from __future__ import annotations

from streaming_data_pipeline_azure_spark.operators import association


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "entity int, item string")


def test_pair_counts_support_lift(spark):
    df = _baskets(
        spark,
        [
            (1, "x"), (1, "y"), (1, "z"),
            (2, "x"), (2, "y"), (2, "y"),  # duplicate purchase collapses
            (3, "x"),
            (4, "y"), (4, "z"),
        ],
    )
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association.pair_associations(df, "entity", "item").collect()
    }
    assert set(got) == {("x", "y"), ("y", "z")}  # (x,z) below min_pair_count
    xy = got[("x", "y")]
    assert xy["n_ab"] == 2 and xy["support"] == 0.5
    assert xy["lift"] == (2 * 4) / (3 * 3)
    yz = got[("y", "z")]
    assert yz["n_ab"] == 2 and yz["lift"] == (2 * 4) / (3 * 2)


def test_whale_basket_cap(spark):
    whale = [(9, f"i{k}") for k in range(20)]
    df = _baskets(spark, [(1, "x"), (1, "y"), (2, "x"), (2, "y")] + whale)
    got = association.pair_associations(
        df, "entity", "item", max_basket_size=10
    ).collect()
    assert {(r["item_a"], r["item_b"]) for r in got} == {("x", "y")}
    # n_entities excludes the dropped whale: support = 2/2
    assert got[0]["support"] == 1.0


def test_no_cartesian_plan(spark):
    from streaming_data_pipeline_azure_spark.plans.inspect import physical_plan

    df = _baskets(spark, [(1, "x"), (1, "y"), (2, "x")])
    plan = physical_plan(association.pair_associations(df, "entity", "item"))
    assert "CartesianProduct" not in plan
