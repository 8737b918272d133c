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


def test_frequent_triples_counts_and_pruning(spark):
    """Triples counted per basket; min_support filters; Apriori result
    equals the brute-force per-basket enumeration."""
    from itertools import combinations

    from streaming_data_pipeline_azure_spark.operators.association import (
        frequent_triples,
    )

    baskets = {
        1: ["a", "b", "c", "d"],
        2: ["a", "b", "c"],
        3: ["a", "b", "d"],
        4: ["b", "c", "d"],
        5: ["a", "x"],
    }
    rows = [(e, i) for e, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "e long, i string")

    # brute-force expectation
    from collections import Counter

    brute = Counter()
    for items in baskets.values():
        for t in combinations(sorted(set(items)), 3):
            brute[t] += 1
    expect = {t: n for t, n in brute.items() if n >= 2}

    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["n_abc"]
        for r in frequent_triples(df, "e", "i", min_support=2).collect()
    }
    assert got == expect
    # support fraction = count / n_baskets
    for r in frequent_triples(df, "e", "i", min_support=2).collect():
        assert abs(r["support"] - r["n_abc"] / 5.0) < 1e-12


def test_frequent_triples_whale_basket_cap(spark):
    """max_basket_size drops oversized baskets before any pair work."""
    from streaming_data_pipeline_azure_spark.operators.association import (
        frequent_triples,
    )

    rows = [(1, f"i{k}") for k in range(50)]  # whale
    rows += [(e, i) for e in (2, 3) for i in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "e long, i string")
    got = frequent_triples(
        df, "e", "i", min_support=2, max_basket_size=10
    ).collect()
    assert {(r["item_a"], r["item_b"], r["item_c"]) for r in got} == {
        ("a", "b", "c")
    }
    assert got[0]["n_abc"] == 2
    # support denominator counts only surviving baskets
    assert abs(got[0]["support"] - 1.0) < 1e-12
