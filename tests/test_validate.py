"""Unit tests for declarative data-quality validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import validate


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -3.0, "B"), (3, None, "A"), (4, 5.0, None)],
        "id long, amount double, flag string",
    )


def test_check_rules_counts_and_null_semantics(spark):
    """NULL predicate outcomes count as violations (conservative); counts
    and fractions are per rule over one shared row count."""
    rules = [
        ("amount_positive", F.col("amount") > 0),          # rows 2 (neg), 3 (null)
        ("flag_domain", F.col("flag").isin("A", "B")),     # row 4 (null)
        ("id_nonnull", F.col("id").isNotNull()),           # passes
    ]
    out = {r["rule"]: r for r in validate.check_rules(_df(spark), rules).collect()}
    assert out["amount_positive"]["n_violations"] == 2
    assert out["amount_positive"]["violation_frac"] == 0.5
    assert out["amount_positive"]["passed"] is False
    assert out["flag_domain"]["n_violations"] == 1
    assert out["id_nonnull"]["n_violations"] == 0
    assert out["id_nonnull"]["passed"] is True
    assert all(r["n_rows"] == 4 for r in out.values())
    with pytest.raises(ValueError):
        validate.check_rules(_df(spark), [])


def test_check_rules_is_one_scan(spark, sf_dir):
    """The whole suite must evaluate as ONE aggregation pass: a single
    shuffle however many rules there are (conditional counts, not
    per-rule jobs)."""
    import re

    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rules = [(f"r{i}", F.col("l_quantity") > i) for i in range(12)]
    plan = physical_plan(validate.check_rules(li, rules))
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 1, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan


def test_failing_rows_samples_offenders(spark):
    rules = [
        ("amount_positive", F.col("amount") > 0),
        ("flag_domain", F.col("flag").isin("A", "B")),
    ]
    rows = validate.failing_rows(_df(spark), rules, limit=10).collect()
    got = {(r["violated_rule"], r["id"]) for r in rows}
    assert got == {
        ("amount_positive", 2),
        ("amount_positive", 3),
        ("flag_domain", 4),
    }


def test_check_referential_orphans_and_null_fk(spark):
    from streaming_data_pipeline_azure_spark.operators import validate

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 9), (4, None)], "id long, fk long"
    )
    [r] = validate.check_referential(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()
    # 3 non-null FKs, one orphan (9); the NULL fk is not an orphan
    assert (r["n_child"], r["n_orphans"]) == (3, 1)
    assert abs(r["orphan_frac"] - 1 / 3) < 1e-15


def test_check_referential_multiple_relations(spark):
    from streaming_data_pipeline_azure_spark.operators import validate

    p1 = spark.createDataFrame([(1,)], "pk long")
    c1 = spark.createDataFrame([(1,), (2,)], "fk long")
    c2 = spark.createDataFrame([(1,), (1,)], "fk long")
    got = {
        r["relation"]: r["n_orphans"]
        for r in validate.check_referential(
            [("a", c1, "fk", p1, "pk"), ("b", c2, "fk", p1, "pk")]
        ).collect()
    }
    assert got == {"a": 1, "b": 0}


def test_diff_snapshots_classifies_and_lists_changed_cols(spark):
    """Planted snapshots pin the diff semantics: added/removed/changed/
    unchanged classification, per-row changed-column lists in
    compare_cols order, null-safe comparison (null->value and
    value->null are changes; null->null is not), and the compare_cols
    default (all shared non-key columns)."""
    from streaming_data_pipeline_azure_spark.operators.validate import (
        diff_snapshots,
    )

    old = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, None), (3, 30, "z"), (4, None, "w")],
        "k int, a int, b string",
    )
    new = spark.createDataFrame(
        [(1, 10, "x"),        # unchanged
         (2, 21, None),       # a changed, b null==null unchanged
         (4, None, None),     # b w->null changed, a null==null
         (5, 50, "v")],       # added; 3 removed
        "k int, a int, b string",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in diff_snapshots(old, new, ["k"]).collect()
    }
    assert got[1] == ("unchanged", [])
    assert got[2] == ("changed", ["a"])
    assert got[3] == ("removed", [])
    assert got[4] == ("changed", ["b"])
    assert got[5] == ("added", [])

    # explicit compare_cols restricts the comparison
    got_b = {
        r["k"]: r["status"]
        for r in diff_snapshots(old, new, ["k"], ["b"]).collect()
    }
    assert got_b[2] == "unchanged"  # only a differs, and a is ignored

    import pytest as _pytest
    with _pytest.raises(ValueError):
        diff_snapshots(old, new, [])


def test_distribution_drift_flags_planted_shift(spark):
    """Identical snapshots show ~zero drift terms; a planted upward
    shift concentrates current mass in the top reference buckets and
    their drift terms dominate; empty snapshots and <2 buckets are
    contract errors."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.validate import (
        distribution_drift,
    )

    ref = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    same = distribution_drift(ref, ref, "v", "k").collect()
    assert sum(r["drift_term"] for r in same) < 1e-12
    assert sum(r["n_cur"] for r in same) == 2_000

    shifted = ref.select("k", (F.col("v") + 60.0).alias("v"))
    d = {r["bucket"]: r for r in
         distribution_drift(ref, shifted, "v", "k").collect()}
    # everything >= 60 lands in the top buckets; bucket 10 holds the
    # overflow mass (cur_share far above ref_share)
    assert d[10]["cur_share"] > 0.5 > d[10]["ref_share"]
    assert d[1]["n_cur"] == 0  # bottom ref bucket drained
    total = sum(r["drift_term"] for r in d.values()
                if r["drift_term"] is not None)
    assert total > 1.0

    with _pytest.raises(ValueError):
        distribution_drift(ref, ref.filter("k < 0"), "v", "k")
    with _pytest.raises(ValueError):
        distribution_drift(ref, ref, "v", "k", n_buckets=1)


def test_distribution_drift_sketch_path_anchored_by_exact(spark):
    """The auto-swapped GK-sketch boundary fit (input above
    exact_max_rows — the r10 scale-twin default) must agree with the
    exact-ntile anchor at a size where the GK sketch is lossless
    (n < accuracy keeps every sample): forcing the sketch path with
    exact_max_rows=0 reproduces the exact path's report bit-for-bit."""
    from streaming_data_pipeline_azure_spark.operators.validate import (
        distribution_drift,
    )

    ref = spark.range(0, 3_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 500).cast("double").alias("v"),
    )
    cur = spark.range(0, 2_500).select(
        F.col("id").alias("k"),
        ((F.col("id") * 53) % 500 + 40).cast("double").alias("v"),
    )
    exact = sorted(
        map(tuple, distribution_drift(ref, cur, "v", "k").collect())
    )
    sketch = sorted(
        map(
            tuple,
            distribution_drift(
                ref, cur, "v", "k", exact_max_rows=0
            ).collect(),
        )
    )
    assert sketch == exact


def test_fd_violations_witnesses_and_nulls(spark):
    """Violating keys surface with distinct counts and min/max
    witnesses; null-mixed groups flag; clean keys stay silent."""
    from streaming_data_pipeline_azure_spark.operators.validate import (
        functional_dependency_violations,
    )

    rows = [
        ("z1", "CA"), ("z1", "CA"),           # clean
        ("z2", "CA"), ("z2", "NV"),           # 2-value violation
        ("z3", "WA"), ("z3", None),           # null-mixed violation
        ("z4", None), ("z4", None),           # all-null: single state, ok
    ]
    df = spark.createDataFrame(rows, "zip string, state string")
    got = {
        r["zip"]: r
        for r in functional_dependency_violations(
            df, ["zip"], "state"
        ).collect()
    }
    assert set(got) == {"z2", "z3"}
    assert got["z2"]["n_rhs_values"] == 2
    assert (got["z2"]["rhs_min"], got["z2"]["rhs_max"]) == ("CA", "NV")
    assert got["z2"]["has_null"] is False
    assert got["z3"]["n_rhs_values"] == 1
    assert got["z3"]["has_null"] is True


def test_table_checksum_order_insensitive_and_sensitive_to_change(spark):
    from streaming_data_pipeline_azure_spark.operators.validate import (
        table_checksum,
    )

    rows = [(1, "a", None), (2, "b", 1.5), (3, None, 2.5)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    base = table_checksum(df, ["id", "s", "v"]).collect()[0]
    assert base["n_rows"] == 3
    # partitioning/order invariance
    shuf = spark.createDataFrame(
        [rows[2], rows[0], rows[1]], "id long, s string, v double"
    ).repartition(5)
    again = table_checksum(shuf, ["id", "s", "v"]).collect()[0]
    assert (again["n_rows"], again["checksum"]) == (
        base["n_rows"],
        base["checksum"],
    )
    # any single-value change moves the checksum
    changed = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, None, 2.6)],
        "id long, s string, v double",
    )
    c = table_checksum(changed, ["id", "s", "v"]).collect()[0]
    assert c["checksum"] != base["checksum"]


def test_k_anonymity_violations(spark):
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.validate import (
        k_anonymity_violations,
    )

    rows = [
        ("94105", "1980"), ("94105", "1980"), ("94105", "1980"),
        ("94110", "1990"), ("94110", "1990"),
        ("94110", "1991"),           # singleton cell
        (None, "1980"), (None, "1980"),
    ]
    df = spark.createDataFrame(rows, "zip string, yob string")
    got = {
        (r["zip"], r["yob"]): r["group_size"]
        for r in k_anonymity_violations(df, ["zip", "yob"], 3).collect()
    }
    assert got == {("94110", "1990"): 2, ("94110", "1991"): 1,
                   (None, "1980"): 2}
    # compliant at k=2 except the singleton
    got2 = {
        (r["zip"], r["yob"])
        for r in k_anonymity_violations(df, ["zip", "yob"], 2).collect()
    }
    assert got2 == {("94110", "1991")}
    with _pytest.raises(ValueError):
        k_anonymity_violations(df, ["zip"], 1)


def test_benford_stats_digit_extraction_and_fill(spark):
    """First significant integer digits; sub-1 magnitudes excluded;
    absent digits still emitted with n=0; shares sum to 1."""
    df = spark.createDataFrame(
        [(123.4,), (1.2,), (19.0,), (0.5,), (950.0,), (-2.3,)],
        "v double",
    )
    rows = {r["digit"]: r for r in validate.benford_stats(df, "v").collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[1]["n"] == 3  # 123.4, 1.2, 19.0
    assert rows[2]["n"] == 1  # |-2.3|
    assert rows[9]["n"] == 1  # 950.0
    assert rows[3]["n"] == 0  # zero-filled
    assert abs(sum(r["obs_share"] for r in rows.values()) - 1.0) < 1e-12
    assert abs(sum(r["exp_share"] for r in rows.values()) - 1.0) < 1e-12
    assert rows[1]["abs_dev"] == abs(
        rows[1]["obs_share"] - rows[1]["exp_share"]
    )


def test_fd_discovery_cardinality_logic(spark):
    """id -> cat holds (unique determinant); cat -> id fails with the
    exact split count; both directions of every pair appear."""
    df = spark.createDataFrame(
        [(1, "A", "x"), (2, "A", "x"), (3, "B", "y"), (4, "B", "z")],
        "id long, cat string, sub string",
    )
    out = {(r["determinant"], r["dependent"]): r for r in
           validate.fd_discovery(df, ["id", "cat", "sub"]).collect()}
    assert len(out) == 6
    assert out[("id", "cat")]["holds"] is True
    assert out[("cat", "id")]["holds"] is False
    assert out[("cat", "id")]["n_extra_values"] == 2  # 4 pairs - 2 cats
    assert out[("sub", "cat")]["holds"] is True       # x->A, y->B, z->B
    assert out[("cat", "sub")]["holds"] is False      # B splits {y,z}
    assert out[("cat", "sub")]["n_extra_values"] == 1
    with pytest.raises(ValueError):
        validate.fd_discovery(df, ["id"])


def test_mondrian_generalize_invariants(spark):
    """Every final box holds >= k rows; box row counts partition the
    input; a clearly splittable 1-D layout splits; the result is
    deterministic across runs; guards fire."""
    rows = [(float(i), float(i % 10)) for i in range(40)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = validate.mondrian_generalize(df, ["x", "y"], k=5)
    got = out.collect()
    assert all(r["n_rows"] >= 5 for r in got)
    assert sum(r["n_rows"] for r in got) == 40
    assert len(got) > 1  # 40 uniform rows at k=5 must split
    again = validate.mondrian_generalize(df, ["x", "y"], k=5).collect()
    key = lambda r: (r["n_rows"], r["x_min"], r["x_max"],
                     r["y_min"], r["y_max"])
    assert sorted(map(key, got)) == sorted(map(key, again))
    with pytest.raises(ValueError):
        validate.mondrian_generalize(df, ["x"], k=1)
    with pytest.raises(ValueError):
        validate.mondrian_generalize(df.limit(3), ["x"], k=5)


def test_temporal_split_report_counts_and_leakage(spark):
    import datetime as dt

    from streaming_data_pipeline_azure_spark.operators.validate import (
        temporal_split_report,
    )

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1)), (1, d(2024, 6, 1)),   # seen in both
        (2, d(2024, 1, 15)),                       # train only
        (3, d(2024, 7, 1)), (3, d(2024, 8, 1)),    # test only (unseen)
    ]
    df = spark.createDataFrame(rows, ["ent", "ts"])
    (r,) = temporal_split_report(df, "ts", "ent", "2024-03-01").collect()
    assert (r["n_train"], r["n_test"]) == (2, 3)
    assert (r["entities_train"], r["entities_test"]) == (2, 2)
    assert r["entities_both"] == 1
    assert r["seen_entity_test_rows"] == 1
    assert r["seen_test_share_scaled"] == 333_333


def test_l_diversity_and_t_closeness_semantics(spark):
    """Planted groups pin the trio's division of labor: a LARGE group
    with one sensitive value passes k-anonymity but fails l-diversity;
    a group matching the global mix scores EMD 0; a group concentrated
    at one extreme scores the maximum scale."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators import validate

    rows = []
    # group A: 10 members, all sensitive value 0 (l-violation)
    rows += [("A", 0) for _ in range(10)]
    # group B: 10 members, uniform over {0, 1} (diverse)
    rows += [("B", v % 2) for v in range(10)]
    df = spark.createDataFrame(rows, "qi string, s int")
    viol = validate.l_diversity_violations(df, ["qi"], "s", 2).collect()
    assert [(r["qi"], r["n_sensitive_values"]) for r in viol] == [("A", 1)]
    with _pytest.raises(ValueError, match="l >= 2"):
        validate.l_diversity_violations(df, ["qi"], "s", 1)
    # t-closeness: global is A(all 0) + B(half/half) = 15 zeros, 5 ones
    out = {
        r["qi"]: r["emd_scaled"]
        for r in validate.t_closeness_report(df, ["qi"], "s").collect()
    }
    # exact: EMD(A) = |10*20 - 15*10| / (10*20*(2-1)) = 50/200 = 0.25
    assert out["A"] == 250_000
    # EMD(B) = |5*20 - 15*10|/200 = 50/200 = 0.25 (B is the mirror)
    assert out["B"] == 250_000
    # a group that IS the global mix scores 0
    df2 = spark.createDataFrame(
        [("C", v % 2) for v in range(10)] + [("D", v % 2) for v in range(10)],
        "qi string, s int",
    )
    out2 = {
        r["qi"]: r["emd_scaled"]
        for r in validate.t_closeness_report(df2, ["qi"], "s").collect()
    }
    assert out2 == {"C": 0, "D": 0}
