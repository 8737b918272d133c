"""Tests for table profiling and sketch summaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import profile
from streaming_data_pipeline_azure_spark.operators.profile import (
    numeric_summary,
    profile_columns,
    value_sketches,
)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id int, s string"
    )
    out = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert out["id"]["n_rows"] == 4
    assert out["id"]["n_nulls"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2


def test_profile_single_scan(spark):
    """The profile must be one aggregation job, not one per column."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # expand for distinct, no per-col jobs


def test_numeric_summary(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "x double")
    [r] = numeric_summary(df, ["x"]).collect()
    assert (r["min_value"], r["max_value"], r["mean_value"]) == (1.0, 3.0, 2.0)


def test_value_sketches_shapes(spark, sf_dir):
    import pyspark.sql.functions as F

    ev = spark.createDataFrame(
        [(i, "t", float(i % 10), i % 7) for i in range(100)],
        "event_id int, event_type string, value double, user_id int",
    )
    [r] = value_sketches(ev, "event_type", "value", "user_id").collect()
    assert r["approx_distinct"] == 7  # HLL exact at tiny cardinality
    p50, p95 = r["approx_percentiles"]
    assert 3.0 <= p50 <= 6.0
    assert p95 >= 8.0


def test_approx_quantile_buckets_tracks_exact_ntile(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    approx = profile.approx_quantile_buckets(docs, "n_chars", 10, bucket_name="decile")
    counts = {r["decile"]: r["cnt"] for r in approx.groupBy("decile").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # every decile populated and within 40% of the ideal n/10 (sketch
    # accuracy at this corpus size is much better; the bar is a guard)
    assert set(counts) == set(range(1, 11))
    for d, c in counts.items():
        assert abs(c - n / 10) <= 0.4 * n / 10, (d, c, n)
    # assignment is monotone in the value: per-decile [min,max] ranges
    # must not interleave
    ranges = (
        approx.groupBy("decile")
        .agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
        .orderBy("decile")
        .collect()
    )
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"]


def test_approx_quantile_buckets_covers_out_of_range(spark):
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 1000000]], "v long")
    out = profile.approx_quantile_buckets(df, "v", 4)
    got = {r["v"]: r["bucket"] for r in out.collect()}
    assert got[1] == 1 and got[1000000] == 4
    assert sorted(got.values()) == list(got[k] for k in sorted(got))


def test_heavy_hitters_cms_matches_exact_on_skew(spark):
    """CMS top-k on a Zipf-ish column: the estimated top set matches the
    exact top set, estimates never undercount, and the heaviest key's
    estimate is within the epsilon*N one-sided bound."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        heavy_hitters_cms,
    )

    rows = []
    for i in range(40):
        rows += [(f"key{i}",)] * (400 // (i + 1))
    df = spark.createDataFrame(rows, "v string").repartition(8)
    exact = {
        r["v"]: r["c"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    exact_top5 = sorted(exact, key=lambda v: (-exact[v], v))[:5]
    got = heavy_hitters_cms(df, "v", k=5, depth=4, width=1024).collect()
    assert [r["value"] for r in got] == exact_top5
    n = sum(exact.values())
    for r in got:
        true = exact[r["value"]]
        assert r["est_count"] >= true          # CMS never undercounts
        assert r["est_count"] <= true + (3 * n) // 1024 + 1


def test_heavy_hitters_cms_empty_input(spark):
    from streaming_data_pipeline_azure_spark.operators.profile import (
        heavy_hitters_cms,
    )

    df = spark.createDataFrame([], "v string")
    assert heavy_hitters_cms(df, "v", k=5).count() == 0


def test_robust_outliers_mad_and_zero_mad_edge(spark):
    from streaming_data_pipeline_azure_spark.operators import profile

    rows = [("g1", float(v)) for v in range(1, 10)] + [("g1", 100.0)]
    rows += [("g2", 5.0), ("g2", 5.0), ("g2", 5.0), ("g2", 7.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {
        r["grp"]: r for r in profile.robust_outliers(df, "grp", "value").collect()
    }
    g1 = got["g1"]
    assert g1["median"] == 5.5 and g1["mad"] == 2.5
    assert g1["n_outliers"] == 1 and g1["outlier_frac"] == 0.1
    g2 = got["g2"]  # MAD=0: exact-tie escapees flagged
    assert g2["mad"] == 0.0 and g2["n_outliers"] == 1


def test_grouped_linreg_exact_fit_and_degenerate(spark):
    from streaming_data_pipeline_azure_spark.operators import profile

    # g1: exact line y = 2x + 1 -> slope 2, intercept 1, r2 = 1
    rows = [("g1", float(x), 2.0 * x + 1.0) for x in range(1, 6)]
    # g2: known non-trivial fit for (1,2),(2,1),(3,4),(4,3)
    rows += [("g2", 1.0, 2.0), ("g2", 2.0, 1.0), ("g2", 3.0, 4.0), ("g2", 4.0, 3.0)]
    # g3: zero x-variance -> NULLs
    rows += [("g3", 5.0, 1.0), ("g3", 5.0, 2.0)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {
        r["grp"]: r for r in profile.grouped_linreg(df, "grp", "x", "y").collect()
    }
    assert got["g1"]["slope"] == 2.0 and got["g1"]["intercept"] == 1.0
    assert got["g1"]["r2"] == 1.0
    # g2 closed form: n=4 sx=10 sy=10 sxy=28 sxx=30 -> slope=12/20=0.6
    assert abs(got["g2"]["slope"] - 0.6) < 1e-12
    assert abs(got["g2"]["intercept"] - 1.0) < 1e-12
    assert got["g3"]["slope"] is None and got["g3"]["r2"] is None


def test_robust_outliers_approx_path_agrees(spark):
    """The approx_percentile scale path must flag the same outliers as
    the exact path on well-separated data (the sketch's rank error only
    matters for z-scores straddling the threshold)."""
    from streaming_data_pipeline_azure_spark.operators import profile

    rows = [("g", float(v % 50)) for v in range(1000)] + [
        ("g", 1e6), ("g", -1e6)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    exact = profile.robust_outliers(df, "grp", "value").collect()[0]
    approx = profile.robust_outliers(
        df, "grp", "value", approx=True
    ).collect()[0]
    assert exact["n_outliers"] == approx["n_outliers"] == 2
    assert approx["n"] == 1002


def test_distinct_partials_merge_bit_identical_to_one_pass(spark):
    """HLL partials taken over any grouping of the rows must union to
    the bit-identical sketch a single pass produces (the mergeability
    contract the streaming ingest relies on), and the estimate must be
    exact at low cardinality (sparse mode)."""
    df = spark.range(100_000).select(
        (F.col("id") % 57_123).cast("string").alias("v"),
        (F.col("id") % 4).alias("slice"),
    )
    one = (
        df.agg(F.hll_sketch_agg("v", F.lit(12)).alias("hll"))
        .select(F.hll_sketch_estimate("hll").alias("est"), "hll")
        .collect()[0]
    )
    merged = (
        profile.merge_distinct_partials(
            profile.distinct_partials(
                df.withColumn("g", F.lit(1)), ["g", "slice"], "v"
            ).drop("slice"),
            ["g"],
        )
        .select(F.hll_sketch_estimate("hll").alias("est"), "hll")
        .collect()[0]
    )
    assert bytes(one["hll"]) == bytes(merged["hll"])
    assert one["est"] == merged["est"]
    # lgk=12 => RSE ~1.6%; assert a loose 5% band on the estimate
    assert abs(one["est"] - 57_123) / 57_123 < 0.05

    low = spark.range(1_000).select(
        (F.col("id") % 150).cast("string").alias("v"), F.lit(1).alias("g")
    )
    est = profile.estimate_distinct(
        profile.distinct_partials(low, ["g"], "v"), ["g"]
    ).collect()[0]["n_distinct_approx"]
    assert est == 150  # sparse-mode exact at low cardinality


def test_estimate_distinct_per_group_and_pre_projection(spark):
    """Per-group estimates with a derived group key built via ``pre``
    stay inside one scan and match exact distinct counts at
    low cardinality."""
    df = spark.range(3_000).select(
        F.col("id").alias("n"),
        (F.col("id") % 3).alias("k"),
        (F.col("id") % 97).cast("string").alias("u"),
    )
    parts = profile.distinct_partials(
        df, ["day"], "u", pre=[(F.col("k") * 10).alias("day"), F.col("u")]
    )
    got = {
        r["day"]: r["n_distinct_approx"]
        for r in profile.estimate_distinct(parts, ["day"]).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in df.select((F.col("k") * 10).alias("day"), "u")
        .groupBy("day")
        .agg(F.countDistinct("u").alias("n"))
        .collect()
    }
    assert got == exact


def test_estimate_key_overlap_sparse_exact_and_error_band(spark):
    """At low cardinality the per-set HLL estimates are exact and the
    set-algebra intersection lands within a few keys of truth; at
    60k/50k keys with 30k shared the estimate lands within 5%."""
    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(150, 400).select(F.col("id").alias("k"))
    got = profile.estimate_key_overlap(a, "k", b, "k").collect()[0]
    # per-set sparse estimates are exact; the UNION sketch may deviate
    # by a hair even at this size (measured 401 on 400 true)
    assert (got["n_left_approx"], got["n_right_approx"]) == (200, 250)
    assert abs(got["n_union_approx"] - 400) <= 8
    assert abs(got["n_intersect_approx"] - 50) <= 8
    assert got["jaccard_approx"] == (
        got["n_intersect_approx"] / got["n_union_approx"]
    )

    big_a = spark.range(0, 60_000).select(F.col("id").alias("k"))
    big_b = spark.range(30_000, 80_000).select(F.col("id").alias("k"))
    est = profile.estimate_key_overlap(big_a, "k", big_b, "k").collect()[0]
    assert abs(est["n_intersect_approx"] - 30_000) / 30_000 < 0.05


def test_correlation_matrix_known_values_and_invariance(spark):
    """Hand-checkable correlations: y = 2x gives corr 1, z = -x gives
    corr -1, a constant column gives NULL (degenerate variance); the
    matrix is partition-invariant (decimal sums)."""
    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i), 7.0) for i in range(50)],
        "x double, y double, z double, c double",
    )
    for parts in (1, 7):
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in profile.correlation_matrix(
                df.repartition(parts), ["x", "y", "z", "c"]
            ).collect()
        }
        assert abs(got[("x", "y")] - 1.0) < 1e-12
        assert abs(got[("x", "z")] + 1.0) < 1e-12
        assert got[("x", "c")] is None and got[("y", "c")] is None
        assert len(got) == 6

    import pytest as _pytest
    with _pytest.raises(ValueError):
        profile.correlation_matrix(df, ["x"])


def test_weighted_percentiles_exact(spark):
    """Lower weighted quantile: smallest value whose cumulative weight
    reaches q x total; weights act as fractional frequencies."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        weighted_percentiles,
    )

    rows = [
        ("a", 1.0, 1.0),
        ("a", 2.0, 1.0),
        ("a", 3.0, 2.0),
        # b: one dominant value
        ("b", 10.0, 0.5),
        ("b", 20.0, 9.5),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {
        (r["g"], r["q"]): r["value"]
        for r in weighted_percentiles(
            df, "g", "v", "w", [0.25, 0.5, 0.75]
        ).collect()
    }
    assert got == {
        ("a", 0.25): 1.0,
        ("a", 0.5): 2.0,
        ("a", 0.75): 3.0,
        ("b", 0.25): 20.0,
        ("b", 0.5): 20.0,
        ("b", 0.75): 20.0,
    }
    # unweighted degenerate case matches percentile_disc semantics
    uni = spark.createDataFrame(
        [("u", float(v), 1.0) for v in range(1, 11)],
        "g string, v double, w double",
    )
    med = weighted_percentiles(uni, "g", "v", "w", [0.5]).collect()
    assert med[0]["value"] == 5.0


def test_weighted_percentiles_rejects_negative_weight(spark):
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.profile import (
        weighted_percentiles,
    )

    df = spark.createDataFrame(
        [("a", 1.0, -2.0)], "g string, v double, w double"
    )
    with _pytest.raises(ValueError, match="negative"):
        weighted_percentiles(df, "g", "v", "w", [0.5])


def test_weighted_percentiles_sketch_divergence_bound(spark):
    """The HDR sketch estimate is <= the exact answer with relative
    error <= 1/m for values >= 1 (the picked bucket contains the exact
    percentile; the reported value is its lower bound)."""
    import random

    from streaming_data_pipeline_azure_spark.operators.profile import (
        weighted_percentiles,
        weighted_percentiles_sketch,
    )

    rng = random.Random(7)
    rows = [
        ("g%d" % (i % 3), rng.uniform(1.0, 5000.0), rng.uniform(0.1, 4.0))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    qs = [0.25, 0.5, 0.9]
    m = 16
    exact = {
        (r["g"], r["q"]): r["value"]
        for r in weighted_percentiles(df, "g", "v", "w", qs).collect()
    }
    sk = {
        (r["g"], r["q"]): r["value"]
        for r in weighted_percentiles_sketch(
            df, "g", "v", "w", qs, m=m
        ).collect()
    }
    assert set(sk) == set(exact)
    for key, est in sk.items():
        true = exact[key]
        assert est <= true + 1e-9, (key, est, true)
        assert (true - est) / true <= 1.0 / m + 1e-9, (key, est, true)


def test_weighted_percentiles_sketch_monotone_and_guards(spark):
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.profile import (
        weighted_percentiles_sketch,
    )

    df = spark.createDataFrame(
        [("a", float(v), 1.0) for v in range(1, 201)],
        "g string, v double, w double",
    )
    out = sorted(
        weighted_percentiles_sketch(
            df, "g", "v", "w", [0.1, 0.5, 0.9], m=8
        ).collect(),
        key=lambda r: r["q"],
    )
    vals = [r["value"] for r in out]
    assert vals == sorted(vals)  # monotone in q
    # underflow bucket: all values < 1 -> estimate 0
    small = spark.createDataFrame(
        [("a", 0.25, 1.0), ("a", 0.75, 1.0)], "g string, v double, w double"
    )
    est = weighted_percentiles_sketch(small, "g", "v", "w", [0.5]).collect()
    assert est[0]["value"] == 0.0
    neg = spark.createDataFrame(
        [("a", -1.0, 1.0)], "g string, v double, w double"
    )
    with _pytest.raises(ValueError, match="negative"):
        weighted_percentiles_sketch(neg, "g", "v", "w", [0.5])


def test_quantile_binning_stats_exact(spark):
    """1..100 into quartiles: boundaries at the exact lower quantiles
    (25, 50, 75), buckets are 25-row blocks, means exact."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.profile import (
        quantile_binning_stats,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "v double"
    )
    got = {
        r["bucket"]: r
        for r in quantile_binning_stats(df, "v", n_buckets=4).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    # boundary values (25, 50, 75) land in the LOWER bucket
    assert (got[0]["lo"], got[0]["hi"], got[0]["n_rows"]) == (1.0, 25.0, 25)
    assert (got[1]["lo"], got[1]["hi"]) == (26.0, 50.0)
    assert got[3]["hi"] == 100.0
    assert abs(got[0]["mean_value"] - 13.0) < 1e-12
    with _pytest.raises(ValueError, match="n_buckets"):
        quantile_binning_stats(df, "v", n_buckets=1)


def test_quantile_binning_stats_sketch_bounds(spark):
    """Sketch-boundary discretizer (r9): totals are preserved, every
    fitted boundary is <= the exact one (HDR lower bound) and within
    the 1/m relative-error contract of it, and a power-of-two-exact
    dataset (values on grid points) reproduces the exact binning."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.profile import (
        quantile_binning_stats,
        quantile_binning_stats_sketch,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "v double"
    )
    m = 32
    sk = quantile_binning_stats_sketch(df, "v", n_buckets=4, m=m).collect()
    assert sum(r["n_rows"] for r in sk) == 100  # partition of the rows
    # per-bucket audit is internally consistent
    for r in sk:
        assert r["lo"] <= r["hi"]
    # exact vs sketch boundary drift ≤ 1/m relative (values ≥ 1):
    # compare the implied bucket maxima of consecutive buckets
    ex = {r["bucket"]: r for r in
          quantile_binning_stats(df, "v", n_buckets=4).collect()}
    skm = {r["bucket"]: r for r in sk}
    for b in sorted(set(ex) & set(skm)):
        assert skm[b]["hi"] <= ex[b]["hi"] * (1 + 1.0 / m) + 1e-9
        assert skm[b]["hi"] >= ex[b]["hi"] * (1 - 1.0 / m) - 1e-9
    with _pytest.raises(ValueError, match="n_buckets"):
        quantile_binning_stats_sketch(df, "v", n_buckets=1)


def test_concentration_stats_known_values(spark):
    """Uniform 4-group distribution: HHI = 1/4, Gini = 0; a dominant
    group raises all three measures."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        concentration_stats,
    )

    uniform = spark.createDataFrame(
        [(f"s{i % 4}",) for i in range(40)], "g string"
    )
    u = concentration_stats(uniform, "g", top_k=2).collect()[0]
    assert u["n_groups"] == 4 and u["n_rows"] == 40
    assert abs(u["hhi"] - 0.25) < 1e-12
    assert abs(u["gini"]) < 1e-12
    assert abs(u["top_share"] - 0.5) < 1e-12

    skewed = spark.createDataFrame(
        [("big",)] * 70 + [("a",)] * 10 + [("b",)] * 10 + [("c",)] * 10,
        "g string",
    )
    s = concentration_stats(skewed, "g", top_k=1).collect()[0]
    assert abs(s["hhi"] - (70**2 + 3 * 10**2) / 100**2) < 1e-12
    assert s["top_share"] == 0.7
    # hand Gini: sizes sorted [10,10,10,70], i·c = 10+20+30+280 = 340
    # G = 2*340/(4*100) - 5/4 = 1.7 - 1.25 = 0.45
    assert abs(s["gini"] - 0.45) < 1e-12


def test_grouped_gini_known_values(spark):
    """Equal values -> 0; max-concentration [0,0,0,4] -> 0.75 by the
    sorted-rank formula; zero-sum group -> NULL."""
    df = spark.createDataFrame(
        [("A", 5.0), ("A", 5.0), ("A", 5.0), ("A", 5.0),
         ("B", 0.0), ("B", 0.0), ("B", 0.0), ("B", 4.0),
         ("C", 0.0), ("C", 0.0)],
        "g string, v double",
    )
    out = {r["g"]: r for r in profile.grouped_gini(df, "g", "v").collect()}
    assert out["A"]["gini"] == 0.0
    assert out["B"]["gini"] == 0.75
    assert out["C"]["gini"] is None
    assert out["A"]["n"] == 4


def test_grouped_theil_sen_outlier_resistance(spark):
    """Median-of-slopes ignores the wild endpoint an OLS fit would
    chase; even/odd medians, pair counts, <2-point groups absent."""
    rows = [("A", 0, 0.0), ("A", 1, 10.0), ("A", 2, 20.0),
            ("A", 3, 1000.0),
            ("B", 0, 5.0), ("B", 1, 7.0), ("B", 2, 9.0),
            ("C", 9, 1.0)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r["g"]: r for r in
           profile.grouped_theil_sen(df, "g", "t", "v").collect()}
    # A slopes sorted: [10, 10, 10, 333.33.., 495, 980] -> (10+333..)/2
    assert out["A"]["n_pairs"] == 6
    assert abs(out["A"]["slope"] - (10.0 + 1000.0 / 3.0) / 2.0) < 1e-9
    # B is clean linear: all slopes exactly 2
    assert out["B"]["slope"] == 2.0 and out["B"]["n_points"] == 3
    assert "C" not in out  # singleton: no pairs


def test_log2_histogram_buckets_and_bounds(spark):
    """Exact power-of-two buckets from binary length; sub-unit values
    excluded; bounds are [2^b, 2^(b+1)-1]."""
    df = spark.createDataFrame(
        [(1.0,), (1.9,), (2.0,), (3.99,), (4.0,), (255.0,), (256.0,),
         (0.5,), (0.0,)],
        "v double",
    )
    out = {r["bucket"]: r for r in
           profile.log2_histogram(df, "v").collect()}
    assert out[0]["n"] == 2 and out[0]["lo"] == 1 and out[0]["hi"] == 1
    assert out[1]["n"] == 2 and out[1]["lo"] == 2 and out[1]["hi"] == 3
    assert out[2]["n"] == 1
    assert out[7]["n"] == 1 and out[7]["lo"] == 128
    assert out[8]["n"] == 1 and out[8]["lo"] == 256
    assert sum(r["n"] for r in out.values()) == 7  # 0.5 and 0.0 excluded


def test_winsorized_stats_clips_tails_exactly(spark):
    """Known 20-value group: p5/p95 bounds are the rank-1/rank-19
    values; the clipped mean moves toward the center; bounds are real
    data values."""
    vals = list(range(1, 20)) + [1000]  # one wild tail value
    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "g string, v double")
    (row,) = profile.winsorized_stats(df, "g", "v").collect()
    # n=20: r_lo = ceil(0.05*20) = 1 -> lo = 1; r_hi = ceil(19) = 19
    assert float(row["lo"]) == 1.0
    assert float(row["hi"]) == 19.0
    assert row["mean_raw"] == sum(vals) / 20
    want = (sum(range(1, 20)) + 19) / 20  # 1000 clips to 19
    assert row["mean_winsorized"] == want
    import pytest

    with pytest.raises(ValueError):
        profile.winsorized_stats(df, "g", "v", p_lo=0.9, p_hi=0.1)


def test_abc_classes_boundaries_and_shares(spark):
    from streaming_data_pipeline_azure_spark.operators.profile import (
        abc_classes,
    )

    # values 50, 30, 15, 5 (total 100): cum shares 50, 80, 95, 100
    # -> A = {k1, k2} (80% INCLUSIVE), B = {k3} (95% inclusive), C = {k4}
    df = spark.createDataFrame(
        [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)], ["k", "v"]
    )
    out = {r["abc_class"]: r for r in abc_classes(df, "k", "v").collect()}
    assert out["A"]["n_keys"] == 2 and out["A"]["class_value"] == 80.0
    assert out["B"]["n_keys"] == 1 and out["B"]["class_value"] == 15.0
    assert out["C"]["n_keys"] == 1 and out["C"]["class_value"] == 5.0
    assert out["A"]["value_share_scaled"] == 800_000
    assert out["C"]["value_share_scaled"] == 50_000


def test_histogram_percentiles_known_buckets(spark):
    from streaming_data_pipeline_azure_spark.operators.profile import (
        histogram_partials,
        histogram_percentiles,
    )

    # values: 0.2 (bucket -1), 1..3 (buckets 0,1,1), 100 (bucket 6)
    df = spark.createDataFrame(
        [("g", 0.2), ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 100.0)],
        ["k", "v"],
    )
    parts = histogram_partials(df, ["k"], "v")
    got = {(r["bucket"]): r["n"] for r in parts.collect()}
    assert got == {-1: 1, 0: 1, 1: 2, 6: 1}
    est = {
        r["pct"]: r["estimate"]
        for r in histogram_percentiles(parts, ["k"], percents=(0, 50, 100)).collect()
    }
    # rank 0 -> bucket -1 midpoint 0; rank 2 -> bucket 1 mid (2+3)/2=2;
    # rank 4 -> bucket 6 mid (64+127)/2=95
    assert est == {0: 0, 50: 2, 100: 95}


def test_histogram_partials_merge_is_addition(spark):
    from streaming_data_pipeline_azure_spark.operators.profile import (
        histogram_partials,
        merge_histogram_partials,
    )

    a = spark.createDataFrame([("g", 5.0)], ["k", "v"])
    b = spark.createDataFrame([("g", 6.0), ("g", 0.1)], ["k", "v"])
    merged = merge_histogram_partials(
        histogram_partials(a, ["k"], "v").unionAll(
            histogram_partials(b, ["k"], "v")
        ),
        ["k"],
    )
    got = {r["bucket"]: r["n"] for r in merged.collect()}
    assert got == {2: 2, -1: 1}


def test_overdispersion_poisson_vs_clumped(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.profile import (
        overdispersion_stats,
    )

    # constant counts (every key exactly 4 events) -> variance 0,
    # dispersion 0
    flat = spark.range(0, 400).select((F.col("id") % 100).alias("k"))
    (r,) = overdispersion_stats(flat, "k").collect()
    assert r["n_keys"] == 100 and r["total_events"] == 400
    assert r["mean_scaled"] == 4_000_000
    assert r["dispersion_scaled"] == 0
    # one key hogs everything -> dispersion far above 1
    clump = spark.range(0, 400).select(
        F.when(F.col("id") < 301, 0).otherwise(F.col("id")).alias("k")
    )
    (c,) = overdispersion_stats(clump, "k").collect()
    assert c["dispersion_scaled"] > 10_000_000


def test_join_cardinality_estimate_exact_on_uniform_keys(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.profile import (
        join_cardinality_audit,
    )

    # uniform fanout: 1000 left rows over 100 keys joined to 100
    # unique right keys -> containment estimate is EXACT
    left = spark.range(0, 1000).select((F.col("id") % 100).alias("lk"))
    right = spark.range(0, 100).select(F.col("id").alias("rk"))
    (r,) = join_cardinality_audit(left, right, "lk", "rk").collect()
    assert r["est_rows"] == 1000
    assert r["actual_rows"] == 1000
    assert r["est_over_actual_scaled"] == 1_000_000


def test_spearman_monotone_and_anti(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.profile import (
        spearman_correlation,
    )

    # any strictly monotone transform -> rho = 1 exactly
    df = spark.range(1, 101).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * F.col("id")).cast("double").alias("y"),
    )
    (r,) = spearman_correlation(df, "x", "y").collect()
    assert r["n"] == 100 and abs(r["rho"] - 1.0) < 1e-12
    # strictly decreasing -> -1
    df2 = spark.range(1, 101).select(
        F.col("id").cast("double").alias("x"),
        (-F.col("id")).cast("double").alias("y"),
    )
    (r2,) = spearman_correlation(df2, "x", "y").collect()
    assert abs(r2["rho"] + 1.0) < 1e-12


def test_spearman_handles_ties_exactly(spark):
    from streaming_data_pipeline_azure_spark.operators.profile import (
        spearman_correlation,
    )

    # x = (1,1,2,2), y = (1,2,1,2): rank vectors are (1.5,1.5,3.5,3.5)
    # and (1.5,3.5,1.5,3.5) -> rho = 0 exactly
    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0)], ["x", "y"]
    )
    (r,) = spearman_correlation(df, "x", "y").collect()
    assert r["rho"] == 0.0


def test_trimmed_mean_drops_exact_tails(spark):
    from streaming_data_pipeline_azure_spark.operators.profile import (
        trimmed_mean,
    )

    # 20 values: 18 ones + outliers 1000 and -1000; 5% trim -> k=1
    # each side -> trimmed mean = exactly 1.0 while raw mean = 1.0 too
    # (symmetric); make asymmetric: outliers 1000 and 2000
    rows = [("g", 1.0)] * 18 + [("g", 1000.0), ("g", 2000.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    (r,) = trimmed_mean(df, "k", "v").collect()
    assert r["n"] == 20 and r["n_trimmed_each_side"] == 1
    # kept: 17 ones + 1000 -> (17 + 1000)/18
    assert abs(r["mean_trimmed"] - (17 + 1000.0) / 18) < 1e-9
    assert r["mean_raw"] == (18 + 3000.0) / 20


def test_freq_zipf_audit_planted_power_law(spark):
    """A planted 2^-k frequency table reads slope -1000000 per octave
    (one log2-count step down per bucket up); a flat table (every item
    the same count) yields a single bucket and no slope pairs."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        freq_zipf_audit,
    )

    # 64 items with count 1, 32 with 2, 16 with 4, 8 with 8: bucket k
    # holds 2^(6-k) items -> log2_n = 6-k, slope exactly -1 per bucket
    rows = []
    i = 0
    for k, (cnt, n_items) in enumerate([(1, 64), (2, 32), (4, 16), (8, 8)]):
        for _ in range(n_items):
            rows.append((i, cnt)); i += 1
    df = spark.createDataFrame(rows, "item long, n long")
    out = freq_zipf_audit(df, "n").collect()
    assert len(out) == 4
    assert all(r["slope_scaled"] == -1_000_000 for r in out)
    got = {r["bucket"]: r for r in out}
    assert got[0]["n_items"] == 64 and got[0]["log2_n"] == 6
    assert got[3]["n_items"] == 8 and got[3]["log2_n"] == 3


def test_kendall_tau_known_values(spark):
    """Hand-checkable tau-b: a single swap in a 4-permutation gives
    C=5, D=1, tau=2/3; a fully tied 2x2 grid gives tau=0 with the tie
    counts split across both marginals (matches scipy.kendalltau)."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        kendall_tau,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2), (4, 4)], "x int, y int"
    )
    [r] = kendall_tau(df, "x", "y").collect()
    assert (int(r["concordant"]), int(r["discordant"])) == (5, 1)
    assert (r["ties_x"], r["ties_y"]) == (0, 0)
    assert abs(r["tau_b"] - 2.0 / 3.0) < 1e-15

    grid = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], "x int, y int"
    )
    [g] = kendall_tau(grid, "x", "y").collect()
    assert (int(g["concordant"]), int(g["discordant"])) == (1, 1)
    assert (g["ties_x"], g["ties_y"]) == (2, 2)
    assert g["tau_b"] == 0.0

    # perfect monotone agreement -> tau exactly 1
    mono = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "x int, y int"
    )
    [m] = kendall_tau(mono, "x", "y").collect()
    assert m["tau_b"] == 1.0


def test_partial_correlation_removes_confounder(spark):
    """x = z + noise_x, y = z + noise_y with independent noises: the
    marginal r_xy is strongly positive (both ride z) but the partial
    r_xy·z collapses toward 0 — and a direct x→y link survives the
    adjustment."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators.profile import (
        partial_correlation,
    )

    rng = np.random.default_rng(11)
    z = rng.integers(0, 100, 500)
    x = z + rng.integers(-5, 6, 500)
    y = z + rng.integers(-5, 6, 500)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y, z)],
        "x long, y long, z long",
    )
    [r] = partial_correlation(df, "x", "y", "z").collect()
    assert r["r_xy"] > 0.9
    assert abs(r["r_xy_given_z"]) < 0.2

    y2 = x * 2 + rng.integers(-3, 4, 500)
    df2 = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y2, z)],
        "x long, y long, z long",
    )
    [s] = partial_correlation(df2, "x", "y", "z").collect()
    assert s["r_xy_given_z"] > 0.9


def test_partial_correlation_degenerate_nulls(spark):
    """Constant x → r_xy/r_xz NULL; z perfectly collinear with x →
    r_xz = ±1 → partial NULL (0/0), never garbage."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        partial_correlation,
    )

    const = spark.createDataFrame(
        [(5, i, i * 2) for i in range(10)], "x long, y long, z long"
    )
    [r] = partial_correlation(const, "x", "y", "z").collect()
    assert r["r_xy"] is None and r["r_xy_given_z"] is None

    collinear = spark.createDataFrame(
        [(i, i + (i % 3), 2 * i) for i in range(10)],
        "x long, y long, z long",
    )
    [s] = partial_correlation(collinear, "x", "y", "z").collect()
    assert abs(s["r_xz"] - 1.0) < 1e-12
    assert s["r_xy_given_z"] is None


def test_jenks_breaks_matches_bruteforce(spark):
    """k=3 over 8 weighted values: the DP's breaks and total cost
    equal exhaustive enumeration (classes {1..7}, {20,21}, {40};
    total floor-cost 49); k ≥ distinct values degenerates to
    singleton zero-cost classes; the value-cardinality bound raises
    loudly."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.profile import (
        jenks_breaks,
    )

    rows = []
    for v, c in [(1, 3), (2, 1), (5, 2), (6, 2), (7, 1), (20, 4),
                 (21, 1), (40, 2)]:
        rows += [(v,)] * c
    df = spark.createDataFrame(rows, "v long")
    got = {r["class"]: r for r in jenks_breaks(df, "v", k=3).collect()}
    assert (got[1]["lo"], got[1]["hi"]) == (1, 7)
    assert (got[2]["lo"], got[2]["hi"]) == (20, 21)
    assert (got[3]["lo"], got[3]["hi"]) == (40, 40)
    assert sum(r["cost"] for r in got.values()) == 49
    assert got[1]["n_rows"] == 9 and got[2]["n_rows"] == 5

    singles = jenks_breaks(df, "v", k=10).collect()
    assert len(singles) == 8
    assert all(r["cost"] == 0 for r in singles)

    with _pytest.raises(ValueError, match="max_values"):
        jenks_breaks(df, "v", k=3, max_values=4)
