"""Unit tests for ML feature-engineering operators (features.py)."""

from __future__ import annotations

import hashlib

import pytest

from streaming_data_pipeline_azure_spark.operators import features


def test_loo_target_encode_semantics(spark):
    """LOO encoding excludes the row's own target; singletons get NULL."""
    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0), (4, "B", 7.0)],
        "id long, cat string, y double",
    )
    out = {
        r["id"]: r["loo_encoding"]
        for r in features.loo_target_encode(df, "cat", "y").collect()
    }
    assert out[1] == 2.5  # (6 - 1) / 2
    assert out[2] == 2.0
    assert out[3] == 1.5
    assert out[4] is None  # singleton category


def test_loo_target_encode_passes_through_columns(spark):
    df = spark.createDataFrame(
        [(1, "A", 1.0, "x"), (2, "A", 2.0, "y")],
        "id long, cat string, y double, extra string",
    )
    out = features.loo_target_encode(df, "cat", "y")
    assert out.columns == ["id", "cat", "y", "extra", "loo_encoding"]


def test_feature_hash_counts_totals_and_range(spark):
    df = spark.createDataFrame(
        [("alpha beta beta",), ("Beta GAMMA-7 alpha",)], "text string"
    )
    rows = features.feature_hash_counts(df, "text", 16).collect()
    # 3 + 4 tokens total ("gamma-7" splits into "gamma", "7")
    assert sum(r["n_tokens"] for r in rows) == 7
    assert all(0 <= r["bucket"] < 16 for r in rows)
    # distinct terms across buckets == vocabulary size (alpha, beta,
    # gamma, 7) when no bucket collision merges two terms' counts
    assert sum(r["n_distinct_terms"] for r in rows) == 4
    with pytest.raises(ValueError):
        features.feature_hash_counts(df, "text", 0)


def test_feature_hash_bucket_matches_md5_reference(spark):
    """The bucket id is the documented md5-prefix hash — verify against
    an independent hashlib computation so the portable-oracle claim is
    pinned by a third implementation."""
    df = spark.createDataFrame([("spark",)], "text string")
    (row,) = features.feature_hash_counts(df, "text", 64).collect()
    expected = int(hashlib.md5(b"spark").hexdigest()[:8], 16) % 64
    assert row["bucket"] == expected
    assert row["n_tokens"] == 1


def test_quantile_normalize_maps_group_ranks_to_reference(spark):
    """Each group's min/max map to the reference min/max; mid ranks hit
    interior reference quantiles; singleton groups map to p=0."""
    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, "A", 50.0), (3, "A", 500.0),
         (4, "B", -1.0), (5, "B", 99.0),
         (6, "C", 7.0)],
        "id long, g string, v double",
    )
    ref = spark.createDataFrame(
        [(10.0,), (20.0,), (30.0,), (40.0,), (50.0,)], "value double"
    )
    out = {r["id"]: r for r in features.quantile_normalize(
        df, "g", "v", "id", ref
    ).collect()}
    assert out[1]["normalized"] == 10.0 and out[1]["p"] == 0.0
    assert out[2]["normalized"] == 30.0 and out[2]["p"] == 0.5
    assert out[3]["normalized"] == 50.0 and out[3]["p"] == 1.0
    assert out[4]["normalized"] == 10.0
    assert out[5]["normalized"] == 50.0
    assert out[6]["normalized"] == 10.0 and out[6]["p"] == 0.0


def test_class_weights_balanced_heuristic(spark):
    from streaming_data_pipeline_azure_spark.operators.features import (
        class_weights,
    )

    # 6 a, 3 b, 1 c -> total 10, k 3
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)], ["y"]
    )
    out = {r["label"]: r for r in class_weights(df, "y").collect()}
    assert out["a"]["n"] == 6
    assert out["a"]["share_scaled"] == 600_000
    # w_a = 10/(3*6) = 0.5555.. -> floor-scaled 555555
    assert out["a"]["weight_scaled"] == 555_555
    # w_c = 10/(3*1) = 3.333.. -> 3333333
    assert out["c"]["weight_scaled"] == 3_333_333
    assert out["b"]["weight_scaled"] == 1_111_111


def test_smoothed_target_encode_shrinkage(spark):
    from streaming_data_pipeline_azure_spark.operators.features import (
        smoothed_target_encode,
    )

    # global mean = 10; category "rare" (n=1, mean 100) shrinks hard,
    # "big" (n=99, mean ~9.09) barely moves
    rows = [("big", 9.090909090909092)] * 99 + [("rare", 100.0)]
    # make exact: big value chosen so global mean is exactly 10
    rows = [("big", 900.0 / 99)] * 99 + [("rare", 100.0)]
    df = spark.createDataFrame(rows, ["c", "y"])
    out = {r["category"]: r for r in smoothed_target_encode(df, "c", "y", m=20).collect()}
    g = 10.0  # (900 + 100) / 100
    rare = out["rare"]
    # enc_rare = (100 + 20*10) / 21 = 300/21
    # values pass through DECIMAL(18,4), so 900/99 rounds at 1e-4
    assert abs(rare["mean_smoothed"] - 300.0 / 21.0) < 1e-3
    big = out["big"]
    assert abs(big["mean_smoothed"] - big["mean_raw"]) < abs(
        rare["mean_smoothed"] - rare["mean_raw"]
    )
    assert abs(
        (out["rare"]["n"] * out["rare"]["mean_raw"] + out["big"]["n"] * out["big"]["mean_raw"]) / 100
        - g
    ) < 0.01


def test_isotonic_fit_pools_and_properties(spark):
    import pytest

    from streaming_data_pipeline_azure_spark.operators.features import (
        isotonic_fit,
    )

    rows = [(1.0, 10.0), (2.0, 30.0), (3.0, 20.0), (4.0, 40.0)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = sorted(
        (tuple(r) for r in isotonic_fit(df, "x", "y").collect())
    )
    assert out == [
        (1.0, 1.0, 1, 10.0), (2.0, 3.0, 2, 25.0), (4.0, 4.0, 1, 40.0)
    ]
    # fully decreasing input collapses to ONE pool at the global mean
    dec = [(float(i), float(100 - 10 * i)) for i in range(1, 6)]
    (p,) = isotonic_fit(
        spark.createDataFrame(dec, ["x", "y"]), "x", "y"
    ).collect()
    assert (p["x_min"], p["x_max"], p["n"]) == (1.0, 5.0, 5)
    assert p["fitted_mean"] == 70.0
    # fitted means are non-decreasing and mass is conserved
    mix = [(float(i % 7), float((i * 37) % 100)) for i in range(200)]
    fit = sorted(
        isotonic_fit(spark.createDataFrame(mix, ["x", "y"]), "x", "y")
        .collect(),
        key=lambda r: r["x_min"],
    )
    means = [r["fitted_mean"] for r in fit]
    assert means == sorted(means)
    assert sum(r["n"] for r in fit) == 200
    # guard: too many distinct x values raises loudly
    big = spark.range(0, 2000).selectExpr(
        "CAST(id AS DOUBLE) AS x", "CAST(id AS DOUBLE) AS y"
    )
    with pytest.raises(ValueError, match="max_points"):
        isotonic_fit(big, "x", "y")


def test_gini_stump_split_exact_separation_and_ties(spark):
    """A perfectly separating threshold must win with the maximum
    score (pure children: S = nL + nR = n); equal-quality candidates
    tie-break on the smallest threshold; the score is the floor-scaled
    exact rational."""
    from streaming_data_pipeline_azure_spark.operators.features import (
        gini_stump_split,
    )

    # feature <= 4 -> label 0, feature >= 5 -> label 1 (perfect split)
    rows = [(float(v), 0) for v in range(1, 5)] + [
        (float(v), 1) for v in range(5, 9)
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    out = gini_stump_split(df, "x", "y").collect()[0]
    assert out["split_value"] == 4.0
    assert (out["n_left"], out["pos_left"]) == (4, 0)
    assert (out["n_right"], out["pos_right"]) == (4, 4)
    # pure children: S = (0+16)/4 + (16+0)/4 = 8 = n -> scaled 8e9
    assert int(out["score_scaled"]) == 8 * 1_000_000_000
    # constant label: every split scores the same -> smallest threshold
    flat = spark.createDataFrame(
        [(float(v), 1) for v in range(1, 7)], "x double, y int"
    )
    o2 = gini_stump_split(flat, "x", "y").collect()[0]
    assert o2["split_value"] == 1.0


def test_mahalanobis2_outliers_joint_vs_marginal(spark):
    """A point that is unremarkable on both marginals but violates the
    x~y correlation must rank first; degenerate (constant) features
    raise instead of returning garbage ranks."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.features import (
        mahalanobis2_outliers,
    )

    rows = [(i, i % 10, (i % 10) + (1 if i % 3 == 0 else 0))
            for i in range(100)]
    rows.append((1000, 2, 9))  # joint outlier, marginally normal
    df = spark.createDataFrame(rows, "id long, x int, y int")
    out = mahalanobis2_outliers(df, "id", "x", "y", k=3).collect()
    assert out[0]["id"] == 1000
    assert out[0]["score_scaled"] > 10 * out[1]["score_scaled"]

    const = spark.createDataFrame(
        [(i, 1, i) for i in range(10)], "id long, x int, y int"
    )
    with _pytest.raises(ValueError, match="degenerate"):
        mahalanobis2_outliers(const, "id", "x", "y")


def test_mahalanobis2_outliers_digit_bound_raises(spark):
    """A feature grain too fine for DECIMAL(38,0) raises LOUDLY (r10
    ADVICE): before the guard, the per-row quadratic form overflowed
    to NULL and the overflowed rows silently vanished from the top-k
    (NULLs sort last under desc). Worst-case |num·scale| is bounded
    exactly from the driver-side sufficient stats."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.features import (
        mahalanobis2_outliers,
    )

    # values ~1e8 over 50 rows: n-scaled deviations ~5e9, scatter
    # terms ~1e21 -> |num|*scale ~ 1e21 * (5e9)^2 * 1e6 >> 1e38
    big = spark.createDataFrame(
        [(i, i * 10**8, i * 10**8 + (i % 7)) for i in range(50)],
        "id long, x long, y long",
    )
    with _pytest.raises(ValueError, match="overflow"):
        mahalanobis2_outliers(big, "id", "x", "y")


def test_two_factor_ols_exact_plane_and_numpy_parity(spark):
    """y = 3 + 2·x1 − x2 exactly → coefficients recovered to double
    precision with r²=1; on seeded noisy integers the closed form
    matches numpy lstsq to 1e-9 relative."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators.features import (
        two_factor_ols,
    )

    pts = [(x1, x2) for x1 in range(1, 7) for x2 in range(1, 5)]
    exact = spark.createDataFrame(
        [(3 + 2 * x1 - x2, x1, x2) for x1, x2 in pts],
        "y long, x1 long, x2 long",
    )
    [r] = two_factor_ols(exact, "y", "x1", "x2").collect()
    assert abs(r["b1"] - 2.0) < 1e-12
    assert abs(r["b2"] + 1.0) < 1e-12
    assert abs(r["intercept"] - 3.0) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12

    rng = np.random.default_rng(7)
    x1 = rng.integers(0, 50, 400)
    x2 = rng.integers(0, 10, 400)
    y = 5 * x1 - 3 * x2 + rng.integers(-20, 21, 400)
    noisy = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(y, x1, x2)],
        "y long, x1 long, x2 long",
    )
    [s] = two_factor_ols(noisy, "y", "x1", "x2").collect()
    X = np.column_stack([np.ones(len(y)), x1, x2]).astype(float)
    coef, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert abs(s["intercept"] - coef[0]) < 1e-6
    assert abs(s["b1"] - coef[1]) < 1e-9
    assert abs(s["b2"] - coef[2]) < 1e-9


def test_two_factor_ols_collinear_is_null(spark):
    """x2 = 2·x1 → singular normal equations → NULL coefficients,
    never a garbage solve."""
    from streaming_data_pipeline_azure_spark.operators.features import (
        two_factor_ols,
    )

    df = spark.createDataFrame(
        [(i + 1, i, 2 * i) for i in range(10)],
        "y long, x1 long, x2 long",
    )
    [r] = two_factor_ols(df, "y", "x1", "x2").collect()
    assert r["b1"] is None and r["b2"] is None and r["r2"] is None
