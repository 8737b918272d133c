"""ML feature-engineering operators — the tabular feature stage of a
training-data pipeline (target encoding, the hashing trick).

Reference parity: the reference's job builds the serving document by
joining the stream to reference attributes (main.go:70-88); these
operators cover what a training pipeline does next with those joined
attributes — turn high-cardinality categoricals into model-ready
numeric features WITHOUT a vocabulary build or a second pass.

Scale notes (100 TB posture):
- ``loo_target_encode`` is one map-side-combined aggregate over the
  category column (O(categories) rows) broadcast back onto the fact
  table — no shuffle of the fact side when the category stats frame
  is broadcast-able (it always is: its size is the category
  cardinality, not the data size).
- ``feature_hash_counts`` never builds a vocabulary: the hashing trick
  maps tokens to a fixed bucket space row-locally (pure codegen md5 →
  conv), so the only shuffle is the final O(n_buckets) aggregate.
  Collisions are the accepted trade of the method (Weinberger et al.,
  "Feature Hashing for Large Scale Multitask Learning", ICML 2009).

Cross-engine portability (oracle discipline): the token bucket hash is
``conv(substr(md5(token),1,8),16,10) % n_buckets`` — DuckDB computes
the identical value as ``('0x' || substr(md5(token),1,8))::UBIGINT %
n_buckets`` (both are the first 8 hex digits of the same md5, < 2^32,
so signedness never matters). Target-encoding sums are exact
DECIMAL(18,4) (the grouped_linreg discipline), doubles only at the
final division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df


def _md5_bucket(col: Column, n_buckets: int) -> Column:
    """Portable token→bucket hash: first 32 bits of md5, mod buckets."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    out_col: str = "loo_encoding",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is replaced
    by the mean of the TARGET over all OTHER rows of the same category
    — ``(sum(cat) - y) / (count(cat) - 1)`` — the standard
    leakage-controlled encoding (a plain category mean leaks each
    row's own label into its feature; LOO removes exactly that row's
    contribution, no fold machinery needed).

    One aggregate of exact DECIMAL(18,4) sums per category, broadcast
    back (O(categories) rows — always broadcast-able), the encoding is
    a row-local codegen expression. Singleton categories (count == 1)
    get NULL (no other rows to borrow a mean from). Appends
    ``out_col`` (double); all input columns pass through.
    """
    d_target = F.col(target_col).cast("decimal(18,4)")
    stats = df.groupBy(cat_col).agg(
        F.sum(d_target).alias("__cat_sum"),
        F.count(F.lit(1)).alias("__cat_n"),
    )
    joined = df.join(F.broadcast(stats), cat_col, "left")
    loo = F.when(
        F.col("__cat_n") > 1,
        (F.col("__cat_sum") - d_target).cast("double")
        / (F.col("__cat_n") - 1).cast("double"),
    )
    return joined.select(*df.columns, loo.alias(out_col))


def feature_hash_counts(
    df: DataFrame,
    text_col: str,
    n_buckets: int,
    *,
    token_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """Hashing-trick feature histogram: lowercase-tokenize ``text_col``,
    map every token to ``pmod(md5_32(token), n_buckets)`` row-locally,
    and return per-bucket totals — (bucket, n_tokens,
    n_distinct_terms). This is the vocabulary-free featurizer: the
    bucket space is fixed up front, so there is no vocab build pass,
    no dictionary broadcast, and adding data never changes feature
    ids. The only shuffle is the O(n_buckets) final aggregate; the
    tokenize + hash pipeline is whole-stage codegen.

    Empty buckets are absent from the output (count them against
    ``n_buckets`` to measure load factor).
    """
    if n_buckets < 1:
        raise ValueError("feature_hash_counts needs n_buckets >= 1")
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(token_pattern), 0
            )
        ).alias("token")
    )
    return (
        toks.select(
            _md5_bucket(F.col("token"), n_buckets).alias("bucket"),
            "token",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct_terms"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    ref: DataFrame,
    ref_value_col: str = "value",
    *,
    out_col: str = "normalized",
) -> DataFrame:
    """Quantile normalization against a REFERENCE SAMPLE: each row's
    value is replaced by the reference-distribution value at the same
    within-group percentile — the cross-batch / cross-instrument
    harmonization step (make every group's score distribution look
    like the reference's, so thresholds transfer).

    Scale design: the textbook method ranks against the FULL global
    distribution (a total sort — untenable at 100 TB). Here the
    reference is a caller-supplied BOUNDED frame — typically a
    deterministic :func:`~...sampling.bottomk_sample` of the target
    distribution — collected lazily into ONE sorted broadcast array;
    per-group ranks are ordinary windows; the lookup is
    ``ref[1 + floor(p·(k−1))]`` with p = (rank−1)/(n−1) — row-local
    codegen. Ranks tie-break on ``id_col`` for determinism; singleton
    groups map to p = 0 (the reference minimum).

    Appends ``p`` and ``out_col``; input columns pass through."""
    from pyspark.sql import Window

    arr = ref.agg(
        F.sort_array(
            F.collect_list(F.col(ref_value_col).cast("double"))
        ).alias("__ref")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(id_col)
    )
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        *df.columns,
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    p = F.when(F.col("__n") > 1,
               (F.col("__r") - 1).cast("double")
               / (F.col("__n") - 1).cast("double")).otherwise(F.lit(0.0))
    k = F.size("__ref")
    idx = (F.lit(1) + F.floor(p * (k - 1).cast("double"))).cast("int")
    return (
        ranked.crossJoin(F.broadcast(arr))
        .select(
            *df.columns,
            p.alias("p"),
            F.element_at("__ref", idx).alias(out_col),
        )
    )


def class_weights(
    df: DataFrame, label_col: str, *, scale: int = 1_000_000
) -> DataFrame:
    """Inverse-frequency class weights for imbalanced training —
    sklearn's "balanced" heuristic w_c = n_total / (k · n_c), the
    standard per-class loss weight. Returns one row per label:
    (label, n, share_scaled, weight_scaled) where the ratios are
    FLOOR-SCALED INTEGERS (value · ``scale`` rounded down via exact
    bigint DIV), the portable fixed-point form (decimal and double
    division round differently across engines; integer division does
    not).

    Scale: one partial-aggregated count shuffle on the label, then an
    O(k)-row broadcast of the total — nothing else touches the data."""
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.agg(
        F.sum("n").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__k"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "label",
            "n",
            F.expr(f"CAST((n * CAST({scale} AS BIGINT)) DIV __total AS BIGINT)").alias(
                "share_scaled"
            ),
            F.expr(
                f"CAST((__total * CAST({scale} AS BIGINT)) DIV (__k * n) AS BIGINT)"
            ).alias("weight_scaled"),
        )
    )


def smoothed_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    m: int = 20,
    scale: int = 4,
) -> DataFrame:
    """m-estimate (smoothed) target encoding — the leakage-light
    sibling of :func:`loo_target_encode`: each category's encoding is
    its target mean SHRUNK toward the global mean by a pseudo-count of
    ``m`` prior observations, enc_c = (Σ_c + m·ȳ)/(n_c + m) — rare
    categories inherit the prior, frequent ones keep their own signal
    (Micci-Barreca 2001, the standard CatBoost/Kaggle form). Returns
    one row per category: (category, n, mean_raw, mean_smoothed).

    Determinism: one aggregation collects exact DECIMAL sums per
    category; the global sums ride a one-row broadcast; the two means
    are fixed double expression trees over those sums (oracle
    hash-checked). One shuffle at category grain."""
    dec = F.col(target_col).cast(f"decimal(18,{scale})")
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec).alias("__s"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("__nt"), F.sum("__s").alias("__st")
    )
    nd = F.col("n").cast("double")
    sd = F.col("__s").cast("double")
    gmean = F.col("__st").cast("double") / F.col("__nt").cast("double")
    return per.join(F.broadcast(tot)).select(
        "category",
        "n",
        (sd / nd).alias("mean_raw"),
        ((sd + F.lit(float(m)) * gmean) / (nd + F.lit(float(m)))).alias(
            "mean_smoothed"
        ),
    )


def isotonic_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    max_points: int = 1000,
    scale: int = 4,
) -> DataFrame:
    """ISOTONIC REGRESSION (pool-adjacent-violators) of mean(y) on x —
    the monotone-calibration fit (score → probability calibration,
    price-vs-discount monotonicity audits). Returns one row per final
    pool: (x_min, x_max, n, fitted_mean), pools ordered by x, means
    non-decreasing by construction.

    Formulation: y pre-aggregates to DISTINCT-X grain (exact decimal
    sums — the shuffle carries x points, never rows), the points
    collapse to ONE sorted array, and PAVA runs as a bounded
    MERGE-OR-APPEND state machine folded over exactly 2·|points|
    transitions: each step either merges the last two pools when
    their means are out of order — the violator test is the exact
    decimal CROSS-PRODUCT s_prev·n_curr > s_curr·n_prev, no division
    — or appends the next point; appends = N and merges ≤ N−1, so
    2N transitions always reach the fixpoint (trailing steps no-op).
    The oracle replays the IDENTICAL transition system as a recursive
    CTE, one transition per recursion. ``max_points`` bounds the
    per-row array (distinct x must be dimension-like: buckets,
    discrete prices — raise it consciously, never for raw
    continuous x; violations raise loudly)."""
    dec = F.col(y_col).cast(f"decimal(18,{scale})")
    pts = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.sum(dec).alias("__s"), F.count(F.lit(1)).cast("long").alias("__n")
    )
    n_pts = pts.count()
    if n_pts == 0:
        raise ValueError("isotonic_fit: no points")
    if n_pts > max_points:
        raise ValueError(
            f"isotonic_fit: {n_pts} distinct x values exceed "
            f"max_points={max_points} — bucket x first (the fold "
            "buffers one array of all points)"
        )
    one = pts.agg(
        F.array_sort(
            F.collect_list(F.struct("__x", "__s", "__n"))
        ).alias("__pts")
    )
    pool = lambda xmin, xmax, s, n: F.struct(  # noqa: E731
        xmin.alias("xmin"), xmax.alias("xmax"), s.alias("s"), n.alias("n")
    )
    acc0 = F.struct(
        F.lit(1).alias("i"),
        F.array().cast(
            "array<struct<xmin:double,xmax:double,s:decimal(28,4),n:bigint>>"
        ).alias("pools"),
    )

    def step(acc, _):
        pools, i = acc["pools"], acc["i"]
        np = F.size(pools)
        last = F.element_at(pools, -1)
        prev = F.element_at(pools, -2)
        # violator test in (19,0)x(18,0) fixed-point: the product fits
        # DECIMAL(38,0) EXACTLY on any engine (a raw (28,4)xBIGINT
        # multiply would exceed precision 38 and round) — valid while
        # pool sums stay < 1e15 and counts < 1e18 (documented bound)
        s_int = lambda q: (q["s"] * 10000).cast("decimal(19,0)")  # noqa: E731
        n_dec = lambda q: q["n"].cast("decimal(18,0)")  # noqa: E731
        out_of_order = (np >= 2) & (
            s_int(prev) * n_dec(last) > s_int(last) * n_dec(prev)
        )
        merged = pool(
            prev["xmin"], last["xmax"],
            (prev["s"] + last["s"]).cast("decimal(28,4)"),
            prev["n"] + last["n"],
        )
        merged_pools = F.concat(
            F.slice(pools, 1, np - 2), F.array(merged)
        )
        nxt = F.element_at(F.col("__pts"), i)
        appended = F.concat(
            pools,
            F.array(
                pool(
                    nxt["__x"].cast("double"),
                    nxt["__x"].cast("double"),
                    nxt["__s"].cast("decimal(28,4)"),
                    nxt["__n"],
                )
            ),
        )
        can_append = i <= F.size(F.col("__pts"))
        return F.struct(
            F.when(out_of_order, i)
            .when(can_append, i + 1)
            .otherwise(i)
            .alias("i"),
            F.when(out_of_order, merged_pools)
            .when(can_append, appended)
            .otherwise(pools)
            .alias("pools"),
        )

    folded = one.select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(2 * n_pts)), acc0, step
        )["pools"].alias("__pools")
    )
    return folded.select(
        F.posexplode("__pools").alias("__i", "__p")
    ).select(
        F.col("__p.xmin").alias("x_min"),
        F.col("__p.xmax").alias("x_max"),
        F.col("__p.n").alias("n"),
        (F.col("__p.s").cast("double") / F.col("__p.n").cast("double")).alias(
            "fitted_mean"
        ),
    )


def gini_stump_split(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    *,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Best decision-stump split (CART-style) for a numeric feature
    against a binary label: the threshold t minimizing the weighted
    Gini impurity of {feature <= t} / {feature > t} — the univariate
    split-quality diagnostic run before trusting any tree/GBM feature,
    and the exact computation scikit-learn approximates per node.

    Exactness (no floats until the published score): minimizing
    weighted Gini is maximizing S(t) = (posL²+negL²)/nL +
    (posR²+negR²)/nR; the rational S is ranked by the floor-scaled
    integer ``score_scaled = (num·scale) DIV den`` with num =
    (posL²+negL²)·nR + (posR²+negR²)·nL and den = nL·nR — DECIMAL(38,0)
    products (≤ n³·scale, 22 digits at 15k rows), exact integral DIV
    in both engines (the HUGEINT ``//`` mirror), threshold-asc
    tie-break. The published ``score_scaled`` is BIGINT — the quotient
    is ≤ n·scale because S(t) ≤ n, so int64 holds to ~9e9 rows (the
    r10 portable-surface rule: no DECIMAL leaves an oracle-checked
    projection). Candidate thresholds are the distinct feature values
    (callers pre-quantize near-continuous features — the
    price_quantity_spearman_quantized grain discipline).

    Shape: one (value)-grain aggregation (the only data-proportional
    shuffle), one cumulative window over distinct values, one
    TakeOrdered. Returns ONE row: (split_value, n_left, pos_left,
    n_right, pos_right, score_scaled)."""
    from pyspark.sql import Window

    lab = F.col(label_col).cast("long")
    pts = (
        df.select(F.col(feature_col).alias("__v"), lab.alias("__y"))
        .filter(F.col("__v").isNotNull() & F.col("__y").isNotNull())
        .groupBy("__v")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum("__y").alias("__p"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    cum = pts.select(
        "__v",
        F.sum("__c").over(w).alias("nl"),
        F.sum("__p").over(w).alias("pl"),
        F.sum("__c").over(wt).alias("n"),
        F.sum("__p").over(wt).alias("p"),
    ).filter(F.col("nl") < F.col("n"))
    d = "decimal(38,0)"
    nl, pl = F.col("nl").cast(d), F.col("pl").cast(d)
    n, p = F.col("n").cast(d), F.col("p").cast(d)
    nr = n - nl
    pr = p - pl
    negl = nl - pl
    negr = nr - pr
    num = (pl * pl + negl * negl) * nr + (pr * pr + negr * negr) * nl
    den = nl * nr
    scored = cum.select(
        "__v", "nl", "pl", "n", "p",
        num.alias("__num"),
        den.alias("__den"),
    ).selectExpr(
        "__v", "nl", "pl", "n", "p",
        f"CAST(__num * {scale} AS DECIMAL(38,0)) DIV __den"
        " AS score_scaled",
    )
    return (
        scored.orderBy(F.desc("score_scaled"), F.asc("__v"))
        .limit(1)
        .select(
            F.col("__v").alias("split_value"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("pl").cast("long").alias("pos_left"),
            (F.col("n") - F.col("nl")).cast("long").alias("n_right"),
            (F.col("p") - F.col("pl")).cast("long").alias("pos_right"),
            # published as BIGINT (r10 portable-surface rule): the
            # quotient S(t)·scale <= n·scale, so int64 holds to ~9e9
            # rows; the wide-decimal arithmetic above stays exact.
            F.col("score_scaled").cast("long").alias("score_scaled"),
        )
    )


def mahalanobis2_outliers(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    k: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bivariate Mahalanobis outlier ranking in EXACT integer
    arithmetic — the correlation-aware alternative to per-feature
    z-scores (a point can be unremarkable on each marginal yet far
    from the joint distribution; HBOS misses exactly those, which is
    why the two sit side by side in a monitoring stack).

    Input contract: INTEGER-valued features (callers pre-quantize —
    the gini_stump_split grain discipline). With integer features the
    whole statistic is rational: using n-scaled deviations
    dx = n·x − Σx and the scatter terms Vxx = n·Σx² − (Σx)²,
    Vyy, Vxy (all exact), the squared Mahalanobis distance is
    proportional to

        q(row) = (Vyy·dx² − 2·Vxy·dx·dy + Vxx·dy²) / (Vxx·Vyy − Vxy²)

    and ranking by the floor-scaled ``score_scaled = q·scale DIV den``
    is exact (the priority_price_stump device). Degenerate inputs
    (constant feature or perfectly collinear pair → den = 0) raise —
    the caller must drop the feature, not read garbage ranks — and so
    does a feature grain too fine for DECIMAL(38,0): the worst-case
    |num·scale| is bounded exactly from the driver-side sufficient
    stats (min/max deviations), because an overflow would otherwise
    silently NULL the score and drop the row from the top-k (NULLs
    sort last under desc) rather than fail.

    Shape: ONE aggregation for the six sufficient sums (a 1-row frame,
    broadcast back), one scoring scan (pure codegen), one TakeOrdered
    for the top-k — no shuffle beyond the scalar agg at any data size.
    Returns (id, x, y, score_scaled) — the k most anomalous rows,
    ties broken by id ascending."""
    d = "decimal(38,0)"
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    xd, yd = F.col("__x").cast(d), F.col("__y").cast(d)
    stats = base.agg(
        F.count(F.lit(1)).cast(d).alias("__n"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * xd).alias("__sxx"),
        F.sum(yd * yd).alias("__syy"),
        F.sum(xd * yd).alias("__sxy"),
        F.min("__x").alias("__xmin"),
        F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"),
        F.max("__y").alias("__ymax"),
    )
    [st] = stats.collect()  # bounded contract: one row of ten scalars
    import decimal as _dec

    n, sx, sy = (_dec.Decimal(st["__n"]), st["__sx"], st["__sy"])
    vxx = int(n * st["__sxx"] - sx * sx)
    vyy = int(n * st["__syy"] - sy * sy)
    vxy = int(n * st["__sxy"] - sx * sy)
    den = vxx * vyy - vxy * vxy
    if den <= 0:
        raise ValueError(
            "mahalanobis2_outliers: degenerate covariance (constant or "
            "collinear features) — drop or re-quantize the feature pair"
        )
    # Loud digit-bound check (r10, ADVICE): a DECIMAL(38,0) overflow in
    # the per-row quadratic form would silently NULL score_scaled, and
    # NULLs sort LAST under desc — overflowed rows would vanish from
    # the top-k instead of failing. The sufficient stats are already on
    # the driver, so bound the worst-case |num·scale| exactly from the
    # min/max deviations and refuse to build a plan that can overflow.
    ni, sxi, syi = int(n), int(sx), int(sy)
    dx_max = max(abs(ni * int(st["__xmin"]) - sxi),
                 abs(ni * int(st["__xmax"]) - sxi))
    dy_max = max(abs(ni * int(st["__ymin"]) - syi),
                 abs(ni * int(st["__ymax"]) - syi))
    num_max = (abs(vyy) * dx_max * dx_max
               + 2 * abs(vxy) * dx_max * dy_max
               + abs(vxx) * dy_max * dy_max)
    if num_max * scale >= 10 ** 38 or den >= 10 ** 38:
        raise ValueError(
            "mahalanobis2_outliers: quadratic form would overflow "
            f"DECIMAL(38,0) (|num|*scale up to {num_max * scale:.3e}) — "
            "re-quantize the features to a coarser grain"
        )
    if num_max * scale // den >= 2 ** 63:
        raise ValueError(
            "mahalanobis2_outliers: score quotient would overflow "
            "BIGINT — re-quantize the features to a coarser grain"
        )
    # per-row quadratic form over n-scaled deviations; literals are the
    # exact driver-side integers (decimal-typed so products stay exact)
    dx = (F.lit(str(int(n))).cast(d) * F.col("__x").cast(d)
          - F.lit(str(int(sx))).cast(d))
    dy = (F.lit(str(int(n))).cast(d) * F.col("__y").cast(d)
          - F.lit(str(int(sy))).cast(d))
    num = (
        F.lit(str(vyy)).cast(d) * dx * dx
        - F.lit(str(2 * vxy)).cast(d) * dx * dy
        + F.lit(str(vxx)).cast(d) * dy * dy
    )
    scored = base.select(
        "__id", "__x", "__y",
        num.alias("__num"),
    ).selectExpr(
        "__id", "__x", "__y",
        f"CAST(__num * {scale} AS DECIMAL(38,0)) DIV CAST('{den}' AS "
        "DECIMAL(38,0)) AS score_scaled",
    )
    return (
        scored.orderBy(F.desc("score_scaled"), F.asc("__id"))
        .limit(k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__x").alias(x_col),
            F.col("__y").alias(y_col),
            "score_scaled",
        )
    )


def two_factor_ols(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Two-feature OLS by closed-form normal equations — distributed
    multiple regression with ZERO iteration: one scan collects the
    nine exact sufficient sums (DECIMAL(38,0) — safe to ~1e31 rows at
    the entry grains), and Cramer's rule finishes on the collected
    1-row frame in ARBITRARY-PRECISION Python integers

        b1 = (S1y·S22 − S2y·S12) / (S11·S22 − S12²)

    (the centered cross-products grow as ~n⁴·max|x|²·max|y|² and would
    overflow any fixed-width decimal — r10 review finding — so the
    finisher runs where integers cannot overflow; the single-division
    doubles float(num)/float(den) are the identical two-correct-
    roundings-plus-IEEE-divide the VARCHAR-round-trip oracle computes,
    so the result stays bit-identical across engines). The 1-row
    collect is a bounded contract, like the mahalanobis stats.

    Next to :func:`~.profile.grouped_linreg` (one feature, many
    groups) this is the many-features-one-model corner; at 100 TB it
    is the same single map-side-combined aggregation — model fitting
    with the cost profile of a SUM.

    Contract: integer-valued inputs (pre-quantize). NULL coefficients
    (never garbage) on a singular design (det = 0 means collinear).
    Returns ONE row: (n, b1, b2, intercept, r2)."""
    dec = "decimal(38,0)"
    y = F.col(y_col).cast(dec)
    x1 = F.col(x1_col).cast(dec)
    x2 = F.col(x2_col).cast(dec)
    row = df.agg(
        F.count(F.lit(1)).cast(dec).alias("__n"),
        F.sum(y).alias("__sy"),
        F.sum(x1).alias("__s1"),
        F.sum(x2).alias("__s2"),
        F.sum(x1 * x1).alias("__s11"),
        F.sum(x2 * x2).alias("__s22"),
        F.sum(x1 * x2).alias("__s12"),
        F.sum(x1 * y).alias("__s1y"),
        F.sum(x2 * y).alias("__s2y"),
        F.sum(y * y).alias("__syy"),
    ).collect()[0]
    if int(row["__n"]) == 0:
        raise ValueError("two_factor_ols: empty input")
    nulls = [c for c in row.asDict() if row[c] is None]
    if nulls:
        raise ValueError(
            "two_factor_ols: sufficient-statistic sum(s) "
            f"{sorted(nulls)} came back NULL — either the inputs are "
            "entirely NULL, or the sum overflowed DECIMAL(38,0) "
            "(non-ANSI Spark returns NULL on decimal overflow). The "
            "contract is non-NULL integer-valued inputs small enough "
            "that the n^2-scale sums fit 38 digits; pre-quantize to a "
            "coarser grain"
        )
    n = int(row["__n"])
    sy, s1, s2 = int(row["__sy"]), int(row["__s1"]), int(row["__s2"])
    s11, s22, s12 = int(row["__s11"]), int(row["__s22"]), int(row["__s12"])
    s1y, s2y, syy = int(row["__s1y"]), int(row["__s2y"]), int(row["__syy"])
    c11 = n * s11 - s1 * s1
    c22 = n * s22 - s2 * s2
    c12 = n * s12 - s1 * s2
    c1y = n * s1y - s1 * sy
    c2y = n * s2y - s2 * sy
    cyy = n * syy - sy * sy
    det = c11 * c22 - c12 * c12
    if det != 0:
        b1 = float(c1y * c22 - c2y * c12) / float(det)
        b2 = float(c2y * c11 - c1y * c12) / float(det)
        intercept = (
            float(sy) - b1 * float(s1) - b2 * float(s2)
        ) / float(n)
        r2 = (
            (b1 * float(c1y) + b2 * float(c2y)) / float(cyy)
            if cyy > 0
            else None
        )
    else:
        b1 = b2 = intercept = r2 = None
    spark = df.sparkSession
    return local_rows_df(
        spark,
        [(n, b1, b2, intercept, r2)],
        "n long, b1 double, b2 double, intercept double, r2 double",
    )
