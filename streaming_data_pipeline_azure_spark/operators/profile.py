"""Table profiling — the data-quality pass a training-data pipeline runs
before anything else: per-column null counts and cardinalities, plus
sketch-based summaries where exact answers don't scale.

One full scan produces every statistic (a single ``agg`` with all the
per-column expressions), then the wide row unpivots to one row per column
— never one job per column.

``exact_distinct=True`` uses ``count_distinct`` (Catalyst expands the
aggregate per distinct column — fine up to a handful of columns, and
required for oracle comparison). At 100 TB with many columns, pass
``False`` for HyperLogLog++ (``approx_count_distinct``) — one pass, fixed
memory, ~2% relative error."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct)."""
    cols = cols or df.columns
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def numeric_summary(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact min/max/decimal-mean per numeric column (long format)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.min(F.col(c)).cast("double").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__max_{c}"),
            F.sum(F.col(c).cast("decimal(18,4)")).cast("double").alias(f"__sum_{c}"),
            F.count(F.col(c)).alias(f"__cnt_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
                F.when(
                    F.col(f"__cnt_{c}") > 0,
                    F.col(f"__sum_{c}") / F.col(f"__cnt_{c}").cast("double"),
                ).alias("mean_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def approx_quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    *,
    accuracy: int = 10000,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Quantile bucketing the way it survives 100 TB: boundaries from a
    one-pass Greenwald-Khanna sketch (driver state O(n_buckets)), then
    assignment as a pure codegen comparison — no global sort, no
    shuffle. The exact-ntile counterpart (`doc_length_deciles` in the
    registered queries) is the correctness anchor; this is the scale
    path it documents.

    Bucket i (1-based) = 1 + number of boundaries strictly below the
    value, so assignment is monotone in ``value_col`` and every row —
    including values outside the sketched range — lands in a bucket."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    [row] = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("__b")
    ).collect()
    bounds = [float(x) for x in row["__b"]]
    bucket = F.lit(1)
    for b in bounds:
        bucket = bucket + F.when(F.col(value_col) > b, 1).otherwise(0)
    return df.withColumn(bucket_name, bucket.cast("int"))


def value_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    distinct_col: str,
    *,
    percentiles: list[float] = (0.5, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch summaries per group: HLL++ distinct estimate and
    approximate percentiles (Greenwald-Khanna). Both are one-pass,
    mergeable, fixed-memory — the only viable shapes at 100 TB. Approx
    results are engine-specific (rows-only verification)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col).alias("approx_distinct"),
        F.percentile_approx(
            value_col, list(percentiles), accuracy
        ).alias("approx_percentiles"),
    )


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    candidates_per_partition: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k heavy hitters via a Count-Min sketch — the
    fixed-memory answer when the key cardinality is too large for an
    exact ``groupBy(col).count()`` (URL/domain/token frequency over a
    100 TB crawl). Completes the sketch family next to HLL++ distincts
    and GK percentiles (``events_value_sketches``).

    Shape: one ``mapInPandas`` pass emits, per input partition, its
    depth×width CMS counter array plus its local exact top-m candidate
    values (a heavy hitter globally is a heavy hitter in at least one
    partition at m ≥ partitions/φ — the standard candidate argument).
    The driver merges O(partitions) fixed-size sketches (elementwise
    sum — CMS merge is exact) and scores the candidate union against
    the merged sketch; per-key estimates are upper bounds with
    ε = e/width one-sided error at δ = e^-depth. Driver cost is
    O(partitions × depth × width + candidates) — bounded like the
    per-partition totals collect in ``packing.py``, independent of
    row count. Returns (value, est_count) best-first; ``est_count``
    NEVER undercounts (CMS property, tested)."""
    partials = cms_partials(
        df, col, depth=depth, width=width,
        candidates_per_partition=candidates_per_partition, seed=seed,
    ).collect()  # O(partitions) fixed-size rows by construction
    return score_cms_partials(
        df.sparkSession, partials, k=k, depth=depth, width=width, seed=seed
    )


def cms_partials(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    candidates_per_partition: int = 64,
    seed: int = 42,
) -> DataFrame:
    """The MERGEABLE half of :func:`heavy_hitters_cms`: one
    (cms counters, local candidates) row per input partition. Factored
    out (r6) so the streaming ingest can persist per-micro-batch
    partials and merge them later — CMS merge is an exact elementwise
    add, so partials accumulated across any batch boundaries score
    identically to one pass over the union."""
    import numpy as np

    def kernel(batches):
        import pandas as pd

        cms = np.zeros((depth, width), dtype=np.int64)
        counts: dict = {}
        for pdf in batches:
            vals = pdf[col].astype(str)
            vc = vals.value_counts()
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            for d in range(depth):
                h = pd.util.hash_pandas_object(
                    vals, index=False, hash_key=f"{seed + d:016d}"
                ).to_numpy() % width
                np.add.at(cms[d], h, 1)
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
        top = top[:candidates_per_partition]
        yield pd.DataFrame(
            {
                "cms": [cms.ravel().tolist()],
                "cand": [[v for v, _ in top]],
            }
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        kernel, schema="cms array<long>, cand array<string>"
    )


def score_cms_partials(
    spark,
    partials,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Merge collected :func:`cms_partials` rows (elementwise counter
    add + candidate union) and score the candidates against the merged
    sketch — (value, est_count) best-first, never undercounting."""
    import numpy as np

    if not partials:
        return local_rows_df(spark, [], "value string, est_count long")
    merged = np.zeros(depth * width, dtype=np.int64)
    cand: set = set()
    for r in partials:
        merged += np.array(r["cms"], dtype=np.int64)
        cand.update(r["cand"])
    merged = merged.reshape(depth, width)

    import pandas as pd

    cand_list = sorted(cand)
    est = np.full(len(cand_list), np.iinfo(np.int64).max, dtype=np.int64)
    s = pd.Series(cand_list)
    for d in range(depth):
        h = pd.util.hash_pandas_object(
            s, index=False, hash_key=f"{seed + d:016d}"
        ).to_numpy() % width
        est = np.minimum(est, merged[d, h])
    order = sorted(
        zip(cand_list, est.tolist()), key=lambda t: (-t[1], t[0])
    )[:k]
    return local_rows_df(
        spark, [(v, int(c)) for v, c in order], "value string, est_count long"
    )


def distinct_partials(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    *,
    lgk: int = 12,
    pre: list | None = None,
) -> DataFrame:
    """Per-group mergeable distinct-count state: one Apache DataSketches
    HLL sketch (``hll_sketch_agg``, JVM-side, 2^lgk registers ≈ 4 KB at
    the default lgk=12) per group, as a ``binary`` column ``hll``.

    This is the HLL member of the mergeable-state family next to the CMS
    partials above and ``IncrementalAgg``'s decimal partials: partials
    taken over ANY partition of the input rows merge (``hll_union_agg``)
    to the IDENTICAL sketch a single pass produces — the property that
    lets a streaming ingest persist per-micro-batch rows and a reader
    serve estimates without rescanning history (tested bit-level in
    tests/test_profile.py). Estimates carry the standard HLL relative
    standard error ~1.04/sqrt(2^lgk) (~1.6% at lgk=12).

    ``pre`` optionally lists projection expressions evaluated before
    grouping (e.g. ``F.to_date('ts').alias('day')``) so derived group
    keys stay inside the one scan."""
    src = df.select(*pre, col) if pre else df
    return src.groupBy(*group_cols).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("hll")
    )


def merge_distinct_partials(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge :func:`distinct_partials` rows across batch boundaries —
    ``hll_union_agg`` per group; commutative/associative, so any merge
    tree yields the same sketch. Returns the same (group_cols…, hll)
    shape, ready for further merges or ``estimate_distinct``."""
    return partials.groupBy(*group_cols).agg(
        F.hll_union_agg("hll").alias("hll")
    )


def estimate_distinct(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Finalize merged partials to per-group approx distinct counts
    (``n_distinct_approx``, long)."""
    return merge_distinct_partials(partials, group_cols).select(
        *group_cols,
        F.hll_sketch_estimate("hll").cast("long").alias("n_distinct_approx"),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    z: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Per-group robust outlier stats via the modified z-score
    |0.6745·(x − median)| / MAD (Iglewicz & Hoaglin 1993) — the
    mean/stddev-free anomaly gate that survives the very outliers it
    hunts. Returns one row per group: (group, n, median, mad,
    n_outliers, outlier_frac).

    Two exact-percentile aggregations over the SAME group partitioning
    (median, then MAD of residuals against the broadcast medians) and a
    final count — three group-keyed passes, no windows over raw rows,
    no driver state. The default exact ``percentile`` keeps the result
    engine-checkable (it is the oracle-anchored path) but buffers each
    group's values in the aggregation — at 100 TB pass
    ``approx=True``, which swaps in the mergeable constant-memory
    ``approx_percentile`` sketch (same plan shape; flags agree with the
    exact path except for values whose z-score straddles the threshold
    within the sketch's rank error — tested). Groups with MAD = 0
    report only exact-tie escapees as outliers (|x − median| > 0
    collapses the z-score to infinity — documented edge, matched by
    the oracle)."""
    pct = "approx_percentile" if approx else "percentile"
    acc = ", 10000" if approx else ""
    med = df.groupBy(group_col).agg(
        F.expr(f"{pct}({value_col}, 0.5{acc})").alias("__med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.expr(f"{pct}(abs({value_col} - __med), 0.5{acc})").alias("__mad")
    )
    flagged = (
        with_med.join(F.broadcast(mad), group_col)
        .withColumn(
            "__is_out",
            F.when(
                F.col("__mad") > 0,
                (
                    F.lit(0.6745)
                    * F.abs(F.col(value_col) - F.col("__med"))
                    / F.col("__mad")
                )
                > F.lit(z),
            ).otherwise(F.abs(F.col(value_col) - F.col("__med")) > 0),
        )
    )
    return flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("__med").alias("median"),
        F.first("__mad").alias("mad"),
        F.sum(F.col("__is_out").cast("long")).cast("long").alias("n_outliers"),
        (
            F.sum(F.col("__is_out").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("outlier_frac"),
    )


def grouped_linreg(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares fit y = slope·x + intercept
    with Pearson r² — computed from the five sufficient-statistic sums
    (n, Σx, Σy, Σxy, Σx², Σy²) in ONE aggregation pass.

    Inputs round once to DECIMAL(18,4); their pairwise products are
    then EXACT in decimal (37,8 fits Spark's 38-digit cap with no
    precision-loss rescale) and the sums are order-independent, so the
    fit is bit-identical across engines and partitionings, and it never
    materializes per-group vectors (a 100 TB regression is one
    map-side-combined aggregate). Supported domain: |x|,|y| < 1e14 with
    4-decimal resolution. Degenerate groups (zero x-variance) return
    NULL slope/intercept/r² rather than dividing by zero."""
    d = lambda c: F.col(c).cast("decimal(18,4)")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(x_col)).alias("__sx"),
        F.sum(d(y_col)).alias("__sy"),
        F.sum(d(x_col) * d(y_col)).alias("__sxy"),
        F.sum(d(x_col) * d(x_col)).alias("__sxx"),
        F.sum(d(y_col) * d(y_col)).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x > 0, cov_n / var_x)
    intercept = F.when(var_x > 0, (sy - (cov_n / var_x) * sx) / n)
    r2 = F.when(
        (var_x > 0) & (var_y > 0), (cov_n * cov_n) / (var_x * var_y)
    )
    return agg.select(
        group_col,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def pii_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """Governance sweep (r7): total email / phone / IPv4 / card-number
    pattern hits per (table, column) across every string column of the
    given tables — the "where does PII live" audit a takedown or
    compliance review starts from (the redaction counterpart lives in
    ``text.redact_pii_extended``; this finds, that scrubs).

    One full scan per table computes ALL of its columns' counters in a
    single aggregate (the :func:`profile_columns` shape — never one
    job per column), the wide row unpivots to one row per column, and
    the per-table frames union. Regex counting is codegen
    (``regexp_extract_all`` with the shared ASCII-explicit patterns
    from ``operators/text.py`` — identical semantics in RE2, so the
    whole audit is SQL-oracle-checkable). Returns (table_name,
    column_name, n_rows, n_emails, n_phones, n_ips, n_cards) sorted
    by nothing — order-insensitive."""
    from streaming_data_pipeline_azure_spark.operators import text as tx

    counters = {
        "n_emails": tx.count_emails,
        "n_phones": tx.count_phones,
        "n_ips": tx.count_ips,
        "n_cards": tx.count_cards,
    }
    out = None
    for tname, df in tables.items():
        scols = [c for c, t in df.dtypes if t == "string"]
        if not scols:
            continue
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in scols:
            for alias, fn in counters.items():
                aggs.append(
                    F.sum(fn(F.col(c))).cast("long").alias(f"__{alias}_{c}")
                )
        wide = df.agg(*aggs)
        per_col = F.array(
            *[
                F.struct(
                    F.lit(tname).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    F.col("__n").alias("n_rows"),
                    *[
                        F.col(f"__{alias}_{c}").alias(alias)
                        for alias in counters
                    ],
                )
                for c in scols
            ]
        )
        row = wide.select(F.explode(per_col).alias("p")).select("p.*")
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("pii_audit needs at least one table with string columns")
    return out


def estimate_key_overlap(
    left: DataFrame,
    left_col: str,
    right: DataFrame,
    right_col: str,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Join-cardinality scouting via HLL set algebra (r7):
    |A∩B| ≈ |A| + |B| − |A∪B| from three sketches — the question every
    join planner asks ("how many keys actually match?") answered with
    two independent scans and ~4 KB of state each, no join, no shuffle
    of data rows. At 100 TB this is how you decide between broadcast /
    shuffle / pre-filter strategies BEFORE paying for the join; the
    estimate inherits HLL's ~1.04/sqrt(2^lgk) relative error per term
    (sparse-mode exact at low cardinality, tested), and the exact
    intersection (a distinct semi-join count) is the oracle anchor.

    Returns one row: (n_left_approx, n_right_approx, n_union_approx,
    n_intersect_approx, jaccard_approx)."""
    a = left.agg(
        F.hll_sketch_agg(F.col(left_col).cast("string"), F.lit(lgk)).alias(
            "hll"
        )
    )
    b = right.agg(
        F.hll_sketch_agg(F.col(right_col).cast("string"), F.lit(lgk)).alias(
            "hll"
        )
    )
    u = a.unionByName(b).agg(F.hll_union_agg("hll").alias("hll"))
    na = F.col("na")
    nb = F.col("nb")
    nu = F.col("nu")
    inter = F.greatest(na + nb - nu, F.lit(0))
    est = lambda frame, alias: frame.select(  # noqa: E731
        F.coalesce(  # empty input -> null sketch -> report 0 distinct
            F.hll_sketch_estimate("hll").cast("long"), F.lit(0)
        ).alias(alias)
    )
    return (
        est(a, "na")
        .crossJoin(est(b, "nb"))
        .crossJoin(est(u, "nu"))
        .select(
            na.alias("n_left_approx"),
            nb.alias("n_right_approx"),
            nu.alias("n_union_approx"),
            inter.alias("n_intersect_approx"),
            F.when(nu > 0, inter.cast("double") / nu.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("jaccard_approx"),
        )
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """All-pairs Pearson correlation (r7) from exact decimal
    sufficient sums in ONE aggregation pass — the numeric-audit
    companion of :func:`grouped_linreg` (same decimal discipline:
    inputs round once to DECIMAL(18,4), pairwise products are exact,
    sums are order-independent, finalization is a fixed double
    expression — so the matrix is bit-identical across engines and
    partitionings and never materializes column vectors; at 100 TB a
    p-column matrix is one map-side-combined aggregate of p·(p+3)/2
    running sums). Returns (col_x, col_y, n, corr) for each unordered
    pair col_x < col_y (input order); degenerate variance → NULL."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    d = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(d(c)).alias(f"__s_{c}"))
        aggs.append(F.sum(d(c) * d(c)).alias(f"__ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.sum(d(a) * d(b)).alias(f"__sp_{a}_{b}"))
    wide = df.agg(*aggs)
    n = F.col("n").cast("double")
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sa = F.col(f"__s_{a}").cast("double")
            sb = F.col(f"__s_{b}").cast("double")
            ssa = F.col(f"__ss_{a}").cast("double")
            ssb = F.col(f"__ss_{b}").cast("double")
            sab = F.col(f"__sp_{a}_{b}").cast("double")
            var_a = n * ssa - sa * sa
            var_b = n * ssb - sb * sb
            corr = F.when(
                (var_a > 0) & (var_b > 0),
                (n * sab - sa * sb) / (F.sqrt(var_a) * F.sqrt(var_b)),
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    F.col("n").alias("n"),
                    corr.alias("corr"),
                )
            )
    return wide.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")


def weighted_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact per-group WEIGHTED percentiles: for each quantile q, the
    smallest value whose cumulative weight reaches q x total weight
    (the lower weighted quantile — a record weighted 3x counts as
    three records, the standard survey/importance-sampling estimator;
    Spark's ``percentile`` only takes integer frequencies, and no
    engine built-in exposes fractional weights).

    Shape: (1) per-(group, value) weight pre-aggregation — the ONE
    data-proportional hash shuffle, with map-side combine, which also
    makes the cumulative sum tie-free (one row per distinct value);
    (2) a cumulative-weight window per group over DISTINCT values
    (bounded by value cardinality, not rows); (3) per q, min(value)
    with cum_weight >= q x total — a group-keyed agg over the same
    compact series. Weights accumulate as DECIMAL(18,6), so the
    threshold compare is exact arithmetic, bit-identical across
    engines and partitionings. Negative or null weights are rejected
    (a silent negative weight corrupts every percentile after it).

    Returns (group, q, value) for every q in ``qs``."""
    from pyspark.sql import Window

    w_dec = F.col(weight_col).cast("decimal(18,6)")
    bad = df.filter(
        F.col(weight_col).isNull() | (F.col(weight_col) < 0)
    )
    if bad.limit(1).count() > 0:
        raise ValueError(
            "weighted_percentiles: null or negative weights present"
        )
    per_value = df.groupBy(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).agg(F.sum(w_dec).alias("__w"))
    win = Window.partitionBy("__g").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("__g")
    cum = per_value.select(
        "__g",
        "__v",
        F.sum("__w").over(win).alias("__cw"),
        F.sum("__w").over(tot).alias("__tot"),
    )
    q_arr = F.array(
        *[F.lit(q).cast("decimal(7,6)") for q in qs]
    )
    return (
        cum.select(
            "__g", "__v", "__cw", "__tot",
            F.explode(q_arr).alias("q"),
        )
        .filter(F.col("__cw") >= F.col("q") * F.col("__tot"))
        .groupBy(F.col("__g").alias(group_col), "q")
        .agg(F.min("__v").alias("value"))
        .select(group_col, F.col("q").cast("double").alias("q"), "value")
    )


def weighted_percentiles_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: list[float],
    *,
    m: int = 16,
) -> DataFrame:
    """Bounded-state SKETCH twin of :func:`weighted_percentiles`
    (VERDICT r7 #3): quantize the value axis onto an HDR grid —
    power-of-two octaves split into ``m`` equal sub-steps — then run
    the identical cumulative-weight walk over the O(64·m)-bucket
    series instead of the distinct-value series. The exact path's
    per-group window runs on DISTINCT VALUE cardinality, which for a
    near-continuous column (prices, latencies) ≈ row count and grows
    linearly with data; the sketch's grain SATURATES at ≤ 64·m rows
    per group at any scale, mirroring ``doc_length_deciles_approx``'s
    exact/approx pairing.

    Error contract: the walk picks the first bucket whose cumulative
    weight reaches q×total — that bucket CONTAINS the exact weighted
    percentile, and the reported value is its lower bound, so for
    values ≥ 1 the estimate is ≤ the exact answer with relative error
    ≤ 1/m (bucket width 2^e/m over a lower bound ≥ 2^e). Values in
    [0, 1) share one underflow bucket (estimate 0, absolute error
    < 1). Weights accumulate as DECIMAL(18,6) exactly as in the exact
    path; null/negative weights are rejected for the same reason.
    Negative values are rejected (the log grid is non-negative; shift
    upstream). Rows-only verification: the exact entry is the oracle
    anchor, divergence/monotonicity tests bound the sketch against it.

    Returns (group, q, value) with value = bucket lower bound
    (double)."""
    from pyspark.sql import Window

    if m < 1:
        raise ValueError("weighted_percentiles_sketch: need m >= 1")
    w_dec = F.col(weight_col).cast("decimal(18,6)")
    v = F.col(value_col).cast("double")
    bad = df.filter(
        F.col(weight_col).isNull()
        | (F.col(weight_col) < 0)
        | (v < 0)
    )
    if bad.limit(1).count() > 0:
        raise ValueError(
            "weighted_percentiles_sketch: null/negative weights or "
            "negative values present"
        )
    # HDR bucket id: e = bit-length exponent (no libm), s = sub-step
    # in [0, m) -> id = e*m + s; one underflow bucket (-1) for v < 1
    e = (F.length(F.bin(F.floor(v).cast("long"))) - 1).cast("int")
    pow2e = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(length(bin(CAST(floor("
        f"CAST({value_col} AS DOUBLE)) AS BIGINT))) - 1 AS INT))"
    )
    s = F.floor(v * m / pow2e).cast("long") - m
    bucket = F.when(v < 1, F.lit(-1).cast("long")).otherwise(
        e.cast("long") * m + s
    )
    per_bucket = (
        df.filter(v.isNotNull())
        .select(
            F.col(group_col).alias("__g"),
            bucket.alias("__b"),
            w_dec.alias("__wd"),
        )
        .groupBy("__g", "__b")
        .agg(F.sum("__wd").alias("__w"))
    )
    win = Window.partitionBy("__g").orderBy("__b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("__g")
    cum = per_bucket.select(
        "__g",
        "__b",
        F.sum("__w").over(win).alias("__cw"),
        F.sum("__w").over(tot).alias("__tot"),
    )
    # bucket lower bound: 2^e * (1 + s/m), e = b div m, s = b mod m
    lo = F.when(F.col("__b") < 0, F.lit(0.0)).otherwise(
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__b DIV {m} AS INT))"
            f" * (1.0D + CAST(__b % {m} AS DOUBLE) / {m}.0D)"
        )
    )
    q_arr = F.array(*[F.lit(q).cast("decimal(7,6)") for q in qs])
    return (
        cum.select(
            "__g", "__b", "__cw", "__tot",
            F.explode(q_arr).alias("q"),
        )
        .filter(F.col("__cw") >= F.col("q") * F.col("__tot"))
        .groupBy(F.col("__g").alias(group_col), "q")
        .agg(F.min("__b").alias("__b"))
        .select(
            group_col,
            F.col("q").cast("double").alias("q"),
            lo.alias("value"),
        )
    )


def quantile_binning_stats(
    df: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 8,
) -> DataFrame:
    """Quantile discretizer, fit + transform + audit in one pass
    contract: boundaries at q = i/n (the exact lower quantile —
    :func:`weighted_percentiles` with unit weights, so the fit is
    engine-exact, no interpolation), rows assigned bucket =
    #boundaries strictly below the value, and the per-bucket audit
    (n_rows, lo, hi, exact-decimal mean) that ML feature pipelines
    ship next to the binned column.

    The n−1 fitted boundaries collapse to ONE sorted array row that
    cross-joins (broadcast) onto the scan; assignment is a codegen
    array filter — no per-row join, no second shuffle beyond the
    bucket aggregation. Buckets can be EMPTY when the distribution is
    heavily tied (a boundary equal to the next boundary swallows its
    bucket) — absent rows, not zero rows, matching the relational
    answer."""
    if n_buckets < 2:
        raise ValueError("quantile_binning_stats: need n_buckets >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    prepped = df.select(F.col(value_col).alias("__v")).withColumn(
        "__g", F.lit(1)
    ).withColumn("__w", F.lit(1.0))
    bounds = weighted_percentiles(prepped, "__g", "__v", "__w", qs)
    arr = bounds.agg(
        F.sort_array(F.collect_list("value")).alias("__bounds")
    )
    assigned = df.crossJoin(F.broadcast(arr)).select(
        F.size(
            F.filter(
                "__bounds",
                lambda b: b < F.col(value_col).cast("double"),
            )
        )
        .cast("long")
        .alias("bucket"),
        F.col(value_col).alias("__v"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
        (
            F.sum(F.col("__v").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_value"),
    )


def quantile_binning_stats_sketch(
    df: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 8,
    m: int = 32,
) -> DataFrame:
    """Sketch-boundary twin of :func:`quantile_binning_stats`
    (VERDICT r8 #3): fit the n−1 boundaries from the bounded HDR grid
    (:func:`weighted_percentiles_sketch` with unit weights) instead of
    the exact distinct-value walk, then run the IDENTICAL broadcast
    array-filter assignment and per-bucket audit.

    Why this is the 100 TB path: the exact fit's cumulative window
    runs on DISTINCT-VALUE cardinality — for a near-continuous column
    (prices, latencies) that approaches row count and the single-group
    window becomes the bottleneck (the one ≥2× bench reading of r8).
    The sketch fit aggregates onto ≤ 64·m HDR buckets per group, so
    the window input SATURATES at a few thousand rows at any scale;
    the transform and audit are unchanged codegen scans. Boundary
    error: each fitted boundary is the lower bound of the HDR bucket
    containing the exact quantile (rel err ≤ 1/m for values ≥ 1), so
    bucket POPULATIONS shift only for rows between the exact boundary
    and its bucket floor; counts/lo/hi/mean stay exact FOR the fitted
    boundaries — the same determinism contract as the exact twin, and
    the whole pipeline replays in SQL (full oracle)."""
    if n_buckets < 2:
        raise ValueError("quantile_binning_stats_sketch: need n_buckets >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    prepped = df.select(F.col(value_col).alias("__v")).withColumn(
        "__g", F.lit(1)
    ).withColumn("__w", F.lit(1.0))
    bounds = weighted_percentiles_sketch(prepped, "__g", "__v", "__w", qs, m=m)
    arr = bounds.agg(
        F.sort_array(F.collect_list("value")).alias("__bounds")
    )
    assigned = df.crossJoin(F.broadcast(arr)).select(
        F.size(
            F.filter(
                "__bounds",
                lambda b: b < F.col(value_col).cast("double"),
            )
        )
        .cast("long")
        .alias("bucket"),
        F.col(value_col).alias("__v"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
        (
            F.sum(F.col("__v").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_value"),
    )


def grouped_theil_sen(
    df: DataFrame, group_col: str, t_col: str, value_col: str
) -> DataFrame:
    """Per-group Theil-Sen robust trend: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(t_j − t_i) — the outlier-proof alternative to
    :func:`grouped_linreg`'s OLS slope (one wild month cannot drag it;
    breakdown point ~29%).

    Input contract: ONE ROW PER (group, t) — pre-aggregate upstream
    (daily/monthly rollups), which is what keeps the O(T²) pairwise
    slope set bounded by the CALENDAR, not the data (T months → T²/2
    pairs per group, thousands at worst; the self-join is per-group
    equi-keyed, never a global cross product). Duplicate t within a
    group would divide by zero — the strict t_i < t_j join skips equal
    timestamps entirely, so duplicates instead silently bias; honor
    the contract.

    Determinism: slopes are single double divisions of exact inputs
    (value rounds once to DECIMAL(18,4), t is integer), the median
    picks sorted-array elements (sort of doubles is total here — no
    NaNs by construction) and even-count medians average two elements
    with one add + one divide — all bit-portable.

    Returns (group, n_points, n_pairs, slope); groups with < 2 points
    are absent (no pairs)."""
    d = F.col(value_col).cast("decimal(18,4)")
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(t_col).cast("long").alias("__t"),
        d.alias("__v"),
    )
    a = base.select(
        "__g", F.col("__t").alias("__ta"), F.col("__v").alias("__va")
    )
    b = base.select(
        "__g", F.col("__t").alias("__tb"), F.col("__v").alias("__vb")
    )
    slopes = (
        a.join(b, "__g")
        .filter(F.col("__ta") < F.col("__tb"))
        .select(
            "__g",
            (
                (F.col("__vb") - F.col("__va")).cast("double")
                / (F.col("__tb") - F.col("__ta")).cast("double")
            ).alias("__s"),
        )
    )
    counts = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    agg = slopes.groupBy("__g").agg(
        F.sort_array(F.collect_list("__s")).alias("__arr")
    )
    n = F.size("__arr")
    # indexes via double division of small ints (exact), truncated by
    # the int cast — (n+1)/2 for odd n and n/2 are integer-valued
    odd = F.element_at("__arr", ((n + 1) / 2).cast("int"))
    even = (
        F.element_at("__arr", (n / 2).cast("int"))
        + F.element_at("__arr", (n / 2).cast("int") + 1)
    ) / F.lit(2.0)
    return agg.join(counts, "__g").select(
        F.col("__g").alias(group_col),
        "n_points",
        n.cast("long").alias("n_pairs"),
        F.when(n % 2 == 1, odd).otherwise(even).alias("slope"),
    )


def grouped_gini(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group Gini coefficient over a CONTINUOUS nonnegative value
    column — the inequality audit for magnitudes (who holds the spend /
    tokens / storage inside each segment), complementing
    :func:`concentration_stats`'s Gini over category sizes.

    Sorted-rank formula G = 2·Σi·x_(i) / (n·Σx) − (n+1)/n with values
    ascending. Exact-arithmetic discipline: x rounds once to
    DECIMAL(18,4); i·x products and both sums are exact decimals, so
    the result is independent of partitioning and identical across
    engines; doubles appear only in the final fixed expression. Rank
    ties (equal x) leave Σi·x unchanged under any tie order, so the
    window needs no tiebreak column to be deterministic.

    One window (rank within group) + one aggregation — the sort is
    per-group. Values must be nonnegative (Gini is undefined below 0);
    negative inputs make the coefficient meaningless rather than
    erroring — filter upstream. Groups with Σx = 0 return NULL.

    Returns (group_col, n, gini)."""
    from pyspark.sql import Window

    x = F.col(value_col).cast("decimal(18,4)")
    w = Window.partitionBy(group_col).orderBy(F.asc(value_col))
    ranked = df.select(
        F.col(group_col),
        x.alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("decimal(38,4)").alias("__sx"),
        F.sum(
            (F.col("__i") * F.col("__x")).cast("decimal(38,4)")
        ).alias("__six"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    six = F.col("__six").cast("double")
    return agg.select(
        group_col,
        "n",
        F.when(
            F.col("__sx") != 0,
            F.lit(2.0) * six / (nd * sx) - (nd + F.lit(1.0)) / nd,
        ).alias("gini"),
    )


def concentration_stats(
    df: DataFrame, group_col: str, *, top_k: int = 3
) -> DataFrame:
    """Concentration / inequality of a categorical distribution in one
    row: group count, HHI (Herfindahl Σshare² — EXACT: Σc²/(Σc)², two
    integer sums and one division), Gini coefficient over group sizes
    (sorted-rank formula G = 2Σi·c_(i)/(n·Σc) − (n+1)/n with
    deterministic (count, group) rank order — exact decimal Σi·c),
    and the combined share of the ``top_k`` largest groups — the
    "is one source eating the corpus" audit for mixture design.

    Group sizes are the only aggregation over data; everything after
    runs on the O(groups) summary (rank window + one more aggregate).
    NULL groups count as a group. At least one row required."""
    sizes = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("__c"), F.asc("__g"))
    ranked = sizes.select(
        "__c", F.row_number().over(w).cast("long").alias("__i")
    )
    w_top = Window.orderBy(F.desc("__c"), F.asc("__g"))
    with_top = sizes.select(
        "__c", F.row_number().over(w_top).cast("long").alias("__tr")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum(F.col("__c") * F.col("__c")).cast("decimal(38,0)").alias(
            "__c2"
        ),
        F.sum(
            (F.col("__i") * F.col("__c")).cast("decimal(38,0)")
        ).alias("__ic"),
    )
    topk = with_top.filter(F.col("__tr") <= top_k).agg(
        F.sum("__c").cast("long").alias("__topc")
    )
    n = F.col("n_groups").cast("double")
    tot = F.col("n_rows").cast("double")
    return agg.crossJoin(F.broadcast(topk)).select(
        "n_groups",
        "n_rows",
        (F.col("__c2").cast("double") / (tot * tot)).alias("hhi"),
        (
            F.lit(2.0) * F.col("__ic").cast("double") / (n * tot)
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
        (F.col("__topc").cast("double") / tot).alias("top_share"),
    )


def log2_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """Power-of-two (HDR-style) magnitude histogram: values >= 1 bucket
    by ⌊log2⌋ — the constant-relative-error latency/size histogram ops
    dashboards use (exponential buckets, so a 6-order-of-magnitude
    range needs ~20 rows, and per-bucket counts are mergeable across
    shards by plain addition).

    No floating log anywhere (libm rounding is engine-specific): the
    exponent is ``length(binary(⌊v⌋)) − 1`` — exact integer arithmetic
    any engine reproduces (DuckDB: ``length(printf('%b', x))``). One
    conditional-aggregation scan; values < 1 or NULL are excluded
    (report them upstream; sub-unit magnitudes have no nonnegative
    exponent).

    Returns (bucket, lo, hi, n) with [lo, hi] = [2^b, 2^(b+1)−1],
    bucket-ascending rows only where n > 0."""
    v = F.floor(F.col(value_col)).cast("long")
    b = (F.length(F.bin(v)) - 1).cast("int")
    counted = (
        df.filter(F.col(value_col) >= 1)
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    lo = F.expr("shiftleft(CAST(1 AS BIGINT), bucket)")
    return counted.select(
        "bucket",
        lo.alias("lo"),
        (lo * 2 - 1).cast("long").alias("hi"),
        "n",
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization report: exact percentile clip bounds
    (the LOWER percentile — value at 1-based rank ⌈p·n⌉) and the
    group mean BEFORE vs AFTER clipping to [lo, hi] — the standard
    tail-taming transform for heavy-tailed metrics, with the
    before/after delta as the audit artifact (how much did the tails
    move the mean).

    Two passes over the per-group data (rank window to pick the two
    bound rows, then one clipped aggregation with the O(groups) bounds
    broadcast back); all means flow through exact DECIMAL(18,4) sums
    (clip bounds are existing data values, so clipping stays inside
    the decimal domain — no rounding anywhere before the final
    division). Returns (group, n, lo, hi, mean_raw, mean_winsorized).
    """
    if not (0 <= p_lo < p_hi <= 1):
        raise ValueError("winsorized_stats needs 0 <= p_lo < p_hi <= 1")
    from pyspark.sql import Window

    d = F.col(value_col).cast("decimal(18,4)")
    base = df.select(
        F.col(group_col).alias("__g"), d.alias("__v")
    )
    w = Window.partitionBy("__g").orderBy("__v")
    wn = Window.partitionBy("__g")
    ranked = base.select(
        "__g",
        "__v",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    r_lo = F.ceil(F.lit(p_lo) * F.col("__n").cast("double")).cast("long")
    r_hi = F.ceil(F.lit(p_hi) * F.col("__n").cast("double")).cast("long")
    bounds = (
        ranked.filter(
            (F.col("__r") == F.greatest(r_lo, F.lit(1)))
            | (F.col("__r") == r_hi)
        )
        .groupBy("__g")
        .agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    )
    clipped = base.join(F.broadcast(bounds), "__g").select(
        "__g",
        "__v",
        F.least(F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi"))
        .alias("__w"),
        "__lo",
        "__hi",
    )
    return clipped.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("__lo").alias("lo"),
        F.min("__hi").alias("hi"),
        (
            F.sum("__v").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_raw"),
        (
            F.sum("__w").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_winsorized"),
    ).withColumnRenamed("__g", group_col)


def abc_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    a_pct: int = 80,
    b_pct: int = 95,
    scale: int = 4,
) -> DataFrame:
    """ABC / Pareto classification: rank keys by total value, walk the
    cumulative share, label the keys covering the first ``a_pct``
    percent 'A', the next slice to ``b_pct`` percent 'B', the tail 'C'
    — the inventory/catalog triage (which parts deserve per-item
    attention vs bulk policies). Returns one row per class:
    (abc_class, n_keys, class_value, value_share_scaled).

    Exactness: values pre-cast to DECIMAL(18, ``scale``); the class
    boundary compares ``cum · 100 <= pct · total`` in pure decimal
    arithmetic (never a float share), and the reported share is a
    floor-scaled bigint ratio on the decimal sums' fixed-point integer
    forms. A key lands in 'A' iff its INCLUSIVE cumulative share stays
    within ``a_pct``%. Ties order by (value DESC, key ASC) — total
    order, engine-independent.

    Scale: one aggregation shuffle to key grain, then an ordered
    window over the KEY DIMENSION (parts/SKUs — millions of rows, not
    the 100 TB fact table) — the same dimension-sized global sort the
    exact-decile anchors document."""
    from pyspark.sql import Window

    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    per_key = df.groupBy(key_col).agg(F.sum(dec).alias("__v"))
    w = Window.orderBy(
        F.col("__v").desc(), F.col(key_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = per_key.agg(F.sum("__v").alias("__total"))
    cum = per_key.withColumn("__cum", F.sum("__v").over(w)).join(
        F.broadcast(total)
    )
    classed = cum.withColumn(
        "abc_class",
        F.when(
            F.col("__cum") * F.lit(100) <= F.col("__total") * F.lit(a_pct),
            F.lit("A"),
        )
        .when(
            F.col("__cum") * F.lit(100) <= F.col("__total") * F.lit(b_pct),
            F.lit("B"),
        )
        .otherwise(F.lit("C")),
    )
    unscaled = 10**scale
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("__v").alias("__cv"),
            F.first("__total").alias("__t"),
        )
        .select(
            "abc_class",
            "n_keys",
            F.col("__cv").cast("double").alias("class_value"),
            F.expr(
                f"CAST((CAST(__cv * {unscaled} AS DECIMAL(38,0))"
                f" * 1000000) DIV CAST(__t * {unscaled} AS DECIMAL(38,0))"
                " AS BIGINT)"
            ).alias("value_share_scaled"),
        )
    )


def histogram_partials(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """MERGEABLE log2-histogram state: per-group power-of-two bucket
    counts — the quantile-sketch member of the mergeable-state family
    (HLL = distinct, CMS = frequency, moments = mean/var; this one
    serves PERCENTILES). Buckets merge across shards/batches by plain
    addition, so the state is replayable and distributive.

    Binning is :func:`log2_histogram`'s exact integer exponent
    (``length(bin(⌊v⌋)) − 1`` — no libm), extended with bucket −1 for
    0 ≤ v < 1 so totals reconcile; negative/NULL values are excluded
    (report upstream). Returns (group…, bucket, n)."""
    v = F.col(value_col)
    b = F.when(
        v < 1, F.lit(-1)
    ).otherwise((F.length(F.bin(F.floor(v).cast("long"))) - 1)).cast("int")
    return (
        df.filter(v.isNotNull() & (v >= 0))
        .select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def merge_histogram_partials(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold histogram partials from any number of shards/batches into
    one per-(group, bucket) count — plain addition, the distributive
    merge that makes the state order- and replay-insensitive."""
    return partials.groupBy(*group_cols, "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def histogram_percentiles(
    partials: DataFrame,
    group_cols: list[str],
    *,
    percents: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Serve percentile ESTIMATES from merged log2-histogram state:
    for each group and percent p, the midpoint of the bucket holding
    the 0-indexed rank ``((total−1)·p) DIV 100`` — constant relative
    error (a value lands within its power-of-two bucket, so the
    estimate is within 2× of the true percentile), which is the HDR-
    histogram trade every latency dashboard makes. Returns
    (group…, pct, n_total, estimate).

    ALL integer arithmetic (rank pick, bucket walk, midpoint
    ``(lo+hi) DIV 2``) — engine-exact, so the batch twin is fully
    ORACLE-checkable and streamed state == one-pass batch
    bit-for-bit. One bucket-ordered window per group (≤ ~64 bucket
    rows per group, never raw values) + one conditional aggregation."""
    from pyspark.sql import Window

    merged = merge_histogram_partials(partials, group_cols)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = merged.withColumn("__cum", F.sum("n").over(w)).withColumn(
        "__total", F.sum("n").over(wt)
    )
    lo = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket)")
    )
    hi = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1")
    )
    mid = F.expr(
        "CAST((__lo + __hi) DIV 2 AS BIGINT)"
    )
    cum = cum.withColumn("__lo", lo).withColumn("__hi", hi)
    aggs = []
    for p in percents:
        if not 0 <= p <= 100:
            raise ValueError("percents must be in [0, 100]")
        target = F.expr(f"CAST(((__total - 1) * {p}) DIV 100 AS BIGINT)")
        aggs.append(
            F.min(
                F.when(F.col("__cum") > target, mid)
            ).alias(f"__est{p}")
        )
    one = cum.groupBy(*group_cols).agg(
        F.max("__total").cast("long").alias("n_total"), *aggs
    )
    stack = ", ".join(f"{p}L, __est{p}" for p in percents)
    return one.selectExpr(
        *group_cols,
        "n_total",
        f"stack({len(percents)}, {stack}) AS (pct, estimate)",
    ).select(*group_cols, "pct", "n_total", "estimate")


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Optimizer-style JOIN CARDINALITY estimate vs ground truth: the
    textbook containment formula |R ⋈ S| ≈ |R|·|S| ∕ max(ndv_R, ndv_S)
    against the join's actual row count — the audit that tells you
    whether statistics-based planning (broadcast thresholds, join
    reordering) can be trusted on this key, and by how much skew
    breaks the uniform-frequency assumption behind the formula.
    Returns ONE row: (n_left, n_right, ndv_left, ndv_right, est_rows,
    actual_rows, est_over_actual_scaled).

    All counts exact (COUNT DISTINCT, not sketches — this is the
    audit, the planning path would use HLL via estimate_key_overlap);
    the estimate and the ratio are exact integer DIVs in
    DECIMAL(38,0). Shape: two single-pass aggregations + one equi-join
    count."""
    ls = left.agg(
        F.count(F.lit(1)).cast("long").alias("n_left"),
        F.countDistinct(left_key).cast("long").alias("ndv_left"),
    )
    rs = right.agg(
        F.count(F.lit(1)).cast("long").alias("n_right"),
        F.countDistinct(right_key).cast("long").alias("ndv_right"),
    )
    actual = (
        left.select(F.col(left_key).alias("__k"))
        .join(right.select(F.col(right_key).alias("__k")), "__k")
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return (
        ls.crossJoin(rs)
        .crossJoin(actual)
        .select(
            "n_left",
            "n_right",
            "ndv_left",
            "ndv_right",
            F.expr(
                "CAST((CAST(n_left AS DECIMAL(38,0)) * n_right)"
                " DIV greatest(ndv_left, ndv_right) AS BIGINT)"
            ).alias("est_rows"),
            "actual_rows",
            F.expr(
                "CAST(((CAST(n_left AS DECIMAL(38,0)) * n_right)"
                " DIV greatest(ndv_left, ndv_right))"
                f" * {scale} DIV actual_rows AS BIGINT)"
            ).alias("est_over_actual_scaled"),
        )
    )


def overdispersion_stats(
    df: DataFrame,
    key_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Count OVERDISPERSION check: the variance-to-mean ratio (index
    of dispersion) of per-key event counts — the one-number test of
    the Poisson assumption every count model / anomaly threshold
    quietly makes (ratio ≈ 1 Poisson, ≫ 1 bursty/clumped → negative
    binomial territory, ≪ 1 regular). Returns ONE row: (n_keys,
    total_events, mean_scaled, dispersion_scaled).

    Exactness: per-key counts are integers; Σc and Σc² stay integral
    (Σc² in DECIMAL(38,0) past int64); mean = Σc∕k and the dispersion
    ratio D = var∕mean = (k·Σc² − (Σc)²) ∕ (Σc·(k−1)) are floor-scaled
    integer DIVs of those exact sums. Shape: one count aggregation to
    key grain, one one-row fold."""
    per = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__c").cast("long").alias("total_events"),
        F.sum(
            F.col("__c").cast("decimal(38,0)") * F.col("__c")
        ).cast("decimal(38,0)").alias("__ss"),
    )
    return agg.select(
        "n_keys",
        "total_events",
        F.expr(
            f"CAST((total_events * CAST({scale} AS BIGINT)) DIV n_keys"
            " AS BIGINT)"
        ).alias("mean_scaled"),
        F.expr(
            f"CAST(((CAST(n_keys AS DECIMAL(38,0)) * __ss"
            f" - CAST(total_events AS DECIMAL(38,0)) * total_events)"
            f" * {scale})"
            " DIV (CAST(total_events AS DECIMAL(38,0)) * (n_keys - 1))"
            " AS BIGINT)"
        ).alias("dispersion_scaled"),
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """KENDALL tau-b rank correlation, exact under ties — the
    pair-concordance alternative to :func:`spearman_correlation`
    (tau reads as a probability: P(concordant) − P(discordant); it is
    also the measure behind Kendall distance on rankings). Returns ONE
    row: (n, concordant, discordant, ties_x, ties_y, tau_b).

    Scale shape: raw pair enumeration is O(n²) in ROWS — dead at any
    scale. Here pairs are counted at CELL grain: aggregate to the
    (x, y) contingency cells first (one data-proportional shuffle with
    map-side combine), then a cell self-join — O(B²) where B is the
    CELL-GRID size, which is bounded by value cardinality, not rows
    (callers pre-quantize near-continuous columns, the
    price_quantity_spearman_quantized grain discipline). Concordant/
    discordant sums are Σ c_i·c_j over strictly-ordered cell pairs;
    tie-pair counts come from the marginal run lengths, all exact
    DECIMAL(38,0) integers:

        n0 = n(n−1)/2,  n1 = Σ_x t_x(t_x−1)/2,  n2 = Σ_y t_y(t_y−1)/2
        tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2))

    The final expression converts the exact decimals to double once
    (Spark's decimal→double is correctly rounded; the oracle mirrors
    via the VARCHAR round-trip) — bit-identical across engines. The
    published concordant/discordant columns are BIGINT (pair counts
    ≤ n(n−1)/2 fit int64 for n ≤ ~4.3e9 rows — the r10 portable-
    surface rule); the internal accumulation stays DECIMAL."""
    cells = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__c"))
    d = "decimal(38,0)"
    a = cells.select(
        F.col("__x").alias("xa"), F.col("__y").alias("ya"),
        F.col("__c").cast(d).alias("ca"),
    )
    b = cells.select(
        F.col("__x").alias("xb"), F.col("__y").alias("yb"),
        F.col("__c").cast(d).alias("cb"),
    )
    pairs = a.join(b, (F.col("xb") > F.col("xa")))
    cd = pairs.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), F.col("ca") * F.col("cb"))
            ),
            F.lit(0).cast(d),
        ).alias("concordant"),
        F.coalesce(
            F.sum(
                F.when(F.col("yb") < F.col("ya"), F.col("ca") * F.col("cb"))
            ),
            F.lit(0).cast(d),
        ).alias("discordant"),
    )
    c_dec = F.col("__c").cast(d)
    marg = cells.agg(F.sum(c_dec).alias("__n"))
    tx = (
        cells.groupBy("__x").agg(F.sum(c_dec).alias("__t"))
        .agg(F.sum(F.col("__t") * F.col("__t")).alias("__sx2"))
    )
    ty = (
        cells.groupBy("__y").agg(F.sum(c_dec).alias("__t"))
        .agg(F.sum(F.col("__t") * F.col("__t")).alias("__sy2"))
    )
    one = cd.crossJoin(marg).crossJoin(tx).crossJoin(ty)
    n = F.col("__n")
    # tau_b = (C−D)/sqrt(((n²−Σt_x²)/2)·((n²−Σt_y²)/2))
    #       = 2(C−D)/(sqrt(n²−Σt_x²)·sqrt(n²−Σt_y²))
    # — the halvings fold into one exact ×2, avoiding decimal division
    # (whose Spark result type grows a fractional scale). Tie counts
    # are reported via integral DIV (LONG-bounded — fine while pair
    # counts fit 2^63; the decimals above stay exact regardless).
    num = (F.col("concordant") - F.col("discordant")).cast("double")
    den = F.sqrt((n * n - F.col("__sx2")).cast("double")) * F.sqrt(
        (n * n - F.col("__sy2")).cast("double")
    )
    return one.select(
        n.cast("long").alias("n"),
        # published as BIGINT (r10 portable-surface rule): pair counts
        # are <= n(n-1)/2, inside int64 for n <= ~4.3e9 rows; the
        # decimal accumulation above stays exact.
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.expr("CAST((__sx2 - __n) DIV 2 AS LONG)").alias("ties_x"),
        F.expr("CAST((__sy2 - __n) DIV 2 AS LONG)").alias("ties_y"),
        (F.lit(2.0) * num / den).alias("tau_b"),
    )


def spearman_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """SPEARMAN rank correlation, exact under ties: Pearson of the
    tie-averaged rank vectors — the monotone-association measure that
    ignores the marginal distributions (Pearson on raw values answers
    a different question; lineitem_correlations has that). Returns ONE
    row: (n, rho).

    Exactness: tie-averaged ranks are computed at DISTINCT-VALUE grain
    as DOUBLED integers (rank run f..l → f+l = 2·cum_before + run + 1,
    the mann_whitney_u device), joined back to rows by value, so every
    sufficient sum (Σr, Σr², Σr_x·r_y) is an exact DECIMAL(38,0)
    integer; ρ is one fixed double expression over those sums —
    engine-hash-checkable. Shape: two distinct-value rank tables
    (windows over value points, not rows), two equi-joins back onto
    the fact, one aggregation."""
    from pyspark.sql import Window

    def ranks(col: str, alias: str) -> DataFrame:
        pts = df.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        w = Window.orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return pts.select(
            "__v",
            (
                F.lit(2) * F.sum("__c").over(w) - F.col("__c") + 1
            ).cast("long").alias(alias),
        )
    rx = ranks(x_col, "__rx")
    ry = ranks(y_col, "__ry")
    joined = (
        df.select(F.col(x_col).alias("__xv"), F.col(y_col).alias("__yv"))
        .join(rx.withColumnRenamed("__v", "__xv"), "__xv")
        .join(ry.withColumnRenamed("__v", "__yv"), "__yv")
    )
    # per-row products in (18,0)x(18,0) -> DECIMAL(37,0): exact and
    # inside Spark's 38-precision cap (a (38,0)x long multiply would
    # overflow the type and round); doubled ranks fit 18 digits for
    # any n < 5e17 rows
    dec = "decimal(18,0)"
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__rx").cast(dec)).alias("__sx"),
        F.sum(F.col("__ry").cast(dec)).alias("__sy"),
        F.sum(F.col("__rx").cast(dec) * F.col("__ry").cast(dec)).alias("__sxy"),
        F.sum(F.col("__rx").cast(dec) * F.col("__rx").cast(dec)).alias("__sxx"),
        F.sum(F.col("__ry").cast(dec) * F.col("__ry").cast(dec)).alias("__syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    rho = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    return agg.select("n", rho.alias("rho"))


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    trim_pct: int = 5,
    scale: int = 4,
) -> DataFrame:
    """Per-group TRIMMED MEAN: drop the lowest and highest
    ``trim_pct`` percent of rows (k = ⌊n·pct∕100⌋ each side, exact
    integer k) and average the decimal remainder — the robust center
    that, unlike winsorization (winsorized_stats), discards rather
    than clamps the tails. Returns (group, n, n_trimmed_each_side,
    mean_raw, mean_trimmed).

    Determinism: the trim set is defined by a TOTAL ORDER — rank by
    (value, then every remaining column as tiebreak is unnecessary:
    ranks only select HOW MANY extreme rows drop, and equal values are
    interchangeable for a mean, so any rank permutation of ties yields
    the same sum). All sums decimal; means fixed double divisions.
    Shape: one rank window per group (row grain — the one sort this
    statistic inherently needs) + one aggregation."""
    from pyspark.sql import Window

    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col).alias("group"),
        dec.alias("__v"),
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(dec.asc())
        ).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    k = F.expr(f"CAST((__n * {int(trim_pct)}) DIV 100 AS BIGINT)")
    kept = (F.col("__r") > k) & (F.col("__r") <= F.col("__n") - k)
    return (
        ranked.groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first(k).cast("long").alias("n_trimmed_each_side"),
            F.sum("__v").alias("__s_all"),
            F.sum(F.when(kept, F.col("__v"))).alias("__s_kept"),
            F.sum(kept.cast("long")).alias("__n_kept"),
        )
        .select(
            "group",
            "n",
            "n_trimmed_each_side",
            (
                F.col("__s_all").cast("double") / F.col("n").cast("double")
            ).alias("mean_raw"),
            (
                F.col("__s_kept").cast("double")
                / F.col("__n_kept").cast("double")
            ).alias("mean_trimmed"),
        )
    )


def freq_zipf_audit(
    counts: DataFrame,
    count_col: str,
) -> DataFrame:
    """Zipf/power-law audit of ANY frequency distribution (r8): bucket
    the counts by ⌊log2⌋ (exact binary-length exponent — no libm),
    count items per bucket, ⌊log2⌋ those too, and fit the log-log line
    with the Theil–Sen median-of-slopes — a power law reads straight
    in log-log space, so a steep negative robust slope is the
    "Zipfian" signature (token frequencies, URL popularity, customer
    activity). The generalized sibling of the co-purchase
    ``degree_zipf_audit`` (same exact-integer devices: binary-length
    log2 on both axes, ≤64-row bucket table, pairwise slopes floored
    once at scale 10^6, lower-median pick from the sorted bounded
    array).

    Input: a pre-aggregated (item, count) frame — the caller owns the
    one data-proportional aggregation. Returns one row per occupied
    bucket: (bucket, n_items, log2_n, slope_scaled) with the shared
    fitted slope on every row."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    c = F.col(count_col).cast("long")
    bucket = (F.length(F.bin(c)) - 1).cast("int")
    buckets = (
        counts.filter(c >= 1)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    with_log = buckets.withColumn(
        "log2_n", (F.length(F.bin(F.col("n_items"))) - 1).cast("long")
    )
    pairs = (
        with_log.alias("a")
        .join(
            F.broadcast(with_log.alias("b")),
            F.col("a.bucket") < F.col("b.bucket"),
        )
        .select(
            F.floor(
                (F.col("b.log2_n") - F.col("a.log2_n"))
                * F.lit(1_000_000.0)
                / (F.col("b.bucket") - F.col("a.bucket"))
            ).cast("long").alias("__s")
        )
    )
    med = pairs.agg(
        F.element_at(
            F.array_sort(F.collect_list("__s")),
            ((F.size(F.array_sort(F.collect_list("__s"))) + 1) / 2).cast(
                "int"
            ),
        ).alias("slope_scaled")
    )
    return with_log.join(F.broadcast(med)).orderBy("bucket")


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
) -> DataFrame:
    """First-order partial correlation, exact-ingredient: the x↔y
    association AFTER controlling for a confounder z —
    r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)) — the
    one-line answer to "is this correlation just both variables
    riding z". Completes the correlation family next to
    `correlation_matrix` (marginal) and :func:`grouped_linreg`
    (conditional mean).

    Exactness: integer-valued inputs (pre-quantize); the six centered
    cross-products N·Σab − Σa·Σb ride exact DECIMAL(38,0); each
    pairwise r is ONE division of an exactly-cast double by a √ of a
    fixed-order double product (IEEE sqrt is correctly rounded, the
    hellinger precedent), and the partial is a fixed IEEE expression
    over the three r's — bit-identical across engines. Returns ONE
    row: (n, r_xy, r_xz, r_yz, r_xy_given_z); r's are NULL on
    zero-variance inputs, the partial also when either conditioning
    correlation is ±1 (the formula's 0/0)."""
    dec = "decimal(38,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    z = F.col(z_col).cast(dec)
    s = df.agg(
        F.count(F.lit(1)).cast(dec).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(z).alias("__sz"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(z * z).alias("__szz"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * z).alias("__sxz"),
        F.sum(y * z).alias("__syz"),
    )
    n = F.col("__n")

    def centered(ab, a, b):
        return n * F.col(ab) - F.col(a) * F.col(b)

    cxx = centered("__sxx", "__sx", "__sx")
    cyy = centered("__syy", "__sy", "__sy")
    czz = centered("__szz", "__sz", "__sz")
    cxy = centered("__sxy", "__sx", "__sy")
    cxz = centered("__sxz", "__sx", "__sz")
    cyz = centered("__syz", "__sy", "__sz")

    def r_of(cab, caa, cbb):
        return F.when(
            (caa > 0) & (cbb > 0),
            cab.cast("double")
            / F.sqrt(caa.cast("double") * cbb.cast("double")),
        )

    r_xy = r_of(cxy, cxx, cyy)
    r_xz = r_of(cxz, cxx, czz)
    r_yz = r_of(cyz, cyy, czz)
    denom = F.sqrt(
        (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    )
    return s.select(
        n.cast("long").alias("n"),
        r_xy.alias("r_xy"),
        r_xz.alias("r_xz"),
        r_yz.alias("r_yz"),
        F.when(denom > 0, (r_xy - r_xz * r_yz) / denom).alias(
            "r_xy_given_z"
        ),
    )


def jenks_breaks(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 5,
    max_values: int = 2048,
) -> DataFrame:
    """Fisher–Jenks natural breaks: partition a 1-D distribution into
    ``k`` contiguous classes minimizing total within-class squared
    deviation — the variance-optimal binning that equal-width
    (`price_histogram`) and equal-frequency (`price_quantile_bins`)
    binning both approximate. THE standard classifier for choropleth/
    report bucketing; on this engine it also answers "where do the
    natural price tiers sit".

    Exactness scheme: the optimization runs at DISTINCT-VALUE grain
    (``value_col`` must be integer-quantized) on exact integer
    sufficient sums; each segment's cost is the floor-quantized SSE

        cost(s..e) = ( W·Q − S² ) DIV W      (W=Σc, S=Σcv, Q=Σcv²)

    and the DP minimizes the SUM of these integer costs with a
    deterministic tie-break (smallest split index) — so the chosen
    breaks are ENGINE-EXACT and a recursive-CTE oracle replays every
    DP cell bit-for-bit (the pagerank device). The floor quantization
    is stated: classes are optimal for the integer cost, which
    brackets true SSE within one unit per segment.

    Contract: distinct-value cardinality ≤ ``max_values`` (raises
    loudly — the DP is O(m²k) driver-side over the collected
    value-grain stats, a bounded contract like the whitening eigh;
    the VALUE GRAIN, not the row count, is what must be small).
    Returns min(k, m) rows — fewer distinct values than classes
    degrades to m singleton zero-cost classes —
    (class, lo, hi, n_values, n_rows, cost)."""
    pts = (
        df.groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy("__v")
        .collect()
    )
    m = len(pts)
    if m > max_values:
        raise ValueError(
            f"jenks_breaks: {m} distinct values exceeds the documented"
            f" max_values={max_values} DP bound — pre-quantize coarser"
        )
    if m == 0 or k < 1:
        raise ValueError("jenks_breaks: empty input or k < 1")
    if any(r["__v"] is None for r in pts):
        raise ValueError(
            "jenks_breaks: value_col contains NULLs — a NULL has no"
            " class; filter or impute upstream"
        )
    kk = min(k, m)
    vs = [int(r["__v"]) for r in pts]
    cs = [int(r["__c"]) for r in pts]
    # 1-indexed prefix sums of W, S=Σcv, Q=Σcv²
    pw = [0] * (m + 1)
    ps = [0] * (m + 1)
    pq = [0] * (m + 1)
    for i in range(1, m + 1):
        pw[i] = pw[i - 1] + cs[i - 1]
        ps[i] = ps[i - 1] + cs[i - 1] * vs[i - 1]
        pq[i] = pq[i - 1] + cs[i - 1] * vs[i - 1] * vs[i - 1]

    def cost(s: int, e: int) -> int:
        w = pw[e] - pw[s - 1]
        sv = ps[e] - ps[s - 1]
        q = pq[e] - pq[s - 1]
        return (w * q - sv * sv) // w

    NEG = -1
    INF = float("inf")
    d_prev = [cost(1, i) for i in range(1, m + 1)]
    arg = [[NEG] * m]  # class 1 has no split
    for j in range(2, kk + 1):
        d_cur = [INF] * m
        a_cur = [NEG] * m
        for i in range(j - 1, m):  # 0-indexed end i -> value i+1
            best, bests = INF, NEG
            for s in range(j - 1, i + 1):  # first index of last class
                cand = d_prev[s - 1] + cost(s + 1, i + 1)
                if cand < best:
                    best, bests = cand, s
            d_cur[i], a_cur[i] = best, bests
        d_prev, arg = d_cur, arg + [a_cur]
    # backtrack: class kk ends at m-1
    bounds = []
    e = m - 1
    for j in range(kk, 0, -1):
        s = arg[j - 1][e] if j > 1 else 0
        bounds.append((j, s, e))
        e = s - 1
    bounds.reverse()
    rows = []
    for j, s, e in bounds:
        rows.append(
            (
                j,
                vs[s],
                vs[e],
                e - s + 1,
                pw[e + 1] - pw[s],
                cost(s + 1, e + 1),
            )
        )
    spark = df.sparkSession
    return local_rows_df(
        spark,
        rows,
        "class long, lo long, hi long, n_values long, n_rows long,"
        " cost long",
    )
