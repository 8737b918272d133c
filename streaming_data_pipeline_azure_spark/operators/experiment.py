"""Deterministic experiment (A/B test) analysis: key-pure variant
assignment, engine-exact per-variant metric statistics, and a Welch
two-sample t readout with a sample-ratio-mismatch (SRM) check.

The missing analytics pillar next to funnels/cohorts (temporal.py):
every experimentation stack needs (1) an assignment that is a PURE
FUNCTION of the randomization unit — reproducible across runs and
engines, stable under repartitioning, no stored assignment table to
join — and (2) a readout whose numbers are exactly reproducible, not
"close up to float sum order".

Assignment reuses :func:`~.sampling.knuth_uniform` (the repo's key-pure
uniform: overflow-safe over the full int64 domain, bit-identical in any
SQL engine), salted so concurrent experiments randomize independently.

The readout follows the `profile.correlation_matrix` /
`grouped_linreg` decimal discipline: metrics round once to
DECIMAL(18,4), the per-variant sufficient sums (n, Σm, Σm²) are exact
decimals accumulated in ONE map-side-combined aggregation (the only
shuffle — O(n_variants) rows), and doubles appear only in the fixed
finalization expression — so mean/variance/t are bit-identical across
engines and partitionings, and the DuckDB oracles hash-check the real
code path. At 100 TB this is a single scan + a v-row shuffle: nothing
about the plan changes with scale.

Reference anchor: the reference's query surface is filtered/grouped
averages over the purchase stream (reference customers.sql:1-12,
README.md:131-166); an experiment readout is the same aggregate shape
keyed by a derived assignment column instead of a stored one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _M32, knuth_uniform


def assign_variant(
    key_col: Column | str, n_variants: int, *, salt: int = 0
) -> Column:
    """Variant id in ``[0, n_variants)`` as a pure function of
    ``(key, salt)``: ``floor(knuth_uniform(pmod(key, 2^32) + salt) * n)``.

    The salt shifts the 32-bit-reduced key BEFORE hashing, so each salt
    value is an independent re-randomization (experiment #2 with a new
    salt is uncorrelated with experiment #1's buckets) and the shifted
    key stays < 2^32 + salt — no int64 overflow under ANSI mode for any
    input key."""
    if n_variants < 2:
        raise ValueError(
            f"assign_variant: n_variants={n_variants} — an experiment "
            "needs at least 2 arms"
        )
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    k = k.cast("long")
    kr = ((k % F.lit(_M32)) + F.lit(_M32)) % F.lit(_M32)
    u = knuth_uniform(kr + F.lit(int(salt)))
    return F.floor(u * F.lit(float(n_variants))).cast("int")


def variant_stats(
    df: DataFrame,
    key_col: str,
    metric_col: str,
    *,
    n_variants: int = 2,
    salt: int = 0,
) -> DataFrame:
    """Per-variant metric statistics from exact decimal sufficient sums:
    (variant, n_rows, n_units, mean_metric, var_metric, std_metric),
    sample variance ``(n·Σm² − (Σm)²) / (n·(n−1))``.

    ``n_units`` counts distinct randomization keys (rows may be events
    under a cluster-randomized key such as customer) — the map-side
    partial distinct bounds that shuffle at one row per (variant, key).
    """
    d = F.col(metric_col).cast("decimal(18,4)")
    g = (
        df.select(
            assign_variant(key_col, n_variants, salt=salt).alias("variant"),
            F.col(key_col).alias("__k"),
            d.alias("__m"),
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.countDistinct("__k").alias("__nu"),
            F.sum("__m").alias("__s"),
            F.sum(F.col("__m") * F.col("__m")).alias("__ss"),
        )
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    var = (n * ss - s * s) / (n * (n - F.lit(1.0)))
    return g.select(
        "variant",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("__nu").cast("long").alias("n_units"),
        (s / n).alias("mean_metric"),
        F.when(F.col("__n") > 1, var).alias("var_metric"),
        F.when(F.col("__n") > 1, F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))).alias(
            "std_metric"
        ),
    )


def variant_partials(
    df: DataFrame,
    key_col: str,
    metric_col: str,
    *,
    n_variants: int = 2,
    salt: int = 0,
) -> DataFrame:
    """Mergeable per-variant sufficient sums — (variant, n, s, ss)
    with s/ss EXACT decimals: partials from arbitrary slicings of the
    data merge (by plain addition) to bit-identical one-pass results,
    so an experiment readout can be maintained per micro-batch and
    served without reprocessing history (the mergeable-state family:
    HLL distinct, CMS frequency, bottom-k samples — this is the
    metric-moments member). ``n_units`` is deliberately absent: a
    distinct count is not mergeable; pair the readout with the HLL
    family if per-variant unit counts are needed at serve time."""
    d = F.col(metric_col).cast("decimal(18,4)")
    return (
        df.select(
            assign_variant(key_col, n_variants, salt=salt).alias(
                "variant"
            ),
            d.alias("__m"),
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__m").alias("s"),
            F.sum(F.col("__m") * F.col("__m")).alias("ss"),
        )
    )


def merge_variant_partials(partials: DataFrame) -> DataFrame:
    """Fold any number of (variant, n, s, ss) partial frames (already
    unioned) back into one row per variant — decimal addition, so the
    merge is exact and order-independent."""
    return partials.groupBy("variant").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
    )


def finalize_variant_stats(partials: DataFrame) -> DataFrame:
    """(variant, n_rows, mean_metric, var_metric, std_metric) from
    merged partials — the identical finalization expressions as
    :func:`variant_stats`, so a streamed/merged readout is
    bit-identical to the one-pass batch answer (tested)."""
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    var = (n * ss - s * s) / (n * (n - F.lit(1.0)))
    return partials.select(
        "variant",
        F.col("n").cast("long").alias("n_rows"),
        (s / n).alias("mean_metric"),
        F.when(F.col("n") > 1, var).alias("var_metric"),
        F.when(
            F.col("n") > 1,
            F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0)),
        ).alias("std_metric"),
    )


def welch_ttest(
    df: DataFrame,
    key_col: str,
    metric_col: str,
    *,
    salt: int = 0,
) -> DataFrame:
    """Two-arm experiment readout in ONE row: sizes, means, the Welch
    unequal-variance t statistic, its Welch–Satterthwaite degrees of
    freedom, and the SRM chi-square against the expected 50/50 split
    (the standard validity guard: a large ``srm_chi2`` means broken
    assignment, and the t statistic should not be trusted).

    Arms are ``assign_variant(key, 2, salt)`` = 0 (control) / 1
    (treatment). All doubles derive from the exact decimal sums of
    :func:`variant_stats` through one fixed expression tree, so the
    statistic is bit-reproducible (oracle-hash-checked, not just
    approximately right). Returns (n_a, n_b, mean_a, mean_b, mean_diff,
    t_stat, welch_df, srm_chi2)."""
    stats = variant_stats(
        df, key_col, metric_col, n_variants=2, salt=salt
    )
    side = lambda c, v: F.max(  # noqa: E731
        F.when(F.col("variant") == v, F.col(c))
    )
    w = stats.agg(
        side("n_rows", 0).alias("n_a"),
        side("n_rows", 1).alias("n_b"),
        side("mean_metric", 0).alias("mean_a"),
        side("mean_metric", 1).alias("mean_b"),
        side("var_metric", 0).alias("__va"),
        side("var_metric", 1).alias("__vb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    se2a = F.col("__va") / na
    se2b = F.col("__vb") / nb
    se2 = se2a + se2b
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    wdf = (se2 * se2) / (
        se2a * se2a / (na - F.lit(1.0)) + se2b * se2b / (nb - F.lit(1.0))
    )
    exp_n = (na + nb) / F.lit(2.0)
    chi2 = (na - exp_n) * (na - exp_n) / exp_n + (nb - exp_n) * (
        nb - exp_n
    ) / exp_n
    return w.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        (F.col("mean_a") - F.col("mean_b")).alias("mean_diff"),
        F.when(se2 > 0, t).alias("t_stat"),
        F.when(se2 > 0, wdf).alias("welch_df"),
        chi2.alias("srm_chi2"),
    )


def chi2_contingency_cells(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Contingency-table independence diagnostics, PER CELL: observed
    count, expected-under-independence count (row·col/total), and the
    cell's chi-square contribution (O−E)²/E — the categorical
    dependence probe (does priority depend on status? does language
    depend on source?).

    Deliberately returns cells, not the summed statistic: a float sum
    over an unordered cell set is engine-order-dependent, while every
    per-cell value here is a fixed expression over exact integer
    counts (bit-reproducible, oracle-checkable) — and the cells are
    what an analyst reads anyway (WHICH combinations deviate). Callers
    wanting the scalar χ² sum the (sorted) contributions; the total
    degrees of freedom is (|X|−1)(|Y|−1).

    One (x, y) aggregation plus two broadcast marginal joins — cell
    cardinality |X|·|Y| is the only window/driver-free output."""
    cells = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    mx = cells.groupBy("x").agg(F.sum("observed").cast("long").alias("__nx"))
    my = cells.groupBy("y").agg(F.sum("observed").cast("long").alias("__ny"))
    tot = cells.agg(F.sum("observed").cast("long").alias("__n"))
    o = F.col("observed").cast("double")
    e = (
        F.col("__nx").cast("double")
        * F.col("__ny").cast("double")
        / F.col("__n").cast("double")
    )
    return (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            "observed",
            e.alias("expected"),
            ((o - e) * (o - e) / e).alias("chi2_contribution"),
        )
    )


def cramers_v(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized effect size of categorical
    association (χ² alone grows with N; V answers "HOW dependent"),
    the feature-selection / leakage screen run over candidate
    categorical features before training. Returns ONE row:
    (n, x_levels, y_levels, dof, chi2, cramers_v).

    Shares :func:`chi2_contingency_cells`' exactness scheme (every
    per-cell contribution is a fixed double expression over exact
    integer counts) but builds the FULL |X|×|Y| grid from the two
    marginals — a zero cell contributes its whole expected count E to
    χ² (a strong dependence signal: perfect association is literally
    "the off-cells are empty"), which the observed-cells-only
    diagnostic cannot see and a scalar χ² must not miss. The second
    device closes the float gap: an unordered SUM over cells is
    engine-order-dependent, so the cells collapse to ONE sorted array
    (lexicographic (x, y) struct order) and fold left-to-right — the
    same device as the vector dot products, bit-identical in any
    engine that replays the ordered fold. Grid size |X|·|Y| is tiny by
    contract (categorical × categorical), so the cross join is two
    broadcast marginal frames and the sorted-array finish one task.

        V = sqrt(χ² / (N · min(|X|−1, |Y|−1)))

    A single-level x or y (min(|X|−1,|Y|−1) = 0, V undefined) returns
    NULL cramers_v explicitly — never a 0/0 NaN — matching the
    kruskal_wallis h_corrected NULL-on-degenerate convention."""
    obs = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    mx = obs.groupBy("x").agg(F.sum("observed").cast("long").alias("__nx"))
    my = obs.groupBy("y").agg(F.sum("observed").cast("long").alias("__ny"))
    tot = obs.agg(F.sum("observed").cast("long").alias("__n"))
    grid = (
        mx.crossJoin(F.broadcast(my))
        .join(obs, ["x", "y"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.coalesce(F.col("observed"), F.lit(0)).cast("long").alias(
                "observed"
            ),
            "__nx",
            "__ny",
            "__n",
        )
    )
    o = F.col("observed").cast("double")
    e = (
        F.col("__nx").cast("double")
        * F.col("__ny").cast("double")
        / F.col("__n").cast("double")
    )
    cells = grid.select(
        "x", "y", "observed",
        ((o - e) * (o - e) / e).alias("chi2_contribution"),
    )
    arr = cells.agg(
        F.sort_array(
            F.collect_list(F.struct("x", "y", "chi2_contribution"))
        ).alias("__cells"),
        F.sum("observed").cast("long").alias("n"),
        F.count_distinct(F.col("x")).cast("long").alias("x_levels"),
        F.count_distinct(F.col("y")).cast("long").alias("y_levels"),
    )
    chi2 = F.aggregate(
        F.transform(F.col("__cells"), lambda s: s["chi2_contribution"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dof = (F.col("x_levels") - 1) * (F.col("y_levels") - 1)
    kmin = F.least(F.col("x_levels") - 1, F.col("y_levels") - 1)
    return arr.select(
        "n",
        "x_levels",
        "y_levels",
        dof.cast("long").alias("dof"),
        chi2.alias("chi2"),
        # Degenerate guard (r10, ADVICE): a single-level x or y gives
        # kmin = 0 and the 0/0 sqrt would emit NaN — V is undefined
        # there (association needs >= 2 levels on both axes), so the
        # column is explicitly NULL, the same convention as
        # kruskal_wallis' h_corrected under zero variance.
        F.when(
            kmin > 0,
            F.sqrt(
                chi2 / (F.col("n").cast("double") * kmin.cast("double"))
            ),
        ).alias("cramers_v"),
    )


#: Cumulative Poisson(1) probabilities for the inverse-CDF lookup used
#: by the deterministic bootstrap (weights capped at 7 — the tail mass
#: beyond is ~1e-5 and folds into the last bucket). Written as exact
#: literals so the oracle SQL can repeat them digit-for-digit.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    n_replicates: int = 40,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    salt: int = 0,
) -> DataFrame:
    """DETERMINISTIC Poisson bootstrap confidence interval for the
    mean: every (row, replicate) draws its resampling weight
    ~ Poisson(1) through the key-pure Knuth hash (inverse-CDF over the
    exact :data:`POISSON1_CDF` literals), so the whole bootstrap — all
    ``n_replicates`` resampled means and the order-statistic CI — is a
    pure function of the data. Reruns, engines and backfills agree
    bit-for-bit (a rand()-based bootstrap can never be
    oracle-checked), which turns the usual "seed it and hope"
    resampling into an auditable statistic.

    Shape: one explode to rows × replicates (the inherent bootstrap
    cost — n_replicates scans' worth of weighted sums, batched into
    ONE shuffle keyed by replicate with decimal map-side combine),
    replicate means from exact decimal Σw·x / Σw, then order
    statistics over the O(n_replicates) means. Returns one row:
    (n_replicates, mean_point, mean_lo, mean_hi) where point is the
    full-sample exact mean and lo/hi are the ceil(q·B)-th sorted
    replicate means."""
    from pyspark.sql import Window

    if not 0 < lo_q < hi_q < 1:
        raise ValueError("bootstrap_mean_ci: need 0 < lo_q < hi_q < 1")
    b = n_replicates
    k32 = ((F.col(key_col).cast("long") % F.lit(4294967296))
           + F.lit(4294967296)) % F.lit(4294967296)
    rep = df.select(
        k32.alias("__k32"),
        F.col(value_col).cast("decimal(18,4)").alias("__v"),
    ).select(
        "__k32",
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__r"),
    )
    u = knuth_uniform(
        F.col("__k32") * F.lit(b) + F.col("__r") + F.lit(salt)
    )
    w = F.lit(len(POISSON1_CDF))
    for i in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[i]), F.lit(i)).otherwise(w)
    means = (
        rep.select("__r", "__v", w.alias("__w"))
        .groupBy("__r")
        .agg(
            F.sum(F.col("__v") * F.col("__w")).alias("__sw"),
            F.sum("__w").cast("long").alias("__nw"),
        )
        .select(
            "__r",
            (
                F.col("__sw").cast("double")
                / F.col("__nw").cast("double")
            ).alias("__m"),
        )
    )
    rank_w = Window.orderBy("__m")
    ranked = means.select(
        "__m", F.row_number().over(rank_w).alias("__rank")
    )
    import math

    lo_rank = math.ceil(lo_q * b)
    hi_rank = math.ceil(hi_q * b)
    point = df.agg(
        (
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_point")
    )
    bounds = ranked.agg(
        F.max(
            F.when(F.col("__rank") == lo_rank, F.col("__m"))
        ).alias("mean_lo"),
        F.max(
            F.when(F.col("__rank") == hi_rank, F.col("__m"))
        ).alias("mean_hi"),
    )
    return point.crossJoin(F.broadcast(bounds)).select(
        F.lit(b).cast("long").alias("n_replicates"),
        "mean_point",
        "mean_lo",
        "mean_hi",
    )


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, EXACT: the maximum
    ECDF gap between two groups' value distributions — the standard
    nonparametric "did the distribution shift" test (A/B guardrails,
    drift detection between cohorts). Returns ONE row:
    (n_a, n_b, ks_scaled) with ks_scaled = floor(D * scale).

    Exactness: D = max_v |F_a(v) - F_b(v)| is evaluated WITHOUT any
    float division — the gap at value v compares the integer
    cross-products |cum_a(v)*n_b - cum_b(v)*n_a| (DECIMAL(38,0)
    products, overflow-safe past int64 at any realistic n), and only
    the maximal numerator is floor-scaled by (n_a*n_b) via exact
    integral DIV. Every engine computes the identical bigint.

    Shape: one aggregation to DISTINCT-VALUE grain (the shuffle
    carries value points, not rows), one ordered window over those
    points for cumulative counts, a one-row broadcast of the totals,
    one max — the dimension-bounded window discipline of the other
    exact statistics."""
    from pyspark.sql import Window

    g = F.col(group_col)
    tagged = df.filter(g.isin([group_a, group_b])).select(
        F.col(value_col).alias("__v"),
        (g == F.lit(group_a)).cast("long").alias("__a"),
        (g == F.lit(group_b)).cast("long").alias("__b"),
    )
    pts = tagged.groupBy("__v").agg(
        F.sum("__a").alias("__na_v"), F.sum("__b").alias("__nb_v")
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pts.select(
        F.sum("__na_v").over(w).alias("__ca"),
        F.sum("__nb_v").over(w).alias("__cb"),
    )
    tot = cum.agg(
        F.max("__ca").cast("long").alias("n_a"),
        F.max("__cb").cast("long").alias("n_b"),
    )
    dec = "decimal(38,0)"
    gap = F.abs(
        F.col("__ca").cast(dec) * F.col("n_b").cast(dec)
        - F.col("__cb").cast(dec) * F.col("n_a").cast(dec)
    )
    return (
        cum.join(F.broadcast(tot))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(gap).alias("__dnum"),
        )
        .select(
            "n_a",
            "n_b",
            F.expr(
                f"CAST((__dnum * {scale}) DIV (CAST(n_a AS DECIMAL(38,0))"
                " * CAST(n_b AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("ks_scaled"),
        )
    )


def jonckheere_trend(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ordered_groups: list,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Jonckheere–Terpstra test for an ORDERED alternative, exact with
    ties: "do values stochastically INCREASE along this group order" —
    the K-group extension of :func:`mann_whitney_u` that uses the
    ordering (Kruskal-Wallis asks "any difference"; J-T asks "this
    monotone trend", and gains power exactly when the order is real).

    J = Σ_{i<j} U(g_i, g_j) over the given order, U counting
    (x from g_i) < (y from g_j) pairs with ties at ½. Kept DOUBLED so
    everything is integer: per distinct value v,

        2·U contribution = Σ_{i<j} [ 2·c_j(v)·cumlt_i(v) + c_i(v)·c_j(v) ]

    with cumlt the strictly-below cumulative count — one distinct-value
    window pass, the K(K−1)/2 pair terms unrolled into a single
    expression (K is small by contract: priority classes, severity
    bands). The window is a global ORDER BY — single-partition by
    construction — so its input is bounded by VALUE CARDINALITY:
    callers pre-quantize near-continuous columns (the mann_whitney_u
    contract; feeding raw row-grain values re-creates the
    one-task-sorts-everything trap). All sums ride DECIMAL(38,0); `jt_scaled` =
    floor(2U / (2·Σ_{i<j} n_i·n_j) · scale) is the trend effect size
    in [0, scale] (scale/2 = no trend) by exact integral DIV.

    Returns ONE row: (n, j2, pairs2, jt_scaled); j2/pairs2 are BIGINT
    (≤ n², fits int64 below ~3e9 rows — the r10 portable-surface
    rule)."""
    from pyspark.sql import Window

    if len(ordered_groups) < 3:
        raise ValueError(
            "jonckheere_trend needs >= 3 ordered groups (use "
            "mann_whitney_u for two)"
        )
    g = F.col(group_col)
    ks = list(range(len(ordered_groups)))
    tagged = df.filter(g.isin(list(ordered_groups))).select(
        F.col(value_col).alias("__v"),
        *[
            (g == F.lit(ordered_groups[i])).cast("long").alias(f"__c{i}")
            for i in ks
        ],
    )
    pts = tagged.groupBy("__v").agg(
        *[F.sum(f"__c{i}").alias(f"__c{i}") for i in ks]
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    cum = pts.select(
        "__v",
        *[F.col(f"__c{i}").cast(dec).alias(f"c{i}") for i in ks],
        *[
            (F.sum(f"__c{i}").over(w) - F.col(f"__c{i}"))
            .cast(dec)
            .alias(f"lt{i}")
            for i in ks
        ],
    )
    contrib = None
    for i in ks:
        for j in ks:
            if i < j:
                term = (
                    F.lit(2).cast(dec) * F.col(f"c{j}") * F.col(f"lt{i}")
                    + F.col(f"c{i}") * F.col(f"c{j}")
                )
                contrib = term if contrib is None else contrib + term
    sums = cum.agg(
        F.sum(contrib).alias("__j2"),
        *[F.sum(f"c{i}").alias(f"__n{i}") for i in ks],
    )
    npairs = None
    for i in ks:
        for j in ks:
            if i < j:
                t = F.col(f"__n{i}") * F.col(f"__n{j}")
                npairs = t if npairs is None else npairs + t
    tot = None
    for i in ks:
        tot = F.col(f"__n{i}") if tot is None else tot + F.col(f"__n{i}")
    return sums.select(
        tot.cast("long").alias("n"),
        # j2/pairs2 published as BIGINT (r10 portable-surface rule):
        # both are <= 2·Σ n_i·n_j <= n², inside int64 for n <= ~3e9
        # rows; the decimal accumulation above stays exact.
        F.col("__j2").cast("long").alias("j2"),
        (F.lit(2).cast(dec) * npairs).cast("long").alias("pairs2"),
        (F.col("__j2") * F.lit(scale)).alias("__num"),
        (F.lit(2).cast(dec) * npairs).cast(dec).alias("__pairs2d"),
    ).selectExpr(
        "n",
        "j2",
        "pairs2",
        "CAST(__num DIV __pairs2d AS BIGINT) AS jt_scaled",
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal–Wallis H, exact-ingredient: the K-group rank ANOVA —
    "does ANY group's value distribution sit elsewhere" — completing
    the nonparametric family (:func:`mann_whitney_u` = 2 groups,
    :func:`jonckheere_trend` = ordered alternative, this = omnibus).

    Exactness scheme: tie-averaged DOUBLED ranks at distinct-value
    grain (the mann_whitney device — and like mann_whitney, the rank
    window is a global ORDER BY over distinct values: single-partition
    by construction, so callers must pre-quantize near-continuous
    columns to keep the window input value-cardinality-bounded, never
    row-count-bounded), so every per-group rank sum R2_g
    and the tie term Σ(t³−t) are exact DECIMAL(38,0); the statistic

        H = 3·Σ_g R2_g²/n_g / (N(N+1)) − 3(N+1)
        H_corrected = H / (1 − Σ(t³−t)/(N³−N))

    leaves exact arithmetic only through correctly-rounded double
    casts, with the K per-group terms folded LEFT-TO-RIGHT in
    group-sorted order (the cramers_v device) — bit-identical in any
    engine that mirrors the fold (wide decimal→double casts go through
    the VARCHAR round-trip on the oracle side).

    Returns ONE row: (n, n_groups, ties_cubed, h, h_corrected);
    h_corrected is NULL when every value is tied (zero variance).
    ties_cubed is published as STRING — Σ(t³−t) exceeds int64 once a
    tie run passes ~2.1e6 rows, so the exact integer travels as its
    digit string (the r10 portable-surface rule)."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    cells = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).groupBy("__v", "__g").agg(F.count(F.lit(1)).alias("__c"))
    runs = cells.groupBy("__v").agg(F.sum("__c").alias("__run"))
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = runs.select(
        "__v",
        F.col("__run").cast(dec).alias("__run"),
        (
            F.lit(2).cast(dec) * F.sum("__run").over(w).cast(dec)
            - F.col("__run").cast(dec)
            + 1
        ).alias("__avg2"),
    )
    per_group = (
        cells.join(ranked, "__v")
        .groupBy("__g")
        .agg(
            F.sum(F.col("__c").cast(dec)).alias("__n"),
            F.sum(F.col("__c").cast(dec) * F.col("__avg2")).alias("__r2"),
        )
    )
    ties = runs.agg(
        F.sum(
            F.col("__run").cast(dec) * F.col("__run") * F.col("__run")
            - F.col("__run")
        ).alias("__t3")
    )
    arr = per_group.agg(
        F.sort_array(
            F.collect_list(F.struct("__g", "__n", "__r2"))
        ).alias("__gs"),
        F.sum("__n").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    ).crossJoin(ties)
    s = F.aggregate(
        F.transform(
            F.col("__gs"),
            lambda g: (g["__r2"] * g["__r2"]).cast("double")
            / g["__n"].cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nd = F.col("__N").cast("double")
    nn1 = (F.col("__N") * (F.col("__N") + 1)).cast("double")
    h = F.lit(3.0) * s / nn1 - F.lit(3.0) * (nd + F.lit(1.0))
    n3n = (
        F.col("__N") * F.col("__N") * F.col("__N") - F.col("__N")
    ).cast("double")
    corr = F.lit(1.0) - F.col("__t3").cast("double") / n3n
    return arr.select(
        F.col("__N").cast("long").alias("n"),
        "n_groups",
        # ties_cubed published as STRING (r10 portable-surface rule):
        # Σ(t³−t) genuinely exceeds int64 once a tie run passes ~2.1e6
        # rows (reachable on low-cardinality columns at scale), so the
        # exact integer travels as its decimal digit string; the
        # internal DECIMAL(38,0) term feeding h_corrected is unchanged.
        F.col("__t3").cast(dec).cast("string").alias("ties_cubed"),
        h.alias("h"),
        F.when(corr > 0, h / corr).alias("h_corrected"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum), EXACT with tie-averaged
    ranks: the nonparametric two-sample location test — "do group A's
    values stochastically dominate group B's". Returns ONE row:
    (n_a, n_b, u2_a, u2_b, auc_scaled) where u2_* = 2*U_* (kept DOUBLED
    so tie-averaged half-ranks stay INTEGER: for a tie run occupying
    ranks f..l, each member's doubled average rank is f+l =
    2*cum_before + run + 1) and auc_scaled = floor(U_a/(n_a*n_b) *
    scale) — the common-language effect size / ROC-AUC equivalence,
    floor-scaled by exact integral DIV.

    Shape: one aggregation to DISTINCT-VALUE grain, one ordered window
    for cumulative counts (tie runs collapse to one row each), one
    final sum — rank sums ride DECIMAL(38,0), no float anywhere; the
    published u2_* are BIGINT (2U ≤ 2·n_a·n_b fits int64 below ~2.1e9
    rows per arm — the r10 portable-surface rule).
    Identity 2*U_a + 2*U_b = 2*n_a*n_b is asserted by the tests."""
    from pyspark.sql import Window

    g = F.col(group_col)
    tagged = df.filter(g.isin([group_a, group_b])).select(
        F.col(value_col).alias("__v"),
        (g == F.lit(group_a)).cast("long").alias("__a"),
        (g == F.lit(group_b)).cast("long").alias("__b"),
    )
    pts = tagged.groupBy("__v").agg(
        F.sum("__a").alias("__na_v"), F.sum("__b").alias("__nb_v")
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    run = (F.col("__na_v") + F.col("__nb_v")).cast(dec)
    cumall = (F.sum("__na_v").over(w) + F.sum("__nb_v").over(w)).cast(dec)
    # doubled average rank of every member of this value's tie run
    avg2 = F.lit(2).cast(dec) * cumall - run + 1
    sums = pts.select(
        F.col("__na_v"),
        F.col("__nb_v"),
        (F.col("__na_v").cast(dec) * avg2).alias("__r2a_v"),
    ).agg(
        F.sum("__na_v").cast("long").alias("n_a"),
        F.sum("__nb_v").cast("long").alias("n_b"),
        F.sum("__r2a_v").alias("__r2a"),
    )
    dnab = "(CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))"
    return sums.select(
        "n_a",
        "n_b",
        # u2_* published as BIGINT (r10 portable-surface rule):
        # 2U <= 2·n_a·n_b fits int64 while both sides stay under
        # ~2.1e9 rows; the rank sums above ride exact DECIMAL.
        F.expr(
            "CAST(__r2a - CAST(n_a AS DECIMAL(38,0))"
            " * (CAST(n_a AS DECIMAL(38,0)) + 1) AS BIGINT)"
        ).alias("u2_a"),
        F.expr(
            f"CAST(2 * {dnab} - (__r2a - CAST(n_a AS DECIMAL(38,0))"
            " * (CAST(n_a AS DECIMAL(38,0)) + 1)) AS BIGINT)"
        ).alias("u2_b"),
        F.expr(
            f"CAST(((__r2a - CAST(n_a AS DECIMAL(38,0))"
            f" * (CAST(n_a AS DECIMAL(38,0)) + 1)) * {scale})"
            f" DIV (2 * {dnab}) AS BIGINT)"
        ).alias("auc_scaled"),
    )


def cuped_adjusted_stats(
    units: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    salt: int = 0,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) — the
    industry-standard A/B sensitivity boost: adjust each unit's metric
    by its pre-experiment covariate, ŷ = y − θ·(x − x̄), with
    θ = cov(x,y)/var(x) estimated POOLED (the covariate predates
    assignment, so pooling is unbiased). Returns ONE row: sizes, θ,
    raw and adjusted means/variances per arm, and the adjusted lift —
    the variance columns show how much standard error the covariate
    bought.

    Determinism: one aggregation collects per-arm EXACT decimal
    sufficient sums (n, Σx, Σy, Σx², Σxy, Σy² — products in
    DECIMAL(37,8)); θ and every adjusted statistic are fixed double
    expression trees over those sums — θ = (nΣxy − ΣxΣy)/(nΣx² − Σx²)
    (the (n−1) normalizations cancel in the ratio), so the oracle
    hash-checks the full finalization. Arms are
    ``assign_variant(key, 2, salt)``. One shuffle (the per-arm
    aggregation); the two arm rows merge in a one-row agg."""
    v = assign_variant(key_col, 2, salt=salt)
    dec = "decimal(18,4)"
    per = units.select(
        v.alias("variant"),
        F.col(x_col).cast(dec).alias("__x"),
        F.col(y_col).cast(dec).alias("__y"),
    )
    arm = per.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    side = lambda c, a: F.max(F.when(F.col("variant") == a, F.col(c)))  # noqa: E731
    one = arm.agg(
        *[
            side(c, a).alias(f"{c}{a}")
            for a in (0, 1)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ]
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n0, n1 = d("n0"), d("n1")
    n = n0 + n1
    sx = d("sx0") + d("sx1")
    sy = d("sy0") + d("sy1")
    sxx = d("sxx0") + d("sxx1")
    sxy = d("sxy0") + d("sxy1")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mean_x = sx / n
    out_cols = [
        F.col("n0").alias("n_a"),
        F.col("n1").alias("n_b"),
        theta.alias("theta"),
    ]
    adj_means = {}
    for a in (0, 1):
        na = d(f"n{a}")
        mx = d(f"sx{a}") / na
        my = d(f"sy{a}") / na
        var_y = (na * d(f"syy{a}") - d(f"sy{a}") * d(f"sy{a}")) / (
            na * (na - F.lit(1.0))
        )
        cov = (na * d(f"sxy{a}") - d(f"sx{a}") * d(f"sy{a}")) / (
            na * (na - F.lit(1.0))
        )
        var_x = (na * d(f"sxx{a}") - d(f"sx{a}") * d(f"sx{a}")) / (
            na * (na - F.lit(1.0))
        )
        m_adj = my - theta * (mx - mean_x)
        v_adj = var_y - F.lit(2.0) * theta * cov + theta * theta * var_x
        lab = "a" if a == 0 else "b"
        adj_means[a] = m_adj
        out_cols += [
            my.alias(f"mean_{lab}"),
            m_adj.alias(f"mean_adj_{lab}"),
            var_y.alias(f"var_{lab}"),
            v_adj.alias(f"var_adj_{lab}"),
        ]
    out_cols.append((adj_means[1] - adj_means[0]).alias("lift_adj"))
    return one.select(*out_cols)


def ks_statistic_grouped(
    df: DataFrame,
    strat_col: str,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-stratum two-sample KS: :func:`ks_statistic` evaluated
    independently inside every value of ``strat_col`` — the segmented
    drift screen ("which brands' return-price distributions actually
    shifted") that one pooled statistic averages away. Returns one row
    per stratum: (stratum, n_a, n_b, ks_scaled).

    Same exactness contract as the pooled form (DECIMAL cross-product
    ECDF gaps, floor-scaled result); the cumulative window partitions
    by stratum, so every group's point set sorts independently —
    shuffle stays at (stratum, distinct value) grain."""
    from pyspark.sql import Window

    g = F.col(group_col)
    tagged = df.filter(g.isin([group_a, group_b])).select(
        F.col(strat_col).alias("stratum"),
        F.col(value_col).alias("__v"),
        (g == F.lit(group_a)).cast("long").alias("__a"),
        (g == F.lit(group_b)).cast("long").alias("__b"),
    )
    pts = tagged.groupBy("stratum", "__v").agg(
        F.sum("__a").alias("__na_v"), F.sum("__b").alias("__nb_v")
    )
    w = (
        Window.partitionBy("stratum")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pts.select(
        "stratum",
        F.sum("__na_v").over(w).alias("__ca"),
        F.sum("__nb_v").over(w).alias("__cb"),
    )
    tot = cum.groupBy("stratum").agg(
        F.max("__ca").cast("long").alias("n_a"),
        F.max("__cb").cast("long").alias("n_b"),
    )
    dec = "decimal(38,0)"
    gap = F.abs(
        F.col("__ca").cast(dec) * F.col("n_b").cast(dec)
        - F.col("__cb").cast(dec) * F.col("n_a").cast(dec)
    )
    return (
        cum.join(F.broadcast(tot), "stratum")
        .groupBy("stratum")
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(gap).alias("__dnum"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "stratum",
            "n_a",
            "n_b",
            F.expr(
                f"CAST((__dnum * {scale}) DIV (CAST(n_a AS DECIMAL(38,0))"
                " * CAST(n_b AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("ks_scaled"),
        )
    )


def did_estimate(
    df: DataFrame,
    key_col: str,
    metric_col: str,
    time_col: str,
    cutoff: str,
    *,
    salt: int = 0,
) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES: the 2×2 (pre/post × control/treat)
    mean table and the DiD estimate (Δtreat − Δcontrol) — the causal
    workhorse when a launch can't be user-randomized cleanly and
    parallel pre-trends stand in for exchangeability. Arms come from
    ``assign_variant`` (so this doubles as the A/B sanity check: a
    randomized experiment's DiD should match its plain lift within
    noise). Returns ONE row: the four cell means, both deltas, and
    ``did``.

    Determinism: one pass of EIGHT conditional decimal sums (cell
    sums/counts); every mean and difference is a fixed double
    expression over those exact sums — oracle hash-checked. Shape: one
    aggregation, no joins."""
    v = assign_variant(key_col, 2, salt=salt)
    post = F.col(time_col) >= F.lit(cutoff).cast("timestamp")
    dec = F.col(metric_col).cast("decimal(18,4)")
    cells = {}
    aggs = []
    for arm in (0, 1):
        for per in (0, 1):
            cond = (v == arm) & (post if per else ~post)
            aggs += [
                F.sum(F.when(cond, dec)).alias(f"__s{arm}{per}"),
                F.sum(cond.cast("long")).alias(f"__n{arm}{per}"),
            ]
    one = df.agg(*aggs)
    m = {
        (arm, per): F.col(f"__s{arm}{per}").cast("double")
        / F.col(f"__n{arm}{per}").cast("double")
        for arm in (0, 1)
        for per in (0, 1)
    }
    d_c = m[(0, 1)] - m[(0, 0)]
    d_t = m[(1, 1)] - m[(1, 0)]
    return one.select(
        F.col("__n00").alias("n_control_pre"),
        F.col("__n01").alias("n_control_post"),
        F.col("__n10").alias("n_treat_pre"),
        F.col("__n11").alias("n_treat_post"),
        m[(0, 0)].alias("mean_control_pre"),
        m[(0, 1)].alias("mean_control_post"),
        m[(1, 0)].alias("mean_treat_pre"),
        m[(1, 1)].alias("mean_treat_post"),
        d_c.alias("delta_control"),
        d_t.alias("delta_treat"),
        (d_t - d_c).alias("did"),
    )


def standardized_comparison(
    df: DataFrame,
    strat_col: str,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 4,
) -> DataFrame:
    """DIRECT STANDARDIZATION (stratified comparison): compare two
    groups' mean outcome after reweighting every stratum to the POOLED
    stratum distribution — the observational-data counterpart of
    randomization that removes confounding by the stratifier (Simpson's
    -paradox insurance: raw means can order one way while every
    stratum orders the other). Returns ONE row: (n_a, n_b, mean_a_raw,
    mean_b_raw, mean_a_std, mean_b_std, lift_raw, lift_std).

    Exactness: per-(stratum, group) decimal sums in one aggregation;
    standardized means are Σ_s w_s·mean_{s,g} with w_s = pooled
    stratum share, evaluated as ONE fixed double expression via a
    stratum-ORDERED array fold (sorted by stratum key, the
    deterministic-fold discipline) — oracle hash-checkable. Strata
    missing a group contribute that group's pooled... they are
    EXCLUDED from both sides (the standard common-support
    restriction), so both standardized means weight the same strata."""
    g = F.col(group_col)
    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    cells = (
        df.filter(g.isin([group_a, group_b]))
        .groupBy(F.col(strat_col).alias("__s"))
        .agg(
            F.sum(F.when(g == group_a, dec)).alias("__sa"),
            F.sum(F.when(g == group_a, F.lit(1)).otherwise(0)).cast(
                "long"
            ).alias("__na"),
            F.sum(F.when(g == group_b, dec)).alias("__sb"),
            F.sum(F.when(g == group_b, F.lit(1)).otherwise(0)).cast(
                "long"
            ).alias("__nb"),
        )
        .filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    )
    one = cells.agg(
        F.array_sort(
            F.collect_list(
                F.struct("__s", "__sa", "__na", "__sb", "__nb")
            )
        ).alias("__c")
    )
    arr = F.col("__c")
    tot = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, x: acc + x["__na"] + x["__nb"],
    ).cast("double")
    def std_mean(sfld, nfld):
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, x: acc
            + (
                (x["__na"] + x["__nb"]).cast("double")
                * (x[sfld].cast("double") / x[nfld].cast("double"))
            ),
        ) / tot
    na = F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x["__na"]
    )
    nb = F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x["__nb"]
    )
    sa = F.aggregate(
        arr,
        F.lit(0).cast("decimal(28,4)"),
        lambda acc, x: (acc + x["__sa"]).cast("decimal(28,4)"),
    )
    sb = F.aggregate(
        arr,
        F.lit(0).cast("decimal(28,4)"),
        lambda acc, x: (acc + x["__sb"]).cast("decimal(28,4)"),
    )
    mean_a_raw = sa.cast("double") / na.cast("double")
    mean_b_raw = sb.cast("double") / nb.cast("double")
    ma = std_mean("__sa", "__na")
    mb = std_mean("__sb", "__nb")
    return one.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        mean_a_raw.alias("mean_a_raw"),
        mean_b_raw.alias("mean_b_raw"),
        ma.alias("mean_a_std"),
        mb.alias("mean_b_std"),
        (mean_a_raw - mean_b_raw).alias("lift_raw"),
        (ma - mb).alias("lift_std"),
    )
