"""Deterministic splitting and sampling for training-data pipelines.

The split must be a pure function of the row KEY — not of partitioning,
row order, or an RNG stream — so that (a) re-runs and backfills land every
row in the same split, (b) any engine computes the same assignment (the
DuckDB oracle reproduces it exactly), and (c) adding data never reshuffles
existing rows between splits. ``df.randomSplit`` guarantees none of these.

Mechanism: md5 of the key rendered as lowercase hex, compared against a
hex threshold on the first 8 nibbles — uniform over keys, identical in
any engine with an md5 function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(frac: float) -> str:
    """First-8-nibble hex threshold t such that P(md5_prefix < t) = frac.

    frac=1.0 maps to 'g': format() would give the 9-char '100000000',
    which sorts BEFORE most 8-char hex prefixes lexicographically and
    would silently empty the selection; 'g' sorts after every hex digit,
    so `prefix < 'g'` keeps every row in any engine."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0,1], got {frac}")
    if frac >= 1.0:
        return "g"
    return format(int(frac * 16**8), "08x")


def split_column(key_col: Column | str, test_frac: float) -> Column:
    """'test' iff the md5 prefix of the key falls below the threshold."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    prefix = F.substring(F.md5(c.cast("string")), 1, 8)
    return F.when(
        prefix < F.lit(_hex_threshold(test_frac)), F.lit("test")
    ).otherwise(F.lit("train"))


def train_test_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1
) -> DataFrame:
    """Append a deterministic 'split' column ('train' / 'test')."""
    return df.withColumn("split", split_column(key_col, test_frac))


def deterministic_sample(
    df: DataFrame, key_col: str, frac: float
) -> DataFrame:
    """Key-deterministic sample: the same keys are selected on every run
    and every engine (unlike ``df.sample``, whose RNG is partition- and
    seed-dependent)."""
    c = F.col(key_col)
    prefix = F.substring(F.md5(c.cast("string")), 1, 8)
    return df.filter(prefix < F.lit(_hex_threshold(frac)))


def cap_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Keep at most ``k`` rows per group — the per-domain cap every crawl
    pipeline applies so no single source dominates the corpus.

    Which k rows survive is decided by ranking on the md5 of the key
    (with the key itself as tie-break), i.e. a uniform, deterministic
    shuffle within each group: re-runs and engines agree, and the kept
    set is stable as other groups grow. One hash-partitioned window per
    group; groups are independent so the hot-group ceiling is k."""
    from pyspark.sql import Window

    c = F.col(key_col)
    w = Window.partitionBy(group_col).orderBy(
        F.md5(c.cast("string")), c
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain-mixing resample: keep each row with a per-stratum rate
    (e.g. downweight crawl English, keep all low-resource languages).

    Same md5-threshold mechanism as :func:`deterministic_sample`, so the
    kept set is a pure function of (key, stratum-rate): reruns, engines
    and backfills agree row-for-row, and changing one stratum's rate
    only adds/removes rows of that stratum. The threshold CASE is pure
    codegen — a 100 TB scan filters at parquet speed with no shuffle.
    """
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    threshold: Column | None = None
    for stratum in sorted(rates):
        cond = F.col(strata_col) == stratum
        lit = F.lit(_hex_threshold(rates[stratum]))
        threshold = (
            F.when(cond, lit) if threshold is None else threshold.when(cond, lit)
        )
    default = F.lit(_hex_threshold(default_rate))
    threshold = default if threshold is None else threshold.otherwise(default)
    return df.filter(prefix < threshold)


def match_distribution(
    df: DataFrame,
    key_col: str,
    group_col: str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Resample so the GROUP DISTRIBUTION matches a target — the corpus
    rebalancing step of mixture design ("make the language mix uniform" /
    "match the reference corpus shares") as a deterministic filter.

    For target share ``t_g`` (default: uniform over the groups present),
    the largest achievable matched sample keeps ``M = min_g(n_g / t_g)``
    rows in expectation, i.e. per-group keep rate ``r_g = M * t_g /
    n_g`` — the binding group (smallest ``n_g/t_g``) keeps everything,
    every other group downsamples to match. Rates derive from ONE
    O(groups) count aggregate broadcast back; the accept test is
    ``knuth_uniform(key) < r_g`` (key-pure — reruns/engines/backfills
    agree row-for-row, and adding data only moves the binding ratio).
    Groups absent from ``target_shares`` are dropped (share 0).

    Returns the kept rows with all input columns. The realized counts
    are binomial around ``M * t_g``; exact-count matching would need a
    per-group rank (a sort) — this is the scan-speed variant."""
    if target_shares is None:
        counts = df.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        m = counts.agg(F.min("__n").alias("__n_min"))
        rates = counts.crossJoin(F.broadcast(m)).select(
            group_col,
            (
                F.col("__n_min").cast("double")
                / F.col("__n").cast("double")
            ).alias("__rate"),
        )
    else:
        total = sum(target_shares.values())
        if total <= 0:
            raise ValueError("target_shares must sum to > 0")
        shares: Column | None = None
        for g in sorted(target_shares):
            cond = F.col(group_col) == g
            lit = F.lit(target_shares[g] / total)
            shares = (
                F.when(cond, lit)
                if shares is None
                else shares.when(cond, lit)
            )
        share_col = shares.otherwise(F.lit(0.0))
        counts = df.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        with_share = counts.select(
            group_col, "__n", share_col.alias("__share")
        ).filter(F.col("__share") > 0)
        m = with_share.agg(
            F.min(
                F.col("__n").cast("double") / F.col("__share")
            ).alias("__m")
        )
        rates = with_share.crossJoin(F.broadcast(m)).select(
            group_col,
            F.least(
                F.lit(1.0),
                F.col("__m")
                * F.col("__share")
                / F.col("__n").cast("double"),
            ).alias("__rate"),
        )
    return (
        df.join(F.broadcast(rates), group_col, "inner")
        .filter(knuth_uniform(key_col) < F.col("__rate"))
        .drop("__rate")
    )


#: Knuth's multiplicative-hash constant (golden-ratio prime) and the
#: 32-/16-bit moduli of the overflow-safe schoolbook multiply below.
_KNUTH_A = 2654435761
_M32 = 4294967296
_M16 = 65536


def knuth_uniform(key_col: Column | str) -> Column:
    """Deterministic uniform in [0, 1) from an integer key via the Knuth
    multiplicative hash — pure BIGINT arithmetic plus one exact double
    division, so every SQL engine computes the identical value (unlike
    engine-specific hash functions or md5-prefix string orderings).

    Defined for the FULL int64 key domain, negatives included: the key is
    first reduced to ``kr = pmod(key, 2^32)``, then ``(kr * A) mod 2^32``
    is computed with a 16-bit-split schoolbook multiply —
    ``((hi*A mod 2^16) * 2^16 + lo*A) mod 2^32`` with ``hi = kr >> 16``,
    ``lo = kr & 0xffff`` — whose largest intermediate is
    ``65535 * A ≈ 1.74e14``, far inside int64, so neither ANSI mode nor
    DuckDB can overflow. For ``0 <= key < 2^32`` the value is bit-identical
    to the naive ``(key * A) mod 2^32``."""
    return _knuth_u32(key_col).cast("double") / F.lit(float(_M32))


def _knuth_u32(key_col: Column | str) -> Column:
    """The integer core of :func:`knuth_uniform`: ``(pmod(key, 2^32) * A)
    mod 2^32`` as a BIGINT column in [0, 2^32) — shared by the uniform
    and by :func:`priority_sample`'s (0, 1] variant."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    k = k.cast("long")
    kr = ((k % F.lit(_M32)) + F.lit(_M32)) % F.lit(_M32)
    hi = F.shiftright(kr, 16)
    lo = kr.bitwiseAND(F.lit(_M16 - 1))
    prod = ((hi * F.lit(_KNUTH_A)) % F.lit(_M16)) * F.lit(_M16) + lo * F.lit(
        _KNUTH_A
    )
    return prod % F.lit(_M32)


def sqrt_temperature_rates(
    df: DataFrame, domain_col: str
) -> DataFrame:
    """Per-domain keep rates for temperature alpha=0.5 mixing (the XLM-R
    style rebalance: sample domains ∝ n^alpha, here realized as the
    largest feasible per-row Bernoulli rates): the smallest domain keeps
    everything and domain d keeps ``sqrt(n_min / n_d)`` — high-resource
    domains are downsampled toward the square-root mixture.

    Exactness contract: the rate is one integer division + one ``sqrt``
    (both correctly-rounded IEEE everywhere) — deliberately NOT
    ``pow(n, alpha-1)``, whose rounding is engine-specific. Returns
    (domain, n_orig, keep_rate); O(domains) rows."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_orig"))
    n_min = counts.agg(F.min("n_orig").alias("__n_min"))
    return counts.crossJoin(F.broadcast(n_min)).select(
        domain_col,
        "n_orig",
        F.sqrt(
            F.col("__n_min").cast("double") / F.col("n_orig").cast("double")
        ).alias("keep_rate"),
    )


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic training-shard assignment: shard =
    ``floor(knuth_uniform(id) * n_shards)`` — a pure function of the id,
    so re-exports, engines, and resumed jobs place every document in the
    same shard; the multiplicative hash scatters contiguous crawl-id
    ranges uniformly (a bare ``id % n`` would stripe correlated
    neighbors into lock-step shards); the downstream write is just
    ``partitionBy("shard")``, no coordination."""
    shard = F.floor(knuth_uniform(id_col) * F.lit(float(n_shards)))
    return df.withColumn("shard", shard.cast("long"))


def sqrt_temperature_sample(
    df: DataFrame, id_col: str, domain_col: str
) -> DataFrame:
    """Temperature alpha=0.5 domain mixing with corpus-DERIVED rates
    (:func:`stratified_sample` is its fixed-rate counterpart): keep row
    iff ``knuth_uniform(id) < keep_rate(domain)``. The rate table is
    O(domains) and broadcasts; the corpus side filters at scan speed
    with no shuffle beyond the tiny counts aggregate."""
    rates = sqrt_temperature_rates(df, domain_col)
    return df.join(
        F.broadcast(rates.select(domain_col, "keep_rate")), domain_col
    ).filter(knuth_uniform(id_col) < F.col("keep_rate"))


def priority_sample(
    df: DataFrame, key_col: str, weight_col: Column | str, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement via PRIORITY
    SAMPLING (Duffield, Lund & Thorup, JACM 2007): each row gets
    priority ``w / u`` with ``u`` a key-derived uniform in (0, 1], and
    the sample is the top-``k`` priorities — heavy rows enter almost
    surely, light rows proportionally to weight, and the scheme admits
    the unbiased subset-sum estimator of
    :func:`priority_sample_estimate`.

    Chosen over the classic A-ES weighted reservoir (``u^(1/w)``)
    deliberately: ``pow`` is libm-specific and breaks cross-engine
    bit-equality, while priority needs only IEEE-exact division — so
    the sample is reproducible on ANY engine from (key, weight) alone,
    the same key-pure contract as the rest of this module (no sampler
    state, re-runs and backfills pick identical rows). Plans as
    TakeOrderedAndProject: per-partition heap + driver merge of
    k·partitions rows, never a global sort."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u_pos = (_knuth_u32(key_col) + F.lit(1)).cast("double") / F.lit(
        float(_M32)
    )
    out = df.withColumn("priority", w.cast("double") / u_pos)
    return out.orderBy(F.col("priority").desc(), F.col(key_col)).limit(k)


def priority_sample_estimate(
    df: DataFrame, key_col: str, weight_col: Column | str, k: int
) -> DataFrame:
    """The unbiased total-weight estimator over a priority sample: with
    ``tau`` the (k+1)-th largest priority, ``sum(max(w, tau))`` over the
    top-``k`` rows estimates the population's total weight (ibid.).
    Returns one row (n_sampled, threshold, est_total). All heavy
    lifting is the same top-(k+1) heap; the estimator arithmetic runs
    over k+1 rows and accumulates in DECIMAL for engine-exactness."""
    from pyspark.sql import Window

    topk1 = priority_sample(df, key_col, weight_col, k + 1).select(
        F.col(key_col),
        (
            F.col(weight_col) if isinstance(weight_col, str) else weight_col
        ).cast("double").alias("__w"),
        "priority",
    )
    w_rank = Window.orderBy(F.col("priority").desc(), F.col(key_col))
    ranked = topk1.withColumn("__rn", F.row_number().over(w_rank))
    tau_df = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == k + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("__tau")
    )
    return (
        ranked.filter(F.col("__rn") <= k)
        .crossJoin(F.broadcast(tau_df))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.min("__tau").alias("threshold"),
            F.sum(
                F.greatest(F.col("__w"), F.col("__tau")).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("est_total"),
        )
    )


def priority_sample_per_group(
    df: DataFrame,
    group_cols,
    key_col: str,
    weight_col: Column | str,
    k: int,
) -> DataFrame:
    """Per-group weighted sampling without replacement (r6): the
    grouped form of :func:`priority_sample` — within every
    ``group_cols`` combination, keep the top-``k`` rows by the same
    key-pure ``w / u`` priority. The training-data use case is
    per-domain / per-language exemplar selection where a global top-k
    would starve small groups.

    Same engine-exact contract (IEEE division over the Knuth uniform,
    no sampler state — identical rows on any engine and any re-run);
    plans as ONE hash shuffle on the group keys + per-partition window
    rank, no global sort. Ties (identical priorities) break by key for
    cross-engine determinism.
    """
    from pyspark.sql import Window

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u_pos = (_knuth_u32(key_col) + F.lit(1)).cast("double") / F.lit(
        float(_M32)
    )
    win = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("priority").desc(), F.col(key_col)
    )
    return (
        df.withColumn("priority", w.cast("double") / u_pos)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def bottomk_sample(
    df: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Bottom-k (KMV) sampling (r7): the k rows with the smallest
    key-pure priority ``knuth_uniform(id)`` — a uniform k-row sample
    with the property that makes it MERGEABLE STATE: bottom-k of a
    union equals bottom-k over the union of the parts' bottom-k
    partials, EXACTLY (an element of the union's true bottom-k is in
    its own part's bottom-k a fortiori). So per-slice/per-batch
    partials of size k merge losslessly to the one-pass answer — the
    SAMPLE member of the mergeable-state family next to the decimal
    aggregates, CMS and HLL — and everything is deterministic
    (key-pure priorities, id tie-break), hence partition-invariant
    and SQL-oracle-checkable, unlike rand()-based sampling.

    Plan: one ``TakeOrderedAndProject`` (per-partition k-heaps, no
    global sort). Ties in the priority break by id, so the sample is
    a pure function of the id set."""
    pri = knuth_uniform(F.col(id_col))
    return df.orderBy(pri.asc(), F.col(id_col).asc()).limit(int(k))


def merge_bottomk(
    partials: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Merge bottom-k partials (any number, any slicing): union rows
    are re-ranked by the same key-pure priority and the global
    bottom-k survives — bit-identical to one pass over the union
    (parity-tested)."""
    return bottomk_sample(partials, id_col, k)


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Variance-optimal stratified sample sizes (Neyman allocation):
    n_h ∝ N_h·S_h — strata that are bigger OR more variable get more
    of the budget, the estimator-variance-minimizing split every
    survey/eval-sampling pipeline wants instead of proportional
    allocation.

    Per-stratum moments come from ONE hash aggregation with exact
    decimal sums (the ``variant_stats`` discipline), so S_h is a pure
    function of the data; the quota math (largest-remainder a.k.a.
    Hamilton rounding, so allocations are integers summing exactly to
    ``total_n``) runs on windows over the O(strata) aggregate — no
    second data pass, nothing driver-side. Single-row or zero-variance
    strata weigh 0 (their sample tells you nothing new); every
    floating step is a single op on engine-identical inputs, so the
    result is bit-stable across engines. Allocations are finally
    clamped to the stratum's population (``alloc_n <= n_rows``;
    the shortfall is NOT redistributed — the contract stays one-pass
    deterministic, and the gap is visible in the output).

    Returns (stratum, n_rows, std_value, alloc_n)."""
    if total_n <= 0:
        raise ValueError("neyman_allocation: total_n must be positive")
    from pyspark.sql import Window

    d = F.col(value_col).cast("decimal(18,4)")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(d).alias("__s"),
        F.sum(d * d).alias("__ss"),
    )
    nn = F.col("n_rows").cast("double")
    sd = F.col("__s").cast("double")
    ssd = F.col("__ss").cast("double")
    var = (nn * ssd - sd * sd) / (nn * (nn - F.lit(1.0)))
    std = F.when(
        F.col("n_rows") > 1,
        F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    weighted = per.select(
        "stratum",
        "n_rows",
        std.alias("std_value"),
        (nn * std).alias("__w"),
    )
    all_w = Window.orderBy("stratum").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quota = (
        F.lit(float(total_n))
        * F.col("__w")
        / F.sum("__w").over(all_w)
    )
    with_quota = weighted.select(
        "stratum",
        "n_rows",
        "std_value",
        F.when(F.sum("__w").over(all_w) > 0, quota)
        .otherwise(F.lit(0.0))
        .alias("__q"),
    )
    base = F.floor(F.col("__q")).cast("long")
    rem_rank = F.row_number().over(
        Window.orderBy(
            (F.col("__q") - F.floor(F.col("__q"))).desc(), F.col("stratum")
        )
    )
    leftover = F.lit(total_n) - F.sum(base).over(all_w)
    alloc = base + F.when(rem_rank <= leftover, F.lit(1)).otherwise(
        F.lit(0)
    )
    return with_quota.select(
        "stratum",
        "n_rows",
        "std_value",
        F.least(alloc, F.col("n_rows")).cast("long").alias("alloc_n"),
    )


def allocated_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alloc: DataFrame,
) -> DataFrame:
    """Draw each stratum's allocated sample: md5-of-key ranking within
    the stratum (the :func:`cap_per_group` shuffle — uniform,
    deterministic, engine-agreed) keeps the first ``alloc_n`` rows.
    ``alloc`` is (stratum, alloc_n) — e.g. a :func:`neyman_allocation`
    result — and broadcasts (O(strata) rows)."""
    from pyspark.sql import Window

    c = F.col(key_col)
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(c.cast("string")), c
    )
    return (
        df.join(
            F.broadcast(alloc.select(F.col("stratum").alias(stratum_col), "alloc_n")),
            stratum_col,
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("alloc_n"))
        .drop("__rn", "alloc_n")
    )


def ring_negative_samples(
    queries: DataFrame,
    items: DataFrame,
    positives: DataFrame,
    *,
    k: int,
    buffer: int = 16,
    query_col: str = "query_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every query, ``k`` pseudo-uniform catalog items that are NOT that
    query's positives — without the |queries| × |items| cross join the
    naive "rank all items per query" formulation costs.

    The hash-ring trick: items take ring positions once (Knuth-hash
    order — a uniform shuffle of the catalog), each query hashes to a
    ring START, and its candidates are the ``k + buffer`` consecutive
    ring slots from there (an EXPLODE of offsets + one equi-join on
    the slot, O(|queries|·(k+buffer)) rows). Positives inside the
    probe window leave by an anti-join and the buffer absorbs the
    holes; survivors keep ring order (neg_rank 1..k). Every step is a
    pure function of the ids — reruns, engines and backfills agree
    row-for-row, and a grown catalog only shifts rings by the new
    items.

    Ring construction is one O(|items|) global sort — the catalog is
    a dimension table by contract (parts, labels, vocabulary), not the
    corpus. Requires k + buffer <= |items| (the probe window must not
    wrap past the ring) and positives deduplicated per (query, item).
    Queries whose window is saturated by positives return fewer than
    ``k`` rows — buffer sizing is the caller's recall knob."""
    from pyspark.sql import Window

    n_items = items.select(item_col).distinct().count()
    if k + buffer > n_items:
        raise ValueError(
            f"ring_negative_samples: k+buffer={k + buffer} exceeds the "
            f"catalog size {n_items} — the probe window would wrap"
        )
    ring = items.select(item_col).distinct().select(
        item_col,
        (
            F.row_number().over(
                Window.orderBy(_knuth_u32(item_col), F.col(item_col))
            )
            - 1
        ).cast("long").alias("__slot"),
    )
    probes = queries.select(query_col).distinct().select(
        query_col,
        (_knuth_u32(query_col) % F.lit(n_items)).alias("__start"),
    ).select(
        query_col,
        F.explode(F.sequence(F.lit(0), F.lit(k + buffer - 1))).alias(
            "__off"
        ),
        "__start",
    ).select(
        query_col,
        "__off",
        ((F.col("__start") + F.col("__off")) % F.lit(n_items)).alias(
            "__slot"
        ),
    )
    cand = probes.join(ring, "__slot").join(
        positives.select(
            F.col(query_col), F.col(item_col)
        ),
        [query_col, item_col],
        "left_anti",
    )
    w = Window.partitionBy(query_col).orderBy("__off")
    return (
        cand.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= k)
        .select(query_col, item_col, "neg_rank")
    )


def sample_size_sweep(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    percents: tuple[int, ...] = (1, 2, 5, 10, 25, 50, 100),
    scale: int = 4,
) -> DataFrame:
    """Learning-curve / estimator-convergence sweep: the SAME pass
    evaluates a NESTED family of deterministic uniform samples — key
    included at percent p iff ``knuth_u32(key) < p·2³²∕100`` (exact
    integer threshold, so a key in the 5% sample is in every larger
    one by construction; no RNG state, replays bit-identically).
    Returns one row per percent: (pct, n_rows, total_value, mean_value).

    Shape: ONE scan with conditional aggregates per percent (never an
    explode — the 100 TB fact table is read once, the sweep rides the
    aggregation buffers), partial-aggregated like any sum."""
    u = _knuth_u32(key_col)
    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    aggs = []
    for p in percents:
        if not 0 < p <= 100:
            raise ValueError("percents must be in (0, 100]")
        thr = (p * 4294967296) // 100
        cond = u < F.lit(thr)
        aggs += [
            F.sum(cond.cast("long")).alias(f"__n{p}"),
            F.sum(F.when(cond, dec)).alias(f"__s{p}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"{p}L, __n{p}, CAST(__s{p} AS DOUBLE)" for p in percents
    )
    return one.selectExpr(
        f"stack({len(percents)}, {stack}) AS (pct, n_rows, total_value)"
    ).select(
        "pct",
        "n_rows",
        "total_value",
        (F.col("total_value") / F.col("n_rows").cast("double")).alias(
            "mean_value"
        ),
    )


def _rendezvous_assign(key_col, n_shards: int):
    """Rendezvous (highest-random-weight) shard id for a key: argmax
    over shards of the Knuth weight of the salt-shifted key, ties to
    the smallest shard id (first-match CASE — total order, mirrored
    verbatim in SQL oracles). The salt shift (s · 1_000_003) keeps
    every intermediate < 2^32 + n·10^6 — overflow-safe under ANSI."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    kr = ((k.cast("long") % F.lit(_M32)) + F.lit(_M32)) % F.lit(_M32)
    weights = [
        _knuth_u32(kr + F.lit(s * 1_000_003)) for s in range(n_shards)
    ]
    g = F.greatest(*weights) if n_shards > 1 else weights[0]
    expr = None
    for s, w in enumerate(weights):
        cond = w == g
        expr = (
            F.when(cond, F.lit(s))
            if expr is None
            else expr.when(cond, F.lit(s))
        )
    return expr.cast("int")


def rendezvous_rebalance_report(
    df: DataFrame,
    key_col: str,
    *,
    n_before: int = 8,
    n_after: int = 9,
    scale: int = 1_000_000,
) -> DataFrame:
    """Shard-rebalance cost audit: when a cluster grows from
    ``n_before`` to ``n_after`` shards, what fraction of keys MOVE —
    under rendezvous (highest-random-weight) hashing vs naive modulo.
    Rendezvous moves ≈ 1∕n_after of the keys (only those whose new
    shard wins the weight race); modulo reshuffles ≈ (n_after−1)∕
    n_after of everything — THE reason consistent-hashing schemes
    exist, measured on real keys. Returns ONE row: (n_keys,
    moved_rendezvous, moved_share_scaled, moved_mod,
    mod_share_scaled).

    Key-pure integer hashing (no RNG state, replays exactly); one
    scan with codegen weight races; floor-scaled integer shares."""
    before = _rendezvous_assign(key_col, n_before)
    after = _rendezvous_assign(key_col, n_after)
    k = F.col(key_col).cast("long")
    kr = ((k % F.lit(_M32)) + F.lit(_M32)) % F.lit(_M32)
    mod_moved = (kr % n_before) != (kr % n_after)
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum((before != after).cast("long"))
        .cast("long")
        .alias("moved_rendezvous"),
        F.sum(mod_moved.cast("long")).cast("long").alias("moved_mod"),
    )
    return agg.select(
        "n_keys",
        "moved_rendezvous",
        F.expr(
            f"CAST((moved_rendezvous * CAST({scale} AS BIGINT))"
            " DIV n_keys AS BIGINT)"
        ).alias("moved_share_scaled"),
        "moved_mod",
        F.expr(
            f"CAST((moved_mod * CAST({scale} AS BIGINT))"
            " DIV n_keys AS BIGINT)"
        ).alias("mod_share_scaled"),
    )


def preference_pairs(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Preference-pair mining: within every bucket pick the single
    best-scoring and worst-scoring item and emit them as a
    (chosen, rejected) pair with its score margin — the RLHF/DPO
    training-pair construction applied to a scored corpus (bucket =
    prompt/topic/language group, score = any quality signal; the
    max-margin pair per bucket is the highest-signal comparison the
    bucket supports). Buckets with fewer than two items cannot form a
    pair and are absent; a zero margin (all-tied bucket) is kept and
    reported — filtering it is a policy choice that belongs to the
    caller. NULL-scored items are EXCLUDED before pairing (Spark's
    ascending rank would otherwise pick a NULL as the 'worst' item —
    NULLS FIRST — and emit a NULL-margin pair the DuckDB oracle,
    NULLS LAST, would not), and they do not count toward n_items.

    Determinism: ties break on ascending id at BOTH ends (chosen =
    max score then MIN id; rejected = min score then MIN id, with the
    chosen item excluded so a 2-item tied bucket still yields a
    well-formed pair). Shape: two bucket-partitioned rank windows
    (streaming rank, no per-bucket materialization) and a bucket-grain
    join — scales with bucket cardinality, never bucket size.

    Returns (bucket, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, n_items)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(bucket_col).alias("bucket"),
        F.col(id_col).alias("__id"),
        F.col(score_col).alias("__s"),
    ).filter(F.col("__s").isNotNull())
    w_best = Window.partitionBy("bucket").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    ranked = base.select(
        "bucket",
        "__id",
        "__s",
        F.row_number().over(w_best).alias("__rb"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_items"),
    )
    chosen = ranked.filter(
        (F.col("__rb") == 1) & (F.col("n_items") >= 2)
    ).select(
        "bucket",
        F.col("__id").alias("chosen_id"),
        F.col("__s").alias("chosen_score"),
        "n_items",
    )
    # worst among the remaining items (chosen excluded): min score,
    # then min id — rank 1 of the ascending window over __rb > 1
    w_worst = Window.partitionBy("bucket").orderBy(
        F.col("__s").asc(), F.col("__id").asc()
    )
    rejected = (
        ranked.filter(F.col("__rb") > 1)
        .select(
            "bucket",
            "__id",
            "__s",
            F.row_number().over(w_worst).alias("__rw"),
        )
        .filter(F.col("__rw") == 1)
        .select(
            "bucket",
            F.col("__id").alias("rejected_id"),
            F.col("__s").alias("rejected_score"),
        )
    )
    return chosen.join(rejected, "bucket").select(
        "bucket",
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        F.col("n_items").cast("long").alias("n_items"),
    )


def dsir_importance_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    target_filter: Column,
    n_buckets: int = 512,
    max_grams: int | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al., "Data
    Selection for Language Models via Importance Resampling", NeurIPS
    2023) over hashed word-bigram features: fit unigram bucket models
    of the TARGET subset (rows matching ``target_filter``) and the
    full RAW corpus, then weight every raw document by its importance
    ratio p_target(doc)/p_raw(doc). Sampling raw data proportionally
    to these weights yields a corpus distributed like the target —
    the standard recipe for "more like Wikipedia, less like spam"
    pretraining mixes.

    Engine-exactness: the per-bucket smoothed ratio is ONE division
    of exact sub-2^53 integer products,
    ``((c_t+1)*(S+B)) / ((c_s+1)*(T+B))``, and the per-document
    weight is the PRODUCT of its grams' ratios folded LEFT-TO-RIGHT
    IN POSITION ORDER — the ``dirichlet_ql`` fixed-order-product
    discipline (a log-sum form would drag engine-specific ``ln``
    rounding into every weight; an ordered IEEE product is
    bit-identical everywhere, and under/overflow to 0/inf is itself
    deterministic). ``max_grams`` caps the fold at the document
    prefix (DSIR's features are already a bag sample; the cap bounds
    the product's dynamic range for pathologically long docs).

    Shape at 100 TB: bucket counts are TWO conditional aggregates in
    one pass onto a fixed ``n_buckets`` key domain (map-side combine
    absorbs the corpus); the O(n_buckets) ratio table broadcasts onto
    the exploded gram stream; the per-doc fold groups on the document
    key — one shuffle of (doc, pos, ratio) rows, the minimum for an
    order-respecting fold. Nothing is collected driver-side.
    Returns (id_col, n_grams, weight) for every raw doc with >= 1
    bigram."""
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
        word_ngrams,
    )
    from streaming_data_pipeline_azure_spark.operators.features import (
        _md5_bucket,
    )

    if n_buckets < 1:
        raise ValueError(f"dsir_importance_weights: n_buckets={n_buckets}")
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        _ensure_parallelism,
    )

    df = _ensure_parallelism(df)  # 1-file corpus would explode on 1 core
    grams = df.select(
        F.col(id_col),
        # NULL target flags must count as "not target" (0), matching the
        # oracle's count(*) FILTER semantics — an all-NULL bucket would
        # otherwise sum to NULL and poison every touching doc's weight
        # (ADVICE r12).
        F.coalesce(target_filter, F.lit(False)).alias("__is_target"),
        F.posexplode(word_ngrams(_norm_tokens(text_col), 2)).alias(
            "__p0", "__g"
        ),
    ).select(
        id_col,
        "__is_target",
        (F.col("__p0") + 1).alias("__pos"),
        _md5_bucket(F.col("__g"), n_buckets).alias("__b"),
    )
    if max_grams is not None:
        grams = grams.filter(F.col("__pos") <= int(max_grams))
    # one pass, two conditional counts per bucket (raw = everything)
    counts = grams.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cs"),
        F.sum(F.col("__is_target").cast("long")).alias("__ct"),
    )
    totals = counts.agg(
        F.sum("__cs").alias("__S"), F.sum("__ct").alias("__T")
    )
    b = F.lit(int(n_buckets)).cast("double")
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            (
                (F.col("__ct") + 1).cast("double")
                * (F.col("__S").cast("double") + b)
            )
            / (
                (F.col("__cs") + 1).cast("double")
                * (F.col("__T").cast("double") + b)
            )
        ).alias("__r"),
    )
    scored = grams.join(F.broadcast(ratios), "__b").select(
        id_col, "__pos", "__r"
    )
    folded = (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__r")))
            ).alias("__rs"),
        )
        .select(
            id_col,
            "n_grams",
            F.aggregate(
                F.transform(F.col("__rs"), lambda s: s["__r"]),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ).alias("weight"),
        )
    )
    return folded


def token_budget_selection(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    budget_pct: int = 25,
    n_buckets: int = 1000,
) -> DataFrame:
    """Greedy quality-ranked corpus selection under a global token
    budget — "keep the best ``budget_pct`` percent of tokens" — the
    budgeting step between quality scoring and training-data export.
    Quality here is the lexical-diversity proxy
    ``distinct_tokens / tokens`` quantized to an integer bucket by
    pure integer arithmetic (``(n_buckets * d) DIV t`` — no float
    boundary anywhere), documents in higher buckets selected first;
    the one bucket straddling the budget line resolves per-document
    in ``id_col`` order as a STRICT contiguous prefix (the running
    total counts every preceding doc, so the first doc crossing the
    line ends the selection — no skip-ahead packing, whose output
    would depend on doc-size interleavings). Every decision is a pure
    function of corpus content (re-runs, backfills, and any engine
    agree row-for-row).

    Scale shape — the TWO-LEVEL prefix sum that avoids the classic
    single-task global cumsum: per-bucket token totals aggregate onto
    a FIXED key domain (``n_buckets``+1 rows), the bucket-level
    running total is a window over those (grain-bounded: bucket
    count, not corpus size), and only documents of the single
    boundary bucket flow through a per-doc cumsum window PARTITIONED
    BY bucket (~corpus/n_buckets rows — raise ``n_buckets`` to
    shrink the boundary task; window: grain-bounded). Full buckets
    above the line select without any per-doc ordering at all.

    Returns (id_col, quality_bucket, n_tokens, selected) for every
    document with >= 1 token."""
    from pyspark.sql import Window

    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
    )

    if not 0 <= budget_pct <= 100:
        raise ValueError(f"budget_pct must be 0..100, got {budget_pct}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        _ensure_parallelism,
    )

    df = _ensure_parallelism(df)  # 1-file corpus tokenizes on 1 core
    toks = df.select(
        F.col(id_col), _norm_tokens(text_col).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("__d"),
    ).filter(F.col("n_tokens") >= 1)
    # true integer DIV, not double-divide-then-cast: a correctly
    # rounded double quotient can land ABOVE the integer boundary
    # (e.g. 12.999999999999998 -> 13.0) where exact DIV gives 12
    docs = toks.select(
        id_col,
        "n_tokens",
        F.expr(f"({int(n_buckets)}L * __d) DIV n_tokens")
        .cast("long")
        .alias("quality_bucket"),
    )
    per_bucket = docs.groupBy("quality_bucket").agg(
        F.sum("n_tokens").alias("__btok")
    )
    total = docs.agg(F.sum("n_tokens").alias("__S"))
    budget = total.select(
        F.expr(f"(__S * {int(budget_pct)}L) DIV 100")
        .cast("long")
        .alias("__budget")
    )
    wb = Window.orderBy(F.col("quality_bucket").desc())  # grain-bounded:
    # n_buckets+1 rows max (the quantized quality domain), never corpus
    bucket_line = (
        per_bucket.withColumn(
            "__cum_before",
            F.coalesce(
                F.sum("__btok").over(
                    wb.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .crossJoin(F.broadcast(budget))
        .select(
            "quality_bucket",
            "__cum_before",
            (F.col("__cum_before") + F.col("__btok") <= F.col("__budget"))
            .alias("__full"),
            (
                (F.col("__cum_before") < F.col("__budget"))
                & (F.col("__cum_before") + F.col("__btok") > F.col("__budget"))
            ).alias("__boundary"),
            (F.col("__budget") - F.col("__cum_before")).alias("__remain"),
        )
    )
    wd = Window.partitionBy("quality_bucket").orderBy(id_col)
    out = (
        docs.join(F.broadcast(bucket_line), "quality_bucket")
        .withColumn(
            "__doc_cum",
            F.coalesce(
                F.sum("n_tokens").over(
                    wd.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(
            id_col,
            "quality_bucket",
            "n_tokens",
            (
                F.col("__full")
                | (
                    F.col("__boundary")
                    & (F.col("__doc_cum") + F.col("n_tokens") <= F.col("__remain"))
                )
            ).alias("selected"),
        )
    )
    return out
