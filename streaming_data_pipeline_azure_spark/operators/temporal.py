"""Temporal operators Spark lacks as built-ins: as-of join and
time-bucketed top-N.

The reference pipeline declares no temporal operators (SURVEY.md §2.2 —
its only join is stream-to-static on an equi-key), so these extend the
engine for event-history workloads.

As-of join strategy: Spark has no ASOF JOIN physical operator (DuckDB and
kdb do). The scalable formulation here is a *union + window* merge — both
sides are tagged and unioned, then one pass of ``last(..., ignorenulls)``
over a window partitioned by key and ordered by time carries the most
recent right-side row onto each left row:

- one shuffle on the key (the union shuffles once for the window sort);
  no range join, no per-row probe;
- skew behaves like any window over a hot key — the partition sorts
  ``n_left + n_right`` rows per key;
- memory is bounded by the window frame (unbounded-preceding ``last`` is
  incremental, not buffered).

A join+filter+max_by formulation was rejected: ``left.ts >= right.ts``
range joins plan as broadcast-nested-loop (O(L×R) per key) — correct at
test scale, catastrophic at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` for the same ``on`` key (backward
    as-of join, DuckDB ``ASOF JOIN`` semantics). Left rows with no prior
    right row keep nulls.

    ``tolerance`` (an INTERVAL string like ``'1 hour'``) additionally
    requires ``left_ts - right_ts <= tolerance``.
    """
    r_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
    )
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_type = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    # right rows sort before left rows at the same (__ts) so an exact-tie
    # right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__last_r",
            F.when(
                F.col("__last_r.__rts")
                >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}"),
                F.col("__last_r"),
            ),
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__last_r.{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: each left row pairs with every right row
    whose ``[right_start, right_end]`` interval contains ``left_ts``
    (same ``on`` key).

    Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as a
    broadcast-nested-loop — O(L×R) per key. The bucketized formulation
    here is an equi-join: left rows get their time bucket, right
    intervals explode into every bucket they cover, and the join runs on
    ``(key, bucket)`` with the exact BETWEEN as a post-filter. A left row
    lives in exactly one bucket, so each qualifying (left, interval) pair
    matches exactly once — no dedup pass. Cost scales with interval
    length / bucket width (replication factor of the right side); pick
    ``bucket_seconds`` near the typical interval length. Inner-join
    semantics (an outer variant needs the BETWEEN inside the join
    condition, which forfeits the clean equi-join shape)."""
    # cast-to-timestamp is a no-op for TIMESTAMP inputs and makes
    # TIMESTAMP_NTZ columns work (unix_micros rejects NTZ; with a UTC
    # session tz the cast preserves the wall-clock instant)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    bucket_us = F.lit(bucket_seconds * 1_000_000).cast("long")
    lhs = left.withColumn("__b", F.floor(us(F.col(left_ts)) / bucket_us))
    rhs = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(us(F.col(right_start)) / bucket_us),
                F.floor(us(F.col(right_end)) / bucket_us),
            )
        ),
    )
    joined = lhs.join(rhs, [on, "__b"], "inner").filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop("__b")


def band_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_val: str,
    delta: float,
    on: list[str] | None = None,
) -> DataFrame:
    """Numeric band join: pair rows with ``|left_val - right_val| <=
    delta`` (optionally also equal on ``on`` keys) — the value-space
    sibling of :func:`range_join`'s time buckets.

    Spark plans the raw inequality as a broadcast-nested-loop (or a
    cartesian without the broadcast) — O(L×R). Here both sides get a
    ``floor(value/delta)`` bucket; a qualifying pair's buckets differ
    by at most 1, so the left side probes ``{b-1, b, b+1}`` via a
    3-element explode and the join is a plain EQUI-join on (keys,
    bucket) with the exact band predicate as a post-filter. Each right
    row owns exactly one bucket, so no pair can match twice — no dedup
    pass. Shuffle volume is 3×|L| + |R| rows, never |L|×|R|; output
    cost is the true number of qualifying pairs (band joins are only
    scale-safe when the band is selective — that is a property of the
    question, not the algorithm).

    Column names must be disjoint apart from ``on`` (standard Spark
    join contract). Inner semantics. Completeness relies on the float
    division ``value/delta`` being accurate to well under one bucket —
    true while |value/delta| stays below ~2^50 (ulp ≪ 1); beyond that
    a boundary pair could land 2 buckets apart and be missed."""
    if delta <= 0:
        raise ValueError("band_join needs delta > 0")
    keys = list(on or [])
    b_r = F.floor(F.col(right_val) / F.lit(delta))
    b_l = F.floor(F.col(left_val) / F.lit(delta))
    lhs = left.withColumn(
        "__b",
        F.explode(F.array(b_l - 1, b_l, b_l + 1)),
    )
    rhs = right.withColumn("__b", b_r)
    joined = lhs.join(rhs, keys + ["__b"], "inner").filter(
        F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(delta)
    )
    return joined.drop("__b")


def lagged_correlation(
    df: DataFrame,
    t_col: str,
    a_col: str,
    b_col: str,
    *,
    max_lag: int,
) -> DataFrame:
    """Lagged cross-correlation of two aligned series: for each lag
    ``0..max_lag``, the Pearson correlation of ``a(t)`` against
    ``b(t + lag)`` — does series a lead series b ("do clicks predict
    purchases two days out")? Input is ONE ROW PER integer time index
    ``t_col`` (aggregate upstream; duplicate indexes would cross-join
    within the self-pairing).

    Shape: the (t, a) side explodes its ``max_lag+1`` probe offsets and
    equi-joins (t + lag == t') to the (t', b) side — (max_lag+1)×|T|
    shuffled rows over an already-aggregated series (tiny by
    construction), then ONE aggregation of exact DECIMAL sufficient
    sums per lag (the correlation_matrix discipline: inputs round once
    to DECIMAL(18,4), products are exact, doubles only in the final
    fixed expression — bit-identical across engines/partitionings).

    Returns (lag, n, corr); lags with degenerate variance → NULL corr,
    lags with no aligned pairs are absent."""
    if max_lag < 0:
        raise ValueError("lagged_correlation needs max_lag >= 0")
    d = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    a_side = df.select(
        F.col(t_col).cast("long").alias("__t"), d(a_col).alias("__a")
    ).withColumn(
        "__lag", F.explode(F.array(*[F.lit(i) for i in range(max_lag + 1)]))
    )
    b_side = df.select(
        F.col(t_col).cast("long").alias("__tb"), d(b_col).alias("__v")
    )
    pairs = a_side.join(
        b_side, a_side["__t"] + a_side["__lag"] == b_side["__tb"]
    )
    agg = pairs.groupBy("__lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__a").alias("__sa"),
        F.sum("__v").alias("__sb"),
        F.sum(F.col("__a") * F.col("__a")).alias("__ssa"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ssb"),
        F.sum(F.col("__a") * F.col("__v")).alias("__sab"),
    )
    n = F.col("n").cast("double")
    sa = F.col("__sa").cast("double")
    sb = F.col("__sb").cast("double")
    ssa = F.col("__ssa").cast("double")
    ssb = F.col("__ssb").cast("double")
    sab = F.col("__sab").cast("double")
    var_a = n * ssa - sa * sa
    var_b = n * ssb - sb * sb
    return agg.select(
        F.col("__lag").cast("int").alias("lag"),
        "n",
        F.when(
            (var_a > 0) & (var_b > 0),
            (n * sab - sa * sb) / (F.sqrt(var_a) * F.sqrt(var_b)),
        ).alias("corr"),
    )


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n: int,
    *,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-N rows per group via ``row_number`` — one shuffle on the group
    key; with AQE, skewed groups split across tasks during the sort."""
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def match_event_patterns(
    events: DataFrame,
    patterns: dict[str, str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Regex CEP over per-key event sequences — the MATCH_RECOGNIZE /
    ClickHouse-``sequenceMatch`` capability :func:`funnel_steps` cannot
    express: alternation ("error OR timeout, then signup"), adjacency
    ("three clicks in a row"), and Kleene repetition, as ordinary
    regular expressions over each key's time-ordered event-type string.

    Each key's events sort by (ts, *tiebreak_cols) — a TOTAL order, so
    the sequence string is a pure function of the data — and their
    types join with single spaces; every ``patterns`` entry becomes a
    boolean ``rlike`` column (write word-boundary regexes like
    ``r"\\bview\\b.*\\bpurchase\\b"``; adjacency = explicit spaces:
    ``r"\\bclick click click\\b"``).

    Plan: ONE shuffle on the key for the ``collect_list`` aggregate
    (map-side partial collect), then sort + join + regex are all
    row-local codegen — no self-joins, no windows over the raw stream,
    no Python. Per-key state is that key's event count (same skew
    profile as sessionization; a 100 TB deploy bounds it upstream with
    ``sampling.cap_per_group``). Returns one row per key:
    (user_col, n_events, <name> boolean per pattern)."""
    if not patterns:
        raise ValueError("patterns must name at least one regex")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("__ts"),
                *[F.col(c).alias(f"__tb{i}") for i, c in
                  enumerate(tiebreak_cols)],
                F.col(type_col).alias("__t"),
            )
        )
    )
    g = events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"), arr.alias("__arr")
    )
    seq = F.array_join(F.transform(F.col("__arr"), lambda x: x["__t"]), " ")
    return g.select(
        user_col,
        "n_events",
        *[seq.rlike(p).alias(name) for name, p in patterns.items()],
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Strict-sequence funnel analysis: how many users performed the
    ``steps`` events IN ORDER (each step strictly after the previous
    one's first qualifying occurrence — re-orderings don't count, the
    standard product-analytics semantics).

    Per step k, the reached-set is users with a step-k event strictly
    after their earliest qualifying step-(k-1) time; earliest-first
    makes the result a pure function of the data (no per-user path
    search). Returns one row per step: (step_idx, step, n_users,
    frac_of_first).

    Plan shape: one user-keyed aggregation per step, each joined to the
    previous step's (user, time) frame — k-1 equi-joins on the user
    key, the natural partitioning for any per-user history operator
    (AQE handles hot users; no windows over the whole event stream, so
    nothing sorts more than the per-step filtered events).

    ``within_seconds`` (r7) bounds each step-to-step gap: step k only
    counts if it happens within that many seconds AFTER the previous
    step's earliest qualifying time — the "purchase within 3 days of
    the view" form every conversion report actually uses. Earliest-
    first semantics are unchanged (the earliest qualifying-and-in-
    window step-k time becomes the next step's anchor)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for k, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if prev is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cond = F.col("__ts") > F.col("__t")
            if within_seconds is not None:
                cond = cond & (
                    F.col("__ts")
                    <= F.col("__t")
                    + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
                )
            cur = (
                ev.join(prev, "__u")
                .filter(cond)
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        reached.append(cur)
        prev = cur
    counts = None
    for k, (step, cur) in enumerate(zip(steps, reached)):
        row = cur.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(k + 1).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("n_users").cast("long"),
        )
        counts = row if counts is None else counts.unionByName(row)
    first = F.broadcast(
        reached[0].agg(F.count(F.lit(1)).alias("__n1"))
    )
    return counts.crossJoin(first).select(
        "step_idx",
        "step",
        "n_users",
        (F.col("n_users").cast("double") / F.col("__n1")).alias(
            "frac_of_first"
        ),
    )


def cohort_retention(
    events: DataFrame,
    *,
    signup_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention — the other product-analytics staple next
    to :func:`funnel_steps`: users cohorted by the ISO week of their
    FIRST ``signup_type`` event, then for each later week-offset the
    count and fraction of the cohort with ANY event that week.

    Shape: one user-keyed aggregate builds the (user, cohort_week)
    table; events join it on the user key (the natural partitioning),
    collapse to distinct (cohort, offset, user) — map-side partial
    distinct bounds the shuffle at one row per user-week — then a tiny
    (cohorts × offsets) aggregate joins the broadcast cohort sizes.
    Week truncation is ISO-Monday ``date_trunc('week', …)`` in both
    Spark and DuckDB, and offsets are exact multiples of 7 days, so the
    result is engine-exact. Returns (cohort_week, week_offset,
    n_active, retention_frac) with offset 0 = the signup week."""
    signup = (
        events.filter(F.col(type_col) == signup_type)
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__s"))
        .select(
            "__u",
            F.date_trunc("week", F.col("__s")).alias("__cw"),
        )
    )
    sizes = signup.groupBy("__cw").agg(
        F.count(F.lit(1)).alias("__n_cohort")
    )
    active = (
        events.select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts"))
        .join(signup, "__u")
        .select(
            "__cw",
            (
                F.datediff(F.date_trunc("week", F.col("__ts")), F.col("__cw"))
                / 7
            ).cast("long").alias("week_offset"),
            "__u",
        )
        .filter(F.col("week_offset") >= 0)
        .distinct()
        .groupBy("__cw", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        active.join(F.broadcast(sizes), "__cw")
        .select(
            F.col("__cw").cast("date").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            (
                F.col("n_active").cast("double") / F.col("__n_cohort")
            ).alias("retention_frac"),
        )
    )


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: for every consecutive pair in a user's timeline (ordered
    by ``ts_col`` then ``tiebreak_col``), count (from_type, to_type)
    and the per-from-type fraction — the "what do users do next"
    complement of :func:`funnel_steps`' fixed-sequence view.

    One shuffle on the user key feeds a single ``lead`` window; the
    transition aggregation then collapses map-side onto the tiny
    (|types|²) key domain, so the second shuffle carries a handful of
    rows per task no matter the corpus size. The fraction divides two
    exact counts — deterministic on any partitioning (callers must make
    the ordering total per user via ``tiebreak_col``)."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(F.col(user_col)).orderBy(*order)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        (
            F.col("n").cast("double")
            / F.sum("n").over(totals).cast("double")
        ).alias("frac_from"),
    )


def time_weighted_avg(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled piecewise-
    constant signal (the TWAP every IoT/finance pipeline needs, which a
    plain AVG gets wrong): per key, each sample's value holds over
    [t_i, t_{i+1}) and is weighted by that duration; the final sample
    has no successor and carries no weight. Keys with a single sample
    report NULL (no interval exists).

    One key-partitioned window (``lead`` over the sample order), then
    an aggregation — the same single-shuffle shape as the other
    per-key history operators. Weighted sums accumulate exactly:
    value DECIMAL(18,4) × duration-micros DECIMAL(18,0) products are
    (37,4) — inside Spark's 38-digit cap — so the result is identical
    on any partitioning. Returns (key, n_intervals, total_us, twap)."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(F.col(key_col)).orderBy(*order)
    t = F.unix_micros(F.col(ts_col))
    seq = events.select(
        F.col(key_col),
        F.col(value_col).cast("decimal(18,4)").alias("__v"),
        (F.lead(t).over(w) - t).alias("__dur"),
    ).filter(F.col("__dur").isNotNull())
    return seq.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("__dur").cast("long").alias("total_us"),
        (
            F.sum(F.col("__v") * F.col("__dur").cast("decimal(18,0)"))
            .cast("double")
            / F.sum("__dur").cast("double")
        ).alias("twap"),
    )


def debounce_events(
    df: DataFrame,
    key_cols,
    ts_col: str,
    *,
    gap_seconds: int,
    tiebreak_cols=(),
) -> DataFrame:
    """Keep the FIRST event of every burst: within each ``key_cols``
    group, an event is dropped when it arrives within ``gap_seconds``
    of the PREVIOUS event (double-clicks, retry storms, at-least-once
    re-deliveries jittered past exact dedup's reach). Gap chaining is
    deliberate — a burst is any run of events with no ``gap_seconds``
    silence inside it, exactly the gap-sessionization rule — so this is
    "sessionize, keep each session's first row".

    One key shuffle + one window pass (lag over (key, ts, tiebreak));
    a second window over the SAME sort marks session firsts, so
    Catalyst plans a single Exchange. Deterministic for a total order:
    pass ``tiebreak_cols`` when timestamps can tie. Returns the kept
    rows with their original columns."""
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    gap_new = (
        F.col(ts_col).cast("long")
        - F.lag(F.col(ts_col)).over(w).cast("long")
        > F.lit(gap_seconds)
    )
    with_flag = df.withColumn(
        "__new", F.coalesce(gap_new, F.lit(True)).cast("int")
    )
    sess = with_flag.withColumn(
        "__sess", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    w_first = Window.partitionBy(
        *[F.col(c) for c in key_cols], F.col("__sess")
    ).orderBy(*order)
    return (
        sess.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__new", "__sess", "__rn")
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    *,
    gap_fill: bool = True,
) -> DataFrame:
    """Per-day count of OPEN intervals — how many ``[start_col,
    end_col]`` intervals (both inclusive, day granularity) cover each
    calendar day: orders in flight, concurrent sessions, active
    incidents. The classic sweep-line, expressed relationally:

    1. every interval emits two delta rows — ``+1`` at its start day,
       ``-1`` the day AFTER its end day;
    2. deltas aggregate per day (ONE hash shuffle; map-side combine
       collapses same-day deltas before the exchange, so the exchange
       carries at most one row per distinct boundary day — O(days),
       never O(intervals));
    3. a running sum over the aggregated day series yields the open
       count. The window is a single global cumulative sum, but it
       runs over the DAY series (bounded by the calendar span — a
       100 TB corpus spanning 10 years is ~3.7k rows here), not the
       input, so the single-partition sort is safe at any input scale;
    4. ``gap_fill``: boundary days only mark CHANGES — days between
       boundaries inherit the previous count.  ``sequence()`` expands
       each boundary day to the run of days it governs (output-sized,
       O(calendar days) rows), so the result has one row per day from
       the first start to the last end, zeros included.

    Returns (day date, n_open bigint). Rows with a NULL start or end,
    or end < start, are rejected with a contract error (a silent drop
    would understate concurrency).

    A per-day explode of every interval (``sequence(start, end)`` per
    row) was rejected: it shuffles O(intervals x duration) rows — the
    sweep-line shuffles O(intervals) deltas and sorts O(days).
    """
    s = F.to_date(F.col(start_col))
    e = F.to_date(F.col(end_col))
    bad = df.filter(
        F.col(start_col).isNull()
        | F.col(end_col).isNull()
        | (e < s)
    )
    if bad.limit(1).count() > 0:
        raise ValueError(
            "interval_concurrency: null or inverted intervals present "
            "(end < start) — fix or filter the input explicitly"
        )
    deltas = df.select(
        F.explode(
            F.array(
                F.struct(s.alias("day"), F.lit(1).alias("d")),
                F.struct(
                    F.date_add(e, 1).alias("day"), F.lit(-1).alias("d")
                ),
            )
        ).alias("x")
    ).select("x.day", "x.d")
    per_day = deltas.groupBy("day").agg(
        F.sum("d").cast("long").alias("delta")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = per_day.select(
        "day", F.sum("delta").over(w).cast("long").alias("n_open")
    )
    if not gap_fill:
        return running
    # expand each boundary day to the days it governs: [day, next
    # boundary). The final boundary (the day after the last end) has
    # n_open 0 and governs nothing -> empty sequence, dropped.
    w_next = Window.orderBy("day")
    spans = running.select(
        "day",
        "n_open",
        F.lead("day").over(w_next).alias("__next"),
    )
    return (
        spans.filter(F.col("__next").isNotNull())
        .select(
            F.explode(
                F.sequence(
                    F.col("day"), F.date_sub(F.col("__next"), 1)
                )
            ).alias("day"),
            "n_open",
        )
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols,
    ts_col: str,
    value_col: str,
    *,
    window_days: int = 7,
    z: float = 3.0,
) -> DataFrame:
    """Time-series anomaly flags: for each key's DAILY value series,
    the trailing ``window_days``-day mean/std (current day included)
    and a |value − mean| > z·std flag — the ops-monitoring pass run
    over revenue, event volume, or error counts.

    Determinism contract (the engine-wide rule): the windowed moments
    accumulate as exact decimals (Σv, Σv² in DECIMAL), so mean and
    variance are single double divisions at the end — bit-identical
    across engines and partitionings. Days with fewer than 2 trailing
    observations report a NULL std and never flag.

    Shape: one hash shuffle for the per-(key, day) pre-aggregation,
    then ONE window pass per key over the daily series — O(days per
    key) rows, bounded by the calendar regardless of corpus size. The
    window frame is day-RANGE based (rows are one-per-day after the
    pre-agg, but range guards against missing days widening the
    lookback).

    Returns (keys…, day, value, n_window, mean_trailing, std_trailing,
    is_anomaly)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    keys = [F.col(c) for c in key_cols]
    daily = df.groupBy(
        *keys, F.to_date(F.col(ts_col)).alias("day")
    ).agg(
        # re-narrow the widened sum: daily totals fit (18,4) by
        # contract, and (18,4)^2 -> (37,8) stays exact (a (28,4)
        # square would overflow 38 digits and silently round)
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("__v")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-(window_days - 1) * 86400, 0)
    )
    n = F.count(F.lit(1)).over(w).cast("long")
    s = F.sum("__v").over(w)
    ss = F.sum(F.col("__v") * F.col("__v")).over(w)
    nn = n.cast("double")
    sd = s.cast("double")
    ssd = ss.cast("double")
    var = (nn * ssd - sd * sd) / (nn * (nn - F.lit(1.0)))
    std = F.when(n > 1, F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0)))
    mean = sd / nn
    val = F.col("__v").cast("double")
    return daily.select(
        *key_cols,
        "day",
        val.alias("value"),
        n.alias("n_window"),
        mean.alias("mean_trailing"),
        std.alias("std_trailing"),
        F.when(
            std.isNotNull() & (std > 0),
            F.abs(val - mean) > F.lit(z) * std,
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    *,
    horizon: int,
) -> DataFrame:
    """Kaplan–Meier survival curve with administrative censoring at
    ``horizon``: subjects whose ``duration_col`` (non-negative
    integer time units) exceeds the horizon are censored there;
    at every observed EVENT time t the curve multiplies in
    (1 − d_t / r_t) — the standard churn / time-to-fulfilment /
    incident-duration estimator.

    Determinism contract: d_t and r_t are exact integers (one
    time-keyed aggregation + a suffix-sum window over the O(distinct
    times) series); each factor is one double division; and the
    cumulative product folds LEFT-TO-RIGHT over the time-sorted factor
    array (``aggregate`` over a sorted ``collect_list`` slice), the
    same operation sequence a recursive SQL CTE produces — so the
    whole curve is bit-identical across engines (the ln/exp running-
    product trick is NOT, which is why it is not used). The fold is
    O(T²) multiplies over T = distinct event times ≤ horizon — a
    bounded calendar-scale series, independent of subject count.

    Returns (t, n_at_risk, n_events, factor, survival) at event times,
    time-ascending. Negative durations are rejected."""
    if df.filter(F.col(duration_col) < 0).limit(1).count() > 0:
        raise ValueError("kaplan_meier: negative durations present")
    obs = df.select(
        F.least(F.col(duration_col).cast("long"), F.lit(horizon)).alias(
            "__t"
        ),
        (F.col(duration_col) <= horizon).cast("int").alias("__e"),
    )
    per_t = obs.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__e").cast("long").alias("__d"),
    )
    w_suffix = Window.orderBy(F.desc("__t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risked = per_t.select(
        "__t",
        "__d",
        F.sum("__n").over(w_suffix).cast("long").alias("__r"),
    ).filter(F.col("__d") > 0)
    factor = F.lit(1.0) - (
        F.col("__d").cast("double") / F.col("__r").cast("double")
    )
    series = risked.select(
        "__t", "__d", "__r", factor.alias("__f")
    )
    one_row = series.agg(
        F.sort_array(
            F.collect_list(F.struct("__t", "__d", "__r", "__f"))
        ).alias("__s")
    )
    exploded = one_row.select(
        F.posexplode("__s").alias("__i", "__row")
    )
    surv = F.aggregate(
        F.expr("slice(__all, 1, __i + 1)"),
        F.lit(1.0),
        lambda acc, x: acc * x["__f"],
    )
    return (
        exploded.crossJoin(
            F.broadcast(one_row.select(F.col("__s").alias("__all")))
        )
        .select(
            F.col("__row.__t").alias("t"),
            F.col("__row.__r").alias("n_at_risk"),
            F.col("__row.__d").alias("n_events"),
            F.col("__row.__f").alias("factor"),
            surv.alias("survival"),
        )
    )


def decayed_sum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    ref_date: str,
    half_life_days: int,
    quantize_bits: int = 20,
) -> DataFrame:
    """Recency-weighted value per key: Σ value · 2^(−age_halflives)
    with age_halflives = ⌊days(ref_date − ts) / half_life_days⌋ — the
    exponential-decay LTV / engagement score, computed WITHOUT pow():

    - the decay weight is a DYADIC division ``value / (1 << k)`` —
      one exact power-of-two shift and one IEEE division, bit-portable
      (libm ``pow`` is engine-specific; division is not);
    - per-row contributions quantize to ``⌊x · 2^quantize_bits⌋``
      integers, so the SUM is exact integer arithmetic — partial-
      aggregation order cannot perturb it (the embedding_covariance
      precedent; a raw double Σ would differ run-to-run at scale).

    ``ref_date`` must be on/after the data's max timestamp (negative
    ages clamp to 0 rather than amplifying the future); k caps at 62
    (beyond that the weight underflows the quantization anyway).

    One map-side-combined aggregation. Returns (key, n_events,
    decayed_q, decayed) — decayed = decayed_q / 2^quantize_bits, the
    float view of the exact integer score."""
    if half_life_days < 1:
        raise ValueError("decayed_sum needs half_life_days >= 1")
    age = F.greatest(
        F.lit(0),
        F.floor(
            F.datediff(F.lit(ref_date), F.to_date(F.col(ts_col)))
            / F.lit(float(half_life_days))
        ),
    )
    k = F.least(age.cast("int"), F.lit(62))
    staged = df.select(
        F.col(key_col), F.col(value_col), k.alias("__k")
    )
    # shiftleft() the builtin only takes a literal bit count — the SQL
    # form accepts a column
    den = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), __k) AS DOUBLE)")
    contrib = F.floor(
        (F.col(value_col).cast("double") / den)
        * F.lit(float(1 << quantize_bits))
    ).cast("long")
    scale = float(1 << quantize_bits)
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(contrib).cast("long").alias("decayed_q"),
    ).select(
        key_col,
        "n_events",
        "decayed_q",
        (F.col("decayed_q").cast("double") / F.lit(scale)).alias(
            "decayed"
        ),
    )


def precedence_pairs(
    df: DataFrame, key_col: str, type_col: str, ts_col: str
) -> DataFrame:
    """Sequential-pattern support for ordered type pairs: for every
    (type_a, type_b), in how many keys' histories does SOME a-event
    strictly precede SOME b-event — the non-adjacent generalization of
    :func:`transition_matrix` (which only sees consecutive steps) and
    the level-2 core of sequence mining (GSP/SPADE's first pass).

    The whole existence test collapses to interval endpoints:
    ∃ t_a < t_b  ⟺  min(ts_a) < max(ts_b) — so one (key, type)
    aggregation reduces each history to first/last timestamps, and a
    per-key self equi-join over the O(types²) condensed rows (bounded
    by the TYPE alphabet, not the event count) evaluates every pair.
    Nothing ever shuffles raw events twice; a 100 TB event log reduces
    to |keys|·|types| rows before the join.

    Returns (type_a, type_b, n_keys, support) with support = n_keys /
    total keys observed; a != b pairs only; strict precedence (exact
    ties don't count)."""
    spans = df.groupBy(
        F.col(key_col).alias("__k"), F.col(type_col).alias("__ty")
    ).agg(
        F.min(ts_col).alias("__first"),
        F.max(ts_col).alias("__last"),
    )
    tot = spans.agg(F.countDistinct("__k").alias("__tot"))
    a = spans.select(
        "__k",
        F.col("__ty").alias("type_a"),
        F.col("__first").alias("__fa"),
    )
    b = spans.select(
        "__k",
        F.col("__ty").alias("type_b"),
        F.col("__last").alias("__lb"),
    )
    pairs = a.join(b, "__k").filter(
        (F.col("type_a") != F.col("type_b"))
        & (F.col("__fa") < F.col("__lb"))
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_keys",
            (
                F.col("n_keys").cast("double")
                / F.col("__tot").cast("double")
            ).alias("support"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    *,
    target: str,
    slack: str = "0",
    threshold: str,
) -> DataFrame:
    """Tabular CUSUM level-shift detection (Page 1954): per group, the
    time-ordered series accumulates

        S⁺_i = max(0, S⁺_{i-1} + (x_i − target − slack))
        S⁻_i = max(0, S⁻_{i-1} + (target − x_i − slack))

    and an alarm fires when either side exceeds ``threshold`` — the
    small-persistent-drift monitor that outlier z-scores miss (ten
    days of +2% never trips a 3σ rule; CUSUM integrates it).

    ``target``/``slack``/``threshold`` are DECIMAL STRINGS (e.g.
    "1500.25"), not floats: they parse exactly to DECIMAL(18,4) in any
    engine, and the whole recursion then runs in exact decimal
    arithmetic — associative, so partitioning cannot perturb it, and a
    recursive SQL CTE reproduces it bit-for-bit (the kaplan_meier
    precedent; a float fold would drift ulps per step).

    Shape: one hash aggregation collects each group's series as a
    sorted array (the series must be per-group BOUNDED — daily/hourly
    rollups, the rolling_zscore contract; this is O(days), not
    O(rows)); ONE ``aggregate`` HOF folds it left-to-right emitting
    every step's state; explode returns the ledger. Duplicate t within
    a group would make the fold order ill-defined — pre-aggregate.

    Returns (group, t, x, s_hi, s_lo, alarm), time-ascending per
    group."""
    dec = lambda s: F.lit(s).cast("decimal(18,4)")  # noqa: E731
    x = F.col(value_col).cast("decimal(18,4)")
    one_row = df.select(
        F.col(group_col).alias("g"),
        F.col(t_col).alias("__t"),
        x.alias("__x"),
    ).groupBy("g").agg(
        F.sort_array(F.collect_list(F.struct("__t", "__x"))).alias(
            "__s"
        )
    )
    t_type = df.select(F.col(t_col)).schema[0].dataType.simpleString()
    zero = dec("0")
    init = F.struct(
        zero.alias("hi"),
        zero.alias("lo"),
        F.array()
        .cast(
            f"array<struct<__t:{t_type},__x:decimal(18,4),"
            "hi:decimal(18,4),lo:decimal(18,4)>>"
        )
        .alias("out"),
    )

    def step(acc, e):
        hi = F.greatest(
            zero, (acc["hi"] + e["__x"]) - dec(target) - dec(slack)
        ).cast("decimal(18,4)")
        lo = F.greatest(
            zero, (acc["lo"] - e["__x"]) + dec(target) - dec(slack)
        ).cast("decimal(18,4)")
        return F.struct(
            hi.alias("hi"),
            lo.alias("lo"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        e["__t"].alias("__t"),
                        e["__x"].alias("__x"),
                        hi.alias("hi"),
                        lo.alias("lo"),
                    )
                ),
            ).alias("out"),
        )

    folded = one_row.select(
        "g", F.aggregate("__s", init, step)["out"].alias("__out")
    )
    thr = dec(threshold)
    return folded.select(
        "g", F.explode("__out").alias("__e")
    ).select(
        F.col("g").alias(group_col),
        F.col("__e.__t").alias(t_col),
        F.col("__e.__x").alias("x"),
        F.col("__e.hi").alias("s_hi"),
        F.col("__e.lo").alias("s_lo"),
        ((F.col("__e.hi") > thr) | (F.col("__e.lo") > thr)).alias(
            "alarm"
        ),
    )


def holt_forecast(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    *,
    horizon: int = 1,
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) with α = β =
    1/4, in EXACT INTEGER arithmetic — the classic short-range
    forecaster, made bit-portable by construction:

    - inputs quantize losslessly: DECIMAL(18,4) × 10000 → int64
      ten-thousandths;
    - the dyadic smoothing constants turn each update into one
      add-multiply and one FLOOR DIVISION by 4 —
      ``fd(a) = (a − pmod(a,4)) / 4`` — computed identically by every
      engine (a float recursion would drift ulps per step, and
      decimal-cast rounding is NOT cross-engine portable: DuckDB
      truncates where Spark rounds half-up);
    - updates: l_t = fd(x_t + 3·(l+b)),  b_t = fd((l_t − l) + 3·b),
      seeded l_1 = x_1, b_1 = 0.

    Same shape contract as :func:`cusum_changepoints`: one per-group
    sorted-array collect (series bounded by the calendar) + one HOF
    fold emitting every step. Returns (group, t, x, level, trend,
    one_step_pred, forecast_h) — one_step_pred is l+b BEFORE seeing
    x_t (the honest backtest column; NULL at the seed step),
    forecast_h = level + horizon·trend FROM each step, all as doubles
    de-quantized by /10⁴."""
    if horizon < 0:
        raise ValueError("holt_forecast needs horizon >= 0")
    x_q = (
        F.col(value_col).cast("decimal(18,4)") * F.lit(10000)
    ).cast("long")
    t_type = df.select(F.col(t_col)).schema[0].dataType.simpleString()
    one_row = df.select(
        F.col(group_col).alias("g"),
        F.col(t_col).alias("__t"),
        x_q.alias("__x"),
    ).groupBy("g").agg(
        F.sort_array(F.collect_list(F.struct("__t", "__x"))).alias(
            "__s"
        )
    )
    init = F.struct(
        F.lit(None).cast("long").alias("l"),
        F.lit(None).cast("long").alias("b"),
        F.array()
        .cast(
            f"array<struct<__t:{t_type},__x:long,l:long,b:long,"
            "pred:long>>"
        )
        .alias("out"),
    )

    def fd4(a):
        return ((a - F.pmod(a, F.lit(4))) / F.lit(4)).cast("long")

    def step(acc, e):
        seeded = acc["l"].isNotNull()
        l_new = F.when(
            seeded, fd4(e["__x"] + F.lit(3) * (acc["l"] + acc["b"]))
        ).otherwise(e["__x"])
        b_new = F.when(
            seeded, fd4((l_new - acc["l"]) + F.lit(3) * acc["b"])
        ).otherwise(F.lit(0).cast("long"))
        pred = F.when(seeded, acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        e["__t"].alias("__t"),
                        e["__x"].alias("__x"),
                        l_new.alias("l"),
                        b_new.alias("b"),
                        pred.cast("long").alias("pred"),
                    )
                ),
            ).alias("out"),
        )

    folded = one_row.select(
        "g", F.aggregate("__s", init, step)["out"].alias("__out")
    )
    dq = lambda c: c.cast("double") / F.lit(10000.0)  # noqa: E731
    e = F.col("__e")
    return folded.select("g", F.explode("__out").alias("__e")).select(
        F.col("g").alias(group_col),
        e["__t"].alias(t_col),
        dq(e["__x"]).alias("x"),
        dq(e["l"]).alias("level"),
        dq(e["b"]).alias("trend"),
        dq(e["pred"]).alias("one_step_pred"),
        dq(e["l"] + F.lit(horizon) * e["b"]).alias("forecast_h"),
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str,
    date_col: str,
    amount_col: str,
    *,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary): per customer,
    days since last order, order count, and exact-decimal total spend,
    each scored into ``n_tiles`` quantile tiles (1 = worst) — the
    classic marketing / lifecycle segmentation.

    Determinism: tiles come from ``ntile`` over FULLY tie-broken
    orderings (metric, then customer id), so equal metrics split
    deterministically; recency is measured against the data's own max
    date (no wall clock). One customer-keyed aggregation, then three
    ntile windows over the O(customers) summary — at 100 TB the
    summary is customer-cardinality, shuffled once. Returns
    (customer, recency_days, frequency, monetary, r_score, f_score,
    m_score, segment) with segment = concat of the three scores."""
    summary = orders.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(F.to_date(F.col(date_col))).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("monetary"),
    )
    anchor = summary.agg(F.max("__last").alias("__anchor"))
    scored = summary.crossJoin(F.broadcast(anchor)).select(
        "customer",
        F.datediff(F.col("__anchor"), F.col("__last"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
    )
    w_r = Window.orderBy(F.desc("recency_days"), F.col("customer"))
    w_f = Window.orderBy(F.asc("frequency"), F.col("customer"))
    w_m = Window.orderBy(F.asc("monetary"), F.col("customer"))
    out = scored.select(
        "customer",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(w_r).cast("long").alias("r_score"),
        F.ntile(n_tiles).over(w_f).cast("long").alias("f_score"),
        F.ntile(n_tiles).over(w_m).cast("long").alias("m_score"),
    )
    return out.withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def lag_autocorrelation(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    lags: list[int],
) -> DataFrame:
    """Seasonality diagnostic: Pearson autocorrelation of the DAILY
    value series at each requested lag (lag 7 high ⇒ weekly cycle,
    lag 1 high ⇒ momentum). Days absent from the series are absent
    from the pairs (no zero-imputation — document gaps, don't invent
    them).

    The daily pre-aggregation is the one data-proportional shuffle;
    each lag is then an equi-join of the O(days) series against its
    date-shifted self plus one sufficient-sums aggregation — all sums
    exact decimals (the correlation_matrix discipline), doubles only
    in the final r formula, so the result is engine-exact. Returns
    (lag, n_pairs, r) with r NULL when either side is constant."""
    daily = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("v")
    )
    out = None
    for lag in lags:
        a = daily.select(F.col("day").alias("__d"), F.col("v").alias("x"))
        b = daily.select(
            F.date_add(F.col("day"), lag).alias("__d"),
            F.col("v").alias("y"),
        )
        sums = (
            a.join(b, "__d")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
            )
            .withColumn("lag", F.lit(lag).cast("long"))
        )
        out = sums if out is None else out.unionByName(sums)
    n = F.col("n_pairs").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    r = (n * sxy - sx * sy) / F.sqrt(varx * vary)
    return out.select(
        "lag",
        "n_pairs",
        F.when((varx > 0) & (vary > 0), r).alias("r"),
    )


def transition_predictability(
    df: DataFrame,
    key_cols,
    ts_col: str,
    state_col: str,
    *,
    tiebreak_cols=(),
) -> DataFrame:
    """How predictable is the event stream: for every prior state, the
    best next-state guess (the transition argmax) and its hit rate —
    the evaluation layer over :func:`transition_matrix` (a Markov
    model's top-1 in-sample accuracy, and the baseline any sequence
    model must beat).

    One lag window per key (the same shuffle transition_matrix pays),
    a (state, next) count, then a deterministic argmax per state via
    ``max_by(next, (count, next DESC ranking))`` — ties break to the
    LEXICALLY SMALLEST next state so the report is engine-exact.
    Returns (state, n_transitions, top_next, top_n, hit_rate)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    pairs = (
        df.select(
            F.col(state_col).alias("__s"),
            F.lead(F.col(state_col)).over(w).alias("__t"),
        )
        .filter(F.col("__t").isNotNull())
        .groupBy("__s", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    # argmax with a lexical tie-break needs an ORDER, not a max_by
    # struct (a string cannot be numerically inverted): one window
    # over the O(states²) pair counts
    w_pick = Window.partitionBy("__s").orderBy(
        F.desc("__n"), F.asc("__t")
    )
    best = pairs.withColumn(
        "__rn", F.row_number().over(w_pick)
    )
    totals = pairs.groupBy("__s").agg(
        F.sum("__n").cast("long").alias("n_transitions")
    )
    return (
        best.filter(F.col("__rn") == 1)
        .join(totals, "__s")
        .select(
            F.col("__s").alias("state"),
            "n_transitions",
            F.col("__t").alias("top_next"),
            F.col("__n").cast("long").alias("top_n"),
            (
                F.col("__n").cast("double")
                / F.col("n_transitions").cast("double")
            ).alias("hit_rate"),
        )
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    tiebreak_cols=(),
) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars plus count and exact
    total — the canonical downsampling for any numeric event series
    (prices, latencies, sensor values). Open/close pick the first/last
    value under the FULLY tie-broken (ts, tiebreaks) order via
    min_by/max_by (one hash aggregation with map-side combine — no
    window, no sort), so bars are engine-exact even with equal
    timestamps. Returns (day, open, high, low, close, n_events,
    total_value)."""
    ties = [F.col(c) for c in tiebreak_cols]
    order = F.struct(F.col(ts_col), *ties)
    v = F.col(value_col)
    return df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.min_by(v, order).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, order).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(v.cast("decimal(18,4)")).cast("double").alias(
            "total_value"
        ),
    )


def growth_accounting(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    bucket: str = "week",
) -> DataFrame:
    """Growth accounting (the social-network-era standard): per time
    bucket, users classified as NEW (first-ever bucket), RETAINED
    (also active the previous bucket), RESURRECTED (active before but
    not the previous bucket) — plus CHURNED, the previous bucket's
    actives who went silent. new + retained + resurrected = the
    bucket's actives; actives_t − churned_t + new_{t+1} +
    resurrected_{t+1} = actives_{t+1} — the accounting identity
    dashboards reconcile against.

    Shape: one (key, bucket) distinct, one per-key window (lag + min),
    one counts aggregation; churn joins the NEXT bucket's silence in
    the same window pass (lead). All counts are exact integers.
    Buckets with no actives (gaps) simply don't appear — churned is
    attributed to the bucket AFTER the user's last active one.

    Returns (bucket_start, n_active, n_new, n_retained,
    n_resurrected, n_churned_next) — n_churned_next = how many of
    THIS bucket's actives are absent from the next bucket they could
    have appeared in (the forward-looking churn column; the final
    bucket reports NULL, its churn being unknowable yet)."""
    if bucket not in ("week", "month", "day"):
        raise ValueError("growth_accounting bucket must be day|week|month")
    b = F.date_trunc(bucket, F.col(ts_col)).cast("date")
    active = df.select(
        F.col(key_col).alias("__k"), b.alias("__b")
    ).distinct()
    w = Window.partitionBy("__k").orderBy("__b")
    step = {"day": 1, "week": 7}.get(bucket)
    prev_expected = (
        F.add_months(F.col("__b"), -1)
        if bucket == "month"
        else F.date_sub(F.col("__b"), step)
    )
    next_expected = (
        F.add_months(F.col("__b"), 1)
        if bucket == "month"
        else F.date_add(F.col("__b"), step)
    )
    classified = active.select(
        "__k",
        "__b",
        F.min("__b").over(
            Window.partitionBy("__k").orderBy("__b").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).alias("__first"),
        F.lag("__b").over(w).alias("__prev"),
        F.lead("__b").over(w).alias("__next"),
        prev_expected.alias("__pe"),
        next_expected.alias("__ne"),
    )
    status = (
        F.when(F.col("__b") == F.col("__first"), F.lit("new"))
        .when(F.col("__prev") == F.col("__pe"), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    churn_next = F.when(
        F.col("__next").isNull() | (F.col("__next") > F.col("__ne")), 1
    ).otherwise(0)
    # the globally-last bucket cannot judge churn yet
    last_bucket = active.agg(F.max("__b").alias("__last"))
    out = (
        classified.select("__b", status.alias("__s"), churn_next.alias("__c"))
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("__s") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("__s") == "retained", 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(
                F.when(F.col("__s") == "resurrected", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_resurrected"),
            F.sum("__c").cast("long").alias("__churn"),
        )
    )
    return out.crossJoin(F.broadcast(last_bucket)).select(
        F.col("__b").alias("bucket_start"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.when(
            F.col("__b") < F.col("__last"), F.col("__churn")
        ).alias("n_churned_next"),
    )


def rolling_distinct_exact(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    window_days: int,
) -> DataFrame:
    """Trailing-window distinct actives, EXACT: for every day with
    events, |distinct keys in [day − window+1, day]| — the rolling
    7-day-active-users shape. Distinct counts do NOT merge across
    window positions, so the honest exact form replicates each (day,
    key) pair into the ≤``window_days`` windows it serves via one
    bounded sequence-explode, then runs one distinct aggregation —
    shuffle ≤ window_days × |daily distinct pairs|, the standard
    exact-rolling-distinct cost (the mergeable-sketch twin
    :func:`rolling_distinct_hll` replaces the replication with
    O(days) 4 KB sketch unions; this operator is its oracle-checkable
    anchor). Returns (day, n_active), day-ascending semantics."""
    if window_days < 1:
        raise ValueError("rolling_distinct_exact needs window_days >= 1")
    daily = df.select(
        F.to_date(F.col(ts_col)).alias("__d"), F.col(key_col).alias("__k")
    ).distinct()
    served = daily.select(
        F.col("__k"),
        F.explode(
            F.sequence(
                F.col("__d"),
                F.date_add(F.col("__d"), window_days - 1),
            )
        ).alias("day"),
    )
    # only days that actually have events report (join back to the
    # observed-day set — a trailing window of a silent day is not a row)
    observed = daily.select(F.col("__d").alias("day")).distinct()
    return (
        served.join(observed, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("__k").cast("long").alias("n_active"))
    )


def rolling_distinct_hll(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    window_days: int,
    lgk: int = 12,
) -> DataFrame:
    """The MERGEABLE-sketch twin of :func:`rolling_distinct_exact`:
    one HLL sketch per day (4 KB each), then each day UNIONS its
    trailing ``window_days`` sketches — O(days × window) sketch merges
    instead of re-shuffling (day, key) pairs per window position; at
    100 TB the daily sketches are the only thing that ever leaves the
    executors, and the same per-day partials serve any window length
    after the fact. Estimates are engine-specific (rows-only; the
    exact twin is the verification anchor, tolerance-tested).
    Returns (day, n_active_est)."""
    if window_days < 1:
        raise ValueError("rolling_distinct_hll needs window_days >= 1")
    per_day = df.groupBy(
        F.to_date(F.col(ts_col)).alias("__d")
    ).agg(
        F.hll_sketch_agg(
            F.col(key_col).cast("string"), F.lit(lgk)
        ).alias("__hll")
    )
    probe = per_day.select(
        F.col("__d").alias("day")
    )
    served = per_day.select(
        "__hll",
        F.explode(
            F.sequence(
                F.col("__d"), F.date_add(F.col("__d"), window_days - 1)
            )
        ).alias("day"),
    )
    return (
        served.join(probe, "day", "left_semi")
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("__hll"))
            .cast("long")
            .alias("n_active_est")
        )
    )


def interevent_stats(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Per-key inter-event time statistics + burstiness: gaps between
    consecutive events (one lag window per key), their mean and
    population std in seconds, and the Goh-Barabási burstiness
    B = (σ − μ)/(σ + μ) — the one-number tempo signature (-1 periodic
    metronome, 0 Poisson, →1 bursty), the behavioral feature churn and
    bot models start from.

    Exactness: gaps are integer MICROSECONDS (no float time math);
    Σgap stays int64, Σgap² accumulates as DECIMAL(38,0) (a 30-day gap
    squares past int64); mean/std/burstiness are fixed double
    expressions of those exact sums. Keys with < 2 events are absent
    (no gaps). One window pass + one aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = df.select(
        F.col(key_col), (us - F.lag(us).over(w)).alias("__gap")
    ).filter(F.col("__gap").isNotNull())
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("__gap").cast("long").alias("__s"),
        F.sum(
            F.col("__gap").cast("decimal(38,0)")
            * F.col("__gap").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("__ss"),
    )
    n = F.col("n_gaps").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    sigma = F.sqrt(n * ss - s * s) / n
    mu = s / n
    return agg.select(
        key_col,
        "n_gaps",
        (mu / F.lit(1_000_000.0)).alias("mean_gap_s"),
        (sigma / F.lit(1_000_000.0)).alias("std_gap_s"),
        F.when(
            (sigma + mu) > 0, (sigma - mu) / (sigma + mu)
        ).alias("burstiness"),
    )


def activity_streaks(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Gaps-and-islands: per-key CONSECUTIVE-DAY activity streaks —
    the retention feature ("longest daily streak") product analytics
    builds on event logs. Returns one row per key: (key, active_days,
    n_streaks, longest_streak, longest_streak_end).

    Formulation: distinct (key, day) → per-key ``row_number`` ordered
    by day → the classic island anchor ``day − row_number`` (constant
    within a run of consecutive days) → streak lengths by
    (key, anchor). Ties for the longest streak resolve to the LATEST
    end date via a lexicographic struct max — a total order, hence
    engine-independent.

    Scale: one distinct shuffle on (key, day), one window whose
    partitions hold each key's distinct DAYS (bounded by the calendar,
    not by event volume), two key-local aggregations. No self-join,
    no range join."""
    days = df.select(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("__day")
    ).distinct()
    w = Window.partitionBy(key_col).orderBy("__day")
    runs = days.withColumn(
        "__anchor", F.date_sub(F.col("__day"), F.row_number().over(w))
    )
    streaks = runs.groupBy(key_col, "__anchor").agg(
        F.count(F.lit(1)).cast("long").alias("__len"),
        F.max("__day").alias("__end"),
    )
    best = F.max(F.struct(F.col("__len"), F.col("__end")))
    return streaks.groupBy(key_col).agg(
        F.sum("__len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        best.getField("__len").cast("long").alias("longest_streak"),
        best.getField("__end").alias("longest_streak_end"),
    )


def max_drawdown(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    scale: int = 4,
) -> DataFrame:
    """Peak-to-trough MAX DRAWDOWN of a time series: the largest drop
    from a running maximum to a later value — the risk/monitoring
    metric for any daily-revenue or engagement series. Returns ONE row:
    (peak_day, trough_day, peak_value, trough_value, max_drawdown).

    Exactness: the series is pre-cast to DECIMAL(18, ``scale``) so the
    running max and the subtraction are exact (no float accumulation
    anywhere); doubles appear only in the final display casts. Tie
    policy (engine-independent total order): the trough is the
    EARLIEST time achieving the maximal drawdown; the peak is the
    EARLIEST time at-or-before the trough holding the running max.

    Scale: callers pass a PRE-AGGREGATED series (one row per period),
    so the ordered window runs over periods — bounded by the calendar,
    not by raw event volume. The final argmin join is against a
    one-row broadcast."""
    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    w = Window.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = df.select(
        F.col(time_col).alias("__t"),
        dec.alias("__v"),
        F.max(dec).over(w).alias("__peak"),
    ).withColumn("__dd", F.col("__peak") - F.col("__v"))
    worst = dd.agg(F.max("__dd").alias("__maxdd"))
    trough = (
        dd.join(F.broadcast(worst), dd["__dd"] == worst["__maxdd"])
        .groupBy()
        .agg(
            F.min(F.struct("__t", "__v", "__peak")).alias("__s"),
            F.first("__maxdd").alias("__maxdd"),
        )
        .select(
            F.col("__s.__t").alias("trough_day"),
            F.col("__s.__v").alias("__tv"),
            F.col("__s.__peak").alias("__pv"),
            F.col("__maxdd").alias("__maxdd"),
        )
    )
    peak = (
        dd.join(F.broadcast(trough), (dd["__v"] == trough["__pv"]) & (dd["__t"] <= trough["trough_day"]))
        .groupBy()
        .agg(
            F.min("__t").alias("peak_day"),
            F.first("trough_day").alias("trough_day"),
            F.first("__pv").alias("__pv"),
            F.first("__tv").alias("__tv"),
            F.first("__maxdd").alias("__maxdd"),
        )
    )
    return peak.select(
        "peak_day",
        "trough_day",
        F.col("__pv").cast("double").alias("peak_value"),
        F.col("__tv").cast("double").alias("trough_value"),
        F.col("__maxdd").cast("double").alias("max_drawdown"),
    )


def conversion_pairs(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    *,
    max_gap_minutes: int = 60,
    join_type: str = "inner",
) -> DataFrame:
    """Interval-join PAIRS: every right-side row landing within
    [left_ts, left_ts + max_gap_minutes) of a left-side row with the
    same key — the click→purchase conversion join, kept at pair grain
    so the SAME operator backs both the batch aggregate and the
    stream-stream join (streaming.pipeline.build_conversion_join_query
    runs this exact expression with watermarks; parity-tested).

    Plan shape: an EQUI-join on the key with the time band as a
    post-join filter — sort-merge/shuffle-hash on the key, never a
    broadcast-nested-loop range join. Per-key work is (left activity ×
    right activity within the window), bounded by per-user event rates,
    not corpus size; a hot key salts like any skewed equi-join.
    Columns are prefixed l_/r_ to keep both timestamps addressable."""
    lt = F.col("l_" + left_ts)
    rt = F.col("r_" + right_ts)
    lp = left.select(
        F.col(key_col), *[F.col(c).alias("l_" + c) for c in left.columns if c != key_col]
    )
    rp = right.select(
        F.col(key_col), *[F.col(c).alias("r_" + c) for c in right.columns if c != key_col]
    )
    band = (rt >= lt) & (
        rt < lt + F.expr(f"INTERVAL {int(max_gap_minutes)} MINUTES")
    )
    if join_type == "inner":
        return lp.join(rp, key_col).filter(band)
    # outer variants need the band INSIDE the join condition (a
    # post-filter would turn matched-but-out-of-band rows into false
    # positives instead of unmatched lefts)
    cond = (lp[key_col] == rp[key_col]) & band
    joined = lp.join(rp, cond, join_type)
    return joined.select(
        lp[key_col].alias(key_col),
        *[c for c in joined.columns if c != key_col],
    )


def first_conversion_stats(
    pairs: DataFrame,
    left_id: str,
    key_col: str,
    left_ts: str,
    right_ts: str,
    value_col: str | None = None,
) -> DataFrame:
    """Per-left-row conversion aggregate over ``conversion_pairs``
    output: (left id, key, left ts, n_conversions, first_conversion_ts
    [, first_conversion_value]). The first conversion resolves ties by
    (right ts, right id-ish columns) via a lexicographic struct min —
    engine-independent. One aggregation on the left id."""
    lid, lts = "l_" + left_id, "l_" + left_ts
    rts = "r_" + right_ts
    first_keys = [F.col(rts)]
    if value_col is not None:
        first_keys.append(F.col("r_" + value_col))
    first = F.min(F.struct(*first_keys))
    agg = [
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        first.getField(rts).alias("first_conversion_ts"),
    ]
    if value_col is not None:
        agg.append(
            first.getField("r_" + value_col).alias("first_conversion_value")
        )
    return (
        pairs.groupBy(F.col(lid).alias(left_id), F.col(key_col), F.col(lts).alias(left_ts))
        .agg(*agg)
    )


def seasonal_naive_backtest(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    lags: tuple[int, ...] = (1, 7),
    scale: int = 4,
) -> DataFrame:
    """Forecast BASELINE backtest: the mean absolute error of the
    (seasonal-)naive forecast ŷ(t) = y(t − lag) over the series, one
    row per lag — the sanity floor every fancier forecaster (Holt,
    conformal) must beat, and the denominator of the MASE metric.
    Returns (lag, n_days, sum_abs_err, mae).

    Exactness: the series pre-casts to DECIMAL(18, ``scale``); lag
    residuals and their sum stay decimal (|a − b| of decimals is
    exact), so the only doubles are the display casts and the final
    exact-sum ÷ exact-count division. One ordered window pass over the
    PRE-AGGREGATED series (calendar-bounded), one aggregation."""
    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    w = Window.orderBy(time_col)
    lagged = df.select(
        *[
            F.abs(dec - F.lag(dec, lag).over(w)).alias(f"__e{lag}")
            for lag in lags
        ]
    )
    aggs = []
    for lag in lags:
        aggs += [
            F.count(F.col(f"__e{lag}")).cast("long").alias(f"__n{lag}"),
            F.sum(F.col(f"__e{lag}")).alias(f"__s{lag}"),
        ]
    one = lagged.agg(*aggs)
    stack = ", ".join(
        f"{lag}L, __n{lag}, CAST(__s{lag} AS DOUBLE)" for lag in lags
    )
    return one.selectExpr(
        f"stack({len(lags)}, {stack}) AS (lag, n_days, sum_abs_err)"
    ).select(
        "lag",
        "n_days",
        "sum_abs_err",
        (
            F.col("sum_abs_err") / F.col("n_days").cast("double")
        ).alias("mae"),
    )


def dow_adjusted_anomalies(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    z_mad: int = 3,
    scale: int = 4,
) -> DataFrame:
    """Seasonality-adjusted robust anomaly detection: subtract each
    day-of-week's MEDIAN from the daily series, then flag days whose
    residual sits more than ``z_mad`` MADs from the residual median —
    the monitoring gate that doesn't page every Sunday because Sundays
    are always low (a plain z-score flags the weekly rhythm itself).
    Returns the flagged days: (day, dow, value, dow_median, residual).

    Exactness: values pre-cast to DECIMAL(18, ``scale``); every
    median is the LOWER median — an actual element picked from a
    sorted array at index ⌈n/2⌉ (exact decimal, engine-mirrorable) —
    and the flag compares |r − med_r| > z·MAD in pure decimal
    arithmetic. MAD = 0 degrades to flagging any nonzero deviation
    (the robust_outliers contract).

    Shape: the series is a per-day pre-aggregate, so the sorted-array
    medians buffer CALENDAR-bounded groups (≤ n_days/7 and n_days
    elements), the dow medians broadcast, and the final filter is
    codegen."""
    dec = F.col(value_col).cast(f"decimal(18,{scale})")
    daily = df.select(
        F.col(time_col).alias("__day"),
        dec.alias("__v"),
        F.dayofweek(F.col(time_col)).cast("int").alias("__dow"),
    )
    def lower_median(col):
        arr = F.array_sort(F.collect_list(col))
        return F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))

    dow_med = daily.groupBy("__dow").agg(
        lower_median(F.col("__v")).alias("__dmed")
    )
    resid = daily.join(F.broadcast(dow_med), "__dow").withColumn(
        "__r", F.col("__v") - F.col("__dmed")
    )
    gstats = resid.agg(lower_median(F.col("__r")).alias("__rmed"))
    resid2 = resid.join(F.broadcast(gstats)).withColumn(
        "__ad", F.abs(F.col("__r") - F.col("__rmed"))
    )
    mad = resid2.agg(lower_median(F.col("__ad")).alias("__mad"))
    return (
        resid2.join(F.broadcast(mad))
        .filter(F.col("__ad") > F.lit(z_mad) * F.col("__mad"))
        .select(
            F.col("__day").alias("day"),
            F.col("__dow").cast("long").alias("dow"),
            F.col("__v").cast("double").alias("value"),
            F.col("__dmed").cast("double").alias("dow_median"),
            F.col("__r").cast("double").alias("residual"),
        )
        .orderBy("day")
    )


def adjacent_period_overlap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    period: str = "week",
    scale: int = 1_000_000,
) -> DataFrame:
    """Audience overlap between CONSECUTIVE periods: per adjacent
    (period, period+1) pair, the distinct-key intersection, union, and
    Jaccard — the week-over-week "same users came back?" retention
    companion (stickiness gives the ratio of actives; this names how
    much of the audience is literally the same set). Returns one row
    per adjacent pair: (period_start, next_start, n_prev, n_next,
    n_common, jaccard_scaled).

    Exactness: all set sizes are exact integer counts from ONE
    distinct (key, period) aggregation; membership in consecutive
    periods is a self-equi-join on the key with the period shifted —
    shuffle carries distinct (key, period) rows, never raw events;
    Jaccard is a floor-scaled integer ratio.
    """
    per = df.select(
        F.col(key_col).alias("__k"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("__p"),
    ).distinct()
    step = {"day": 1, "week": 7}.get(period)
    if step is None:
        raise ValueError("adjacent_period_overlap supports day/week periods")
    a = per.select("__k", F.col("__p").alias("period_start"))
    b = per.select(
        "__k", F.date_sub(F.col("__p"), step).alias("period_start")
    )
    common = a.join(b, ["__k", "period_start"]).groupBy("period_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    sizes = per.groupBy(F.col("__p").alias("period_start")).agg(
        F.count(F.lit(1)).cast("long").alias("n_prev")
    )
    nsizes = per.groupBy(
        F.date_sub(F.col("__p"), step).alias("period_start")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_next"))
    out = (
        sizes.join(nsizes, "period_start")
        .join(common, "period_start", "left")
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0)))
    )
    return out.select(
        "period_start",
        F.date_add("period_start", step).alias("next_start"),
        "n_prev",
        "n_next",
        F.col("n_common").cast("long").alias("n_common"),
        F.expr(
            f"CAST((n_common * CAST({scale} AS BIGINT))"
            " DIV (n_prev + n_next - n_common) AS BIGINT)"
        ).alias("jaccard_scaled"),
    ).orderBy("period_start")


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    *,
    horizon: int,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve — :func:`kaplan_meier`'s
    additive sibling: at every event time, H(t) accumulates d_t ∕ r_t
    (the instantaneous hazard) instead of multiplying survival
    factors, which is the better-behaved estimator for small risk
    sets and the input to proportional-hazards eyeballing
    (parallel-ish H curves between cohorts ⇒ PH is plausible).
    Administrative censoring at ``horizon``, same as KM.

    Determinism contract: identical to KM's — exact integer d_t/r_t
    from one time-keyed aggregation + one suffix-sum window, each
    increment one double division, and the cumulative sum folds
    LEFT-TO-RIGHT over the time-sorted increment array, the operation
    sequence a recursive CTE (or DuckDB list_reduce) reproduces
    bit-for-bit. Returns (t, n_at_risk, n_events, hazard_increment,
    cum_hazard) at event times, time-ascending."""
    if df.filter(F.col(duration_col) < 0).limit(1).count() > 0:
        raise ValueError("nelson_aalen: negative durations present")
    obs = df.select(
        F.least(F.col(duration_col).cast("long"), F.lit(horizon)).alias(
            "__t"
        ),
        (F.col(duration_col) <= horizon).cast("int").alias("__e"),
    )
    per_t = obs.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__e").cast("long").alias("__d"),
    )
    w_suffix = Window.orderBy(F.desc("__t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risked = per_t.select(
        "__t",
        "__d",
        F.sum("__n").over(w_suffix).cast("long").alias("__r"),
    ).filter(F.col("__d") > 0)
    inc = F.col("__d").cast("double") / F.col("__r").cast("double")
    series = risked.select("__t", "__d", "__r", inc.alias("__h"))
    one_row = series.agg(
        F.sort_array(
            F.collect_list(F.struct("__t", "__d", "__r", "__h"))
        ).alias("__s")
    )
    exploded = one_row.select(F.posexplode("__s").alias("__i", "__row"))
    cum = F.aggregate(
        F.expr("slice(__all, 1, __i + 1)"),
        F.lit(0.0),
        lambda acc, x: acc + x["__h"],
    )
    return (
        exploded.crossJoin(
            F.broadcast(one_row.select(F.col("__s").alias("__all")))
        )
        .select(
            F.col("__row.__t").alias("t"),
            F.col("__row.__r").alias("n_at_risk"),
            F.col("__row.__d").alias("n_events"),
            F.col("__row.__h").alias("hazard_increment"),
            cum.alias("cum_hazard"),
        )
    )


def pettitt_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Pettitt's nonparametric single-changepoint test (Pettitt 1979)
    over an ordered series: the split position t maximizing |U_t|,
    U_t = 2·Σ_{i≤t} r_i − t·(n+1) with tie-AVERAGED ranks — the
    rank-sum form of Σ_{i≤t}Σ_{j>t} sign(x_j − x_i), i.e. a
    Mann-Whitney sweep over every prefix/suffix split at once. The
    CUSUM family (:func:`cusum_changepoints`) watches a known target;
    Pettitt finds WHERE the distribution shifted with no parameters.

    Exactness: tie-averaged ranks ride the DOUBLED-rank device
    (:func:`~..experiment.mann_whitney_u` — a tie run spanning ranks
    f..l contributes f+l per member, an integer), so
    U_t = S2_t − t·(n+1) with S2_t the doubled-rank prefix sum is
    EXACT integer arithmetic end to end — hash-checkable. The argmax
    tie-breaks on the earliest position (a total order).

    Shape: one (value)-grain rank table (distinct values + the f+l
    window), one join back, one prefix window in ``order_col`` order.
    The series is expected to be PRE-AGGREGATED to a bounded grain
    (daily/hourly rollups — the calendar-bounded global-window
    contract); rows, not raw events. Returns ONE row:
    (n_points, t_star, change_at, u_abs) — the changepoint is AFTER
    position t_star (1-based), ``change_at`` is that row's
    ``order_col`` value."""
    pts = df.select(
        F.col(order_col).alias("__o"), F.col(value_col).alias("__v")
    )
    vals = pts.groupBy("__v").agg(F.count(F.lit(1)).alias("__c"))
    w_val = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # doubled tie-averaged rank: f+l = 2*cum_before + run + 1
    r2 = vals.select(
        "__v",
        (F.lit(2) * F.sum("__c").over(w_val) - F.col("__c") + 1)
        .cast("long")
        .alias("__r2"),
    )
    w_ord = Window.orderBy("__o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = (
        pts.join(r2, "__v")
        .select(
            "__o",
            F.row_number().over(Window.orderBy("__o")).alias("__t"),
            F.sum("__r2").over(w_ord).alias("__s2"),
            F.count(F.lit(1)).over(w_all).alias("__n"),
        )
    )
    u = ranked.select(
        "__o",
        "__t",
        "__n",
        F.abs(
            F.col("__s2") - F.col("__t") * (F.col("__n") + 1)
        ).alias("__u"),
    ).filter(F.col("__t") < F.col("__n"))
    return (
        u.orderBy(F.desc("__u"), F.asc("__t"))
        .limit(1)
        .select(
            F.col("__n").cast("long").alias("n_points"),
            F.col("__t").cast("long").alias("t_star"),
            F.col("__o").alias("change_at"),
            F.col("__u").cast("long").alias("u_abs"),
        )
    )


def transition_backtest(
    events: DataFrame,
    key_col: str,
    type_col: str,
    time_col: str,
    cutoff: str,
    *,
    tiebreak_col: str | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Markov next-event model TRAIN + TEMPORAL BACKTEST in one pass:
    fit the first-order argmax predictor (per source type, the most
    frequent next type) on transitions completed BEFORE ``cutoff``,
    then score it on transitions completed on/after — the accuracy
    readout that tells you whether yesterday's transition matrix still
    predicts today (the model-lifecycle sibling of
    :func:`transition_matrix`, which only describes).

    Determinism: the argmax tie-breaks on (count DESC, next-type ASC)
    — a total order; per-key event order is (time, tiebreak). A test
    transition whose source type never appeared in training gets a
    NULL prediction and counts as incorrect (that is exactly the
    coverage gap the backtest should surface). Accuracy is the
    floor-scaled integer ratio n_correct·scale DIV n_test.

    Shape: one per-key lead window over events, one O(types²) training
    aggregation + an O(types) argmax window, one broadcast join onto
    the test slice, one O(types) rollup. Returns (from_type,
    predicted, n_test, n_correct, acc_scaled)."""
    order_cols = [F.col(time_col)]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    seq = events.select(
        F.col(type_col).alias("__from"),
        F.lead(type_col).over(w).alias("__next"),
        F.lead(time_col).over(w).alias("__nts"),
    ).filter(F.col("__next").isNotNull())
    cut = F.lit(cutoff).cast("timestamp")
    train = seq.filter(F.col("__nts") < cut)
    test = seq.filter(F.col("__nts") >= cut)
    counts = train.groupBy("__from", "__next").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_rank = Window.partitionBy("__from").orderBy(
        F.desc("__c"), F.asc("__next")
    )
    model = (
        counts.select(
            "__from",
            F.col("__next").alias("predicted"),
            F.row_number().over(w_rank).alias("__r"),
        )
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    scored = test.join(F.broadcast(model), "__from", "left")
    return (
        scored.groupBy(F.col("__from").alias("from_type"))
        .agg(
            F.max("predicted").alias("predicted"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (F.col("predicted") == F.col("__next")).cast("long")
            ).cast("long").alias("n_correct"),
        )
        .selectExpr(
            "from_type", "predicted", "n_test",
            "COALESCE(n_correct, 0) AS n_correct",
            f"CAST(COALESCE(n_correct, 0) * {scale} AS DECIMAL(38,0)) "
            "DIV n_test AS acc_scaled",
        )
        .selectExpr(
            "from_type", "predicted", "n_test", "n_correct",
            "CAST(acc_scaled AS BIGINT) AS acc_scaled",
        )
    )


def fifo_allocate(
    supply: DataFrame,
    demand: DataFrame,
    key_col: str,
    time_col: str,
    qty_col: str,
    *,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Quantity-weighted FIFO matching made DECLARATIVE (the inventory
    costing / lot-tracking primitive): per key, demand consumes supply
    strictly oldest-first. The sequential walk every imperative
    implementation does becomes two cumulative sums + one SORTED MERGE
    — supply row i owns the quantity interval [cum_{i−1}, cum_i) on
    the key's FIFO axis, demand row j owns its own interval, and every
    overlapping (supply, demand) interval pair IS an allocation of
    exactly the overlap length.

    Merge, not join (r9 — found by the 30× scale probe): the r8
    formulation joined the two interval sets per key and filtered on
    overlap, which materializes n_s·n_d candidate pairs per key before
    the filter — quadratic in PER-KEY HISTORY, the thing that grows as
    a SKU ages (measured: 6.3× wall for the 3× step from 10× to 30×
    data). Because each side's intervals are CONSECUTIVE on the same
    axis, every overlapping pair has its ``greatest(lo, lo)`` at one
    side's interval start, so the pairing is exactly: union both
    sides' boundary rows, per-key fill-forward of the other side's
    open interval (``last(…, ignorenulls)`` over the lo-ordered
    window), and emit ``least(hi, hi) − lo`` where positive. One
    emission per union row — the ≤ n_supply + n_demand − 1 output
    bound is now also the COMPUTE bound; no per-key quadratic
    anywhere. Zero/negative-quantity rows are dropped up front (they
    can never receive an allocation, and a zero-width interval would
    otherwise shadow the covering interval in the fill-forward).

    Exactness: quantities accumulate as DECIMAL(18,4); the overlap
    is exact decimal arithmetic and identical to the join
    formulation's ``least − greatest`` (the oracle replays THAT n²
    relational form — the hash match is the merge's proof). Ordering
    is (time, *tiebreak_cols) — pass tiebreaks that make the per-key
    order total or allocations are not reproducible; within a key,
    boundary ties across sides order supply-first (both orders emit
    the same pairs — the zero-width candidates the tie creates are
    filtered by the positivity check). Unmatched tails (excess demand
    or leftover supply) simply have no pair — callers aggregate the
    shortfall as total − allocated.

    Returns (key, supply_ts, demand_ts, qty_allocated) with one row
    per overlapping pair."""
    from pyspark.sql import Window

    tb = tiebreak_cols or []

    def cum(df: DataFrame, side: str) -> DataFrame:
        w = Window.partitionBy(key_col).orderBy(
            F.col(time_col), *[F.col(c) for c in tb]
        ).rowsBetween(Window.unboundedPreceding, 0)
        q = F.col(qty_col).cast("decimal(18,4)")
        return df.filter(
            F.col(qty_col).isNotNull() & (F.col(qty_col) > 0)
        ).select(
            F.col(key_col).alias("__k"),
            F.col(time_col).alias(f"{side}_ts"),
            q.alias("__q"),
            F.sum(q).over(w).alias("__hi"),
        ).select(
            "__k",
            f"{side}_ts",
            (F.col("__hi") - F.col("__q")).alias("__lo"),
            F.col("__hi").alias(f"__{side}_hi"),
        )

    s = cum(supply, "supply")
    d = cum(demand, "demand")
    # null literals for the absent side are typed from the other
    # side's actual dtypes (time columns keep whatever type the
    # caller supplied — date/timestamp/long)
    merged = s.select(
        "__k", "__lo", F.lit(0).alias("__side"),
        F.col("supply_ts"), F.col("__supply_hi"),
        F.lit(None).cast(dict(d.dtypes)["demand_ts"]).alias("demand_ts"),
        F.lit(None).cast(dict(d.dtypes)["__demand_hi"]).alias("__demand_hi"),
    ).unionByName(
        d.select(
            "__k", "__lo", F.lit(1).alias("__side"),
            F.lit(None).cast(dict(s.dtypes)["supply_ts"]).alias("supply_ts"),
            F.lit(None).cast(dict(s.dtypes)["__supply_hi"]).alias("__supply_hi"),
            F.col("demand_ts"), F.col("__demand_hi"),
        )
    )
    w = Window.partitionBy("__k").orderBy("__lo", "__side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = merged.select(
        "__k",
        "__lo",
        F.last("supply_ts", ignorenulls=True).over(w).alias("supply_ts"),
        F.last("__supply_hi", ignorenulls=True).over(w).alias("__s_hi"),
        F.last("demand_ts", ignorenulls=True).over(w).alias("demand_ts"),
        F.last("__demand_hi", ignorenulls=True).over(w).alias("__d_hi"),
    )
    return (
        filled.filter(
            F.col("supply_ts").isNotNull()
            & F.col("demand_ts").isNotNull()
            & (F.least("__s_hi", "__d_hi") > F.col("__lo"))
        )
        .select(
            F.col("__k").alias(key_col),
            "supply_ts",
            "demand_ts",
            (F.least("__s_hi", "__d_hi") - F.col("__lo"))
            .alias("qty_allocated"),
        )
    )


def holt_winters_forecast(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    *,
    season: int = 7,
    horizon: int = 1,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing (level +
    trend + ``season``-slot seasonality) with α = β = γ = 1/4, in the
    same EXACT INTEGER arithmetic as :func:`holt_forecast` — the
    seasonal completion of the forecasting family (Holt tracks level
    and slope; this also learns the weekly/whatever rhythm so the
    one-step backtest stops paying the seasonal error every period).

    Determinism devices (all shared with holt_forecast): DECIMAL(18,4)
    ×10⁴ lossless quantization, dyadic smoothing via the portable
    floor division fd(a) = (a − pmod(a,4))/4, sorted-array fold per
    group (series bounded by the calendar), seed l₁ = x₁, b = 0,
    s[·] = 0 — every engine computes the identical bit pattern, so
    the whole trajectory is ORACLE-hash-checkable (the DuckDB twin is
    a recursive CTE carrying the seasonal slots as columns).

    Updates per step (slot = step index mod season, s = slot's value):
        pred = l + b + s            (before seeing x_t)
        l'   = fd((x_t − s) + 3·(l + b))
        b'   = fd((l' − l) + 3·b)
        s'   = fd((x_t − l') + 3·s)
    Returns (group, t, x, level, trend, seasonal, one_step_pred,
    forecast_h) with forecast_h = l' + horizon·b' + s_new[(slot +
    horizon) mod season]."""
    if season < 2:
        raise ValueError("holt_winters_forecast needs season >= 2")
    if horizon < 0:
        raise ValueError("holt_winters_forecast needs horizon >= 0")
    x_q = (
        F.col(value_col).cast("decimal(18,4)") * F.lit(10000)
    ).cast("long")
    t_type = df.select(F.col(t_col)).schema[0].dataType.simpleString()
    one_row = df.select(
        F.col(group_col).alias("g"),
        F.col(t_col).alias("__t"),
        x_q.alias("__x"),
    ).groupBy("g").agg(
        F.sort_array(F.collect_list(F.struct("__t", "__x"))).alias("__s")
    )
    init = F.struct(
        F.lit(None).cast("long").alias("l"),
        F.lit(None).cast("long").alias("b"),
        F.array_repeat(F.lit(0).cast("long"), season).alias("s"),
        F.array()
        .cast(
            f"array<struct<__t:{t_type},__x:long,l:long,b:long,"
            "sv:long,pred:long,fh:long>>"
        )
        .alias("out"),
    )

    def fd4(a):
        return ((a - F.pmod(a, F.lit(4))) / F.lit(4)).cast("long")

    def step(acc, e):
        seeded = acc["l"].isNotNull()
        slot = F.pmod(F.size(acc["out"]), F.lit(season))
        s_old = F.element_at(acc["s"], slot + F.lit(1))
        l_new = F.when(
            seeded,
            fd4((e["__x"] - s_old) + F.lit(3) * (acc["l"] + acc["b"])),
        ).otherwise(e["__x"])
        b_new = F.when(
            seeded, fd4((l_new - acc["l"]) + F.lit(3) * acc["b"])
        ).otherwise(F.lit(0).cast("long"))
        s_upd = F.when(
            seeded, fd4((e["__x"] - l_new) + F.lit(3) * s_old)
        ).otherwise(F.lit(0).cast("long"))
        s_new = F.transform(
            acc["s"],
            lambda v, idx: F.when(idx == slot, s_upd).otherwise(v),
        )
        pred = F.when(seeded, acc["l"] + acc["b"] + s_old)
        fh = (
            l_new
            + F.lit(horizon) * b_new
            + F.element_at(
                s_new,
                F.pmod(slot + F.lit(horizon), F.lit(season)) + F.lit(1),
            )
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            s_new.alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        e["__t"].alias("__t"),
                        e["__x"].alias("__x"),
                        l_new.alias("l"),
                        b_new.alias("b"),
                        s_upd.alias("sv"),
                        pred.cast("long").alias("pred"),
                        fh.cast("long").alias("fh"),
                    )
                ),
            ).alias("out"),
        )

    folded = one_row.select(
        "g", F.aggregate("__s", init, step)["out"].alias("__out")
    )
    dq = lambda c: c.cast("double") / F.lit(10000.0)  # noqa: E731
    e = F.col("__e")
    return folded.select("g", F.explode("__out").alias("__e")).select(
        F.col("g").alias(group_col),
        e["__t"].alias(t_col),
        dq(e["__x"]).alias("x"),
        dq(e["l"]).alias("level"),
        dq(e["b"]).alias("trend"),
        dq(e["sv"]).alias("seasonal"),
        dq(e["pred"]).alias("one_step_pred"),
        dq(e["fh"]).alias("forecast_h"),
    )


def forecast_residual_anomalies(
    forecast: DataFrame,
    t_col: str,
    *,
    x_col: str = "x",
    pred_col: str = "one_step_pred",
    z_mad: float = 3.0,
) -> DataFrame:
    """Forecast-based anomaly detection: flag the points whose
    one-step-ahead forecast error is extreme — |residual − median| >
    ``z_mad``·MAD — completing the anomaly family's ladder (rolling
    z-score → calendar-median adjustment → CUSUM drift → Pettitt
    changepoint → MODEL-RESIDUAL, the strongest member: whatever
    structure the forecaster learned, level, trend or seasonality,
    stops paging).

    Takes any frame shaped like the forecasters' output ((t, x,
    one_step_pred); seed rows with NULL predictions are skipped).
    Determinism: the inputs are exact dyadic-recursion values rendered
    as doubles, and every operation here — subtraction, sorted-array
    lower-median pick, one multiply, one compare — is a single IEEE
    op computed identically by any engine, so the flag set is
    hash-checkable WITHOUT re-quantizing (a double→DECIMAL cast here
    would be the non-portable step: Spark rounds, DuckDB truncates).
    Medians buffer the calendar-bounded series (the sorted-array
    contract). Returns flagged rows (t, x, one_step_pred, residual)
    ordered by t."""
    base = forecast.filter(F.col(pred_col).isNotNull()).select(
        F.col(t_col).alias("__t"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(pred_col).cast("double").alias("__p"),
        (F.col(x_col).cast("double") - F.col(pred_col).cast("double"))
        .alias("__r"),
    )

    def lower_median(col):
        arr = F.array_sort(F.collect_list(col))
        return F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))

    rmed = base.agg(lower_median(F.col("__r")).alias("__rmed"))
    wd = base.join(F.broadcast(rmed)).withColumn(
        "__ad", F.abs(F.col("__r") - F.col("__rmed"))
    )
    mad = wd.agg(lower_median(F.col("__ad")).alias("__mad"))
    return (
        wd.join(F.broadcast(mad))
        .filter(F.col("__ad") > F.lit(z_mad) * F.col("__mad"))
        .select(
            F.col("__t").alias(t_col),
            F.col("__x").alias("x"),
            F.col("__p").alias("one_step_pred"),
            F.col("__r").alias("residual"),
        )
        .orderBy(t_col)
    )


def logrank_test(
    df: DataFrame,
    group_col: str,
    time_col: str,
    event_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Log-rank test, exact-ingredient: do two groups share a survival
    curve? At every distinct event time t the 2×2 table (deaths vs
    survivors × group) contributes O−E = d_a − d·n_a/n and
    hypergeometric variance d·n_a·(n−n_a)·(n−d) / (n²·(n−1)) — the
    inferential companion to :func:`kaplan_meier` (which only DRAWS
    the curves; this says whether their gap is noise). Censored units
    leave the risk set without contributing a term.

    Exactness scheme: risk sets and death counts are exact integers
    at distinct-time grain (one ordered cumulative window — input
    bounded by TIME CARDINALITY, so callers pre-quantize to
    day/week grain); each time's E and V terms leave integers through
    a SINGLE division of exact-cast doubles, folded LEFT-TO-RIGHT in
    time order (the kruskal device) — bit-identical in any engine
    that mirrors the fold. chi2 = (O−E)²/V on the folded doubles.

    Returns ONE row: (n_a, n_b, events_a, events_b, o_minus_e,
    var_lr, chi2); chi2 NULL when V = 0 (no comparable event times).

    ``event_col``: 1 = event observed at ``time_col``, 0 = censored
    (leaves the risk set after ``time_col``)."""
    from pyspark.sql import Window

    g = F.col(group_col)
    rows = df.filter(g.isin([group_a, group_b])).select(
        F.col(time_col).cast("long").alias("__t"),
        F.col(event_col).cast("long").alias("__e"),
        (g == F.lit(group_a)).cast("long").alias("__a"),
    )
    from ..functions.cache import persist_tracked

    # persist the time grain: the risk-set window, the term fold, and
    # the size totals all consume it — ONE scan of the fact table
    # (sizes derive from pts, never a second input scan)
    pts = persist_tracked(
        rows.groupBy("__t").agg(
            F.count(F.lit(1)).alias("__r"),
            F.sum("__a").alias("__ra"),
            F.sum("__e").alias("__d"),
            F.sum(F.col("__e") * F.col("__a")).alias("__da"),
        )
    )
    # at-risk just before t = everyone whose time >= t
    w = Window.orderBy(F.col("__t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = pts.select(
        "__t",
        "__d",
        "__da",
        F.sum("__r").over(w).alias("__n"),
        F.sum("__ra").over(w).alias("__na"),
    ).filter(F.col("__d") > 0)
    dec = "decimal(38,0)"
    terms = risk.select(
        "__t",
        "__da",
        # E term: d·n_a/n — one exact-integer product, one division
        (
            (F.col("__d").cast(dec) * F.col("__na").cast(dec)).cast(
                "double"
            )
            / F.col("__n").cast("double")
        ).alias("__et"),
        # V term: d·n_a·(n−n_a)·(n−d) / (n²·(n−1)), 0 when n=1
        F.when(
            F.col("__n") > 1,
            (
                F.col("__d").cast(dec)
                * F.col("__na").cast(dec)
                * (F.col("__n") - F.col("__na")).cast(dec)
                * (F.col("__n") - F.col("__d")).cast(dec)
            ).cast("double")
            / (
                F.col("__n").cast(dec)
                * F.col("__n").cast(dec)
                * (F.col("__n") - 1).cast(dec)
            ).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("__vt"),
    )
    # coalesce: zero event times (fully censored data) must read as
    # events_a=0 / e1=0 / v1=0, not NULL — both engines mirror this
    folded = terms.agg(
        F.coalesce(F.sum("__da"), F.lit(0)).cast("long").alias(
            "events_a"
        ),
        F.sort_array(
            F.collect_list(F.struct("__t", "__et", "__vt"))
        ).alias("__ts"),
    )
    e1 = F.aggregate(
        F.transform(F.col("__ts"), lambda s: s["__et"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    v1 = F.aggregate(
        F.transform(F.col("__ts"), lambda s: s["__vt"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sizes = pts.agg(
        F.sum("__ra").cast("long").alias("n_a"),
        F.sum(F.col("__r") - F.col("__ra")).cast("long").alias("n_b"),
        F.sum(F.col("__d") - F.col("__da"))
        .cast("long")
        .alias("events_b"),
    )
    ome = F.col("events_a").cast("double") - F.col("__e1")
    return (
        folded.select("events_a", e1.alias("__e1"), v1.alias("__v1"))
        .crossJoin(sizes)
        .select(
            "n_a",
            "n_b",
            "events_a",
            "events_b",
            ome.alias("o_minus_e"),
            F.col("__v1").alias("var_lr"),
            F.when(
                F.col("__v1") > 0, (ome * ome) / F.col("__v1")
            ).alias("chi2"),
        )
    )


def stl_lite(
    df: DataFrame,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Additive trend/seasonal/remainder decomposition (STL-lite):
    trend = centered 7-OBSERVATION moving average of the day-ordered
    series, seasonal = day-of-week mean of the detrended series,
    remainder = value − trend − seasonal — the classical
    decomposition a forecaster inspects before choosing a model
    (:func:`holt_winters_forecast` ASSUMES this structure; this
    SHOWS it). Days are observation-indexed, not calendar-indexed:
    on sparse series the window spans the 7 nearest observed days
    (gap-fill first — `daily_gapfill` — for calendar semantics).

    Exactness scheme: ``value_col`` must be integer (cents). The
    7-fold detrended value 7·v − Σ₇v is an exact BIGINT, so the
    per-dow seasonal means are single divisions of exact integers
    (Σ detrended7 / (7·count)); trend is Σ₇v/7 (one division);
    remainder is a fixed-order IEEE expression over those — all
    bit-identical across engines. Edge observations (no full ±3
    window) carry NULL trend/seasonal/remainder and are EXCLUDED
    from the seasonal fit.

    Shape: one day-grain aggregation upstream of this operator, one
    ordered ±3 rows window at DAY GRAIN (input bounded by calendar
    cardinality, never row count), one 7-row broadcast join of dow
    means. Returns (day, value, trend, seasonal, remainder)."""
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(-3, 3)
    base = df.select(
        F.col(day_col).alias("day"),
        F.col(value_col).cast("long").alias("value"),
    ).select(
        "day",
        "value",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("value").over(w),
        ).alias("__sum7"),
    )
    det = base.select(
        "day",
        "value",
        "__sum7",
        (F.lit(7) * F.col("value") - F.col("__sum7")).alias("__det7"),
        F.dayofweek("day").alias("__dow"),
    )
    seas = (
        det.filter(F.col("__det7").isNotNull())
        .groupBy("__dow")
        .agg(
            (
                F.sum("__det7").cast("double")
                / (F.lit(7) * F.count(F.lit(1))).cast("double")
            ).alias("__seasonal")
        )
    )
    trend = F.col("__sum7").cast("double") / F.lit(7.0)
    return (
        det.join(F.broadcast(seas), "__dow", "left")
        .select(
            "day",
            "value",
            trend.alias("trend"),
            F.when(
                F.col("__sum7").isNotNull(), F.col("__seasonal")
            ).alias("seasonal"),
            F.when(
                F.col("__sum7").isNotNull(),
                F.col("value").cast("double")
                - trend
                - F.col("__seasonal"),
            ).alias("remainder"),
        )
        .orderBy("day")
    )


def haar_energy(
    df: DataFrame,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Unnormalized Haar wavelet energy spectrum: which TIME SCALES
    carry the series' variance — level 1 = day-to-day, level k =
    2^(k-1)-day swings — the dyadic spectral readout a forecaster uses
    to pick seasonality/smoothing windows, computed with ZERO floats:
    each level's detail coefficients are pairwise differences
    d = a − b and the next level's signal is pairwise sums s = a + b
    (the unnormalized Haar transform; energies relate to the
    orthonormal ones by the fixed 2^level factor, stated so callers
    can rescale offline).

    Exactness: integer input (cents); sums/differences/energies ride
    exact DECIMAL(38,0); each level's energy is published as its digit
    STRING (Σd² exceeds int64 by construction at realistic scales —
    the r10 portable-surface rule) plus a single-division double
    share of total energy. The series is the day-ordered prefix of
    length 2^k (largest power of two ≤ n_days — the standard dyadic
    truncation, stated in the row count).

    Shape: one day-grain aggregation upstream; one row_number window
    at CALENDAR grain (bounded by day cardinality); then k ≈ log₂(days)
    tiny halving aggregations, each localCheckpoint-pinned (≤ 2^k rows
    total — the chain would otherwise re-execute every prefix per
    level). Returns k rows: (level, scale_days, n_coeffs, energy,
    energy_frac), level-ascending."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    base = (
        df.select(
            F.col(day_col).alias("__d"),
            F.col(value_col).cast(dec).alias("__v"),
        )
        .select(
            (F.row_number().over(Window.orderBy("__d")) - 1).alias(
                "__i"
            ),
            "__v",
        )
    )
    # pin the day-grain window output ONCE: the count and the level-1
    # filter both read the checkpointed blocks (r10 review: counting
    # the un-pinned frame re-executed the scan + sort)
    base = base.localCheckpoint()
    n = base.count()
    if n < 2:
        raise ValueError("haar_energy needs at least 2 observations")
    k = n.bit_length() - 1
    m = 1 << k
    cur = base.filter(F.col("__i") < m)
    energies = []
    for level in range(1, k + 1):
        pairs = (
            cur.groupBy(
                F.expr("__i DIV 2").alias("__j")
            )
            .agg(
                F.sum(
                    F.when(F.col("__i") % 2 == 0, F.col("__v"))
                ).alias("__a"),
                F.sum(
                    F.when(F.col("__i") % 2 == 1, F.col("__v"))
                ).alias("__b"),
            )
            .withColumnRenamed("__j", "__i")
            .localCheckpoint()
        )
        e = pairs.agg(
            F.sum(
                (F.col("__a") - F.col("__b"))
                * (F.col("__a") - F.col("__b"))
            ).cast(dec).alias("__e")
        ).select(
            F.lit(level).cast("long").alias("level"),
            F.lit(1 << (level - 1)).cast("long").alias("scale_days"),
            F.lit(m >> level).cast("long").alias("n_coeffs"),
            F.col("__e"),
        )
        energies.append(e)
        cur = pairs.select(
            "__i", (F.col("__a") + F.col("__b")).alias("__v")
        )
    allz = energies[0]
    for e in energies[1:]:
        allz = allz.unionByName(e)
    tot = allz.agg(F.sum("__e").cast(dec).alias("__tot"))
    return (
        allz.crossJoin(F.broadcast(tot))
        .select(
            "level",
            "scale_days",
            "n_coeffs",
            F.col("__e").cast(dec).cast("string").alias("energy"),
            F.when(
                F.col("__tot") > 0,
                F.col("__e").cast("double")
                / F.col("__tot").cast("double"),
            ).alias("energy_frac"),
        )
        .orderBy("level")
    )
