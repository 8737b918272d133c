"""Tests for the as-of join, top-N-per-group, and skew utilities —
each verified against the equivalent naive formulation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators.skew import (
    salted_groupby_agg,
    salted_join,
)
from streaming_data_pipeline_azure_spark.operators.temporal import (
    asof_join,
    top_n_per_group,
)


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_backward(spark):
    quotes = spark.createDataFrame(
        [
            (1, _t(9), 100.0),
            (1, _t(11), 110.0),
            (2, _t(10), 50.0),
        ],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            (1, _t(8), 5),    # before any quote -> null price
            (1, _t(9), 10),   # exact tie -> 09:00 quote visible
            (1, _t(10), 20),  # latest prior = 09:00
            (1, _t(12), 30),  # latest prior = 11:00
            (2, _t(12), 40),
            (3, _t(12), 50),  # key with no quotes at all
        ],
        ["sym", "tts", "qty"],
    )
    out = {
        (r["sym"], r["tts"].hour): r["price"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["price"],
        ).collect()
    }
    assert out[(1, 8)] is None
    assert out[(1, 9)] == 100.0
    assert out[(1, 10)] == 100.0
    assert out[(1, 12)] == 110.0
    assert out[(2, 12)] == 50.0
    assert out[(3, 12)] is None


def test_asof_join_tolerance(spark):
    quotes = spark.createDataFrame([(1, _t(9), 100.0)], ["sym", "qts", "price"])
    trades = spark.createDataFrame(
        [(1, _t(9, 30), 1), (1, _t(11), 2)], ["sym", "tts", "qty"]
    )
    out = {
        r["qty"]: r["price"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["price"], tolerance="1 HOUR",
        ).collect()
    }
    assert out[1] == 100.0   # 30 min old -> within tolerance
    assert out[2] is None    # 2 h old -> outside tolerance


def test_asof_matches_naive_on_testdata(spark, sf_dir):
    """The window-merge as-of join must equal the naive join+max_by
    formulation on a dense synthetic key/time grid."""
    clicks = spark.createDataFrame(
        [(u, _t(9 + (u % 3)), float(u)) for u in range(20)],
        ["user_id", "cts", "cval"],
    )
    buys = spark.createDataFrame(
        [(u % 25, _t(10 + (u % 4)), u) for u in range(50)],
        ["user_id", "bts", "order"],
    )
    fast = asof_join(
        buys, clicks, on="user_id", left_ts="bts", right_ts="cts",
        right_cols=["cval"],
    )
    naive = (
        buys.join(clicks, "user_id", "left")
        .filter((F.col("cts") <= F.col("bts")) | F.col("cts").isNull())
        .groupBy("user_id", "bts", "order")
        .agg(F.max_by("cval", "cts").alias("cval"))
    )
    # align: naive drops rows where the only click is after the buy;
    # compare on the common support plus null handling via left join
    f = {(r["user_id"], r["bts"], r["order"]): r["cval"] for r in fast.collect()}
    n = {(r["user_id"], r["bts"], r["order"]): r["cval"] for r in naive.collect()}
    for k, v in n.items():
        assert f[k] == v
    for k, v in f.items():
        if k not in n:
            assert v is None  # fast keeps unmatched lefts with null


def test_top_n_per_group(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = top_n_per_group(
        orders, ["o_orderpriority"], "o_totalprice", 3,
        tiebreak_col="o_orderkey",
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    naive = {
        r["o_orderpriority"]: r["mx"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.max("o_totalprice").alias("mx"))
        .collect()
    }
    for g, prices in per.items():
        assert len(prices) <= 3
        assert max(prices) == naive[g]


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        customer,
        "c_custkey",
        n_salts=8,
    ).count()
    assert salted == plain


def test_salted_groupby_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r["o_orderpriority"]: (r["n"], r["mx"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count("o_orderkey").alias("n"), F.max("o_totalprice").alias("mx"))
        .collect()
    }
    salted = {
        r["o_orderpriority"]: (r["n"], r["mx"])
        for r in salted_groupby_agg(
            orders,
            ["o_orderpriority"],
            {"n": ("count", "o_orderkey"), "mx": ("max", "o_totalprice")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_range_join_point_in_interval(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import range_join

    events = spark.createDataFrame(
        [(1, _t(9, 30), "a"), (1, _t(11, 30), "b"), (1, _t(13), "c"),
         (2, _t(9, 30), "d")],
        ["k", "ts", "tag"],
    )
    windows = spark.createDataFrame(
        [(1, _t(9), _t(10), "w1"), (1, _t(11), _t(12), "w2"),
         (2, _t(20), _t(21), "w3")],
        ["k", "ws", "we", "win"],
    )
    out = {
        (r["tag"], r["win"])
        for r in range_join(
            events, windows, on="k", left_ts="ts",
            right_start="ws", right_end="we", bucket_seconds=1800,
        ).collect()
    }
    # a->w1, b->w2; c outside all windows; d's key-2 window doesn't cover it
    assert out == {("a", "w1"), ("b", "w2")}


def test_range_join_inclusive_bounds(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import range_join

    events = spark.createDataFrame(
        [(1, _t(9), "lo"), (1, _t(10), "hi")], ["k", "ts", "tag"]
    )
    windows = spark.createDataFrame([(1, _t(9), _t(10), "w")], ["k", "ws", "we", "win"])
    out = {
        r["tag"]
        for r in range_join(
            events, windows, on="k", left_ts="ts",
            right_start="ws", right_end="we", bucket_seconds=3600,
        ).collect()
    }
    assert out == {"lo", "hi"}  # both boundary points included


def test_funnel_steps_strict_order(spark):
    """Funnel semantics: a user counts for step k only with a step-k
    event strictly AFTER their earliest step-(k-1) time — out-of-order
    histories stop at the last in-order stage."""
    from datetime import datetime

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        funnel_steps,
    )

    T = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full in-order funnel
        (1, T(0), "view"), (1, T(5), "click"), (1, T(9), "purchase"),
        # u2: purchase BEFORE click -> stops after click
        (2, T(0), "view"), (2, T(6), "click"), (2, T(3), "purchase"),
        # u3: click before any view -> stops at view
        (3, T(5), "view"), (3, T(2), "click"),
        # u4: never viewed -> not even step 1
        (4, T(1), "click"), (4, T(2), "purchase"),
        # u5: simultaneous view/click (strict > excludes) -> stops at view
        (5, T(0), "view"), (5, T(0), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["step"]: r for r in
           funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 4        # u1, u2, u3, u5
    assert out["click"]["n_users"] == 2       # u1, u2
    assert out["purchase"]["n_users"] == 1    # u1
    assert out["view"]["frac_of_first"] == 1.0
    assert out["click"]["frac_of_first"] == 0.5
    assert out["purchase"]["frac_of_first"] == 0.25
    assert [out[s]["step_idx"] for s in ("view", "click", "purchase")] == [1, 2, 3]


def test_funnel_steps_within_seconds(spark):
    """Gap-bounded funnel: with within_seconds each step must land in
    (prev_t, prev_t + bound]; a qualifying-but-late event drops the
    user at that step, the boundary second is inclusive, and the
    earliest IN-WINDOW occurrence becomes the next step's anchor (a
    later out-of-window click can't resurrect via an earlier one)."""
    from datetime import datetime

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        funnel_steps,
    )

    T = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)
    rows = [
        # u1: click 2 min after view, purchase 1 min after click: all in
        (1, T(0), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
        # u2: click 10 min after view -> outside the 5-min bound
        (2, T(0), "view"), (2, T(10), "click"), (2, T(11), "purchase"),
        # u3: click exactly AT the bound (300 s) -> inclusive, counts;
        #     purchase 301 s after that click -> one past, drops
        (3, T(0), "view"), (3, T(5), "click"), (3, T(10, 1), "purchase"),
        # u4: two in-window clicks — the EARLIEST (T2) anchors, so the
        #     purchase at T8 (360 s after T2) is out of window even
        #     though a path through the T7 click would convert: the
        #     earliest-first rule is a pure function, not a path search
        (4, T(0), "view"), (4, T(2), "click"), (4, T(7), "click"),
        (4, T(8), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["step"]: r["n_users"] for r in
           funnel_steps(ev, ["view", "click", "purchase"],
                        within_seconds=300).collect()}
    assert out == {"view": 4, "click": 3, "purchase": 1}
    # unbounded control: everyone converts fully
    out_unb = {r["step"]: r["n_users"] for r in
               funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert out_unb == {"view": 4, "click": 4, "purchase": 4}


def test_cohort_retention_weekly(spark):
    """Cohort semantics: users cohort by the ISO week of their FIRST
    signup; retention counts distinct active users per later week;
    pre-signup-week activity is excluded; fractions are of cohort size."""
    from datetime import datetime

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        cohort_retention,
    )

    # 2024-01-01 is a Monday (ISO week start)
    D = lambda d, h=0: datetime(2024, 1, d, h)
    rows = [
        # cohort W0 (Jan 1 week): users 1, 2
        (1, D(2), "signup"), (1, D(3), "click"),    # active W0
        (1, D(9), "view"),                           # active W1
        (2, D(4), "signup"), (2, D(16), "click"),    # active W0 (signup) + W2
        # user 3 signs up in W1; their W0 click precedes the cohort week
        (3, D(5), "click"), (3, D(10), "signup"), (3, D(11), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in cohort_retention(ev).collect()
    }
    w0 = "2024-01-01"
    w1 = "2024-01-08"
    # signup events themselves make offset 0 complete
    assert out[(w0, 0)]["n_active"] == 2
    assert out[(w0, 0)]["retention_frac"] == 1.0
    assert out[(w0, 1)]["n_active"] == 1           # user 1
    assert out[(w0, 1)]["retention_frac"] == 0.5
    assert out[(w0, 2)]["n_active"] == 1           # user 2
    assert out[(w1, 0)]["n_active"] == 1           # user 3
    # user 3's pre-signup-week click created no negative-offset row
    assert all(off >= 0 for _, off in out)


def test_transition_matrix_counts_and_fracs(spark):
    import datetime as dt

    from streaming_data_pipeline_azure_spark.operators import temporal

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "A", 1), (1, t0.replace(hour=1), "B", 2),
        (1, t0.replace(hour=2), "A", 3), (1, t0.replace(hour=3), "C", 4),
        (2, t0, "A", 5), (2, t0.replace(hour=1), "B", 6),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["frac_from"])
        for r in temporal.transition_matrix(
            ev, tiebreak_col="event_id"
        ).collect()
    }
    assert got[("A", "B")] == (2, 2 / 3)
    assert got[("A", "C")] == (1, 1 / 3)
    assert got[("B", "A")] == (1, 1.0)
    assert len(got) == 3


def test_time_weighted_avg_hand_checked(spark):
    import datetime as dt

    from streaming_data_pipeline_azure_spark.operators import temporal

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: value 10 for 1h, then 20 for 3h, then 99 (no weight)
        (1, t0, 10.0, 1),
        (1, t0 + dt.timedelta(hours=1), 20.0, 2),
        (1, t0 + dt.timedelta(hours=4), 99.0, 3),
        # user 2: single sample -> no interval, excluded entirely
        (2, t0, 5.0, 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double, event_id int"
    )
    got = {
        r["user_id"]: r
        for r in temporal.time_weighted_avg(
            ev, tiebreak_col="event_id"
        ).collect()
    }
    r1 = got[1]
    assert r1["n_intervals"] == 2
    assert r1["total_us"] == 4 * 3600 * 1_000_000
    assert r1["twap"] == (10.0 * 1 + 20.0 * 3) / 4  # 17.5
    assert 2 not in got


def test_transition_matrix_fracs_sum_to_one(spark):
    """Per from_type, frac_from must sum to exactly 1 (ratios of exact
    integer counts over the shared total)."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators import temporal

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=m), t, u * 100 + m)
        for u in range(5)
        for m, t in enumerate(["A", "B", "C", "A", "B"][: 3 + u % 3])
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int"
    )
    tm = temporal.transition_matrix(ev, tiebreak_col="event_id")
    sums = tm.groupBy("from_type").agg(F.sum("frac_from").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-12 for r in sums)


def test_debounce_events_keeps_burst_heads(spark):
    """Gap chaining: a burst is any run with no gap_seconds silence
    inside it — only its FIRST event survives; a later isolated event
    starts a new burst; keys are independent; order within ties is
    deterministic via the tiebreak."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        debounce_events,
    )

    def ts(s):
        return f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}"

    rows = [
        # user 1 click: burst at 0,30,59,89 (each within 60 of prev),
        # then isolated at 300 -> keep 0 and 300
        (1, 1, "click", ts(0)),
        (2, 1, "click", ts(30)),
        (3, 1, "click", ts(59)),
        (4, 1, "click", ts(89)),
        (5, 1, "click", ts(300)),
        # user 1 view: independent key, single event -> kept
        (6, 1, "view", ts(10)),
        # user 2 click: two events exactly 61s apart -> both kept
        (7, 2, "click", ts(0)),
        (8, 2, "click", ts(61)),
        # user 3: same-timestamp tie -> smallest event_id kept
        (9, 3, "click", ts(0)),
        (10, 3, "click", ts(0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    kept = {
        r["event_id"]
        for r in debounce_events(
            df, ["user_id", "event_type"], "ts",
            gap_seconds=60, tiebreak_cols=["event_id"],
        ).collect()
    }
    assert kept == {1, 5, 6, 7, 8, 9}


def test_match_event_patterns_semantics(spark):
    """Planted per-user sequences pin the CEP semantics: ordered
    containment respects time order (not row order), adjacency needs
    strictly consecutive events, alternation matches either branch,
    and word boundaries stop 'click' matching 'clicker'."""
    from streaming_data_pipeline_azure_spark.operators import temporal

    rows = [
        # u1: view ... purchase (with noise) — containment matches;
        # inserted out of row order to prove the ts sort governs
        (3, "u1", "purchase"), (1, "u1", "view"), (2, "u1", "click"),
        # u2: purchase BEFORE view — must NOT match containment
        (1, "u2", "purchase"), (2, "u2", "view"),
        # u3: three consecutive clicks
        (1, "u3", "click"), (2, "u3", "click"), (3, "u3", "click"),
        # u4: clicks separated by a view — adjacency must fail
        (1, "u4", "click"), (2, "u4", "click"), (3, "u4", "view"),
        (4, "u4", "click"),
        # u5: 'clicker' type must not satisfy \bclick\b adjacency
        (1, "u5", "clicker"), (2, "u5", "clicker"), (3, "u5", "clicker"),
        # u6: error then purchase — alternation branch 1
        (1, "u6", "error"), (2, "u6", "purchase"),
    ]
    ev = spark.createDataFrame(
        [(float(t), u, ty, i) for i, (t, u, ty) in enumerate(rows)],
        "tsec double, user_id string, event_type string, event_id long",
    ).select(
        F.timestamp_seconds("tsec").alias("ts"), "user_id", "event_type",
        "event_id",
    )
    out = {
        r["user_id"]: r
        for r in temporal.match_event_patterns(
            ev,
            {
                "vp": r"\bview\b.*\bpurchase\b",
                "ccc": r"\bclick click click\b",
                "alt": r"\b(error|signup)\b.*\bpurchase\b",
            },
        ).collect()
    }
    assert out["u1"]["vp"] and not out["u2"]["vp"]
    assert out["u3"]["ccc"] and not out["u4"]["ccc"] and not out["u5"]["ccc"]
    assert out["u6"]["alt"] and not out["u1"]["alt"]
    assert out["u1"]["n_events"] == 3

    # equal-ts rows: the event_id tiebreak makes the sequence (and so
    # the match) partition-invariant
    tie = spark.createDataFrame(
        [(1.0, "t", "view", 1), (1.0, "t", "purchase", 2)],
        "tsec double, user_id string, event_type string, event_id long",
    ).select(F.timestamp_seconds("tsec").alias("ts"), "user_id",
             "event_type", "event_id")
    for parts in (1, 5):
        got = temporal.match_event_patterns(
            tie.repartition(parts), {"vp": r"\bview\b.*\bpurchase\b"}
        ).collect()[0]
        assert got["vp"]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        temporal.match_event_patterns(ev, {})


def test_aqe_splits_planted_skew_join(spark):
    """The engine's skew posture is twofold: explicit salting
    (salted_join, tested above) and AQE's runtime skew-join split for
    joins we did NOT pre-salt. Prove the second actually engages: a
    90%-one-key fact joined to a non-broadcastable dim, with the skew
    thresholds lowered to match test scale, must show skew=true on the
    sort-merge join in the FINAL adaptive plan."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim_"), F.col("id")).alias("dv"),
        )
        # aggregate over pad so the wide payload column survives the
        # join shuffle (column pruning would otherwise shrink the skewed
        # partition below any realistic threshold), and group by the
        # DIM column, not the join key — an agg that reuses the join's
        # hash distribution forbids the skew split (splitting would
        # break co-partitioning, and AQE refuses to add a shuffle)
        joined = fact.join(dim, "k").groupBy("dv").agg(
            F.sum(F.length("pad")).alias("pad_bytes")
        )
        joined.collect()  # execute THIS instance so its adaptive plan finalizes
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cep_regex_agrees_with_funnel_on_tie_free_data(spark):
    """Cross-operator consistency: on tie-free timestamps, the user set
    matching the regex 'view.*purchase' equals the users funnel_steps
    counts as reaching step 2 of [view, purchase] — a purchase after
    ANY view is a purchase after the FIRST view and vice versa. Pins
    the two sequence formulations to one semantics."""
    import random

    from streaming_data_pipeline_azure_spark.operators import temporal

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(40):
        ts = sorted(rng.sample(range(1, 10_000), rng.randint(2, 12)))
        for t in ts:
            rows.append(
                (float(t), f"u{u}",
                 rng.choice(["view", "click", "purchase", "error"]), eid)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "tsec double, user_id string, event_type string, event_id long"
    ).select(F.timestamp_seconds("tsec").alias("ts"), "user_id",
             "event_type", "event_id")

    regex_users = {
        r["user_id"]
        for r in temporal.match_event_patterns(
            ev, {"vp": r"\bview\b.*\bpurchase\b"}
        ).collect()
        if r["vp"]
    }
    funnel = {
        r["step_idx"]: r["n_users"]
        for r in temporal.funnel_steps(ev, ["view", "purchase"]).collect()
    }
    # the LAST step's reached-count is the purchase-after-view users
    assert funnel[max(funnel)] == len(regex_users)


def test_interval_concurrency_sweep_line(spark):
    """Open-count per day from the sweep line: overlaps add, gaps
    read zero, every calendar day from first start to last end
    appears exactly once."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        interval_concurrency,
    )

    d = dt.datetime
    rows = [
        (d(2024, 1, 1), d(2024, 1, 3)),
        (d(2024, 1, 2), d(2024, 1, 2)),
        (d(2024, 1, 5), d(2024, 1, 6)),
    ]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    got = {
        str(r["day"]): r["n_open"]
        for r in interval_concurrency(df, "s", "e").collect()
    }
    assert got == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-03": 1,
        "2024-01-04": 0,
        "2024-01-05": 1,
        "2024-01-06": 1,
    }
    # change-points-only mode: one row per boundary day
    sparse = {
        str(r["day"]): r["n_open"]
        for r in interval_concurrency(
            df, "s", "e", gap_fill=False
        ).collect()
    }
    assert sparse == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-03": 1,
        "2024-01-04": 0,
        "2024-01-05": 1,
        "2024-01-07": 0,
    }


def test_interval_concurrency_rejects_inverted(spark):
    import datetime as _dt

    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        interval_concurrency,
    )

    df = spark.createDataFrame(
        [(_dt.datetime(2024, 1, 5), _dt.datetime(2024, 1, 1))],
        "s timestamp, e timestamp",
    )
    with _pytest.raises(ValueError, match="inverted"):
        interval_concurrency(df, "s", "e")


def test_rolling_zscore_flags_planted_spike(spark):
    """A 10x spike against a flat trailing baseline flags; the flat
    days and the warm-up day do not."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        rolling_zscore_anomalies,
    )

    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(10):
        v = 1000.0 if i != 7 else 10_000.0
        # two raw events per day prove the pre-aggregation sums
        rows.append(("a", base + dt.timedelta(days=i), v / 2))
        rows.append(("a", base + dt.timedelta(days=i), v / 2))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        str(r["day"]): r
        for r in rolling_zscore_anomalies(
            df, "k", "ts", "v", window_days=7, z=2.0
        ).collect()
    }
    assert len(out) == 10
    flagged = [d for d, r in out.items() if r["is_anomaly"]]
    assert flagged == ["2024-03-08"]
    # warm-up: first day has n_window 1 and never flags
    assert out["2024-03-01"]["n_window"] == 1
    assert out["2024-03-01"]["std_trailing"] is None
    assert out["2024-03-05"]["n_window"] == 5
    assert out["2024-03-05"]["value"] == 1000.0


def test_kaplan_meier_hand_computed(spark):
    """Classic textbook check: durations [1,2,2,3,5,6(censored at 5)]
    with horizon 5 -> survival steps match the hand-computed KM
    product; censored subjects leave the risk set without an event."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        kaplan_meier,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (5,), (6,)], "dur long"
    )
    got = {
        r["t"]: r for r in kaplan_meier(df, "dur", horizon=5).collect()
    }
    # t=1: r=6, d=1 -> 5/6
    # t=2: r=5, d=2 -> 5/6 * 3/5 = 1/2
    # t=3: r=3, d=1 -> 1/2 * 2/3 = 1/3
    # t=5: r=2, d=1 (the 6 is censored AT 5: at risk, no event)
    #      -> 1/3 * 1/2 = 1/6
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["n_at_risk"] == 6 and got[1]["n_events"] == 1
    assert abs(got[1]["survival"] - 5 / 6) < 1e-15
    assert got[2]["n_at_risk"] == 5 and got[2]["n_events"] == 2
    assert abs(got[2]["survival"] - 0.5) < 1e-15
    assert abs(got[3]["survival"] - 1 / 3) < 1e-15
    assert got[5]["n_at_risk"] == 2 and got[5]["n_events"] == 1
    assert abs(got[5]["survival"] - 1 / 6) < 1e-15


def test_rfm_segments_tiles_and_anchor(spark):
    """Recency anchored at the data's max date; better customers score
    higher tiles on every axis; ties split deterministically."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        rfm_segments,
    )

    d = dt.datetime
    rows = []
    # c1: recent, frequent, big spender; c4: stale singleton
    for i in range(4):
        rows.append((1, d(2024, 6, 20 + i), 500.0))
    rows.append((2, d(2024, 6, 1), 200.0))
    rows.append((2, d(2024, 6, 10), 200.0))
    rows.append((3, d(2024, 5, 1), 100.0))
    rows.append((4, d(2024, 1, 1), 10.0))
    df = spark.createDataFrame(rows, "c long, ts timestamp, amt double")
    got = {
        r["customer"]: r
        for r in rfm_segments(df, "c", "ts", "amt", n_tiles=4).collect()
    }
    assert got[1]["recency_days"] == 0
    assert got[4]["recency_days"] == (d(2024, 6, 23) - d(2024, 1, 1)).days
    assert got[1]["frequency"] == 4 and got[1]["monetary"] == 2000.0
    assert (got[1]["r_score"], got[1]["f_score"], got[1]["m_score"]) == (
        4, 4, 4,
    )
    # c3 and c4 tie on frequency 1; the customer-id tie-break puts c3
    # in tile 1 and c4 in tile 2 (deterministic, documented)
    assert got[4]["r_score"] == 1 and got[4]["segment"] == "1-2-1"
    assert got[1]["segment"] == "4-4-4"


def test_lag_autocorrelation_detects_period(spark):
    """A strict 2-day alternation: lag-2 correlation = +1, lag-1 = -1;
    constant series -> NULL."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        lag_autocorrelation,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", base + dt.timedelta(days=i), 100.0 if i % 2 == 0 else 200.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["lag"]: r
        for r in lag_autocorrelation(
            df, "ts", "v", lags=[1, 2]
        ).collect()
    }
    assert abs(got[2]["r"] - 1.0) < 1e-12
    assert abs(got[1]["r"] + 1.0) < 1e-12
    assert got[1]["n_pairs"] == 29
    flat = spark.createDataFrame(
        [("k", base + dt.timedelta(days=i), 5.0) for i in range(10)],
        "k string, ts timestamp, v double",
    )
    fr = lag_autocorrelation(flat, "ts", "v", lags=[1]).collect()[0]
    assert fr["r"] is None


def test_transition_predictability(spark):
    """Per-state argmax with lexical tie-break; hit rate = top count /
    total transitions out of the state."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        transition_predictability,
    )

    seq = ["a", "b", "a", "b", "a", "c"]  # a->b x2, b->a x2, a->c x1
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, i), s) for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, s string")
    got = {
        r["state"]: r
        for r in transition_predictability(df, "u", "ts", "s").collect()
    }
    assert got["a"]["n_transitions"] == 3
    assert got["a"]["top_next"] == "b" and got["a"]["top_n"] == 2
    assert abs(got["a"]["hit_rate"] - 2 / 3) < 1e-15
    assert got["b"]["top_next"] == "a" and got["b"]["hit_rate"] == 1.0
    # tie: equal counts -> lexically smallest next wins
    tie = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, i), s)
         for i, s in enumerate(["x", "z", "x", "y"])],
        "u long, ts timestamp, s string",
    )
    t = {
        r["state"]: r
        for r in transition_predictability(tie, "u", "ts", "s").collect()
    }
    assert t["x"]["top_next"] == "y"  # y vs z tie at 1 -> smaller


def test_ohlc_bars(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        ohlc,
    )

    d0 = dt.datetime(2024, 2, 1, 9, 0)
    rows = [
        (1, d0, 10.0),
        (2, d0 + dt.timedelta(hours=1), 14.0),
        (3, d0 + dt.timedelta(hours=2), 8.0),
        (4, d0 + dt.timedelta(hours=3), 12.0),
        # tie on ts: higher event_id wins close, lower wins open
        (5, d0 + dt.timedelta(days=1), 3.0),
        (6, d0 + dt.timedelta(days=1), 7.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, v double")
    got = {
        str(r["day"]): r
        for r in ohlc(df, "ts", "v", tiebreak_cols=["event_id"]).collect()
    }
    b = got["2024-02-01"]
    assert (b["open"], b["high"], b["low"], b["close"]) == (
        10.0, 14.0, 8.0, 12.0,
    )
    assert b["n_events"] == 4 and b["total_value"] == 44.0
    t = got["2024-02-02"]
    assert (t["open"], t["close"]) == (3.0, 7.0)


def test_band_join_matches_bruteforce_and_plans_equijoin(spark):
    """band_join == O(n²) inequality join on a seeded frame, including
    negative values and exact-boundary gaps; the plan must contain no
    CartesianProduct / BroadcastNestedLoopJoin (the whole point)."""
    from streaming_data_pipeline_azure_spark.operators.temporal import band_join

    rows = [(i, "g" + str(i % 2), ((i * 37) % 100) - 50 + 0.25 * (i % 4))
            for i in range(80)]
    a = spark.createDataFrame(
        [(i, g, v) for i, g, v in rows], "key_a long, g string, va double"
    )
    b = spark.createDataFrame(
        [(i + 1000, g, v) for i, g, v in rows], "key_b long, g string, vb double"
    )
    out = band_join(a, b, left_val="va", right_val="vb", delta=1.5, on=["g"])
    got = {(r["key_a"], r["key_b"]) for r in out.collect()}
    want = {
        (i, j + 1000)
        for i, gi, vi in rows
        for j, gj, vj in rows
        if gi == gj and abs(vi - vj) <= 1.5
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import pytest

    with pytest.raises(ValueError):
        band_join(a, b, left_val="va", right_val="vb", delta=0.0)


def test_lagged_correlation_known_series(spark):
    """b = a shifted by 2 -> corr 1.0 exactly at lag 2 (decimal sums);
    constant-series lags -> NULL; lag 0 on anticorrelated halves."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        lagged_correlation,
    )

    # a has a spike at t=3; b has the same spike at t=5 (a leads by 2)
    data = [(t, 10.0 + (5.0 if t == 3 else 0.0),
             10.0 + (5.0 if t == 5 else 0.0)) for t in range(10)]
    df = spark.createDataFrame(data, "t long, a double, b double")
    out = {r["lag"]: r for r in
           lagged_correlation(df, "t", "a", "b", max_lag=3).collect()}
    assert out[2]["corr"] == 1.0
    assert out[2]["n"] == 8
    # at lag 0 both spikes misalign -> correlation < 1
    assert out[0]["corr"] is None or out[0]["corr"] < 1.0
    df_const = spark.createDataFrame(
        [(t, 1.0, float(t)) for t in range(5)], "t long, a double, b double"
    )
    outc = {r["lag"]: r for r in
            lagged_correlation(df_const, "t", "a", "b", max_lag=1).collect()}
    assert outc[0]["corr"] is None  # zero variance side


def test_cusum_changepoints_fold_and_alarms(spark):
    """Hand-checked two-sided tabular CUSUM: a persistent +2 drift
    integrates into an s_hi alarm that a single-step rule would miss;
    the low side stays zero; exact decimal states."""
    from decimal import Decimal

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        cusum_changepoints,
    )

    rows = [("g", t, 10.0) for t in range(1, 4)]
    rows += [("g", t, 12.0) for t in range(4, 9)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r["t"]: r for r in cusum_changepoints(
        df, "g", "t", "v", target="10", slack="0.5", threshold="5",
    ).collect()}
    # steady phase: x - target - slack = -0.5 -> clamped at 0
    assert out[3]["s_hi"] == Decimal("0.0000")
    # drift phase accumulates 1.5/step: 1.5, 3.0, 4.5, 6.0, 7.5
    assert out[5]["s_hi"] == Decimal("3.0000")
    assert out[7]["s_hi"] == Decimal("6.0000")
    assert not out[6]["alarm"] and out[7]["alarm"] and out[8]["alarm"]
    assert all(r["s_lo"] == Decimal("0.0000") for r in out.values())


def test_precedence_pairs_endpoint_reduction(spark):
    """∃ a-before-b via min/max endpoints: non-adjacent precedence
    counts (transition_matrix would miss A..X..B), strict ordering,
    per-key existence not event counts."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        precedence_pairs,
    )

    rows = [
        ("u1", "A", 1), ("u1", "X", 2), ("u1", "B", 3),
        ("u2", "B", 1), ("u2", "A", 2), ("u2", "B", 3),
        ("u3", "A", 5),  # single-type user: contributes to total only
    ]
    df = spark.createDataFrame(rows, "u string, ty string, t long")
    out = {(r["type_a"], r["type_b"]): r for r in
           precedence_pairs(df, "u", "ty", "t").collect()}
    assert out[("A", "B")]["n_keys"] == 2          # u1 and u2
    assert out[("B", "A")]["n_keys"] == 1          # u2 only
    assert out[("A", "X")]["n_keys"] == 1          # u1
    assert ("B", "B") not in out                   # a != b only
    assert out[("A", "B")]["support"] == 2 / 3     # 3 users total


def test_decayed_sum_dyadic_weights_and_quantization(spark):
    """Half-life steps give exact 1, 1/2, 1/4 weights (shift division,
    no pow); contributions quantize to exact 2^20 integers; future
    timestamps clamp to age 0."""
    import datetime as dtm

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        decayed_sum,
    )

    d = lambda s: dtm.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        ("u", d("2024-01-31T12:00:00"), 4.0),   # age 0 half-lives
        ("u", d("2024-01-24T00:00:00"), 4.0),   # 7 days  -> w 1/2
        ("u", d("2024-01-17T00:00:00"), 4.0),   # 14 days -> w 1/4
        ("v", d("2024-02-05T00:00:00"), 8.0),   # future -> clamp w 1
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, v double")
    out = {r["u"]: r for r in decayed_sum(
        df, "u", "ts", "v", ref_date="2024-01-31", half_life_days=7
    ).collect()}
    assert out["u"]["decayed"] == 4.0 + 2.0 + 1.0
    assert out["u"]["decayed_q"] == 7 * (1 << 20)
    assert out["v"]["decayed"] == 8.0
    import pytest

    with pytest.raises(ValueError):
        decayed_sum(df, "u", "ts", "v", ref_date="2024-01-31",
                    half_life_days=0)


def test_holt_forecast_integer_recursion(spark):
    """Hand-checked alpha=beta=1/4 updates on a tiny series; seed step
    (l=x1, b=0, pred NULL); forecast_h = level + h*trend."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        holt_forecast,
    )

    rows = [("g", 1, 10.0), ("g", 2, 14.0), ("g", 3, 18.0)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r["t"]: r for r in holt_forecast(
        df, "g", "t", "v", horizon=2
    ).collect()}
    # quantized: x1=100000 -> l=100000, b=0, pred NULL
    assert out[1]["level"] == 10.0 and out[1]["trend"] == 0.0
    assert out[1]["one_step_pred"] is None
    # step2: l = fd(140000 + 3*100000) = 110000; b = fd(10000) = 2500
    assert out[2]["level"] == 11.0 and out[2]["trend"] == 0.25
    assert out[2]["one_step_pred"] == 10.0
    # step3: l = fd(180000 + 3*112500) = 129375
    #        b = fd((129375-110000) + 7500) = 6718 (floor)
    assert out[3]["level"] == 12.9375
    assert out[3]["trend"] == 0.6718
    assert out[3]["forecast_h"] == 12.9375 + 2 * 0.6718
    import pytest

    with pytest.raises(ValueError):
        holt_forecast(df, "g", "t", "v", horizon=-1)


def test_interevent_stats_burstiness_signatures(spark):
    """A perfectly periodic key -> std 0, burstiness -1; a bursty key
    (many tiny gaps + one huge) -> burstiness > 0; exact micros."""
    import datetime as dtm

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        interevent_stats,
    )

    t0 = dtm.datetime(2024, 1, 1)
    rows = [("p", t0 + dtm.timedelta(seconds=10 * i)) for i in range(5)]
    burst = [("b", t0 + dtm.timedelta(seconds=s))
             for s in [0, 1, 2, 3, 4, 10000]]
    df = spark.createDataFrame(rows + burst, "u string, ts timestamp")
    out = {r["u"]: r for r in interevent_stats(df, "u", "ts").collect()}
    assert out["p"]["mean_gap_s"] == 10.0
    assert out["p"]["std_gap_s"] == 0.0
    assert out["p"]["burstiness"] == -1.0
    assert out["b"]["n_gaps"] == 5
    # max attainable B at n gaps is (sqrt(n-1)-1)/(sqrt(n-1)+1) = 1/3
    # for n=5 — one giant gap hits it (to float rounding)
    assert out["b"]["burstiness"] > 0.33


def test_rolling_distinct_exact_and_hll_twin(spark):
    """Exact trailing-window distincts on a hand fixture (re-seen keys
    count once per window; silent days produce no row); the HLL twin
    agrees exactly at tiny cardinality."""
    import datetime as dtm

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        rolling_distinct_exact,
        rolling_distinct_hll,
    )

    d = lambda day, u: (dtm.datetime(2024, 1, day, 9), u)  # noqa: E731
    rows = [d(1, "a"), d(1, "b"), d(2, "a"), d(5, "c"), d(9, "a")]
    df = spark.createDataFrame(rows, "ts timestamp, u string")
    out = {r["day"].isoformat(): r["n_active"] for r in
           rolling_distinct_exact(df, "ts", "u", window_days=3).collect()}
    assert out == {
        "2024-01-01": 2,          # a, b
        "2024-01-02": 2,          # a (once), b
        "2024-01-05": 1,          # c
        "2024-01-09": 1,          # a
    }
    hll = {r["day"].isoformat(): r["n_active_est"] for r in
           rolling_distinct_hll(df, "ts", "u", window_days=3).collect()}
    assert hll == out  # tiny cardinality: HLL is exact here
    import pytest

    with pytest.raises(ValueError):
        rolling_distinct_exact(df, "ts", "u", window_days=0)


def test_growth_accounting_classes_and_identity(spark):
    """Hand fixture: new/retained/resurrected classification, the
    accounting identity, and NULL churn on the final bucket."""
    import datetime as dtm

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        growth_accounting,
    )

    # weeks: W1=2024-01-01, W2=01-08, W3=01-15 (Mondays)
    d = lambda day, u: (dtm.datetime(2024, 1, day, 12), u)  # noqa: E731
    rows = [
        d(1, "a"), d(8, "a"), d(15, "a"),   # a: new W1, retained W2, W3
        d(1, "b"), d(15, "b"),              # b: new W1, gap, resurrected W3
        d(8, "c"),                          # c: new W2, churned after
    ]
    df = spark.createDataFrame(rows, "ts timestamp, u string")
    out = {r["bucket_start"].isoformat(): r for r in growth_accounting(
        df, "ts", "u", bucket="week"
    ).collect()}
    w1, w2, w3 = "2024-01-01", "2024-01-08", "2024-01-15"
    assert (out[w1]["n_new"], out[w1]["n_active"]) == (2, 2)
    assert out[w1]["n_churned_next"] == 1            # b skips W2
    assert (out[w2]["n_retained"], out[w2]["n_new"]) == (1, 1)
    assert out[w2]["n_churned_next"] == 1            # c vanishes
    assert out[w3]["n_resurrected"] == 1             # b returns
    assert out[w3]["n_churned_next"] is None         # final bucket
    # identity: active_t = new + retained + resurrected
    for r in out.values():
        assert r["n_active"] == (
            r["n_new"] + r["n_retained"] + r["n_resurrected"]
        )
    import pytest

    with pytest.raises(ValueError):
        growth_accounting(df, "ts", "u", bucket="quarter")


def test_activity_streaks_islands_and_ties(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        activity_streaks,
    )

    d = dt.datetime
    rows = [
        # user 1: 3-day streak Jan 1-3, gap, 2-day streak Jan 5-6;
        # duplicate events within a day must collapse
        (1, d(2024, 1, 1, 9)), (1, d(2024, 1, 1, 18)),
        (1, d(2024, 1, 2, 9)), (1, d(2024, 1, 3, 9)),
        (1, d(2024, 1, 5, 9)), (1, d(2024, 1, 6, 9)),
        # user 2: two 2-day streaks (tie) -> longest end = the LATER one
        (2, d(2024, 1, 1, 9)), (2, d(2024, 1, 2, 9)),
        (2, d(2024, 1, 10, 9)), (2, d(2024, 1, 11, 9)),
        # user 3: single day
        (3, d(2024, 1, 7, 9)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        r["user_id"]: r
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert out[1]["active_days"] == 5
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[1]["longest_streak_end"] == dt.date(2024, 1, 3)
    assert out[2]["longest_streak"] == 2
    assert out[2]["longest_streak_end"] == dt.date(2024, 1, 11)
    assert out[3]["active_days"] == 1
    assert out[3]["n_streaks"] == 1


def test_max_drawdown_peak_trough_and_ties(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        max_drawdown,
    )

    # series: 10, 30, 20, 5, 25, 5 -> peak 30 (day2), trough 5 (day4,
    # EARLIEST of the two dd=25 days), drawdown 25
    rows = [
        (dt.date(2024, 1, 1), 10.0),
        (dt.date(2024, 1, 2), 30.0),
        (dt.date(2024, 1, 3), 20.0),
        (dt.date(2024, 1, 4), 5.0),
        (dt.date(2024, 1, 5), 25.0),
        (dt.date(2024, 1, 6), 5.0),
    ]
    df = spark.createDataFrame(rows, ["day", "v"])
    (r,) = max_drawdown(df, "day", "v").collect()
    assert r["peak_day"] == dt.date(2024, 1, 2)
    assert r["trough_day"] == dt.date(2024, 1, 4)
    assert r["peak_value"] == 30.0
    assert r["trough_value"] == 5.0
    assert r["max_drawdown"] == 25.0


def test_max_drawdown_monotone_series_is_zero(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        max_drawdown,
    )

    rows = [(dt.date(2024, 1, i), float(i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["day", "v"])
    (r,) = max_drawdown(df, "day", "v").collect()
    assert r["max_drawdown"] == 0.0
    # dd=0 everywhere -> earliest day wins both roles
    assert r["trough_day"] == dt.date(2024, 1, 1)
    assert r["peak_day"] == dt.date(2024, 1, 1)


def test_conversion_pairs_and_first_conversion(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        conversion_pairs,
        first_conversion_stats,
    )

    d = dt.datetime
    clicks = spark.createDataFrame(
        [(1, 7, d(2024, 1, 1, 10, 0)), (2, 7, d(2024, 1, 1, 12, 0))],
        ["event_id", "user_id", "ts"],
    )
    purchases = spark.createDataFrame(
        [
            (7, d(2024, 1, 1, 10, 20), 5.0),
            (7, d(2024, 1, 1, 10, 40), 3.0),
            (7, d(2024, 1, 1, 11, 0), 9.0),   # exactly at +60min: excluded
            (7, d(2024, 1, 1, 12, 30), 7.0),
            (8, d(2024, 1, 1, 10, 30), 1.0),  # other user
        ],
        ["user_id", "ts", "value"],
    )
    pairs = conversion_pairs(
        clicks, purchases, "user_id", "ts", "ts", max_gap_minutes=60
    )
    assert pairs.count() == 3  # click1 -> 10:20, 10:40; click2 -> 12:30
    out = {
        r["event_id"]: r
        for r in first_conversion_stats(
            pairs, "event_id", "user_id", "ts", "ts", value_col="value"
        ).collect()
    }
    assert out[1]["n_conversions"] == 2
    assert out[1]["first_conversion_ts"] == d(2024, 1, 1, 10, 20)
    assert out[1]["first_conversion_value"] == 5.0
    assert out[2]["n_conversions"] == 1
    assert out[2]["first_conversion_value"] == 7.0


def test_seasonal_naive_backtest_known_series(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        seasonal_naive_backtest,
    )

    # 10 days of values 0..9: lag-1 errors are nine 1s (MAE 1);
    # lag-7 errors are three 7s (MAE 7)
    rows = [(dt.date(2024, 1, 1 + i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["day", "v"])
    out = {r["lag"]: r for r in seasonal_naive_backtest(df, "day", "v").collect()}
    assert out[1]["n_days"] == 9 and out[1]["mae"] == 1.0
    assert out[7]["n_days"] == 3 and out[7]["mae"] == 7.0
    assert out[7]["sum_abs_err"] == 21.0


def test_dow_adjusted_anomalies_ignores_weekly_rhythm(spark):
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        dow_adjusted_anomalies,
    )

    # 8 weeks: Sundays always 10, other days always 100 — a plain
    # z-score would flag every Sunday; dow-adjusted must flag ONLY the
    # planted spike day
    rows = []
    for i in range(56):
        day = dt.date(2024, 1, 7) + dt.timedelta(days=i)
        v = 10.0 if day.weekday() == 6 else 100.0
        rows.append((day, v))
    # plant one anomalous Wednesday
    rows[3] = (rows[3][0], 5000.0)
    df = spark.createDataFrame(rows, ["day", "v"])
    out = dow_adjusted_anomalies(df, "day", "v").collect()
    assert len(out) == 1
    assert out[0]["day"] == rows[3][0]
    assert out[0]["value"] == 5000.0
    assert out[0]["dow_median"] == 100.0


def test_key_skew_report_flags_hot_key(spark):
    from streaming_data_pipeline_azure_spark.operators.skew import (
        key_skew_report,
    )

    # key 0 holds half the rows over 101 keys -> max/mean ~ 50x
    rows = [(0,)] * 500 + [(k,) for k in range(1, 101) for _ in range(5)]
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_report(df, "k", top_k=3).collect()
    assert out[0]["key"] == "0" and out[0]["n_rows"] == 500
    assert out[0]["share_scaled"] == 500_000
    # max/mean = 500 * 101 / 1000 = 50.5
    assert out[0]["max_over_mean_scaled"] == 50_500_000


def test_nelson_aalen_known_curve_and_km_consistency(spark):
    import math

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        kaplan_meier,
        nelson_aalen,
    )

    # durations 1,2,2,3 (horizon 10): at t=1 r=4 d=1 -> H=0.25;
    # t=2 r=3 d=2 -> H=0.25+2/3; t=3 r=1 d=1 -> H += 1
    df = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["d"])
    na = {r["t"]: r for r in nelson_aalen(df, "d", horizon=10).collect()}
    assert na[1]["cum_hazard"] == 0.25
    assert abs(na[2]["cum_hazard"] - (0.25 + 2.0 / 3.0)) < 1e-12
    assert abs(na[3]["cum_hazard"] - (0.25 + 2.0 / 3.0 + 1.0)) < 1e-12
    assert na[2]["n_at_risk"] == 3 and na[2]["n_events"] == 2
    # exp(-H) tracks the KM survival from above (standard inequality
    # S_KM <= exp(-H_NA) at every event time)
    km = {r["t"]: r["survival"] for r in kaplan_meier(df, "d", horizon=10).collect()}
    for t, r in na.items():
        if km.get(t, 0) > 0:
            assert km[t] <= math.exp(-r["cum_hazard"]) + 1e-12


def test_pettitt_changepoint_locates_planted_shift(spark):
    """A clean level shift must be located exactly: 30 low values then
    30 high values -> t_star = 30 (the last pre-shift position), and
    |U| there equals t*(n-t) with all pre < all post (the maximum the
    statistic can reach). A constant series scores u_abs ~ 0 splits
    everywhere -> earliest-t tie-break."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        pettitt_changepoint,
    )

    rows = [(i, 10.0 if i <= 30 else 50.0) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "pos int, v double")
    out = pettitt_changepoint(df, "pos", "v").collect()[0]
    assert out["n_points"] == 60
    assert out["t_star"] == 30
    assert out["change_at"] == 30
    assert out["u_abs"] == 30 * 30  # t*(n-t): every cross-pair signs -1
    # constant series: U_t = 0 for every t -> earliest split wins
    flat = spark.createDataFrame(
        [(i, 7.0) for i in range(1, 11)], "pos int, v double"
    )
    o2 = pettitt_changepoint(flat, "pos", "v").collect()[0]
    assert o2["u_abs"] == 0 and o2["t_star"] == 1


def test_transition_backtest_argmax_and_unseen_types(spark):
    """Planted sequences pin the backtest: the argmax model predicts
    the majority next type from TRAIN transitions only; a test-only
    source type gets a NULL prediction counted incorrect; accuracy is
    the exact floor-scaled ratio."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        transition_backtest,
    )

    # user 1 (train, all before cutoff): a->b, a->b, a->c  => model a->b
    # user 2 (test): a->b (correct), a->c (wrong)
    # user 3 (test): z->a (source 'z' unseen in train -> incorrect)
    rows = [
        (1, "2024-01-01 00:00:00", "a"), (1, "2024-01-01 00:01:00", "b"),
        (1, "2024-01-01 00:02:00", "a"), (1, "2024-01-01 00:03:00", "b"),
        (1, "2024-01-01 00:04:00", "a"), (1, "2024-01-01 00:05:00", "c"),
        (2, "2024-02-01 00:00:00", "a"), (2, "2024-02-01 00:01:00", "b"),
        (2, "2024-02-01 00:02:00", "a"), (2, "2024-02-01 00:03:00", "c"),
        (3, "2024-02-01 00:00:00", "z"), (3, "2024-02-01 00:01:00", "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).col("ts").cast("timestamp"))
    out = {
        r["from_type"]: r
        for r in transition_backtest(
            df, "user_id", "event_type", "ts", "2024-01-15"
        ).collect()
    }
    # test transitions from 'a': user2 a->b, a->c; also user2 b->a and
    # user3 a-> nothing... from 'a' in test: 2 rows, 1 correct
    assert out["a"]["predicted"] == "b"
    assert out["a"]["n_test"] == 2 and out["a"]["n_correct"] == 1
    assert out["a"]["acc_scaled"] == 500_000
    assert out["z"]["predicted"] is None
    assert out["z"]["n_correct"] == 0 and out["z"]["acc_scaled"] == 0


def test_fifo_allocate_interval_semantics(spark):
    """Hand-built lots pin FIFO semantics: demand consumes supply
    oldest-first across lot boundaries; the pair count per key is
    <= n_s + n_d - 1; leftover supply and excess demand have no pair."""
    from decimal import Decimal

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        fifo_allocate,
    )

    # key A: supply lots 10@t1, 5@t2; demand 8@t3, 6@t4 (total 14 of 15)
    sup = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 5.0), ("B", 1, 3.0)],
        "k string, t int, q double",
    )
    dem = spark.createDataFrame(
        [("A", 3, 8.0), ("A", 4, 6.0), ("B", 9, 7.0)],
        "k string, t int, q double",
    )
    out = fifo_allocate(sup, dem, "k", "t", "q").collect()
    a = sorted(
        [(r["supply_ts"], r["demand_ts"], float(r["qty_allocated"]))
         for r in out if r["k"] == "A"]
    )
    # d1(8) takes 8 from lot1; d2(6) takes lot1's last 2 then 4 of lot2
    assert a == [(1, 3, 8.0), (1, 4, 2.0), (2, 4, 4.0)]
    assert len(a) <= 2 + 2 - 1
    # key B: demand 7 > supply 3 -> one allocation of 3, shortfall 4
    b = [(r["supply_ts"], r["demand_ts"], float(r["qty_allocated"]))
         for r in out if r["k"] == "B"]
    assert b == [(1, 9, 3.0)]


def test_fifo_allocate_merge_edge_cases(spark):
    """r9 merge-formulation edges: zero-quantity rows are inert (they
    neither receive allocations nor shadow the covering interval in
    the fill-forward), and exact boundary ties across sides — a demand
    starting exactly where a supply lot starts — pair correctly with
    no duplicate or zero-width allocations."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        fifo_allocate,
    )

    # supply 10@t1 then a ZERO lot @t2 then 5@t3; demand 8@t4, 0@t5,
    # 7@t6 — the zero rows sit exactly on interval boundaries (cum=10)
    sup = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 0.0), ("A", 3, 5.0)],
        "k string, t int, q double",
    )
    dem = spark.createDataFrame(
        [("A", 4, 8.0), ("A", 5, 0.0), ("A", 6, 7.0)],
        "k string, t int, q double",
    )
    out = sorted(
        (r["supply_ts"], r["demand_ts"], float(r["qty_allocated"]))
        for r in fifo_allocate(sup, dem, "k", "t", "q").collect()
    )
    # d1(8) from lot1; d3(7) takes lot1's last 2 then ALL 5 of lot3
    assert out == [(1, 4, 8.0), (1, 6, 2.0), (3, 6, 5.0)]

    # boundary tie: supply lots 5@t1, 5@t2; demand 5@t3, 5@t4 — the
    # second demand's interval starts exactly at lot2's start (cum=5)
    sup2 = spark.createDataFrame(
        [("B", 1, 5.0), ("B", 2, 5.0)], "k string, t int, q double"
    )
    dem2 = spark.createDataFrame(
        [("B", 3, 5.0), ("B", 4, 5.0)], "k string, t int, q double"
    )
    out2 = sorted(
        (r["supply_ts"], r["demand_ts"], float(r["qty_allocated"]))
        for r in fifo_allocate(sup2, dem2, "k", "t", "q").collect()
    )
    assert out2 == [(1, 3, 5.0), (2, 4, 5.0)]


def test_holt_winters_matches_reference_fold_and_learns_season(spark):
    """The Spark fold must equal a plain-Python replay of the dyadic
    recursion exactly (bit parity), and on a pure period-3 pattern the
    one-step error must shrink once the seasonal slots have trained."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        holt_winters_forecast,
    )

    vals = [10.0, 20.0, 60.0] * 8  # strict period-3 signal
    rows = [("g", i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = sorted(
        holt_winters_forecast(
            df, "g", "t", "v", season=3, horizon=3
        ).collect(),
        key=lambda r: r["t"],
    )

    def fd(a):
        return (a - ((a % 4) + 4) % 4) // 4

    l = b = None
    s = [0, 0, 0]
    ref = []
    for i, v in enumerate(vals):
        x = int(round(v * 10000))
        slot = i % 3
        if l is None:
            l, b = x, 0
            pred = None
            s[slot] = 0
        else:
            pred = l + b + s[slot]
            l_new = fd((x - s[slot]) + 3 * (l + b))
            b = fd((l_new - l) + 3 * b)
            s[slot] = fd((x - l_new) + 3 * s[slot])
            l = l_new
        ref.append((l, b, s[slot], pred))
    for r, (rl, rb, rs, rp) in zip(out, ref):
        assert round(r["level"] * 10000) == rl
        assert round(r["trend"] * 10000) == rb
        assert round(r["seasonal"] * 10000) == rs
        if rp is None:
            assert r["one_step_pred"] is None
        else:
            assert round(r["one_step_pred"] * 10000) == rp
    # seasonality learned: late one-step abs errors < early ones
    errs = [abs(r["one_step_pred"] - r["x"]) for r in out[1:]]
    assert sum(errs[-6:]) < sum(errs[:6]) / 2


def test_forecast_residual_anomalies_flags_planted_spike(spark):
    """A spike the forecaster could not have predicted is flagged; the
    seasonal pattern itself never pages; seed rows (NULL pred) are
    skipped."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        forecast_residual_anomalies,
        holt_winters_forecast,
    )

    vals = [10.0, 20.0, 60.0] * 10
    vals[20] = 500.0  # planted spike
    rows = [("g", i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    fc = holt_winters_forecast(df, "g", "t", "v", season=3)
    out = forecast_residual_anomalies(fc, "t").collect()
    flagged = {r["t"] for r in out}
    assert 21 in flagged  # the spike (t is 1-based)
    # the pure pattern's PRE-SPIKE steady state never pages (the model
    # has learned the season by t=10; post-spike recovery transients
    # MAY page — that is real residual structure, not a bug)
    assert not any(10 <= t <= 20 for t in flagged)
    # flags are a minority of the series
    assert len(flagged) < len(vals) // 3


def test_fifo_allocate_plan_has_no_join(spark):
    """The r9 merge formulation must stay a union + fill-forward
    window: a Join node in the optimized plan means the per-key
    quadratic candidate generation crept back (SCALING.md §10 measured
    it at 6.3× wall per 3× data)."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        fifo_allocate,
    )

    sup = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 5.0)], "k string, t int, q double"
    )
    dem = spark.createDataFrame(
        [("A", 3, 8.0), ("A", 4, 6.0)], "k string, t int, q double"
    )
    plan = (
        fifo_allocate(sup, dem, "k", "t", "q")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 3  # two cum sums + the fill-forward


def test_logrank_hand_values(spark):
    """A=(1 event, 3 event), B=(2 event, 4 censored): O₁=2,
    E₁ = 1/2 + 1/3 + 1/2 = 4/3, V = 1/4 + 2/9 + 1/4 = 13/18,
    chi2 = (2/3)²/(13/18) = 8/13 — the worked 2×2-per-time table."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        logrank_test,
    )

    df = spark.createDataFrame(
        [("A", 1, 1), ("A", 3, 1), ("B", 2, 1), ("B", 4, 0)],
        "g string, t long, e long",
    )
    [r] = logrank_test(df, "g", "t", "e", "A", "B").collect()
    assert (r["n_a"], r["n_b"], r["events_a"], r["events_b"]) == (
        2, 2, 2, 1)
    assert abs(r["o_minus_e"] - 2.0 / 3.0) < 1e-12
    assert abs(r["var_lr"] - 13.0 / 18.0) < 1e-12
    assert abs(r["chi2"] - 8.0 / 13.0) < 1e-12


def test_logrank_identical_groups_and_censored(spark):
    """Mirror-image groups → O−E = 0 exactly; fully censored data →
    zero events, zero variance, NULL chi2 (never garbage)."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        logrank_test,
    )

    same = spark.createDataFrame(
        [(g, t, 1) for g in ("A", "B") for t in (1, 2, 5)],
        "g string, t long, e long",
    )
    [r] = logrank_test(same, "g", "t", "e", "A", "B").collect()
    assert abs(r["o_minus_e"]) < 1e-12

    cens = spark.createDataFrame(
        [("A", 9, 0), ("B", 9, 0)], "g string, t long, e long"
    )
    [c] = logrank_test(cens, "g", "t", "e", "A", "B").collect()
    assert c["events_a"] == 0 and c["var_lr"] == 0.0
    assert c["chi2"] is None


def test_stl_lite_recovers_planted_structure(spark):
    """Planted series value = 1000 + 10·t (trend) on consecutive
    days: a linear series' centered MA equals the value exactly, so
    seasonal ≈ 0 and remainder ≈ 0; edges (first/last 3) are NULL."""
    import datetime as _dt

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        stl_lite,
    )

    d0 = _dt.date(2024, 1, 1)
    rows = [(d0 + _dt.timedelta(days=t), 1000 + 10 * t)
            for t in range(28)]
    df = spark.createDataFrame(rows, "d date, v long")
    out = stl_lite(df, "d", "v").collect()
    assert len(out) == 28
    interior = [r for r in out if r["trend"] is not None]
    assert len(interior) == 22
    for r in interior:
        assert abs(r["trend"] - r["value"]) < 1e-9
        assert abs(r["seasonal"]) < 1e-9
        assert abs(r["remainder"]) < 1e-9
    edges = [r for r in out if r["trend"] is None]
    assert all(r["seasonal"] is None and r["remainder"] is None
               for r in edges)


def test_stl_lite_finds_weekly_cycle(spark):
    """Planted dow bump: value = 1000 + 700·[dow==Monday] over 70
    consecutive days — the Monday seasonal reads ≈ 600 (the MA
    absorbs 100 of the bump: 700/7) and every other dow ≈ −100;
    remainder stays bounded."""
    import datetime as _dt

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        stl_lite,
    )

    d0 = _dt.date(2024, 1, 1)  # a Monday
    rows = [(d0 + _dt.timedelta(days=t),
             1000 + (700 if (d0 + _dt.timedelta(days=t)).weekday() == 0
                     else 0))
            for t in range(70)]
    df = spark.createDataFrame(rows, "d date, v long")
    out = [r for r in stl_lite(df, "d", "v").collect()
           if r["seasonal"] is not None]
    mond = {r["seasonal"] for r in out
            if r["day"].weekday() == 0}
    rest = {r["seasonal"] for r in out
            if r["day"].weekday() != 0}
    assert all(abs(s - 600.0) < 1e-9 for s in mond)
    assert all(abs(s + 100.0) < 1e-9 for s in rest)
    assert all(abs(r["remainder"]) < 1e-9 for r in out)


def test_haar_energy_hand_values(spark):
    """[5,1,9,7,2,6,4,4]: level energies 36/100/36 (total 172) by the
    textbook unnormalized transform; a 5-long series truncates to its
    first dyadic prefix (4); constant series → all-zero energy with
    NULL fractions guarded by total>0... (total=0 → frac NULL)."""
    import datetime as _dt

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        haar_energy,
    )

    d0 = _dt.date(2024, 1, 1)
    vals = [5, 1, 9, 7, 2, 6, 4, 4]
    df = spark.createDataFrame(
        [(d0 + _dt.timedelta(days=i), v) for i, v in enumerate(vals)],
        "d date, v long",
    )
    rows = {r["level"]: r for r in haar_energy(df, "d", "v").collect()}
    assert [rows[i]["energy"] for i in (1, 2, 3)] == ["36", "100", "36"]
    assert rows[1]["n_coeffs"] == 4 and rows[3]["n_coeffs"] == 1
    assert rows[2]["scale_days"] == 2
    assert abs(rows[2]["energy_frac"] - 100.0 / 172.0) < 1e-15

    trunc = spark.createDataFrame(
        [(d0 + _dt.timedelta(days=i), v)
         for i, v in enumerate([1, 3, 2, 2, 99])],
        "d date, v long",
    )
    t = {r["level"]: r for r in haar_energy(trunc, "d", "v").collect()}
    assert set(t) == {1, 2}            # 99 is beyond the dyadic prefix
    assert t[1]["energy"] == "4" and t[2]["energy"] == "0"
    assert abs(t[1]["energy_frac"] - 1.0) < 1e-15

    flat = spark.createDataFrame(
        [(d0 + _dt.timedelta(days=i), 7) for i in range(4)],
        "d date, v long",
    )
    f = haar_energy(flat, "d", "v").collect()
    assert all(r["energy"] == "0" and r["energy_frac"] is None
               for r in f)
