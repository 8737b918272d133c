"""Conversion attribution semantics (operators/attribution.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators.attribution import (
    attribution_credits,
    channel_revenue,
)

T = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)  # noqa: E731


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


def _base_rows():
    return [
        # u1: click@5, view@6, purchase@9 (val 100), lookback 5 min ->
        # last=view, first=click
        (1, T(6), 1, "view", 1.0),
        (2, T(5), 1, "click", 2.0),
        (3, T(9), 1, "purchase", 100.0),
        # u2: click@0 only touch, but purchase@9 with lookback 5 min ->
        # too old, unattributed
        (4, T(0), 2, "click", 1.0),
        (5, T(9), 2, "purchase", 50.0),
        # u3: touch exactly AT the conversion instant -> strict <,
        # excluded; earlier view@1 wins both models
        (6, T(1), 3, "view", 1.0),
        (7, T(4), 3, "purchase", 30.0),
        (8, T(4), 3, "click", 1.0),
        # u4: two clicks same timestamp @2 -> tie broken by event_id
        # (last -> id 10, first -> id 9)
        (9, T(2), 4, "click", 1.0),
        (10, T(2), 4, "click", 1.0),
        (11, T(3), 4, "purchase", 10.0),
    ]


def test_last_and_first_touch_credits(spark):
    ev = _ev(spark, _base_rows())
    last = {
        r["conversion_id"]: r
        for r in attribution_credits(
            ev, model="last_touch", lookback_seconds=300
        ).collect()
    }
    assert set(last) == {3, 7, 11}  # conversion 5 unattributed
    assert last[3]["touch_id"] == 1 and last[3]["channel"] == "view"
    assert last[3]["credit"] == 100.0
    assert last[7]["touch_id"] == 6  # the @4 click is not strictly before
    assert last[11]["touch_id"] == 10  # tie -> larger event_id
    first = {
        r["conversion_id"]: r
        for r in attribution_credits(
            ev, model="first_touch", lookback_seconds=300
        ).collect()
    }
    assert first[3]["touch_id"] == 2 and first[3]["channel"] == "click"
    assert first[11]["touch_id"] == 9  # tie -> smaller event_id


def test_linear_splits_and_conserves(spark):
    ev = _ev(spark, _base_rows())
    lin = attribution_credits(
        ev, model="linear", lookback_seconds=300
    ).collect()
    by_conv = {}
    for r in lin:
        by_conv.setdefault(r["conversion_id"], []).append(r["credit"])
    # u1: two touches -> 50/50 of 100
    assert sorted(by_conv[3]) == [50.0, 50.0]
    # u4: two tied clicks both credited 5
    assert sorted(by_conv[11]) == [5.0, 5.0]
    # conservation: per conversion the credits sum to its full value
    assert sum(by_conv[3]) == 100.0
    assert sum(by_conv[7]) == 30.0
    assert 5 not in by_conv  # unattributed stays unattributed


def test_channel_revenue_report(spark):
    ev = _ev(spark, _base_rows())
    out = {
        (r["model"], r["channel"]): r
        for r in channel_revenue(ev, lookback_seconds=300).collect()
    }
    # last: conv3->view(100), conv7->view(30), conv11->click(10)
    assert out[("last_touch", "view")]["revenue"] == 130.0
    assert out[("last_touch", "view")]["n_conversions"] == 2
    assert out[("last_touch", "click")]["revenue"] == 10.0
    # first: conv3->click(100), conv7->view(30), conv11->click(10)
    assert out[("first_touch", "view")]["revenue"] == 30.0
    assert out[("first_touch", "click")]["revenue"] == 110.0
    assert out[("first_touch", "click")]["n_conversions"] == 2


def test_model_validation(spark):
    ev = _ev(spark, _base_rows())
    with pytest.raises(ValueError, match="not in"):
        attribution_credits(ev, model="u_shaped")
    with pytest.raises(ValueError, match="linear"):
        channel_revenue(ev, models=("last_touch", "linear"))


def test_attribution_no_global_sort(spark):
    """The credited-touch window partitions by conversion id — the plan
    must contain no global (empty-partition-spec) Window and no
    cartesian product."""
    ev = _ev(spark, _base_rows())
    plan = attribution_credits(
        ev, model="last_touch", lookback_seconds=300
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "PartitionBy: []" not in plan


def test_position_based_credits(spark):
    """U-shaped 40/20/40: edges take 0.4, middles split 0.2; n=1 and
    n=2 degenerate correctly; credits conserve the conversion value."""
    import datetime as dt

    from streaming_data_pipeline_azure_spark.operators.attribution import (
        attribution_credits,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0)
    rows = [
        # user 1: 4 touches then purchase of 100
        (1, t0 + dt.timedelta(minutes=m), 10 + m, "view", 0.0)
        for m in range(4)
    ]
    rows.append((1, t0 + dt.timedelta(minutes=10), 99, "purchase", 100.0))
    # user 2: single touch
    rows.append((2, t0, 20, "click", 0.0))
    rows.append((2, t0 + dt.timedelta(minutes=5), 98, "purchase", 40.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
        "event_type string, value double"
    )
    got = attribution_credits(df, model="position_based").collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conversion_id"], []).append(r)
    u1 = sorted(by_conv[99], key=lambda r: r["touch_position"])
    assert [r["credit"] for r in u1] == [40.0, 10.0, 10.0, 40.0]
    assert all(r["n_touches"] == 4 for r in u1)
    assert abs(sum(r["credit"] for r in u1) - 100.0) < 1e-9
    assert by_conv[98][0]["credit"] == 40.0  # single touch takes all


def test_time_decay_stepped_dyadic_weights(spark):
    """Touches 0/1/2 whole half-lives old weigh 4:2:1; with v=7 the
    credits are exactly 4, 2, 1 (exact integer weights, exact long
    normalizer); ages inside the same half-life share a weight."""
    import datetime as dtm

    from streaming_data_pipeline_azure_spark.operators.attribution import (
        attribution_credits,
    )

    c = dtm.datetime(2024, 1, 10, 0, 0, 0)
    rows = [
        (1, c, 7, "purchase", 7.0),
        (2, c - dtm.timedelta(hours=12), 7, "view", 0.0),   # k=0
        (3, c - dtm.timedelta(hours=36), 7, "click", 0.0),  # k=1
        (4, c - dtm.timedelta(hours=60), 7, "view", 0.0),   # k=2
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    out = {r["touch_id"]: r for r in attribution_credits(
        df, model="time_decay"
    ).collect()}
    assert out[2]["credit"] == 4.0 and out[2]["half_lives_old"] == 0
    assert out[3]["credit"] == 2.0 and out[3]["half_lives_old"] == 1
    assert out[4]["credit"] == 1.0 and out[4]["half_lives_old"] == 2


def test_shapley_efficiency_and_symmetry(spark):
    from streaming_data_pipeline_azure_spark.operators.attribution import (
        shapley_channel_values,
    )

    # 10 users touch only A and convert; 10 touch only B and convert;
    # 5 touch nothing and convert (baseline); symmetric A/B must get
    # equal credit, and shares must sum to ~1e6 (efficiency)
    rows = []
    for u in range(10):
        rows += [(u, "a"), (u, "buy")]
    for u in range(10, 20):
        rows += [(u, "b"), (u, "buy")]
    for u in range(20, 25):
        rows += [(u, "noise")]
        rows += [(u, "buy")]
    df = spark.createDataFrame(rows, ["uid", "et"])
    out = {
        r["channel"]: r
        for r in shapley_channel_values(
            df, "uid", "et", ["a", "b"], "buy"
        ).collect()
    }
    assert out["a"]["phi_xnfact"] == out["b"]["phi_xnfact"]
    # v(N) - v(empty) = 25 - 5 = 20 conversions attributable; x2! = 40
    assert out["a"]["phi_xnfact"] + out["b"]["phi_xnfact"] == 40
    assert out["a"]["phi_share_scaled"] == 500_000


def test_shapley_null_player_gets_zero(spark):
    from streaming_data_pipeline_azure_spark.operators.attribution import (
        shapley_channel_values,
    )

    # channel c is touched only by users who NEVER convert -> its
    # marginal contribution is zero in every coalition
    rows = []
    for u in range(10):
        rows += [(u, "a"), (u, "buy")]
    for u in range(10, 14):
        rows += [(u, "c")]
    df = spark.createDataFrame(rows, ["uid", "et"])
    out = {
        r["channel"]: r["phi_xnfact"]
        for r in shapley_channel_values(
            df, "uid", "et", ["a", "b", "c"], "buy"
        ).collect()
    }
    assert out["c"] == 0
    assert out["b"] == 0
    assert out["a"] > 0
