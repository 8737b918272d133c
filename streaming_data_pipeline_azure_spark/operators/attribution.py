"""Marketing-style conversion attribution: split each conversion's
revenue across the user's preceding touch events inside a lookback
window — last-touch, first-touch, or linear credit.

Completes the product-analytics family (funnels / cohorts / CEP in
temporal.py): "which channel gets credit for this purchase" is the
standard revenue question downstream of every funnel.

Shape: ONE user-keyed equi-join of conversions against touches with a
time-band filter (the as-of-join pattern — per-user history is the
natural partitioning; AQE splits hot users), then a window ranked
inside each conversion's touch set (groups are per-conversion, tiny by
construction — bounded by touches-per-user-per-window, not by corpus
size). Nothing global is sorted; at 100 TB both sides shuffle once on
the user key.

Exactness: last/first credit the FULL conversion value to one touch,
so per-channel revenue is a sum of exact DECIMAL(18,4) values —
order-independent and oracle-hash-checkable. Linear credit divides by
the touch count (a per-row double), so its per-channel sums are
float-order-dependent across engines; it is anchored by conservation
and hand-computed tests instead (tests/test_attribution.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MODELS = (
    "last_touch",
    "first_touch",
    "linear",
    "position_based",
    "time_decay",
)

#: time_decay half-life (seconds) — touches a half-life older than the
#: conversion carry half the weight of fresh ones, stepped per whole
#: half-life so every weight is an exact power of two (see below).
TIME_DECAY_HALF_LIFE_S = 86_400


def attribution_credits(
    events: DataFrame,
    *,
    model: str = "last_touch",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 3 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per credited touch: (conversion_id, touch_id, channel, credit).

    A touch qualifies when it is the same user's, STRICTLY before the
    conversion, and at most ``lookback_seconds`` earlier. ``last_touch``
    / ``first_touch`` credit the latest / earliest qualifying touch
    with the full conversion value (ties broken by the touch id, so the
    result is a pure function of the data); ``linear`` splits the value
    equally across all qualifying touches. Conversions with no
    qualifying touch produce no rows (unattributed — callers can
    anti-join to report them)."""
    if model not in _MODELS:
        raise ValueError(
            f"attribution model {model!r} not in {_MODELS}"
        )
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col(id_col).alias("conversion_id"),
        F.col(value_col).cast("decimal(18,4)").alias("__v"),
    )
    touch = events.filter(
        F.col(type_col).isin(*touch_types)
    ).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("channel"),
    )
    j = conv.join(touch, "__u").filter(
        (F.col("__tts") < F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts")
            - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS")
        )
    )
    if model == "linear":
        w = Window.partitionBy("conversion_id")
        return j.select(
            "conversion_id",
            "touch_id",
            "channel",
            (
                F.col("__v").cast("double")
                / F.count(F.lit(1)).over(w).cast("double")
            ).alias("credit"),
        )
    if model == "position_based":
        # U-shaped 40/20/40: first and last touches take 0.4 each, the
        # middles split the remaining 0.2 evenly; n=1 -> 1.0, n=2 ->
        # 0.5/0.5. Every credit is ONE double multiply(/divide) on a
        # per-row basis — deterministic per row, so per-touch output
        # is oracle-hash-checkable (channel SUMS of these doubles are
        # not; report per touch, like chi2_contingency_cells).
        w_pos = Window.partitionBy("conversion_id").orderBy(
            F.col("__tts").asc(), F.col("touch_id").asc()
        )
        w_all = Window.partitionBy("conversion_id")
        pos = F.row_number().over(w_pos)
        n = F.count(F.lit(1)).over(w_all)
        vd = F.col("__v").cast("double")
        weight_edge = F.when(n == 1, F.lit(1.0)).otherwise(
            F.when(n == 2, F.lit(0.5)).otherwise(F.lit(0.4))
        )
        credit = (
            F.when((pos == 1) | (pos == n), vd * weight_edge)
            .otherwise(
                vd * F.lit(0.2) / (n - F.lit(2)).cast("double")
            )
        )
        return (
            j.withColumn("__pos", pos)
            .withColumn("__n", n)
            .select(
                "conversion_id",
                "touch_id",
                "channel",
                F.col("__pos").cast("long").alias("touch_position"),
                F.col("__n").cast("long").alias("n_touches"),
                credit.alias("credit"),
            )
        )
    if model == "time_decay":
        # STEPPED exponential decay: k = whole half-lives of touch age,
        # weight = 2^(31-min(k,31)) as an exact INTEGER — the window
        # normalizer is then an exact long sum (order-free, unlike a
        # float weight sum), and each credit is one double
        # multiply+divide: v * w / Σw. No pow(), no float recursion —
        # the decayed_sum dyadic discipline applied to attribution.
        age_s = (
            F.unix_micros(F.col("__cts")) - F.unix_micros(F.col("__tts"))
        ) / F.lit(1_000_000.0)
        k = F.least(
            F.floor(age_s / F.lit(float(TIME_DECAY_HALF_LIFE_S))).cast(
                "int"
            ),
            F.lit(31),
        )
        staged = j.withColumn("__k", k).withColumn(
            "__w",
            F.expr("shiftleft(CAST(1 AS BIGINT), 31 - __k)"),
        )
        w_all = Window.partitionBy("conversion_id")
        vd = F.col("__v").cast("double")
        return staged.select(
            "conversion_id",
            "touch_id",
            "channel",
            F.col("__k").cast("long").alias("half_lives_old"),
            (
                vd
                * F.col("__w").cast("double")
                / F.sum("__w").over(w_all).cast("double")
            ).alias("credit"),
        )
    desc = model == "last_touch"
    order = (
        [F.col("__tts").desc(), F.col("touch_id").desc()]
        if desc
        else [F.col("__tts").asc(), F.col("touch_id").asc()]
    )
    w = Window.partitionBy("conversion_id").orderBy(*order)
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "conversion_id",
            "touch_id",
            "channel",
            F.col("__v").cast("double").alias("credit"),
        )
    )


def channel_revenue(
    events: DataFrame,
    *,
    models: tuple[str, ...] = ("last_touch", "first_touch"),
    **kwargs,
) -> DataFrame:
    """Per (model, channel): credited conversion count and attributed
    revenue — the report form of :func:`attribution_credits`.

    Only single-touch models are accepted here: their per-channel
    revenue is a sum of exact decimals (order-independent, engine-
    exact); linear's divided credits are not, and belong in
    :func:`attribution_credits` + a conservation test, not in an
    oracle-checked report. Returns (model, channel, n_conversions,
    revenue)."""
    bad = [m for m in models if m == "linear"]
    if bad:
        raise ValueError(
            "channel_revenue: 'linear' credits are float-divided and "
            "not order-independent — aggregate attribution_credits "
            "yourself if approximate sums are acceptable"
        )
    outs = []
    for m in models:
        conv = events.filter(
            F.col(kwargs.get("type_col", "event_type"))
            == kwargs.get("conversion_type", "purchase")
        )
        credits = attribution_credits(events, model=m, **kwargs)
        # re-join the exact decimal value by conversion id to keep the
        # channel sum decimal-exact (credits exposes only the double)
        val = conv.select(
            F.col(kwargs.get("id_col", "event_id")).alias(
                "conversion_id"
            ),
            F.col(kwargs.get("value_col", "value"))
            .cast("decimal(18,4)")
            .alias("__v"),
        )
        outs.append(
            credits.join(val, "conversion_id")
            .groupBy("channel")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_conversions"),
                F.sum("__v").alias("__r"),
            )
            .select(
                F.lit(m).alias("model"),
                "channel",
                "n_conversions",
                F.col("__r").cast("double").alias("revenue"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def shapley_channel_values(
    df: DataFrame,
    key_col: str,
    type_col: str,
    channels: list[str],
    conversion_type: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """SHAPLEY-VALUE channel attribution — the game-theoretic credit
    split (each channel's average marginal contribution over every
    coalition order), the principled endpoint of the attribution
    family after first/last/position/time-decay heuristics. The
    characteristic function is the standard subset-reach model:
    v(S) = conversions among users whose touched-channel set ⊆ S
    (what S alone could have reached). Returns one row per channel:
    (channel, phi_xnfact, phi_share_scaled) — φ is reported ×n! so
    the |S|!(n−|S|−1)! coalition weights stay INTEGER; shares are
    floor-scaled against Σφ = v(N) − v(∅) (the efficiency axiom,
    asserted by the tests).

    Exactness: everything is integer — per-user channel bitmasks, the
    2ⁿ subset reaches via bitwise containment (m & ~S = 0) in ONE
    conditional aggregation, and the weighted marginal sums. Capped at
    ≤ 4 channels (2ⁿ conditional sums in one row; the closed form is
    the point, not wide n). Shape: one per-user aggregation, one
    8-row mask count, one single-row fold — nothing iterative."""
    import math

    n = len(channels)
    if not 2 <= n <= 4:
        raise ValueError("shapley_channel_values supports 2-4 channels")
    t = F.col(type_col)
    touch = [
        F.max((t == c).cast("int")).alias(f"__c{i}")
        for i, c in enumerate(channels)
    ]
    per_user = df.groupBy(key_col).agg(
        *touch,
        F.max((t == conversion_type).cast("int")).alias("__conv"),
    )
    mask = None
    for i in range(n):
        term = F.col(f"__c{i}") * F.lit(1 << i)
        mask = term if mask is None else mask + term
    masks = per_user.select(mask.alias("__m"), F.col("__conv")).groupBy(
        "__m"
    ).agg(F.sum("__conv").cast("long").alias("__nc"))
    # v(S) for every subset S: one conditional sum each — the mask
    # table has 2^n rows, so this is a constant-size fold
    full = (1 << n) - 1
    v_cols = [
        F.sum(
            F.when(
                F.col("__m").bitwiseAND(F.lit(full ^ S)) == 0,
                F.col("__nc"),
            ).otherwise(F.lit(0))
        ).cast("long").alias(f"__v{S}")
        for S in range(1 << n)
    ]
    one = masks.agg(*v_cols)
    fact = math.factorial
    rows = []
    for i in range(n):
        phi = None
        for S in range(1 << n):
            if S & (1 << i):
                continue
            size = bin(S).count("1")
            w = fact(size) * fact(n - size - 1)  # x n! when summed
            term = F.lit(w) * (
                F.col(f"__v{S | (1 << i)}") - F.col(f"__v{S}")
            )
            phi = term if phi is None else phi + term
        rows.append((channels[i], phi))
    total = None
    for _, phi in rows:
        total = phi if total is None else total + phi
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("channel"),
                        phi.cast("long").alias("phi_xnfact"),
                        total.cast("long").alias("__tot"),
                    )
                    for name, phi in rows
                ]
            )
        ).alias("__s")
    )
    return stacked.select(
        F.col("__s.channel").alias("channel"),
        F.col("__s.phi_xnfact").alias("phi_xnfact"),
        F.expr(
            f"CAST((__s.phi_xnfact * CAST({scale} AS BIGINT)) DIV __s.__tot"
            " AS BIGINT)"
        ).alias("phi_share_scaled"),
    )
