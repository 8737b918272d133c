"""Pareto frontier: exactness vs brute force, ties, flags, nulls."""

from __future__ import annotations

import pytest

from streaming_data_pipeline_azure_spark.operators.skyline import (
    pareto_frontier,
)


def _brute(rows, maximize=(True, True)):
    def better(q, p):
        qx, qy = (q[1], q[2])
        px, py = (p[1], p[2])
        if not maximize[0]:
            qx, px = -qx, -px
        if not maximize[1]:
            qy, py = -qy, -py
        return qx >= px and qy >= py and (qx > px or qy > py)

    return {
        p[0]
        for p in rows
        if not any(better(q, p) for q in rows)
    }


def test_pareto_frontier_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randrange(20)), float(rng.randrange(20)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r["id"]
        for r in pareto_frontier(df.repartition(7), "x", "y").collect()
    }
    assert got == _brute(rows)


def test_pareto_frontier_minimize_and_ties(spark):
    rows = [
        (1, 1.0, 9.0),
        (2, 1.0, 9.0),   # duplicate frontier point: both kept
        (3, 2.0, 9.0),   # dominates 1,2 on x at equal y? maximize x,
        #   min y: (3) has higher x same y -> dominates under (max,max)
        (4, 2.0, 1.0),
        (5, 3.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    # maximize x, minimize y
    got = {
        r["id"]
        for r in pareto_frontier(
            df, "x", "y", maximize=(True, False)
        ).collect()
    }
    assert got == _brute(rows, maximize=(True, False))
    assert 4 in got and 5 in got


def test_pareto_frontier_rejects_nulls(spark):
    df = spark.createDataFrame(
        [(1, None, 2.0)], "id long, x double, y double"
    )
    with pytest.raises(ValueError, match="null"):
        pareto_frontier(df, "x", "y")
