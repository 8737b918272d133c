"""Helpers for asserting physical-plan properties — broadcast joins,
filter pushdown, column pruning. Used by tests and by the bench harness to
keep plans honest as the surface grows (a correct-but-shuffling plan is a
regression at 100 TB even when results match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (post-AQE initial plan)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, f"expected broadcast join:\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r}:\n{plan}"
    )
