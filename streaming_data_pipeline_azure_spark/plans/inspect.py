"""Helpers for asserting physical-plan properties — broadcast joins,
filter pushdown, column pruning. Used by tests and by the bench harness to
keep plans honest as the surface grows (a correct-but-shuffling plan is a
regression at 100 TB even when results match).
"""

from __future__ import annotations

from py4j.protocol import Py4JError, Py4JJavaError
from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (post-AQE initial plan)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def unpartitioned_window_count(df: DataFrame) -> int:
    """Count WindowExec nodes with an EMPTY partitionSpec in the
    pre-AQE physical plan — the 100 TB red flag (a global window
    funnels every row through ONE task). Plan-only: nothing executes.
    The standing r11 audit gate (VERDICT r10 #4) walks every
    ``queries()`` entry through this and requires any non-zero count
    to carry a docstring grain-bound tag."""
    count = 0

    def visit(node) -> None:
        nonlocal count
        name = node.getClass().getSimpleName()
        # any window-family node — matching the exact class name left
        # the audit blind to non-WindowExec global windows (ADVICE
        # r11): pandas window UDFs plan as ArrowWindowPythonExec in
        # Spark 4 (WindowInPandasExec in 3.x — note neither STARTS
        # with "Window", hence substring), plus WindowGroupLimitExec.
        # Every window-family exec exposes partitionSpec(); the guard
        # keeps an unrelated future *Window* node from breaking walks.
        if "Window" in name:
            try:
                if node.partitionSpec().size() == 0:
                    count += 1
            except (AttributeError, Py4JError) as exc:
                # ONLY the "this *Window* node has no partitionSpec()"
                # shape may be skipped; a genuine window-family node
                # failing MID-call (a Java-side exception) must surface
                # rather than silently undercount the audit (ADVICE
                # r12).
                if isinstance(exc, Py4JJavaError):
                    raise
        ch = node.children()
        for i in range(ch.size()):
            visit(ch.apply(i))

    visit(df._jdf.queryExecution().sparkPlan())
    return count


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, f"expected broadcast join:\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r}:\n{plan}"
    )


def scan_output_rows(df: DataFrame) -> int:
    """Execute ``df`` and return the summed ``numOutputRows`` of every
    file-source scan in the FINAL executed plan — the rows that
    SURVIVED parquet row-group/page pruning by the pushed filters
    (with record-level filtering off, Spark's default, the parquet
    reader drops whole row groups/pages by min/max stats and the scan
    emits the survivors; the post-scan Filter then drops the rest).
    Layout claims get metric-level evidence this way: a clustered
    layout must yield a much smaller scan output than a poorly-
    clustered one for the same predicate (VERDICT r7 #7)."""
    df.collect()
    total = 0

    def visit(node) -> None:
        nonlocal total
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            visit(node.executedPlan())
            return
        if "QueryStageExec" in name:
            visit(node.plan())
            return
        if "FileSourceScanExec" in name or "BatchScanExec" in name:
            m = node.metrics()
            if m.contains("numOutputRows"):
                total += int(m.apply("numOutputRows").value())
        ch = node.children()
        for i in range(ch.size()):
            visit(ch.apply(i))

    visit(df._jdf.queryExecution().executedPlan())
    return total


def shuffle_write_metrics(df: DataFrame) -> list[dict]:
    """Execute ``df`` and return one dict per ShuffleExchange in the
    FINAL (post-AQE) executed plan with its measured write metrics:
    ``bytes`` (shuffleBytesWritten — on-the-wire, compressed),
    ``records`` (shuffleRecordsWritten) and ``data_size`` (in-memory
    row size before compression).

    This is how the scale-critical shuffle-VOLUME claims get byte-level
    evidence (VERDICT r5 #3): plan-shape tests prove what shuffles,
    these prove how MUCH. Call on a freshly-built DataFrame — metrics
    accumulate across repeated actions on the same plan instance."""
    df.collect()
    out: list[dict] = []

    def visit(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            visit(node.executedPlan())
            return
        if "QueryStageExec" in name:
            visit(node.plan())
            return
        if name == "ShuffleExchangeExec":
            m = node.metrics()

            def val(key: str) -> int:
                return int(m.apply(key).value()) if m.contains(key) else 0

            out.append(
                {
                    "bytes": val("shuffleBytesWritten"),
                    "records": val("shuffleRecordsWritten"),
                    "data_size": val("dataSize"),
                }
            )
        ch = node.children()
        for i in range(ch.size()):
            visit(ch.apply(i))

    visit(df._jdf.queryExecution().executedPlan())
    return out
