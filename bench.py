"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect bottleneck). A warmup pass on sf's smallest sibling is
skipped intentionally: JVM+Catalyst warmup is part of real cost only once,
so we warm up with a trivial job instead to keep per-query numbers honest.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_data_pipeline_azure_spark.session import get_spark

import __spark_entry__ as entrymod


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    # JVM/codegen warmup on a trivial job
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        # operators that persist() intermediates (LSH dedup) hold blocks
        # until the session drops them; clear between queries so each
        # timing is isolated instead of degrading under accumulated cache
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
