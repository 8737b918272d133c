"""Capture .explain("formatted") for named bench entries into text files.

Usage: python scripts/capture_plans.py <outdir> <suffix> name1 name2 ...
Writes <outdir>/<name>_<suffix>.txt for each entry. Uses sf0.01 by default
($SPARK_GRAFT_SF_DIR overrides) — the plan SHAPE is sf-independent and the
small SF keeps index-build entry prerequisites cheap.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from streaming_data_pipeline_azure_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("capture-plans")
    os.makedirs(outdir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
