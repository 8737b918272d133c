"""Isolated warm-triple timing for named bench entries (BASELINE.md
methodology): per-table warmup first, any session-cached index builds
timed separately, then each named query forced end-to-end three times.

Usage: python scripts/bench_triples.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from streaming_data_pipeline_azure_spark.functions.cache import release_caches
from streaming_data_pipeline_azure_spark.session import get_spark

import __spark_entry__ as entrymod


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _identity(batches):
        for pdf in batches:
            yield pdf

    spark.range(256).repartition(64).mapInPandas(_identity, "id long").count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        force(spark.read.parquet(f"{sf_dir}/{t}.parquet"))

    queries = entrymod.queries()
    out = {}
    # pay any index build ONCE, timed separately, before the triples
    builds = {
        "preamble_postings_index_build": entrymod._corpus_postings_index,
        "preamble_ivfpq_index_build": entrymod._ivfpq_index,
        "preamble_novelty_index_build": entrymod._corpus_novelty_index,
    }
    needed = set()
    for n in names:
        if n in ("bm25_search_indexed",):
            needed.add("preamble_postings_index_build")
        if n in ("ann_ivfpq_topk", "ann_ivfpq_multiquery",
                 "ann_ivfpq_filtered"):
            needed.add("preamble_ivfpq_index_build")
        if n in ("doc_novelty_incremental",):
            needed.add("preamble_novelty_index_build")
    for b in sorted(needed):
        t0 = time.perf_counter()
        builds[b](spark, sf_dir)
        out[b] = [round(time.perf_counter() - t0, 3)]
    for n in names:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(queries[n](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            release_caches()
            spark.catalog.clearCache()
        out[n] = runs
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
