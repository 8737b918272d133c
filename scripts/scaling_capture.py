"""Empirical scaling capture (VERDICT r5 #2): time the heaviest
operators at a base scale factor and at an N-fold scaled copy (built by
``make_scaled_sf.py``), to test the 100x-survival claims directly.

Usage:
    python scripts/scaling_capture.py SF_DIR [query ...]

Prints one JSON object: per-query isolated warm triples (BASELINE.md
methodology — per-table warmup, session-cached index builds paid and
timed as separate labeled entries, 3 forced runs per query).
Run once per scale directory and compare the medians.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from streaming_data_pipeline_azure_spark.functions.cache import release_caches
from streaming_data_pipeline_azure_spark.session import get_spark

import __spark_entry__ as entrymod

DEFAULT_QUERIES = [
    "span_dedup",
    "cross_doc_repetition",
    "training_export_stats",
    "fuzzy_customer_pairs",
    "bm25_search_indexed",
    "dedup_incremental_neardup",
    "span_dedup_incremental",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "embedding_neardup_pairs",
    "pricing_summary",
    "events_sessionized",
]

# query -> (build label, build fn) for session-cached indexes, so probe
# entries measure probe cost and build cost is visible separately
BUILDS = {
    "bm25_search_indexed": (
        "build_postings_index", lambda s, d: entrymod._corpus_postings_index(s, d)
    ),
    "dedup_incremental_neardup": (
        "build_minhash_index", lambda s, d: entrymod._corpus_minhash_index(s, d)
    ),
    "span_dedup_incremental": (
        "build_gram_index", lambda s, d: entrymod._corpus_gram_index(s, d)
    ),
    "ann_ivf_topk": (
        "build_ivf_index",
        lambda s, d: entrymod.queries()["ann_ivf_topk"](s, d),
    ),
    "ann_ivfpq_topk": (
        "build_ivfpq_index", lambda s, d: entrymod._ivfpq_index(s, d)
    ),
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _identity(batches):
        yield from batches

    spark.range(256).repartition(64).mapInPandas(_identity, "id long").count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        force(spark.read.parquet(f"{sf_dir}/{t}.parquet"))

    out: dict[str, list[float]] = {}
    for n in names:
        if n in BUILDS:
            label, fn = BUILDS[n]
            if label not in out:
                t0 = time.perf_counter()
                fn(spark, sf_dir)
                out[label] = [round(time.perf_counter() - t0, 3)]
    queries = entrymod.queries()
    for n in names:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(queries[n](spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            release_caches()
            spark.catalog.clearCache()
        out[n] = runs
    print(json.dumps({"sf_dir": sf_dir, "timings": out}, indent=1))


if __name__ == "__main__":
    main()
