"""PySpark-native analytics engine with the query surface of
``abhirockzz/streaming-data-pipeline-azure``.

The reference is a streaming data-enrichment pipeline on Azure (Event Hubs
-> Azure Stream Analytics join with a SQL reference table -> Cosmos DB) plus
ad-hoc analytical queries over the sink (reference README.md:5-10, 227-245).
This package re-expresses that computation Spark-first:

- ``session``    — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``schemas``    — explicit StructTypes for every declared schema
- ``sources``    — source/sink registry (kafka, jdbc, csv, json, parquet,
                   file-stream, rate generator, cosmos-shaped upsert sink)
- ``operators``  — the operator library: enrichment join, relational ops,
                   dedup (exact/minhash/simhash/jaccard/embedding), similarity
                   search, text analysis, multimodal column plumbing
- ``streaming``  — Structured Streaming pipeline assembly + load generator
- ``plans``      — plan-inspection helpers (assert broadcast, pushdown)
"""

__version__ = "0.1.0"
