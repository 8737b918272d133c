"""Unified takedown coordinator: one call hides a document from the
sink and every registered index at once (operators/takedown.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_azure_spark.operators import (
    corpus,
    dedup,
    search,
    similarity,
    takedown,
)
from streaming_data_pipeline_azure_spark.sources.sinks import ParquetUpsertSink

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "completely different text about spark shuffles and joins here"),
    (3, "a third document with some unique searchable tokens inside it"),
]


def test_forget_documents_hides_everywhere_then_compacts(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [float(i)] * 16) for i, _ in DOCS],
        "vec_id long, embedding array<double>",
    )

    sink = ParquetUpsertSink(str(tmp_path / "sink"))
    sink.write_batch(
        docs.select(
            F.col("doc_id").cast("string").alias("order_id"),
            F.lit("c").alias("customer_id"),
            F.lit(1.0).alias("purchase_amount"),
            F.lit("n").alias("customer_name"),
            F.lit("x").alias("city"),
        ),
        0,
    )
    mh = dedup.MinHashCorpusIndex(str(tmp_path / "mh"))
    mh.build(docs)
    post = search.PostingsIndex(str(tmp_path / "post"))
    post.build(docs)
    ivf = similarity.IvfIndex(str(tmp_path / "ivf"), dim=16, n_planes=2)
    ivf.build(emb, "embedding")
    gram = corpus.GramCorpusIndex(str(tmp_path / "gram"))
    gram.build(docs)

    target_text = DOCS[0][1]
    probe = spark.createDataFrame([(99, target_text)], "doc_id long, text string")
    assert mh.probe_pairs(probe).count() > 0           # visible before
    assert any(
        r["doc_id"] == 1 for r in post.search(spark, ["fox"], k=5).collect()
    )
    assert 1 in {
        r["vec_id"] for r in ivf.probe(spark, [1.0] * 16, k=3).collect()
    }

    report = takedown.forget_documents(
        spark,
        [1],
        sink=sink,
        indexes={"minhash": mh, "postings": post, "ivf": ivf, "gram": gram},
    )
    assert report == {
        "sink": "deleted",
        "minhash": "deleted",
        "postings": "deleted",
        "ivf": "deleted",
        "gram": "unsupported",       # doc-id-free membership set
    }

    # logically gone EVERYWHERE, immediately
    assert "1" not in {r["order_id"] for r in sink.read(spark).collect()}
    assert mh.probe_pairs(probe).filter(F.col("corpus_id") == 1).count() == 0
    assert all(
        r["doc_id"] != 1 for r in post.search(spark, ["fox"], k=5).collect()
    )
    assert 1 not in {
        r["vec_id"] for r in ivf.probe(spark, [1.0] * 16, k=3).collect()
    }
    # other docs untouched
    assert {"2", "3"} <= {r["order_id"] for r in sink.read(spark).collect()}

    # physical pass drops the bytes and clears tombstones
    report2 = takedown.forget_documents(
        spark, [1], sink=sink,
        indexes={"minhash": mh, "ivf": ivf}, compact=True,
    )
    assert report2["minhash"] == "deleted+compacted"
    assert mh.stats(spark)["n_tombstones"] == 0
    assert ivf.stats(spark)["n_tombstones"] == 0
    assert ivf.stats(spark)["n_vectors"] == 2
