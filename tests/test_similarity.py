"""Unit tests for similarity search (X3)."""

from __future__ import annotations

import math

import pytest

from streaming_data_pipeline_azure_spark.operators import similarity as sim

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.0, 1.0]),
    (4, [0.7, 0.7, 0.0]),
    (5, [-1.0, 0.0, 0.0]),
]


def _df(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_bruteforce_topk_order(spark):
    rows = sim.topk_bruteforce(_df(spark), "embedding", [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in rows] == [0, 1, 4]
    assert rows[0]["score"] == pytest.approx(1.0)
    assert rows[1]["score"] == pytest.approx(0.9 / math.sqrt(0.82))


def test_bruteforce_score_range(spark):
    rows = sim.topk_bruteforce(_df(spark), "embedding", [1.0, 0.0, 0.0], k=6).collect()
    assert len(rows) == 6
    assert rows[-1]["vec_id"] == 5
    assert rows[-1]["score"] == pytest.approx(-1.0)


def test_ivf_index_probe_matches_bruteforce(spark, tmp_path, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter("vec_id = 0").collect()[0]["embedding"]
    query = [float(x) for x in query]
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=64, n_planes=4)
    idx.build(emb, "embedding")
    exact = [r["vec_id"] for r in sim.topk_bruteforce(emb, "embedding", query, k=5).collect()]
    approx = [r["vec_id"] for r in idx.probe(spark, query, k=5, n_probe=4).collect()]
    # the query's own vector must be found, and recall should be decent
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_recall_at_k(spark, tmp_path, sf_dir):
    """Recall@10 over several probe queries: IVF with n_probe=4 of ~16
    centroids must recover most of the exact top-10."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=64, n_planes=4)
    idx.build(emb, "embedding")
    recalls = []
    for qid in [0, 5, 11]:
        q = [float(x) for x in emb.filter(f"vec_id = {qid}").collect()[0]["embedding"]]
        exact = {r["vec_id"] for r in sim.topk_bruteforce(emb, "embedding", q, k=10).collect()}
        approx = {r["vec_id"] for r in idx.probe(spark, q, k=10, n_probe=4).collect()}
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.5  # random-vector corpus; probes 1/4 of partitions


def test_allpairs_cosine_exact(spark):
    vecs = [
        (0, [1.0, 0.0]), (1, [0.99, 0.14]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sim.allpairs_cosine_pairs(df, threshold=0.9).collect()
    }
    assert pairs == {(0, 1)}
