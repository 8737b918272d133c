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
