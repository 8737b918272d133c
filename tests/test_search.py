"""Unit tests for BM25 top-k retrieval (operators/search.py)."""

from __future__ import annotations

from streaming_data_pipeline_azure_spark.operators import search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_length(spark):
    """More query-term mass ranks higher; at equal tf, the shorter
    document wins (length normalization); docs with no query term are
    absent; n_matched counts distinct matched terms."""
    docs = _docs(
        spark,
        [
            (1, "hash join hash join spark"),                 # dense, short
            (2, "hash join spark " + "filler " * 20),          # same terms, long
            (3, "hash only mentioned once here in this text"),
            (4, "completely unrelated words about gardening"),
        ],
    )
    rows = search.bm25_topk(docs, ["hash", "join", "spark"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 4 not in ids
    assert ids[0] == 1                      # densest doc first
    assert ids.index(2) < ids.index(3)      # 3 matched terms beat 1
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["n_matched"] == 3 and by_id[3]["n_matched"] == 1
    assert by_id[1]["score"] > by_id[2]["score"] > by_id[3]["score"] > 0


def test_bm25_topk_plan_shape(spark):
    """The top-k must plan as TakeOrderedAndProject (heap, not full
    sort) and the df/stats sides must broadcast — no sort-merge join
    anywhere."""
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    docs = _docs(spark, [(i, "hash join spark words") for i in range(50)])
    plan = physical_plan(
        search.bm25_topk(docs, ["hash", "join", "spark"], k=5)
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
