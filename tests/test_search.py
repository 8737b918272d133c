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


def test_rrf_fuse_semantics(spark):
    """RRF: a doc present in both lists outranks single-list docs with
    similar ranks; missing-list contribution is 0; n_lists counts the
    lists a doc appears in; score is exactly 1/(60+ra) + 1/(60+rb)."""
    a = _docs_scores(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
    b = _docs_scores(spark, [(2, 0.9), (4, 0.8)])
    rows = search.rrf_fuse(a, b, "doc_id", topk=10).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert [r["doc_id"] for r in rows][0] == 2    # both-lists doc wins
    assert by_id[2]["n_lists"] == 2
    assert abs(by_id[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-15
    assert by_id[1]["n_lists"] == 1
    assert abs(by_id[1]["rrf_score"] - 1 / 61) < 1e-15
    assert by_id[4]["rrf_score"] == 1 / 62
    assert set(by_id) == {1, 2, 3, 4}


def _docs_scores(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")
