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


# ---- PostingsIndex: the persisted inverted-index serving path ----


def _corpus_rows():
    return [
        (1, "hash join hash join spark"),
        (2, "hash join spark " + "filler " * 20),
        (3, "hash only mentioned once here in this text"),
        (4, "completely unrelated words about gardening"),
        (5, "spark spark spark shuffle"),
    ]


def _build_index(spark, tmp_path, rows=None):
    idx = search.PostingsIndex(str(tmp_path / "postings_idx"))
    idx.build(_docs(spark, rows or _corpus_rows()))
    return idx


def test_postings_search_matches_direct_scan(spark, tmp_path):
    """Index-served BM25 must equal the corpus-scan bm25_topk
    bit-for-bit (shared scoring tail; same tokenization; df/N/avgdl
    reconstructed exactly from postings + stats rows)."""
    docs = _docs(spark, _corpus_rows())
    idx = _build_index(spark, tmp_path)
    direct = search.bm25_topk(docs, ["hash", "join", "spark"], k=10).collect()
    served = idx.search(spark, ["hash", "join", "spark"], k=10).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]


def test_postings_append_matches_full_rebuild(spark, tmp_path):
    """build(A) + append(B) must serve the same results as build(A∪B)."""
    rows = _corpus_rows()
    idx = _build_index(spark, tmp_path, rows[:3])
    idx.append(_docs(spark, rows[3:]))
    full = search.bm25_topk(
        _docs(spark, rows), ["hash", "join", "spark"], k=10
    ).collect()
    served = idx.search(spark, ["hash", "join", "spark"], k=10).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in full]


def test_postings_partition_pruning(spark, tmp_path):
    """A search must read ONLY the query terms' bucket partitions: the
    postings scan carries a __bkt PartitionFilter (directory pruning)
    and the df/stats sides broadcast — no sort-merge join."""
    import re

    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    idx = _build_index(spark, tmp_path)
    plan = physical_plan(idx.search(spark, ["hash"], k=10))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__bkt" in m.group(1), plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_postings_delete_hides_then_compact_reexactifies(spark, tmp_path):
    """delete() hides a doc from search immediately (and df follows);
    compact() drops its postings physically, re-exactifies N/avgdl, and
    clears tombstones — after which results equal a fresh index built
    without the doc."""
    rows = _corpus_rows()
    idx = _build_index(spark, tmp_path)
    idx.delete(spark, [1])
    ids = [r["doc_id"] for r in idx.search(spark, ["hash", "join"], k=10).collect()]
    assert 1 not in ids and 2 in ids
    st = idx.stats(spark)
    assert st["n_tombstones"] == 1 and st["n_docs"] == 5  # stats stale pre-compact
    idx.compact(spark)
    st = idx.stats(spark)
    assert st["n_tombstones"] == 0 and st["n_docs"] == 4
    assert st["generation"] == 1
    fresh = search.PostingsIndex(str(tmp_path / "fresh_idx"))
    fresh.build(_docs(spark, [r for r in rows if r[0] != 1]))
    a = idx.search(spark, ["hash", "join", "spark"], k=10).collect()
    b = fresh.search(spark, ["hash", "join", "spark"], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_postings_params_mismatch_guard(spark, tmp_path):
    import pytest

    idx = _build_index(spark, tmp_path)
    other = search.PostingsIndex(idx.path, n_buckets=32)
    with pytest.raises(ValueError, match="params mismatch"):
        other.search(spark, ["hash"])
    reloaded = search.PostingsIndex.load(spark, idx.path)
    assert reloaded.n_buckets == idx.n_buckets
    assert [tuple(r) for r in reloaded.search(spark, ["hash"], k=3).collect()]


def test_postings_search_empty_query_guard(spark, tmp_path):
    """An empty term list must raise a clear ValueError, not IndexError
    deep in the bucket filter (ADVICE r5)."""
    import pytest

    idx = _build_index(spark, tmp_path)
    with pytest.raises(ValueError, match="query_terms is empty"):
        idx.search(spark, [])


def test_bm25_require_all_conjunctive_semantics(spark, tmp_path):
    """AND retrieval: only docs matching EVERY term survive; scores of
    the survivors are identical to OR retrieval (same aggregation, a
    HAVING filter after); corpus-scan and index paths agree
    bit-for-bit under require_all too."""
    docs = _docs(spark, _corpus_rows())
    both = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in search.bm25_topk(
            docs, ["hash", "spark"], k=10, require_all=True
        ).collect()
    }
    assert both, "conjunctive result should be non-empty on this corpus"
    assert all(n == 2 for n, _ in both.values())
    either = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in search.bm25_topk(
            docs, ["hash", "spark"], k=10
        ).collect()
    }
    assert set(both) < set(either)                   # strict subset here
    for d, v in both.items():
        assert either[d] == v, d                     # same scores

    idx = _build_index(spark, tmp_path)
    served = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in idx.search(
            spark, ["hash", "spark"], k=10, require_all=True
        ).collect()
    }
    assert served == both


def test_phrase_topk_counts_consecutive_occurrences(spark):
    """Phrase retrieval counts OVERLAPPING consecutive occurrences;
    docs with the terms in the wrong order or separated do not match;
    empty phrase raises; top-k orders by tf then id."""
    import pytest

    docs = _docs(
        spark,
        [
            (1, "hash join hash join spark"),        # 2x "hash join"
            (2, "join hash somewhere else"),          # wrong order
            (3, "hash word join"),                    # separated
            (4, "a a a"),                             # overlapping probe
            (5, "hash join"),                         # 1x
        ],
    )
    got = [
        (r["doc_id"], r["phrase_tf"])
        for r in search.phrase_topk(docs, ["hash", "join"], k=10).collect()
    ]
    assert got == [(1, 2), (5, 1)]
    overlap = search.phrase_topk(docs, ["a", "a"], k=10).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in overlap] == [(4, 2)]
    with pytest.raises(ValueError, match="empty"):
        search.phrase_topk(docs, [])


def test_prf_expansion_characterizes_feedback_docs(spark):
    """Planted corpus: the query matches docs rich in 'spark'; their
    companion term 'shuffle' must top the expansion while query terms
    themselves and short tokens are excluded, and terms only in
    NON-matching docs never appear."""
    from streaming_data_pipeline_azure_spark.operators.search import (
        prf_expansion_terms,
    )

    match = [
        (i, "spark shuffle tuning with spark shuffle partitions ok")
        for i in range(6)
    ]
    noise = [
        (100 + i, "gardening tulips watering schedule advice blooms")
        for i in range(6)
    ]
    docs = spark.createDataFrame(match + noise, "doc_id long, text string")
    got = [
        (r["term"], r["df"])
        for r in prf_expansion_terms(
            docs, ["spark"], k_docs=6, k_terms=3
        ).collect()
    ]
    terms = [t for t, _ in got]
    # all companion words tie at df=6 -> alphabetical tie-break
    assert terms == ["partitions", "shuffle", "tuning"]
    assert all(df == 6 for _, df in got)
    assert "spark" not in terms          # query term excluded
    assert "ok" not in terms             # min_term_len
    assert not set(terms) & {"gardening", "tulips"}  # non-feedback docs


def test_eval_rankings_metrics(spark):
    """Recall@k, first relevant rank, and reciprocal rank per query,
    including no-hit and unjudged-query edges."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.search import (
        eval_rankings,
    )

    runs = spark.createDataFrame(
        # q1: rel docs at ranks 2 and 4; q2: no rel in top-k;
        # q3 judged but never retrieved
        [("q1", d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        + [("q2", d, r) for r, d in enumerate([20, 21, 22], 1)],
        "query_id string, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", 11), ("q1", 13), ("q1", 99), ("q2", 77), ("q3", 30)],
        "query_id string, doc_id long",
    )
    got = {
        r["query_id"]: r
        for r in eval_rankings(runs, qrels, k=5).collect()
    }
    assert got["q1"]["n_rel"] == 3
    assert got["q1"]["n_rel_ret"] == 2
    assert got["q1"]["first_rel_rank"] == 2
    assert got["q1"]["rr_at_k"] == 0.5
    assert abs(got["q1"]["recall_at_k"] - 2 / 3) < 1e-15
    assert got["q2"]["n_rel_ret"] == 0
    assert got["q2"]["rr_at_k"] == 0.0
    assert got["q2"]["first_rel_rank"] is None
    assert got["q3"]["n_ret"] == 0
    assert got["q3"]["recall_at_k"] == 0.0

    with _pytest.raises(ValueError, match="duplicate"):
        eval_rankings(
            runs,
            qrels.unionByName(
                spark.createDataFrame(
                    [("q1", 11)], "query_id string, doc_id long"
                )
            ),
            k=5,
        )


def test_lm_dirichlet_ranks_matching_docs_and_smooths(spark):
    """A doc rich in the query terms outranks a sparse one; a doc with
    zero matches is absent; unmatched terms still contribute their
    background factor (score differs from the matched-only product)."""
    df = spark.createDataFrame(
        [
            (1, "spark join hash spark spark"),
            (2, "spark only once here with padding words galore"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    rows = search.lm_dirichlet_topk(
        df, ["spark", "join", "hash"], mu=10.0, k=10
    ).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 1 and 3 not in ids
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["n_matched"] == 3
    assert by_id[2]["n_matched"] == 1
    assert 0.0 < by_id[2]["score"] < by_id[1]["score"]
    import pytest

    with pytest.raises(ValueError):
        search.lm_dirichlet_topk(df, [])


def test_rank_agreement_known_tau(spark):
    """Identical lists -> tau 1; reversed -> -1; disjoint -> NULL with
    n_common 0."""
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    rev = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "doc_id long, score double"
    )
    (row,) = search.rank_agreement(a, a).collect()
    assert row["tau"] == 1.0 and row["n_common"] == 3
    (row,) = search.rank_agreement(a, rev).collect()
    assert row["tau"] == -1.0 and row["n_discordant"] == 3
    other = spark.createDataFrame(
        [(9, 1.0)], "doc_id long, score double"
    )
    (row,) = search.rank_agreement(a, other).collect()
    assert row["n_common"] == 0 and row["tau"] is None
    assert row["n_concordant"] == 0 and row["n_discordant"] == 0


def test_term_proximity_counts_pairs_within_window(spark):
    """Pair counting within the slop window: adjacent and near pairs
    count, far ones don't; ranking by pair count with id tie-break."""
    df = spark.createDataFrame(
        [
            (1, "spark join spark databases join"),  # pairs within 2:
            #    positions spark:[0,2] join:[1,4]; |0-1|,|2-1|,|2-4|<=2
            (2, "spark x x x x x x join"),           # distance 7: none
            (3, "spark join"),                       # one pair
        ],
        "doc_id long, text string",
    )
    rows = search.term_proximity_topk(
        df, "spark", "join", window=2, k=10
    ).collect()
    got = {r["doc_id"]: r["n_pairs"] for r in rows}
    assert got == {1: 3, 3: 1}
    assert rows[0]["doc_id"] == 1
    import pytest

    with pytest.raises(ValueError):
        search.term_proximity_topk(df, "spark", "spark", window=2)
    with pytest.raises(ValueError):
        search.term_proximity_topk(df, "a", "b", window=0)


def test_best_snippets_picks_densest_earliest_window(spark):
    """The window with the most DISTINCT terms wins; ties go to the
    earliest anchor; anchors sit on hits; snippet slices the real
    tokens."""
    df = spark.createDataFrame(
        [
            # terms at 0 ('spark') and far 'join spark hash' cluster
            (1, "spark x x x x x x x x x join spark hash y y"),
            (2, "x x join x x"),
            (3, "none here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in search.best_snippets(
        df, ["spark", "join", "hash"], window=4
    ).collect()}
    # doc 1: window [10,14) covers join spark hash -> 3 distinct
    assert out[1]["start_pos"] == 10
    assert out[1]["n_query_terms"] == 3
    assert out[1]["snippet"] == "join spark hash y"
    assert out[2]["start_pos"] == 2
    assert out[2]["snippet"] == "join x x"  # clamped at doc end
    assert 3 not in out
    import pytest

    with pytest.raises(ValueError):
        search.best_snippets(df, [], window=4)
    with pytest.raises(ValueError):
        search.best_snippets(df, ["a"], window=0)


def test_ndcg_eval_hand_computed(spark):
    """DCG/IDCG against hand-computed values with the literal discount
    table; unretrieved-but-judged docs only raise IDCG; a query with
    no hits scores 0; non-positive grades rejected."""
    import math

    runs = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3),
         ("q2", 5, 1)],
        "query_id string, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 3), ("q1", 3, 1), ("q1", 9, 2),
         ("q3", 7, 2)],
        "query_id string, doc_id long, rel long",
    )
    out = {r["query_id"]: r for r in
           search.ndcg_eval(runs, qrels, k=10).collect()}
    dcg = 3 * 1.0 + 1 * (1.0 / math.log2(4))
    idcg = 3 * 1.0 + 2 * (1.0 / math.log2(3)) + 1 * (1.0 / math.log2(4))
    assert abs(out["q1"]["dcg"] - dcg) < 1e-12
    assert abs(out["q1"]["idcg"] - idcg) < 1e-12
    assert abs(out["q1"]["ndcg"] - dcg / idcg) < 1e-12
    assert out["q3"]["dcg"] == 0.0 and out["q3"]["ndcg"] == 0.0
    assert "q2" not in out  # runs without judgments produce no row
    bad = spark.createDataFrame(
        [("q1", 1, 0)], "query_id string, doc_id long, rel long"
    )
    import pytest

    with pytest.raises(ValueError):
        search.ndcg_eval(runs, bad, k=10)


def test_spell_suggest_blocking_complete_and_ranked(spark):
    from streaming_data_pipeline_azure_spark.operators.search import (
        spell_suggest,
    )

    docs = spark.createDataFrame(
        [
            (1, "stream stream stream streams table"),
            (2, "stream table tables tablet"),
        ],
        ["doc_id", "text"],
    )
    out = spell_suggest(docs, ["streem", "table", "zzz"], k=2).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r["term"], []).append(
            (r["rank"], r["suggestion"], r["n_occurrences"])
        )
    # substitution candidate found via shared deletion variant
    assert (1, "stream", 4) in by_term["streem"]
    # exact term self-suggests at rank 1 (freq beats neighbors)
    assert sorted(by_term["table"])[0] == (1, "table", 2)
    # distance-2+ garbage yields nothing
    assert "zzz" not in by_term


def test_team_draft_interleave_hand_traced(spark):
    from streaming_data_pipeline_azure_spark.operators.search import (
        team_draft_interleave,
    )

    # A = [1,2,3], B = [2,4,5]; knuth coin is even (team A) at rounds
    # 0, 2 and 4 -> picks: A:1, B:2 (ta>tb), A:3 (tie, coin A),
    # B:4, then A exhausted -> B:5
    a = spark.createDataFrame([(1, 3.0), (2, 2.0), (3, 1.0)], ["doc_id", "score"])
    b = spark.createDataFrame([(2, 9.0), (4, 8.0), (5, 7.0)], ["doc_id", "score"])
    got = [tuple(r) for r in team_draft_interleave(a, b, k=3).collect()]
    assert got == [
        (1, 1, "A"), (2, 2, "B"), (3, 3, "A"), (4, 4, "B"), (5, 5, "B"),
    ]


def test_team_draft_interleave_balance_and_dedup(spark):
    from streaming_data_pipeline_azure_spark.operators.search import (
        team_draft_interleave,
    )

    # disjoint 10-vs-10: every doc appears once, teams stay balanced
    # (|A picks - B picks| <= 1 at every prefix while both live)
    a = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], ["doc_id", "score"]
    )
    b = spark.createDataFrame(
        [(100 + i, float(100 - i)) for i in range(10)], ["doc_id", "score"]
    )
    rows = team_draft_interleave(a, b, k=10).collect()
    assert len(rows) == 20
    assert len({r["doc_id"] for r in rows}) == 20
    ta = tb = 0
    for r in sorted(rows, key=lambda r: r["rank"]):
        ta += r["team"] == "A"
        tb += r["team"] == "B"
        assert abs(ta - tb) <= 1


def test_bm25_hard_negatives_partial_matches_only(spark):
    from streaming_data_pipeline_azure_spark.operators.search import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark join hash spark join hash"),   # full match
            (2, "spark spark spark spark spark"),     # partial, high tf
            (3, "join elsewhere entirely"),           # partial
            (4, "nothing relevant here"),             # no match
        ],
        ["doc_id", "text"],
    )
    terms = ["hash", "join", "spark"]
    hard = bm25_topk(docs, terms, k=10, hard_negatives=True).collect()
    ids = {r["doc_id"] for r in hard}
    assert ids == {2, 3}  # full match and no-match both excluded
    assert all(r["n_matched"] < 3 for r in hard)
    # the pre-heap gate surfaces partials even though doc 1 outscores:
    full = bm25_topk(docs, terms, k=1).collect()[0]["doc_id"]
    assert full == 1


def test_rank_biased_overlap_bounds_and_identity(spark):
    from streaming_data_pipeline_azure_spark.operators.search import (
        rank_biased_overlap,
    )

    a = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], ["doc_id", "score"]
    )
    # identical rankings -> per-depth overlap = d, RBO = (1-p)*sum(p^(d-1))
    (r,) = rank_biased_overlap(a, a, k=10).collect()
    assert r["overlap_at_k"] == 10
    expected = (1.0 - 0.9) * sum(0.9 ** (d - 1) for d in range(1, 11))
    assert abs(r["rbo"] - expected) < 1e-12
    # fully disjoint rankings -> 0
    b = spark.createDataFrame(
        [(100 + i, float(100 - i)) for i in range(10)], ["doc_id", "score"]
    )
    (r2,) = rank_biased_overlap(a, b, k=10).collect()
    assert r2["overlap_at_k"] == 0 and r2["rbo"] == 0.0
