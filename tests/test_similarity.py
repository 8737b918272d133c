"""Unit tests for similarity search (X3)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

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


def test_ivf_kmeans_recall_planted(spark, tmp_path):
    """k-means-refined centroids (Lloyd's on sign-LSH init) must recover
    >=0.8 of the exact top-10 at n_probe=4 on planted-cluster data: 20
    tight gaussian clusters of 100 points; each query sits at a cluster
    center so its true neighbors share one centroid cell."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(scale=0.05, size=(100, 32))
        for pi, p in enumerate(pts):
            rows.append((ci * 100 + pi, [float(x) for x in p]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=32, n_planes=5,
                       kmeans_iters=4)
    idx.build(df, "embedding")
    recalls = []
    for ci in [0, 7, 13]:
        q = [float(x) for x in centers[ci]]
        exact = {r["vec_id"] for r in
                 sim.topk_bruteforce(df, "embedding", q, k=10).collect()}
        approx = {r["vec_id"] for r in
                  idx.probe(spark, q, k=10, n_probe=4).collect()}
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.8


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


def test_allpairs_blocked_matches_single_block(spark, sf_dir):
    """Forcing many blocks (block_size=64 → ~8 blocks at sf0.001) must
    give the identical pair set as the trivial single-block run:
    exercises the diagonal-triangle and off-diagonal-cross kernels and
    the exactly-once guarantee of the block-pair explosion."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    single = {
        (r["id_a"], r["id_b"])
        for r in sim.allpairs_cosine_pairs(
            emb, threshold=0.4, block_size=1 << 30
        ).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in sim.allpairs_cosine_pairs(
            emb, threshold=0.4, block_size=64
        ).collect()
    }
    assert blocked == single
    assert len(single) > 0  # non-vacuous at this threshold


def test_allpairs_no_driver_collect(spark, monkeypatch):
    """Scale regression guard: building the all-pairs plan must never
    collect the input to the driver (VERDICT r1 'What's wrong' #2), and
    the physical plan must be the grouped-map (FlatMapGroupsInPandas)
    formulation."""
    from pyspark.sql import DataFrame

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(32)], ["vec_id", "embedding"]
    )

    def boom(self, *a, **k):  # pragma: no cover - should never fire
        raise AssertionError("driver-side collect in allpairs plan")

    monkeypatch.setattr(DataFrame, "collect", boom)
    plan_df = sim.allpairs_cosine_pairs(df, threshold=0.5, block_size=8)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_assign_fixed_centroids_planted_and_ties(spark):
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [1.0, 1.0]), (13, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in sim.assign_fixed_centroids(df, "embedding", cents).collect()
    }
    assert out[10]["cluster_id"] == 0
    assert out[11]["cluster_id"] == 1
    # exact cosine tie (1/sqrt(2) to both) -> smallest centroid id wins
    assert out[12]["cluster_id"] == 0
    # zero vector: cosine 0.0 to both -> deterministic cid 0
    assert out[13]["cluster_id"] == 0 and out[13]["score"] == 0.0
    # no shuffle in the plan: assignment is a pure projection
    plan = (
        sim.assign_fixed_centroids(df, "embedding", cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_assign_centroids_kernel_parity(spark, sf_dir):
    """The kernel strategy of assign_fixed_centroids (engaged above
    MAX_LITERAL_CENTROIDS — VERDICT r10 #2) must be BIT-identical to
    the literal-expression path the SQL oracle replays: same
    left-to-right IEEE fold per dimension, same dot/(na*nb) divide,
    same smallest-cid tie-break. Checked on real sf0.001 embeddings
    plus hand-built edge rows (exact tie via duplicated centroid,
    zero vector, zero-norm centroid)."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(40)
    )
    dim = len(emb.first()["embedding"])
    cent_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]
    # duplicated centroid vector under a larger cid -> every row scoring
    # it ties, and the smaller cid must win on BOTH paths
    cents = cent_rows + [(10_000, list(cent_rows[0][1])), (10_001, [0.0] * dim)]
    edge = spark.createDataFrame(
        [(990_000, [0.0] * dim), (990_001, cent_rows[0][1])],
        "vec_id long, embedding array<double>",
    )
    df = emb.unionByName(edge)
    lit_rows = {
        r["vec_id"]: r
        for r in sim.assign_fixed_centroids(df, "embedding", cents).collect()
    }
    ker_rows = {
        r["vec_id"]: r
        for r in sim.assign_fixed_centroids(
            df, "embedding", cents, max_literal_centroids=0
        ).collect()
    }
    assert set(lit_rows) == set(ker_rows)
    for vid, lr in lit_rows.items():
        kr = ker_rows[vid]
        assert kr["cluster_id"] == lr["cluster_id"], vid
        # bit parity: exact double equality, not approx
        assert kr["score"] == lr["score"], (vid, kr["score"], lr["score"])
    # ties resolved to the duplicate's SMALLER cid on both paths
    assert lit_rows[990_001]["cluster_id"] == cent_rows[0][0]
    assert ker_rows[990_001]["cluster_id"] == cent_rows[0][0]


def test_assign_centroids_guards_strategy_independent(spark):
    """r12 (ADVICE r11): clash/duplicate-cid validation must not
    depend on which physical strategy the centroid count selects —
    the same call site must behave identically at |C| <= threshold
    (literal) and above it (kernel)."""
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 5)], "vec_id long, embedding array<double>, score int"
    )
    dup = [(0, [1.0, 0.0]), (0, [0.0, 1.0])]
    df2 = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for mlc in (0, 16):  # kernel strategy, literal strategy
        with pytest.raises(ValueError, match="score"):
            sim.assign_fixed_centroids(
                df, "embedding", cents, max_literal_centroids=mlc
            )
        with pytest.raises(ValueError, match="duplicate"):
            sim.assign_fixed_centroids(
                df2, "embedding", dup, max_literal_centroids=mlc
            )


def test_assign_centroids_kernel_nonfinite_parity(spark):
    """r12 (ADVICE r11): vectors with non-finite components must pick
    the SAME cluster on both strategies. The literal path's array_min
    over struct(-score, cid) orders NaN as the largest double, so a
    NaN-scored centroid never wins while any finite score exists; the
    kernel masks NaN scores to -inf before argmax to match. All-NaN
    rows fall to the smallest cid on both paths."""
    import math

    nan, inf = float("nan"), float("inf")
    # cid 5 is ZERO-NORM (score exactly 0.0 for finite vectors on both
    # engines); cid 9 is POISONED (inf component -> NaN score against
    # every finite vector). A finite vector therefore sees MIXED
    # finite/NaN scores — the case where a raw np.argmax returns the
    # NaN index (cid 9) while the literal struct-min skips it.
    cents = [(3, [1.0, 0.0]), (5, [0.0, 0.0]), (9, [inf, 0.0])]
    df = spark.createDataFrame(
        [
            (1, [inf, 1.0]),   # non-finite vec: all scores NaN
            (2, [nan, nan]),   # all-NaN vec
            (3, [1.0, nan]),   # NaN component poisons every dot
            (4, [0.5, 0.5]),   # finite: (0.707.., 0.0, NaN) -> cid 3
            (5, [0.0, 0.0]),   # zero vec: (0.0, 0.0, NaN) -> cid 3 tie
        ],
        "vec_id long, embedding array<double>",
    )
    lit = {
        r["vec_id"]: r
        for r in sim.assign_fixed_centroids(df, "embedding", cents).collect()
    }
    ker = {
        r["vec_id"]: r
        for r in sim.assign_fixed_centroids(
            df, "embedding", cents, max_literal_centroids=0
        ).collect()
    }
    for vid in lit:
        assert ker[vid]["cluster_id"] == lit[vid]["cluster_id"], (
            vid, lit[vid], ker[vid],
        )
        ls, ks = lit[vid]["score"], ker[vid]["score"]
        assert (ls == ks) or (math.isnan(ls) and math.isnan(ks)), (
            vid, ls, ks,
        )
    # finite vector must SKIP the poisoned centroid on both paths
    assert lit[4]["cluster_id"] == 3 and ker[4]["cluster_id"] == 3
    # all-NaN rows fall to the smallest cid with a NaN score
    assert lit[2]["cluster_id"] == 3 and math.isnan(lit[2]["score"])


def test_argmax_nan_last_inf_tie():
    """r13 (ADVICE r12): a genuine -inf score must BEAT a NaN-masked
    centroid with a smaller column index — the literal struct-min
    orders NaN above +inf(-score), so NaN loses to every non-NaN score
    including -inf. Unreachable through real vectors (Cauchy-Schwarz
    keeps |dot| <= denom, so a -inf dot forces an inf denom -> NaN),
    hence pinned at the selection-helper level."""
    import numpy as np

    score = np.array(
        [
            [np.nan, -np.inf, 1.0],     # finite max wins
            [np.nan, -np.inf, -np.inf], # -inf ties: first NON-NaN wins
            [-np.inf, np.nan, -np.inf], # NaN in the middle skipped
            [np.nan, np.nan, np.nan],   # all-NaN: falls to column 0
            [0.5, np.nan, 0.9],         # plain finite argmax
        ]
    )
    assert sim._argmax_nan_last(score).tolist() == [2, 1, 0, 0, 2]


def test_groupwise_centroids_exact(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [5.0, 6.0])],
        "g string, v array<double>",
    )
    out = {
        (r["g"], r["dim"]): r["centroid_val"]
        for r in sim.groupwise_centroids(df, "g", "v").collect()
    }
    assert out == {
        ("a", 1): 2.0, ("a", 2): 3.0, ("b", 1): 5.0, ("b", 2): 6.0,
    }


def test_quantize_int8_stats_bounds(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, v array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in sim.quantize_int8_stats(df, "vec_id", "v").collect()
    }
    r1 = out[1]
    # amax maps exactly to +/-127; error bounded by half a quantum
    assert r1["q_absmax"] == 127
    assert r1["qscale"] == 1.0 / 127.0
    assert r1["recon_max_err"] <= r1["qscale"] / 2 + 1e-15
    # all-zero vector: guarded scale, zero everything
    r2 = out[2]
    assert r2["qscale"] == 0.0
    assert r2["q_absmax"] == 0
    assert r2["recon_max_err"] == 0.0


def test_ivf_batched_probe_matches_single_and_exact(spark, tmp_path, sf_dir):
    """probe_batch (VERDICT r2 #7): the batched probe must (1) agree
    exactly with per-query probe() at the same n_probe — same pruned
    partitions, same scoring — and (2) keep decent recall vs the exact
    batched answer (multiquery_topk)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=64, n_planes=4)
    idx.build(emb, "embedding")
    qids = [0, 5, 11]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batched = idx.probe_batch(spark, queries, k=10, n_probe=4)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    assert set(got) == set(qids)
    recalls = []
    for qid in qids:
        q = [float(x) for x in
             emb.filter(f"vec_id = {qid}").collect()[0]["embedding"]]
        single = [(r["vec_id"], r["score"])
                  for r in idx.probe(spark, q, k=10, n_probe=4).collect()]
        b = sorted(got[qid], key=lambda t: (-t[1], t[0]))
        assert [v for v, _ in b] == [v for v, _ in single]
        for (_, sa), (_, sb) in zip(b, single):
            assert abs(sa - sb) < 1e-9
        exact = {r["vec_id"] for r in
                 sim.topk_bruteforce(emb, "embedding", q, k=10).collect()}
        recalls.append(len(exact & {v for v, _ in b}) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_index_tombstone_delete(spark, tmp_path):
    """VERDICT r4 #5 takedown on the embedding index: delete() hides the
    vector from every probe path immediately, compact() drops it from
    the parquet files and clears the tombstones, and append afterwards
    still works."""
    def vec(axis, nudge=0.0):
        v = [0.0] * 8
        v[axis] = 10.0
        v[(axis + 1) % 8] += nudge
        return v

    corpus = spark.createDataFrame(
        [(i, vec(i % 4)) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    idx = sim.IvfIndex(path, dim=8, n_planes=3, seed=5)
    idx.build(corpus, "embedding")

    q = vec(0)
    before = {r["vec_id"] for r in idx.probe(spark, q, k=16, n_probe=8).collect()}
    assert {0, 4, 8, 12} <= before  # the axis-0 cluster serves

    # delete the whole axis-0 cluster
    idx.delete(spark, [0, 4, 8, 12])
    after = {r["vec_id"] for r in idx.probe(spark, q, k=16, n_probe=8).collect()}
    assert after.isdisjoint({0, 4, 8, 12})
    # probe_pairs / filter_novel: a near-dup of a deleted vector is novel
    batch = spark.createDataFrame(
        [(100, vec(0, 0.1))], "vec_id long, embedding array<double>"
    )
    assert idx.probe_pairs(batch, threshold=0.95, n_probe=8).count() == 0
    assert idx.filter_novel(batch, threshold=0.95, n_probe=8).count() == 1
    # batched probe path hides them too
    queries = spark.createDataFrame(
        [(7, q)], "query_id long, embedding array<double>"
    )
    got = {r["vec_id"] for r in
           idx.probe_batch(spark, queries, k=16, n_probe=8).collect()}
    assert got.isdisjoint({0, 4, 8, 12})
    st = idx.stats(spark)
    assert st["n_tombstones"] == 4 and st["n_vectors"] == 16

    idx.compact(spark)
    st2 = idx.stats(spark)
    assert st2["n_tombstones"] == 0 and st2["n_vectors"] == 12
    on_disk = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/vectors/gen={st2['generation']}")
        .select("vec_id").collect()
    }
    assert on_disk.isdisjoint({0, 4, 8, 12})  # gone from the files
    # still appendable and probeable after the swap
    idx.append(batch)
    assert idx.probe_pairs(
        spark.createDataFrame(
            [(101, vec(0, 0.1))], "vec_id long, embedding array<double>"
        ),
        threshold=0.95, n_probe=8,
    ).count() == 1


def test_contract_collects_enforce_caps(spark, tmp_path):
    """VERDICT r4 #2: the two 'small by contract' driver collects are now
    runtime guarantees — an over-cap batch/query set raises a clear
    contract error naming the distributed alternative instead of OOMing
    the driver, and the collect itself is LIMIT-bounded so even the
    failing call never transfers more than cap+1 rows."""
    import pytest

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(100 + i, [float(i), 2.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    # under the cap: normal result
    ok = sim.batch_corpus_cosine_pairs(
        corpus, batch, threshold=0.99, max_batch_rows=6
    )
    assert ok.count() >= 0
    with pytest.raises(ValueError, match="small-by-contract.*allpairs"):
        sim.batch_corpus_cosine_pairs(
            corpus, batch, threshold=0.99, max_batch_rows=5
        ).count()

    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=2, n_planes=2)
    idx.build(corpus, "embedding")
    queries = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(4)],
        "query_id long, embedding array<double>",
    )
    assert idx.probe_batch(
        spark, queries, k=2, n_probe=1, max_query_rows=4
    ).count() > 0
    with pytest.raises(ValueError, match="small-by-contract.*Chunk"):
        idx.probe_batch(spark, queries, k=2, n_probe=1, max_query_rows=3)


def test_ivf_batched_probe_prunes_partitions(spark, tmp_path, sf_dir):
    """The batched probe's vector scan must carry a centroid_id partition
    filter (union of probed partitions) and join the broadcast probe
    plan — never a full-index scan or sort-merge join."""
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=64, n_planes=4)
    idx.build(emb, "embedding")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = physical_plan(idx.probe_batch(spark, queries, k=5, n_probe=2))
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def _clustered_corpus(n_clusters=4, per_cluster=40, dim=16, seed=7):
    """Well-separated clusters: axis-anchored centers + small noise, so
    near-dup structure is controlled (within-cluster cosines are high but
    below 0.99; planted copies exceed 0.999)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c] = 10.0
        pts = center + rng.normal(0, 1.0, size=(per_cluster, dim))
        for i, p in enumerate(pts):
            rows.append((c * 1000 + i, [float(x) for x in p]))
    return rows


def test_ivf_probe_pairs_incremental_dedup(spark, tmp_path):
    """VERDICT r3 #2 — embedding crawl-delta dedup against the persisted
    IVF index: planted near-identical re-crawls of indexed vectors must
    be caught by probe_pairs and dropped by filter_novel; genuinely new
    directions survive; append folds survivors so a re-sent batch is
    then fully dropped."""
    import numpy as np

    rows = _clustered_corpus()
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=16, n_planes=4, seed=11)
    idx.build(corpus, "embedding")

    rng = np.random.default_rng(99)
    planted = []  # near-identical re-crawls: tiny perturbation, new ids
    for vid, vec in rows[::25]:
        v = np.array(vec) + rng.normal(0, 0.01, size=len(vec))
        planted.append((100000 + vid, [float(x) for x in v], vid))
    novel = []  # fresh directions far from every cluster axis
    for j in range(5):
        v = np.zeros(16)
        v[8 + (j % 8)] = 10.0  # axes 8..12 unused by the corpus clusters
        v = v + rng.normal(0, 1.0, size=16)
        novel.append((200000 + j, [float(x) for x in v], -1))
    batch = spark.createDataFrame(
        [(i, v) for i, v, _ in planted + novel],
        "vec_id long, embedding array<double>",
    )

    pairs = idx.probe_pairs(batch, threshold=0.95, n_probe=2).collect()
    hit = {(r["batch_id"], r["corpus_id"]) for r in pairs}
    for bid, _, src in planted:
        assert (bid, src) in hit, f"planted re-crawl {bid} missed"
    assert all(b < 200000 for b, _ in hit), "novel vector falsely matched"
    for r in pairs:
        assert r["cosine_sim"] >= 0.95

    survivors = idx.filter_novel(batch, threshold=0.95, n_probe=2)
    got = {r["vec_id"] for r in survivors.collect()}
    assert got == {200000 + j for j in range(5)}

    # fold the survivors in; the re-sent batch is now fully non-novel
    idx.append(survivors)
    assert idx.filter_novel(batch, threshold=0.95, n_probe=2).count() == 0


def test_ivf_load_and_params_guard(spark, tmp_path):
    """load() restores the pinned build parameters; a directly-constructed
    instance with different parameters refuses to probe_pairs/append."""
    corpus = spark.createDataFrame(
        _clustered_corpus(), "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf")
    idx = sim.IvfIndex(path, dim=16, n_planes=4, seed=11)
    idx.build(corpus, "embedding")

    reopened = sim.IvfIndex.load(spark, path)
    assert (reopened.dim, reopened.n_planes, reopened.seed) == (16, 4, 11)
    batch = corpus.limit(3)
    assert reopened.probe_pairs(batch, threshold=0.99).count() >= 3  # self-hits

    wrong = sim.IvfIndex(path, dim=16, n_planes=5, seed=11)
    with pytest.raises(ValueError, match="parameter mismatch"):
        wrong.probe_pairs(batch)
    with pytest.raises(ValueError, match="parameter mismatch"):
        wrong.append(batch)


def test_ivf_compact_and_stats(spark, tmp_path):
    """IVF maintenance (symmetry with MinHashCorpusIndex.compact):
    appends accumulate small files per centroid partition; compact()
    merges them under generation G+1 with the crash-safe marker swap,
    GC's the old generation, and leaves probe results untouched."""
    import os

    path = str(tmp_path / "ivf")
    rows = _clustered_corpus()
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = sim.IvfIndex(path, dim=16, n_planes=4, seed=11)
    idx.build(corpus, "embedding")
    for j in range(2):  # two fold-ins -> small files in partition dirs
        delta = spark.createDataFrame(
            [(300000 + 100 * j + i, v) for i, (vid, v) in enumerate(rows[j::7])],
            "vec_id long, embedding array<double>",
        )
        idx.append(delta)

    before = idx.stats(spark)
    assert before["generation"] == 0
    assert before["n_vectors"] == 160 + len(rows[0::7]) + len(rows[1::7])

    probe = spark.createDataFrame(rows[:5], "vec_id long, embedding array<double>")
    pairs_before = {
        (r["batch_id"], r["corpus_id"])
        for r in idx.probe_pairs(probe, threshold=0.99, n_probe=2).collect()
    }
    assert pairs_before  # self-hits at minimum

    idx.compact(spark)
    after = idx.stats(spark)
    assert after["generation"] == 1
    assert not os.path.isdir(f"{path}/vectors/gen=0")
    assert (after["n_vectors"], after["n_centroids"]) == (
        before["n_vectors"], before["n_centroids"]
    )
    assert after["n_files"] == after["n_centroids"]  # one file per partition
    assert after["n_files"] < before["n_files"]
    pairs_after = {
        (r["batch_id"], r["corpus_id"])
        for r in idx.probe_pairs(probe, threshold=0.99, n_probe=2).collect()
    }
    assert pairs_after == pairs_before

    # rebuild over a compacted index must land cleanly back at gen=0
    idx2 = sim.IvfIndex(path, dim=16, n_planes=4, seed=11)
    idx2.build(corpus, "embedding")
    assert idx2.stats(spark)["generation"] == 0
    assert idx2.stats(spark)["n_vectors"] == 160


def test_ivf_filter_novel_dedups_within_batch_exactly(spark, tmp_path):
    """filter_novel's within-batch pass is exact block-BLAS all-pairs:
    two near-identical NOVEL vectors in one delta collapse to the
    smallest id (no LSH recall caveat within the delta)."""
    import numpy as np

    corpus = spark.createDataFrame(
        _clustered_corpus(), "vec_id long, embedding array<double>"
    )
    idx = sim.IvfIndex(str(tmp_path / "ivf"), dim=16, n_planes=4, seed=11)
    idx.build(corpus, "embedding")

    rng = np.random.default_rng(3)
    v = np.zeros(16)
    v[9] = 10.0  # unused axis -> novel vs corpus
    v = v + rng.normal(0, 0.5, size=16)
    twin = v + rng.normal(0, 0.01, size=16)  # near-identical to v
    other = np.zeros(16)
    other[12] = 10.0
    batch = spark.createDataFrame(
        [
            (500001, [float(x) for x in v]),
            (500002, [float(x) for x in twin]),
            (500003, [float(x) for x in other]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"] for r in idx.filter_novel(
        batch, threshold=0.95, n_probe=2, dedup_within=True
    ).collect()}
    assert got == {500001, 500003}  # twin 500002 collapsed onto 500001


# ---- Product quantization ----


def test_pq_encode_argmin_hand_checked(spark):
    """dim-4 vector, 2 subspaces, 2 codewords each: the argmin code and
    squared distance per subspace are hand-computable."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    books = [
        [(0, [0.0, 1.0]), (1, [5.0, 5.0])],     # sub 0: code 0 wins (d2=1)
        [(0, [0.0, 0.0]), (1, [3.0, 3.0])],     # sub 1: code 1 wins (d2=1)
    ]
    rows = {
        r["subspace"]: r
        for r in sim.pq_encode(df, "vec_id", "embedding", books).collect()
    }
    assert rows[0]["code"] == 0 and rows[0]["dist"] == 1.0
    assert rows[1]["code"] == 1 and rows[1]["dist"] == 1.0


def test_pq_init_rows_encode_to_themselves(spark):
    """Vectors that ARE the codebook rows encode to their own code with
    distance exactly 0 in every subspace."""
    rows = _clustered_corpus(n_clusters=4, per_cluster=4, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    first8 = [r[1] for r in sorted(rows)[:8]]
    books = sim.init_codebooks_from_rows(first8, m_subspaces=4)
    enc = sim.pq_encode(
        df.filter(F.col("vec_id") < 8), "vec_id", "embedding", books
    ).collect()
    for r in enc:
        assert r["code"] == r["vec_id"] and r["dist"] == 0.0, r


def test_pq_training_reduces_distortion(spark):
    """Lloyd-refined codebooks must not increase (and on clustered data
    strictly decrease) total encoding distortion vs the init-only books."""
    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    first = [r[1] for r in sorted(rows)[:8]]
    init_books = sim.init_codebooks_from_rows(first, m_subspaces=4)
    trained = sim.train_pq_codebooks(
        df, "embedding", m_subspaces=4, k_codes=8, iters=5
    )

    def distortion(books):
        return (
            sim.pq_encode(df, "vec_id", "embedding", books)
            .agg(F.sum("dist"))
            .collect()[0][0]
        )

    assert distortion(trained) < distortion(init_books)


def test_pq_adc_topk_recall_and_plan(spark):
    """ADC top-10 over trained codes must recover most of the exact
    squared-L2 top-10 (clustered corpus, deterministic), the encode plan
    must contain no Exchange (row-local), and the ADC top-k must plan as
    TakeOrderedAndProject."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = sim.train_pq_codebooks(
        df, "embedding", m_subspaces=4, k_codes=8, iters=5
    )
    query = rows[7][1]
    mat = np.asarray([r[1] for r in rows])
    ids = np.asarray([r[0] for r in rows])
    exact = set(
        ids[np.argsort(((mat - np.asarray(query)) ** 2).sum(axis=1))[:10]]
    )
    codes = sim.pq_encode(df, "vec_id", "embedding", books)
    got = [
        r["vec_id"]
        for r in sim.pq_topk_adc(codes, "vec_id", books, query, k=10).collect()
    ]
    assert len(set(got) & exact) >= 7, (sorted(got), sorted(exact))
    enc_plan = physical_plan(codes)
    assert "Exchange" not in enc_plan, enc_plan
    adc_plan = physical_plan(sim.pq_topk_adc(codes, "vec_id", books, query, k=10))
    assert "TakeOrderedAndProject" in adc_plan, adc_plan


# ---- IVF-PQ composite index ----


def _ivfpq(spark, tmp_path, rows, name="ivfpq"):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = sim.IvfPqIndex(
        str(tmp_path / name), dim=16, n_planes=3, m_subspaces=4, k_codes=8
    )
    idx.build(df, "embedding")
    return idx, df


def test_ivfpq_probe_recall_and_pruning(spark, tmp_path):
    """Probe recall vs exact L2 top-10 on the clustered corpus, and the
    codes scan must carry a centroid_id PartitionFilter with NO raw
    vector column in the stored schema (the 32x-storage point)."""
    import re

    import numpy as np

    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows)
    query = rows[7][1]
    mat = np.asarray([r[1] for r in rows])
    ids = np.asarray([r[0] for r in rows])
    exact = set(
        ids[np.argsort(((mat - np.asarray(query)) ** 2).sum(axis=1))[:10]]
    )
    probe = idx.probe(spark, query, k=10, n_probe=3)
    got = [r["vec_id"] for r in probe.collect()]
    assert len(set(got) & exact) >= 6, (sorted(got), sorted(exact))
    plan = physical_plan(probe)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan
    stored = spark.read.parquet(idx._codes_path(spark))
    assert set(stored.columns) == {"vec_id", "centroid_id", "codes"}


def test_ivfpq_append_then_probe_finds_new_vector(spark, tmp_path):
    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows[:100], name="ivfpq_app")
    extra = spark.createDataFrame(
        rows[100:], "vec_id long, embedding array<double>"
    )
    idx.append(extra, "embedding")
    target = rows[150]
    got = [r["vec_id"] for r in idx.probe(spark, target[1], k=3, n_probe=4).collect()]
    assert target[0] in got
    assert idx.stats(spark)["n_vectors"] == len(rows)


def test_ivfpq_delete_compact_lifecycle(spark, tmp_path):
    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows, name="ivfpq_del")
    target = rows[7]
    pre = [r["vec_id"] for r in idx.probe(spark, target[1], k=5, n_probe=4).collect()]
    assert target[0] in pre
    idx.delete(spark, [target[0]])
    mid = [r["vec_id"] for r in idx.probe(spark, target[1], k=5, n_probe=4).collect()]
    assert target[0] not in mid
    idx.compact(spark)
    st = idx.stats(spark)
    assert st["n_tombstones"] == 0 and st["n_vectors"] == len(rows) - 1
    assert st["generation"] == 1
    post = [r["vec_id"] for r in idx.probe(spark, target[1], k=5, n_probe=4).collect()]
    assert post == mid


def test_ivfpq_params_guard_and_load(spark, tmp_path):
    rows = _clustered_corpus(n_clusters=2, per_cluster=10, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows, name="ivfpq_params")
    other = sim.IvfPqIndex(
        idx.path, dim=16, n_planes=3, m_subspaces=8, k_codes=8
    )
    with pytest.raises(ValueError, match="parameter mismatch"):
        other.probe(spark, rows[0][1], k=2)
    reloaded = sim.IvfPqIndex.load(spark, idx.path)
    assert reloaded.m_subspaces == 4
    assert reloaded.probe(spark, rows[0][1], k=2, n_probe=2).count() == 2


def test_ivfpq_probe_batch_matches_per_query(spark, tmp_path):
    """Batched ADC must return exactly the per-query probe() results at
    the same n_probe, from one union-pruned scan; over-contract query
    sets raise the bounded-collect error."""
    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows, name="ivfpq_batch")
    picks = [rows[3], rows[77], rows[141]]
    ids = [p[0] for p in picks]
    queries = df.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert queries.count() == 3
    batched = idx.probe_batch(spark, queries, k=5, n_probe=2)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["approx_dist"])
        )
    by_q = {q: sorted(v, key=lambda t: (t[1], t[0])) for q, v in got.items()}
    for qid, vec in [(p[0], p[1]) for p in picks]:
        single = [
            (r["vec_id"], r["approx_dist"])
            for r in idx.probe(spark, vec, k=5, n_probe=2).collect()
        ]
        assert by_q[qid] == single, qid
    with pytest.raises(ValueError, match="small-by-contract"):
        idx.probe_batch(spark, queries, k=5, n_probe=2, max_query_rows=2)


def test_pq_encode_np_bit_identical_to_expression(spark):
    """The numpy wide-form encoder must produce the exact same codes as
    the SQL-expression long form (same fold order, same argmin tie
    rule) — the property that lets IvfPqIndex build with the fast path
    while pq_codes stays oracle-exact."""
    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = sim.train_pq_codebooks(
        df, "embedding", m_subspaces=4, k_codes=8, iters=3
    )
    expr = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in sim.pq_encode(df, "vec_id", "embedding", books).collect()
    }
    for r in sim.pq_encode_np(df, "vec_id", "embedding", books).collect():
        for m, code in enumerate(r["codes"]):
            assert expr[(r["vec_id"], m)] == code, (r["vec_id"], m)


def test_pq_encode_np_long_bit_identical_to_expression(spark):
    """The numpy LONG-form encoder (r13-opt serving path of the
    `pq_codes` entry) must reproduce the SQL-expression long form
    bit-for-bit — codes AND the published double `dist` (same
    element-by-element IEEE fold as `_sq_l2`, same smallest-code tie
    rule), so the entry's oracle hash is unchanged by the swap."""
    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = sim.train_pq_codebooks(
        df, "embedding", m_subspaces=4, k_codes=8, iters=3
    )
    expr = {
        (r["vec_id"], r["subspace"]): (r["code"], r["dist"])
        for r in sim.pq_encode(df, "vec_id", "embedding", books).collect()
    }
    got = sim.pq_encode_np_long(df, "vec_id", "embedding", books).collect()
    assert len(got) == len(expr)
    for r in got:
        code, dist = expr[(r["vec_id"], r["subspace"])]
        assert r["code"] == code, (r["vec_id"], r["subspace"])
        assert r["dist"] == dist, (r["vec_id"], r["subspace"])


def test_train_pq_codebooks_small_or_degenerate_sample_guard(spark):
    """Fewer sample rows than k_codes must raise a clear error before
    the Lloyd loop (not IndexError mid-iteration), and duplicate sample
    rows must not seed duplicate codewords: init takes the first k
    DISTINCT subvector rows (ADVICE r5)."""
    few = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="need at least k_codes"):
        sim.train_pq_codebooks(few, "embedding", m_subspaces=2, k_codes=8)

    # 8 rows but only 4 distinct -> k_codes=8 must refuse, k_codes=4
    # must train with 4 DISTINCT codewords per subspace
    dup_rows = [
        (i, [float(i % 4), float(i % 4) + 1.0, 10.0 * (i % 4), 0.5])
        for i in range(8)
    ]
    dups = spark.createDataFrame(
        dup_rows, "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="distinct sample rows"):
        sim.train_pq_codebooks(dups, "embedding", m_subspaces=2, k_codes=8)
    books = sim.train_pq_codebooks(
        dups, "embedding", m_subspaces=2, k_codes=4, iters=0
    )
    for book in books:
        words = [tuple(cw) for _, cw in book]
        assert len(set(words)) == 4, words


def test_ivfpq_filtered_probe_recall_and_pushdown(spark, tmp_path):
    """Filtered ANN (VERDICT r5 #5): a metadata predicate runs INSIDE
    the partition-pruned codes scan — every hit satisfies the filter,
    recall vs the exact FILTERED L2 top-10 is >=7/10, the plan keeps
    the centroid_id PartitionFilter AND pushes the metadata predicate
    to the parquet scan, and probe_batch agrees with probe."""
    import re

    import numpy as np

    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    df = spark.createDataFrame(
        [(i, v, int(i % 2)) for i, v in rows],
        "vec_id long, embedding array<double>, label int",
    )
    idx = sim.IvfPqIndex(
        str(tmp_path / "ivfpq_filt"), dim=16, n_planes=3,
        m_subspaces=4, k_codes=8, meta_cols=("label",),
    )
    idx.build(df, "embedding")
    stored = spark.read.parquet(idx._codes_path(spark))
    assert set(stored.columns) == {"vec_id", "centroid_id", "codes", "label"}

    query = rows[7][1]
    keep = {i for i, _ in rows if i % 2 == 0}
    mat = np.asarray([v for i, v in rows if i in keep])
    ids = np.asarray([i for i, _ in rows if i in keep])
    exact = set(
        ids[np.argsort(((mat - np.asarray(query)) ** 2).sum(axis=1))[:10]]
    )
    probe = idx.probe(spark, query, k=10, n_probe=8, where="label = 0")
    got = [r["vec_id"] for r in probe.collect()]
    assert all(i in keep for i in got), got          # filter is honored
    assert len(set(got) & exact) >= 7, (sorted(got), sorted(exact))

    plan = physical_plan(probe)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan   # pruning survives
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pf and "label" in pf.group(1), plan       # predicate pushed

    # batch path agrees with the single-query path under the same filter
    queries = spark.createDataFrame(
        [(99, query)], "query_id long, embedding array<double>"
    )
    batched = sorted(
        (r["vec_id"], r["approx_dist"])
        for r in idx.probe_batch(
            spark, queries, k=10, n_probe=8, where="label = 0"
        ).collect()
    )
    single = sorted(
        (r["vec_id"], r["approx_dist"]) for r in probe.collect()
    )
    assert batched == single

    # load() restores meta_cols; a mismatched instance errors loudly
    reloaded = sim.IvfPqIndex.load(spark, idx.path)
    assert reloaded.meta_cols == ("label",)
    bare = sim.IvfPqIndex(
        idx.path, dim=16, n_planes=3, m_subspaces=4, k_codes=8
    )
    with pytest.raises(ValueError, match="meta_cols mismatch"):
        bare.probe(spark, query, k=2)


def test_ivfpq_rerank_recovers_within_cluster_ordering(spark, tmp_path):
    """The measured operating curve (SCALING.md §3) shows raw ADC
    recall@10 plateauing ~0.2 on clustered data: the probed CELLS are
    right but 8-byte codes cannot order within a cluster. The FAISS
    refine stage — top-R by ADC, exact L2 on those R raw vectors only —
    must recover recall >=8/10 while touching O(R) vector rows, and
    must require the vectors table explicitly."""
    import numpy as np

    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows, name="ivfpq_rerank")
    query = rows[7][1]
    mat = np.asarray([r[1] for r in rows])
    ids = np.asarray([r[0] for r in rows])
    exact = set(
        ids[np.argsort(((mat - np.asarray(query)) ** 2).sum(axis=1))[:10]]
    )
    raw = {
        r["vec_id"]
        for r in idx.probe(spark, query, k=10, n_probe=4).collect()
    }
    reranked_df = idx.probe(
        spark, query, k=10, n_probe=4, rerank=40, vectors=df
    )
    reranked = {r["vec_id"] for r in reranked_df.collect()}
    assert "exact_dist" in reranked_df.columns
    assert len(reranked & exact) >= 8, (sorted(reranked), sorted(exact))
    assert len(reranked & exact) >= len(raw & exact)

    with pytest.raises(ValueError, match="needs the raw-vector table"):
        idx.probe(spark, query, k=10, rerank=40)


def test_ivfpq_probe_batch_rerank_matches_single_rerank(spark, tmp_path):
    """Batched refine must return exactly the single-query rerank
    results per query (same R, same n_probe), and each query's
    reranked set must hit the exact L2 top-5 at least as well as raw
    ADC."""
    import numpy as np

    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    idx, df = _ivfpq(spark, tmp_path, rows, name="ivfpq_brr")
    picks = [rows[3], rows[77], rows[141]]
    queries = df.filter(
        F.col("vec_id").isin([p[0] for p in picks])
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    batched = {}
    for r in idx.probe_batch(
        spark, queries, k=5, n_probe=4, rerank=40, vectors=df
    ).collect():
        batched.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["exact_dist"], 9))
        )
    mat = np.asarray([r[1] for r in rows])
    ids = np.asarray([r[0] for r in rows])
    for qid, qvec in [(p[0], p[1]) for p in picks]:
        single = [
            (r["vec_id"], round(r["exact_dist"], 9))
            for r in idx.probe(
                spark, qvec, k=5, n_probe=4, rerank=40, vectors=df
            ).collect()
        ]
        got = sorted(batched[qid], key=lambda t: (t[1], t[0]))
        assert got == single, qid
        exact = set(
            ids[np.argsort(((mat - np.asarray(qvec)) ** 2).sum(axis=1))[:5]]
        )
        assert len({v for v, _ in got} & exact) >= 4, qid


def test_ivf_probe_allowed_id_set_filter(spark, tmp_path):
    """IvfIndex filtered search (r6): an allowed-id set restricts
    candidates inside the pruned scan — every hit is allowed, k stays
    filled from the allowed pool, recall vs the exact FILTERED cosine
    top-5 holds, and disallowed near-identical vectors are excluded."""
    import numpy as np

    rows = _clustered_corpus(n_clusters=4, per_cluster=40, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = sim.IvfIndex(str(tmp_path / "ivf_filt"), dim=16, n_planes=3)
    idx.build(df, "embedding")

    keep = {i for i, _ in rows if i % 2 == 0}
    allowed = spark.createDataFrame(
        [(i,) for i in sorted(keep)], "vec_id long"
    )
    query = rows[7][1]          # vec_id 7 itself is NOT allowed (odd)
    got = [
        r["vec_id"]
        for r in idx.probe(
            spark, query, k=5, n_probe=8, allowed=allowed
        ).collect()
    ]
    assert len(got) == 5
    assert all(i in keep for i in got), got
    assert 7 not in got

    def norm(v):
        v = np.asarray(v)
        n = np.linalg.norm(v)
        return v / (n or 1.0)

    mat = np.asarray([norm(v) for i, v in rows if i in keep])
    ids = np.asarray([i for i, _ in rows if i in keep])
    exact = set(ids[np.argsort(-(mat @ norm(query)), kind="stable")[:5]])
    assert len(set(got) & exact) >= 4, (sorted(got), sorted(exact))

    # batched path honors the same filter and agrees with probe()
    queries = spark.createDataFrame(
        [(42, query)], "query_id long, embedding array<double>"
    )
    batched = sorted(
        (r["vec_id"], round(r["score"], 9))
        for r in idx.probe_batch(
            spark, queries, k=5, n_probe=8, allowed=allowed
        ).collect()
    )
    single = sorted(
        (r["vec_id"], round(r["score"], 9))
        for r in idx.probe(
            spark, query, k=5, n_probe=8, allowed=allowed
        ).collect()
    )
    assert batched == single


def test_semantic_dedup_keeps_best_representative_per_dup_set(spark):
    """SemDeDup contract: within a cluster, every duplicate set keeps
    exactly its best representative (closest to centroid, ties to the
    smaller id); singletons always survive; similar docs in DIFFERENT
    clusters are never compared (cluster-scoped by design)."""
    c0 = [1.0, 0.0, 0.0, 0.0]
    c1 = [0.0, 1.0, 0.0, 0.0]

    def tilt(base, eps, dim=2):
        v = list(base)
        v[dim] = eps
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        # cluster 0: dup set {10, 11, 12} — 10 is closest to centroid
        (10, tilt(c0, 0.01)),
        (11, tilt(c0, 0.02)),
        (12, tilt(c0, 0.03)),
        # cluster 0: singleton far from the dup set but same cluster
        (13, tilt(c0, 0.9, dim=3)),
        # cluster 1: dup set {20, 21} — exact same vector: tie, keep 20
        (20, tilt(c1, 0.01)),
        (21, tilt(c1, 0.01)),
        # cluster 1: near-copy of doc 10's DIRECTION but assigned to
        # cluster 1? no — it sits near c1; just another singleton
        (22, tilt(c1, 0.8, dim=3)),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    cents = [(0, c0), (1, c1)]
    kept = sim.semantic_dedup(
        df, "vec_id", "embedding", cents, threshold=0.99
    )
    got = {r["vec_id"]: r["cluster_id"] for r in kept.collect()}
    assert set(got) == {10, 13, 20, 22}
    assert got[10] == 0 and got[20] == 1

    # partition invariance: same survivors from a different partitioning
    kept2 = sim.semantic_dedup(
        df.repartition(7), "vec_id", "embedding", cents, threshold=0.99
    )
    assert {r["vec_id"] for r in kept2.collect()} == set(got)


def test_semantic_dedup_is_cluster_scoped_equi_join(spark):
    """The candidate pair generation must be an equi-join on cluster_id
    — never a cartesian product (the plan property the |cluster|² cost
    bound depends on)."""
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    kept = sim.semantic_dedup(
        df, "vec_id", "embedding", cents, threshold=0.9
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_embedding_decontaminate_flags_near_eval_vectors(spark):
    """Planted geometry pins semantic decontamination: a corpus vector
    nearly parallel to an eval vector is contaminated, an orthogonal
    one is clean; the single-eval expression path works; empty eval
    and over-cap eval sets are contract errors."""
    import pytest as _pytest

    eval_df = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.1, 0.0]),   # near eval -> contaminated
            (2, [0.0, 1.0, 0.0]),    # orthogonal -> clean
            (3, [-1.0, 0.0, 0.0]),   # opposite -> clean (cos = -1)
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["contaminated"], r["max_eval_cos"])
        for r in sim.embedding_decontaminate(
            corpus, eval_df, threshold=0.9
        ).collect()
    }
    assert got[1][0] and got[1][1] > 0.99
    assert not got[2][0] and abs(got[2][1]) < 1e-12
    assert not got[3][0] and got[3][1] == -1.0

    with _pytest.raises(ValueError):
        sim.embedding_decontaminate(corpus, eval_df.filter("vec_id < 0"))
    with _pytest.raises(ValueError):
        sim.embedding_decontaminate(corpus, corpus, max_eval=2)


def test_mmr_rerank_diversifies_duplicate_cluster(spark):
    """Planted geometry pins MMR semantics: three near-identical
    high-relevance vectors collapse to ONE representative in the
    reranked top-3 (the other slots go to diverse lower-relevance
    candidates); lam=1 degenerates to pure relevance order;
    determinism across partitionings; over-cap candidates error."""
    import pytest as _pytest

    rows = [
        # dup cluster, highest relevance
        (1, [1.0, 0.0, 0.0], 0.99),
        (2, [0.999, 0.01, 0.0], 0.98),
        (3, [0.998, 0.02, 0.0], 0.97),
        # diverse directions, lower relevance
        (4, [0.0, 1.0, 0.0], 0.60),
        (5, [0.0, 0.0, 1.0], 0.55),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, score double"
    )
    got = sim.mmr_rerank(
        df, "vec_id", "embedding", "score", k=3, lam=0.5
    )
    ids = [t[0] for t in got]
    assert ids[0] == 1                      # best relevance first
    assert set(ids) == {1, 4, 5}            # dups 2,3 displaced
    pure = sim.mmr_rerank(
        df, "vec_id", "embedding", "score", k=3, lam=1.0
    )
    assert [t[0] for t in pure] == [1, 2, 3]
    again = sim.mmr_rerank(
        df.repartition(5), "vec_id", "embedding", "score", k=3, lam=0.5
    )
    assert [t[0] for t in again] == ids
    with _pytest.raises(ValueError):
        sim.mmr_rerank(
            df, "vec_id", "embedding", "score", max_candidates=2
        )


def test_embedding_covariance_exact_vs_numpy(spark):
    """The decimal-sum covariance equals numpy's to float precision,
    is symmetric, and covers all d^2 positions."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators.similarity import (
        embedding_covariance,
    )

    rng = np.random.default_rng(5)
    x = rng.normal(size=(60, 6)).round(6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(df).collect()
    }
    # the operator quantizes to the 2^-20 grid; mirror it in the ref
    xq = np.floor(x * 2**20) / 2**20
    ref = np.cov(xq, rowvar=False, ddof=1)
    assert len(got) == 36
    for (i, j), c in got.items():
        assert abs(c - ref[i, j]) < 1e-9, (i, j)
        assert got[(j, i)] == c
    # and the grid perturbs the true covariance only at ~1e-6
    true = np.cov(x, rowvar=False, ddof=1)
    for (i, j), c in got.items():
        assert abs(c - true[i, j]) < 1e-5, (i, j)


def test_whiten_embeddings_identity_covariance(spark):
    """The exact covariance of the whitened output is the identity
    (the anchor that makes the rows-only transform trustworthy)."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators.similarity import (
        embedding_covariance,
        whiten_embeddings,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(80, 4))
    mix = np.array(
        [[2.0, 0.3, 0.0, 0.0],
         [0.0, 1.5, 0.4, 0.0],
         [0.0, 0.0, 0.7, 0.2],
         [0.1, 0.0, 0.0, 1.1]]
    )
    x = (base @ mix + np.array([5.0, -3.0, 0.5, 2.0])).round(6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    w = whiten_embeddings(df).withColumnRenamed("whitened", "embedding")
    cov = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(w).collect()
    }
    for (i, j), c in cov.items():
        want = 1.0 if i == j else 0.0
        assert abs(c - want) < 1e-6, (i, j, c)


def test_group_centroid_drift_geometry(spark):
    """A group aligned with the global mean reads ~1; an opposed group
    reads negative; values match a numpy reference on the quantized
    grid."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators.similarity import (
        group_centroid_drift,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(0.2, 0.05, size=(40, 8))
    flipped = -base[:10] * 0.5
    rows = [("a", [float(v) for v in r]) for r in base]
    rows += [("b", [float(v) for v in r]) for r in flipped]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = {
        r["label"]: r
        for r in group_centroid_drift(df, "label").collect()
    }
    x = np.vstack([base, flipped])
    xq = np.floor(x * 2**20) / 2**20
    g = xq.mean(axis=0)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ref_a = cos(np.floor(base * 2**20).mean(axis=0), np.floor(x * 2**20).mean(axis=0))
    assert got["a"]["n_vecs"] == 40
    assert abs(got["a"]["cosine_to_global"] - ref_a) < 1e-9
    assert got["a"]["cosine_to_global"] > 0.9
    assert got["b"]["cosine_to_global"] < 0


def test_cluster_quality_db_known_geometry(spark):
    """Two tight, well-separated 2-D clusters: scatter equals the
    hand-computed mean member->mean distance and the DB term is
    (S_i+S_j)/M_ij (to quantization tolerance 2^-20)."""
    import math

    from streaming_data_pipeline_azure_spark.operators.similarity import (
        cluster_quality_db,
    )

    rows = [
        (0, [2.0, 0.1]), (1, [3.0, -0.1]),    # cosine-near (1,0)
        (2, [0.1, 5.0]), (3, [-0.1, 4.0]),    # cosine-near (0,1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r["cluster_id"]: r for r in
           cluster_quality_db(df, "embedding", cents).collect()}
    assert out[0]["n_vectors"] == 2 and out[1]["n_vectors"] == 2
    s0 = math.dist((2.0, 0.1), (2.5, 0.0))       # == both members
    s1 = math.dist((0.1, 5.0), (0.0, 4.5))
    m01 = math.dist((2.5, 0.0), (0.0, 4.5))
    tol = 2**-19
    assert abs(out[0]["scatter"] - s0) < tol
    assert abs(out[1]["scatter"] - s1) < tol
    want = (out[0]["scatter"] + out[1]["scatter"]) / m01
    # M_ij uses the QUANTIZED cluster means (off the true mean by up
    # to 2^-21 per dim), so compare at 1e-6
    assert abs(out[0]["db_term"] - want) < 1e-6
    assert abs(out[1]["db_term"] - want) < 1e-6
