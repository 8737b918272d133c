from __future__ import annotations

from streaming_data_pipeline_azure_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "s long, d long")


def test_triangle_count_hand_checked(spark):
    """K4 has 4 triangles; a pendant node adds none. Duplicate,
    reversed, and self-loop edges must collapse away."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(1, 0), (2, 2), (0, 1), (4, 0)]  # reverse, loop, dup, pendant
    got = graph.graph_summary(_edges(spark, noisy), "s", "d").collect()[0]
    assert got["n_nodes"] == 5 and got["n_edges"] == 7
    assert got["n_triangles"] == 4
    # wedges: degs 4,3,3,3,1 -> 6+3+3+3+0 = 15; clustering = 12/15
    assert got["avg_degree"] == 14 / 5
    assert got["global_clustering"] == 12 / 15


def test_triangle_free_graph(spark):
    """A star graph has wedges but zero triangles."""
    star = [(0, i) for i in range(1, 6)]
    got = graph.graph_summary(_edges(spark, star), "s", "d").collect()[0]
    assert got["n_triangles"] == 0 and got["global_clustering"] == 0.0


def test_degree_histogram(spark):
    star = [(0, i) for i in range(1, 6)]
    got = {
        r["degree"]: r["n_nodes"]
        for r in graph.degree_histogram(_edges(spark, star), "s", "d").collect()
    }
    assert got == {5: 1, 1: 5}


def test_orientation_counts_each_triangle_once(spark):
    """Two triangles sharing an edge (bowtie-ish) count as exactly 2
    regardless of degree ties, and partitioning doesn't change it."""
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    df = _edges(spark, edges)
    a = graph.graph_summary(df.repartition(5), "s", "d").collect()[0]
    b = graph.graph_summary(df.coalesce(1), "s", "d").collect()[0]
    assert a["n_triangles"] == b["n_triangles"] == 2


def test_pagerank_matches_numpy_power_iteration(spark):
    """Ranks must match a dense numpy power-iteration reference (same
    damping/iterations/dangling handling) to 1e-9, on a graph with a
    dangling vertex and asymmetric structure."""
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 -> 3; none leave 4? no: 4->3 exists, add dangling 5
    edges.append((3, 5))  # 5 has no out-edges: dangling
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(df, damping=0.85, n_iter=12).collect()
    }

    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i] == 0:
                dangling += r[i]
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        r = (1 - 0.85) / n + 0.85 * (contrib + dangling / n)
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    # mass conservation with a dangling vertex present
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_and_partition_invariance(spark):
    """Star graph: the center (all spokes point at it) must dominate;
    spokes are symmetric and equal. Result must not depend on input
    partitioning."""
    from streaming_data_pipeline_azure_spark.operators.graph import pagerank

    spokes = [(i, 100) for i in range(1, 9)]
    df = spark.createDataFrame(spokes, ["src", "dst"])
    got = {
        r["id"]: r["rank"] for r in pagerank(df, n_iter=8).collect()
    }
    assert got[100] > max(got[i] for i in range(1, 9)) * 3
    spoke_ranks = {round(got[i], 12) for i in range(1, 9)}
    assert len(spoke_ranks) == 1  # symmetric spokes, identical ranks

    re_part = {
        r["id"]: r["rank"]
        for r in pagerank(df.repartition(7), n_iter=8).collect()
    }
    assert set(re_part) == set(got)
    for k in got:
        assert abs(re_part[k] - got[k]) < 1e-12, k


def test_pagerank_fixedpoint_matches_float_twin_and_python(spark):
    """The fixed-point integer twin must (a) reproduce a pure-Python
    integer replay EXACTLY (the engine-exactness claim the oracle
    depends on), (b) agree with the float pagerank on RANK ORDER
    where gaps dwarf the 1/scale floor leak, and (c) be partition
    invariant. Star graph + a small asymmetric graph with a dangling
    vertex."""
    from streaming_data_pipeline_azure_spark.operators.graph import (
        pagerank,
        pagerank_fixedpoint,
    )

    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (4, 2), (5, 4)]
    # vertex 6 dangles: receives from 3... make 3->6 so 6 has no out
    edges.append((3, 6))
    df = spark.createDataFrame(edges, ["src", "dst"])

    got = {
        r["id"]: r["rank_scaled"]
        for r in pagerank_fixedpoint(df, n_iter=10).collect()
    }

    # pure-python integer replay
    es = sorted(set(edges))
    verts = sorted({s for s, _ in es} | {d for _, d in es})
    n = len(verts)
    out = {}
    for s, _ in es:
        out[s] = out.get(s, 0) + 1
    scale = 10**12
    base = (3 * scale) // (20 * n)
    r = {v: scale // n for v in verts}
    for _ in range(10):
        dm = sum(r[v] for v in verts if v not in out)
        inflow = {v: 0 for v in verts}
        for s, d in es:
            inflow[d] += r[s] // out[s]
        r = {
            v: base + (17 * (inflow[v] + dm // n)) // 20 for v in verts
        }
    assert got == r

    # order parity with the float twin (gaps here are ~1e-2 of rank)
    f = {
        row["id"]: row["rank"] for row in pagerank(df, n_iter=10).collect()
    }
    order_fixed = sorted(got, key=lambda v: (-got[v], v))
    order_float = sorted(f, key=lambda v: (-f[v], v))
    assert order_fixed == order_float

    re_part = {
        row["id"]: row["rank_scaled"]
        for row in pagerank_fixedpoint(df.repartition(7), n_iter=10).collect()
    }
    assert re_part == got


def test_bfs_distances_chain_and_branches(spark):
    """Hop distances on a known topology: a chain with a side branch
    and a disconnected component — minimal hop wins when multiple
    paths exist, unreachable vertices are absent, direction of the
    input edge never matters."""
    from streaming_data_pipeline_azure_spark.operators.graph import (
        bfs_distances,
    )

    #   1-2-3-4-5   (chain)   2-6 (branch)   1-3 (shortcut)
    #   8-9         (disconnected)
    edges = [(1, 2), (3, 2), (3, 4), (5, 4), (2, 6), (1, 3), (8, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seed = spark.createDataFrame([(1,)], ["id"])
    got = {
        r["id"]: r["distance"]
        for r in bfs_distances(df, seed, max_hops=10).collect()
    }
    # 3 is reachable in 1 via the shortcut even though the chain says 2
    assert got == {1: 0, 2: 1, 3: 1, 6: 2, 4: 2, 5: 3}


def test_bfs_distances_multi_source_and_hop_cap(spark):
    """Multi-source: distance is to the NEAREST seed; max_hops
    truncates the expansion."""
    from streaming_data_pipeline_azure_spark.operators.graph import (
        bfs_distances,
    )

    # path 1-2-3-4-5-6 with seeds {1, 6}
    edges = [(i, i + 1) for i in range(1, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (6,)], ["id"])
    got = {
        r["id"]: r["distance"]
        for r in bfs_distances(df, seeds, max_hops=10).collect()
    }
    assert got == {1: 0, 6: 0, 2: 1, 5: 1, 3: 2, 4: 2}
    capped = {
        r["id"]: r["distance"]
        for r in bfs_distances(df, seeds, max_hops=1).collect()
    }
    assert capped == {1: 0, 6: 0, 2: 1, 5: 1}


def test_link_prediction_jaccard_brute_force(spark):
    """Candidates, scores, and ranking match a per-pair brute force;
    existing edges are excluded; hub-middle cap drops wedge middles."""
    from itertools import combinations

    from streaming_data_pipeline_azure_spark.operators.graph import (
        link_prediction_jaccard,
    )

    edges = [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 6),
    ]
    df = spark.createDataFrame(edges, "s long, d long")
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    eset = {tuple(sorted(e)) for e in edges}
    brute = {}
    for a, b in combinations(sorted(adj), 2):
        if (a, b) in eset:
            continue
        cn = len(adj[a] & adj[b])
        if cn:
            brute[(a, b)] = (cn, cn / len(adj[a] | adj[b]))
    got = {
        (r["node_a"], r["node_b"]): (
            r["common_neighbors"],
            r["jaccard"],
        )
        for r in link_prediction_jaccard(df, "s", "d", k=100).collect()
    }
    assert set(got) == set(brute)
    for pair, (cn, j) in brute.items():
        assert got[pair][0] == cn
        assert abs(got[pair][1] - j) < 1e-15

    # hub cap: dropping degree>=4 middles removes wedges THROUGH hubs
    capped = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in link_prediction_jaccard(
            df, "s", "d", k=100, max_middle_degree=3
        ).collect()
    }
    full_mid_degrees = {v: len(n) for v, n in adj.items()}
    hubs = {v for v, d in full_mid_degrees.items() if d > 3}
    for (a, b), cn in capped.items():
        assert cn == len((adj[a] & adj[b]) - hubs)


def test_degree_assortativity_star_and_cycle(spark):
    """A star is maximally disassortative (-1: every edge pairs the hub
    degree with a leaf degree); a cycle is degree-regular (zero
    variance -> NULL); counts come from the canonical simple graph."""
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 0)],  # dup direction collapses
        "s long, d long",
    )
    (row,) = graph.degree_assortativity(star, "s", "d").collect()
    assert row["n_nodes"] == 4 and row["n_edges"] == 3
    assert abs(row["assortativity"] - (-1.0)) < 1e-12
    cycle = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "s long, d long"
    )
    (row,) = graph.degree_assortativity(cycle, "s", "d").collect()
    assert row["assortativity"] is None
    assert row["n_edges"] == 3


def test_k_core_peels_to_unique_core(spark):
    """A 4-clique with a pendant chain: the 3-core is exactly the
    clique (chain peels away layer by layer); every member keeps >= k
    in-core neighbors; k too high -> empty; guards fire."""
    import pytest

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "s long, d long")
    out = {r["v"]: r["degree"] for r in
           graph.k_core(df, "s", "d", k=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(d == 3 for d in out.values())
    assert graph.k_core(df, "s", "d", k=4).count() == 0
    with pytest.raises(ValueError):
        graph.k_core(df, "s", "d", k=0)
    with pytest.raises(RuntimeError):
        graph.k_core(df, "s", "d", k=2, max_iter=1)


def test_k_core_members_satisfy_degree_invariant(spark):
    """Property on a hashed pseudo-random graph: every k-core member
    has >= k neighbors INSIDE the returned member set (the defining
    invariant, checked independently of the peeling loop)."""
    from pyspark.sql import functions as F

    edges = spark.range(400).select(
        (F.col("id") % 60).alias("s"),
        ((F.col("id") * 37 + 11) % 60).alias("d"),
    )
    core = graph.k_core(edges, "s", "d", k=4)
    members = {r["v"] for r in core.select("v").collect()}
    raw = {(r["s"], r["d"]) for r in edges.collect() if r["s"] != r["d"]}
    und = {tuple(sorted(p)) for p in raw}
    for v in members:
        nbrs = {b for a, b in und if a == v} | {
            a for a, b in und if b == v
        }
        assert len(nbrs & members) >= 4, v


def test_label_propagation_two_cliques_with_bridge(spark):
    from streaming_data_pipeline_azure_spark.operators.graph import (
        label_propagation,
    )

    # clique A {1,2,3}, clique B {10,11,12}, one bridge 3-10: LPA must
    # keep TWO communities (connected components would merge them)
    ca = [(1, 2), (1, 3), (2, 3)]
    cb = [(10, 11), (10, 12), (11, 12)]
    edges = spark.createDataFrame(ca + cb + [(3, 10)], ["s", "d"])
    out = {r["v"]: r["community"] for r in label_propagation(edges, "s", "d").collect()}
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]


def test_label_propagation_disjoint_cliques_match_components(spark):
    from streaming_data_pipeline_azure_spark.operators.graph import (
        label_propagation,
    )

    # on disjoint cliques, communities == connected components ==
    # min member id (labels converge to each clique's smallest vertex)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (20, 21)],
        ["s", "d"],
    )
    out = {r["v"]: r["community"] for r in label_propagation(edges, "s", "d").collect()}
    assert {out[1], out[2], out[3]} == {1}
    assert {out[7], out[8], out[9]} == {7}
    assert {out[20], out[21]} == {20}


def test_label_propagation_hub_cap_isolates_hub_keeps_cliques(spark):
    from streaming_data_pipeline_azure_spark.operators.graph import (
        label_propagation,
    )

    # two cliques plus a universal hub 99 touching every vertex: the
    # uncapped run merges everything through the hub; max_degree below
    # the hub's degree drops its edges, keeps both cliques intact, and
    # the hub reports as a singleton (still present in the output)
    ca = [(1, 2), (1, 3), (2, 3)]
    cb = [(10, 11), (10, 12), (11, 12)]
    hub = [(99, v) for v in (1, 2, 3, 10, 11, 12)]
    edges = spark.createDataFrame(ca + cb + hub, ["s", "d"])
    capped = {
        r["v"]: r["community"]
        for r in label_propagation(
            edges, "s", "d", max_degree=5
        ).collect()
    }
    assert capped[1] == capped[2] == capped[3]
    assert capped[10] == capped[11] == capped[12]
    assert capped[1] != capped[10]
    assert capped[99] == 99  # hub isolated, not dropped from output
    # a cap ABOVE every degree is a no-op vs the uncapped run
    uncapped = {
        r["v"]: r["community"]
        for r in label_propagation(edges, "s", "d").collect()
    }
    noop = {
        r["v"]: r["community"]
        for r in label_propagation(
            edges, "s", "d", max_degree=100
        ).collect()
    }
    assert noop == uncapped


def test_label_propagation_raises_on_exhausted_iterations(spark):
    import pytest

    from streaming_data_pipeline_azure_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["s", "d"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        label_propagation(edges, "s", "d", max_iter=1)


def test_degree_zipf_audit_star_vs_uniform(spark):
    from streaming_data_pipeline_azure_spark.operators.graph import (
        degree_zipf_audit,
    )

    # star graph: hub degree 64 (bucket 6, 1 vertex), leaves degree 1
    # (bucket 0, 64 vertices) -> steep NEGATIVE slope: the hub
    # signature
    star = spark.createDataFrame([(0, i) for i in range(1, 65)], ["s", "d"])
    rows = degree_zipf_audit(star, "s", "d").collect()
    by_bucket = {r["bucket"]: r for r in rows}
    assert by_bucket[0]["n_vertices"] == 64 and by_bucket[6]["n_vertices"] == 1
    # slope = (0 - 6) * 1e6 / (6 - 0) = -1e6 exactly
    assert rows[0]["slope_scaled"] == -1_000_000
