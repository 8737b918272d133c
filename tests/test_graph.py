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
