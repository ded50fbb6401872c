"""Centralities, coloring, dispersion, segmentation ops, generators, IVF."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph, example_graph, graph_from_adjacency
from lynxkite_spark.operators.centrality import (
    eigenvector_centrality,
    harmonic_centrality,
    katz_centrality,
)
from lynxkite_spark.operators.clustering import (
    clustering_coefficient,
    dispersion,
    embeddedness,
    modularity,
)
from lynxkite_spark.operators.coloring import greedy_coloring
from lynxkite_spark.operators.generators import erdos_renyi, scale_free
from lynxkite_spark.operators.segmentation import (
    combine_segmentations,
    deterministic_sample,
    edges_from_segmentation,
    grow_segmentation,
    segment_by_interval,
    vertex_set_intersection,
)


def test_eigenvector_on_cycle(spark):
    """On a directed 3-cycle the eigenvector is uniform."""
    g = graph_from_adjacency(spark, {0: [1], 1: [2], 2: [0]})
    got = {r["id"]: r["eigenvector"] for r in eigenvector_centrality(g, tol=1e-9).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-6)


def test_katz_star(spark):
    """Star a→c, b→c: center accumulates more Katz mass than leaves."""
    g = graph_from_adjacency(spark, {0: [2], 1: [2]})
    got = {r["id"]: r["katz"] for r in katz_centrality(g, alpha=0.1, iterations=10).collect()}
    assert got[2] > got[0] == got[1]


def test_harmonic_path(spark):
    """Path 0→1→2: harmonic(2) = 1/1 + 1/2."""
    g = graph_from_adjacency(spark, {0: [1], 1: [2]})
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    assert got[2] == pytest.approx(1.5)
    assert got[1] == pytest.approx(1.0)
    assert got[0] == 0.0


def test_greedy_coloring_proper(spark):
    """A proper coloring: no edge joins same-colored endpoints; a triangle
    needs 3 colors."""
    g = graph_from_adjacency(spark, {0: [1, 2], 1: [2], 3: [4]})
    colors = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    for s, d in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        assert colors[s] != colors[d]
    assert len({colors[0], colors[1], colors[2]}) == 3
    assert max(colors.values()) <= 3


def test_dispersion_square(spark):
    """4-cycle + diagonal (0-2): edge (0,2)'s common neighbors {1,3} are
    non-adjacent → dispersion 1; other edges have <2 common neighbors."""
    g = graph_from_adjacency(spark, {0: [1, 2, 3], 1: [2], 2: [3]})
    got = {(r["src"], r["dst"]): r["dispersion"] for r in dispersion(g).collect()}
    assert got[(0, 2)] == 1
    assert all(v == 0 for k, v in got.items() if k != (0, 2))


def test_embeddedness_example(spark):
    g = example_graph(spark)
    got = {(r["src"], r["dst"]): r["embeddedness"] for r in embeddedness(g).collect()}
    # triangle {0,1,2}: each edge has exactly 1 mutual neighbor
    assert got[(0, 1)] == 1 and got[(2, 0)] == 1 and got[(2, 1)] == 1


def test_modularity_two_cliques(spark):
    adj = {0: [1, 2], 1: [2], 3: [4, 5], 4: [5], 2: [3]}
    g = graph_from_adjacency(spark, adj)
    bt = g.vertices.sparkSession.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)], "id long, label long"
    )
    q = modularity(g, bt)
    assert 0.2 < q < 0.6  # clearly positive for the natural split


def test_clustering_coefficient_triangle_plus_tail(spark):
    g = graph_from_adjacency(spark, {0: [1, 2], 1: [2], 2: [3]})
    got = {
        r["id"]: r["clustering_coefficient"]
        for r in clustering_coefficient(g).collect()
    }
    assert got[0] == pytest.approx(1.0)  # nbrs {1,2} connected
    assert got[2] == pytest.approx(1 / 3)  # nbrs {0,1,3}: 1 of 3 pairs
    assert got[3] == pytest.approx(1.0)  # degree 1 → defined as 1.0


def test_segmentation_ops(spark):
    bt = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)], "id long, segment long"
    )
    e = edges_from_segmentation(bt)
    assert e.count() == 6  # 3·2 ordered pairs in segment 10

    g = graph_from_adjacency(spark, {1: [5], 4: [6]})
    grown = grow_segmentation(g, bt)
    pairs = {(r["id"], r["segment"]) for r in grown.collect()}
    assert (5, 10) in pairs and (6, 20) in pairs

    bt2 = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 100), (4, 100)], "id long, segment long"
    )
    combo = combine_segmentations(bt, bt2)
    segs = {r["id"]: r["segment"] for r in combo.collect()}
    assert segs[1] == segs[3] != segs[2]  # (10,100) vs (10,200)
    assert segs[4] != segs[1]  # (20,100)


def test_vertex_intersection_and_sample(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "id long")
    assert sorted(r["id"] for r in vertex_set_intersection(a, b).collect()) == [2, 3]

    v = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    s1 = {r["id"] for r in deterministic_sample(v, 0.2, seed=1).collect()}
    s2 = {r["id"] for r in deterministic_sample(v.repartition(7), 0.2, seed=1).collect()}
    assert s1 == s2  # partition-invariant
    assert 100 < len(s1) < 300


def test_segment_by_interval(spark):
    v = spark.createDataFrame([(1, 5.0), (2, 14.9), (3, 15.1)], "id long, x double")
    got = {r["id"]: r["segment"] for r in segment_by_interval(v, "x", 5.0).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_generators_deterministic(spark):
    g1 = erdos_renyi(spark, 200, 4.0, seed=7)
    g2 = erdos_renyi(spark, 200, 4.0, seed=7)
    e1 = {(r["src"], r["dst"]) for r in g1.edges.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert e1 == e2 and len(e1) > 200

    sf = scale_free(spark, 300, out_degree=3, seed=7)
    deg = sf.edges.groupBy("dst").count()
    top = deg.orderBy(F.col("count").desc()).first()
    assert top["dst"] < 30  # hubs are early vertices (power-law shape)


def test_ivf_topk_matches_exact_reasonably(spark):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from lynxkite_spark.functions.similarity import brute_force_topk, ivf_topk

    q = embs.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(embs, q, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(embs, q, k=3, n_centroids=8, nprobe=4).collect()}
    assert len(exact & approx) / len(exact) >= 0.4


def test_chung_lu_generator_tracks_degrees(spark):
    """Chung-Lu: realized degrees correlate with requested expected
    degrees; generation is deterministic at any parallelism."""
    from pyspark.sql import functions as F

    from lynxkite_spark.operators.generators import chung_lu

    degrees = spark.createDataFrame(
        [(i, 2 + (i % 20)) for i in range(300)], "id long, degree long"
    )
    g = chung_lu(spark, degrees, seed=7)
    e1 = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    g2 = chung_lu(spark, degrees.repartition(13), seed=7)
    e2 = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert e1 == e2  # partition-invariant
    out_deg = {r["src"]: r["n"] for r in g.edges.groupBy("src").agg(F.count("*").alias("n")).collect()}
    want = {r["id"]: r["degree"] for r in degrees.collect()}
    hi = [v for v, w in want.items() if w >= 18]
    lo = [v for v, w in want.items() if w <= 4]
    avg_hi = sum(out_deg.get(v, 0) for v in hi) / len(hi)
    avg_lo = sum(out_deg.get(v, 0) for v in lo) / len(lo)
    assert avg_hi > 2 * avg_lo
