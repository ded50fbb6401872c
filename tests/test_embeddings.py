"""Tests for operators/embeddings.py (Node2Vec-without-torch + PCA)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.embeddings import (
    node2vec_embedding,
    pca_embedding,
    random_walks,
)


@pytest.fixture(scope="module")
def two_cliques(spark):
    """Two 6-cliques joined by a single bridge edge."""
    edges = []
    for base in (0, 6):
        for i in range(6):
            for j in range(6):
                if i != j:
                    edges.append(Row(src=base + i, dst=base + j))
    edges.append(Row(src=0, dst=6))
    edges.append(Row(src=6, dst=0))
    v = spark.createDataFrame([Row(id=i) for i in range(12)])
    return Graph(vertices=v, edges=spark.createDataFrame(edges))


def test_random_walks_shape_and_determinism(spark, two_cliques):
    walks = random_walks(two_cliques, walk_length=5, walks_per_node=2, seed=7)
    rows = walks.collect()
    assert len(rows) == 24  # 12 vertices x 2 walks
    assert all(len(r["walk"]) == 5 for r in rows)
    # every step is a real neighbor of the previous vertex
    adj = {}
    for e in two_cliques.edges.collect():
        adj.setdefault(e["src"], set()).add(e["dst"])
    for r in rows:
        w = [int(x) for x in r["walk"]]
        for a, b in zip(w, w[1:]):
            assert b in adj[a]
    # deterministic + partition-invariant
    again = {r["walker_id"]: r["walk"] for r in random_walks(
        Graph(vertices=two_cliques.vertices.repartition(5),
              edges=two_cliques.edges.repartition(5)),
        walk_length=5, walks_per_node=2, seed=7).collect()}
    assert {r["walker_id"]: r["walk"] for r in rows} == again


def test_random_walks_deadend_self_loops(spark):
    """A vertex with no outgoing edges must self-loop, not vanish
    (node2vec.py:15-22)."""
    g = Graph(
        vertices=spark.createDataFrame([Row(id=0), Row(id=1)]),
        edges=spark.createDataFrame([Row(src=0, dst=1)]),
    )
    rows = random_walks(g, walk_length=4, walks_per_node=1).collect()
    w1 = next(r["walk"] for r in rows if r["walk"][0] == "1")
    assert w1 == ["1", "1", "1", "1"]


def test_node2vec_separates_cliques(spark, two_cliques):
    emb = {r["id"]: r["embedding"] for r in node2vec_embedding(
        two_cliques, dimensions=8, walk_length=8, walks_per_node=6,
        context_size=3, iterations=2, seed=5).collect()}
    assert set(emb) == set(range(12))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb + 1e-12)

    within = [cos(emb[i], emb[j]) for i in range(6) for j in range(6) if i < j]
    within += [cos(emb[i], emb[j]) for i in range(6, 12) for j in range(6, 12) if i < j]
    across = [cos(emb[i], emb[j]) for i in range(6) for j in range(6, 12)]
    assert sum(within) / len(within) > sum(across) / len(across)


def test_pca_matches_numpy(spark):
    import numpy as np

    # deterministic anisotropic cloud: dominant axis = (1, 1, 0)-ish
    pts = []
    for i in range(60):
        t = (i * 37 % 60) / 10.0 - 3.0
        n1 = ((i * 7919) % 100) / 500.0
        n2 = ((i * 104729) % 100) / 500.0
        pts.append(Row(vec_id=i, embedding=[t + n1, t - n1, n2]))
    df = spark.createDataFrame(pts)
    out = {r["id"]: r["embedding"] for r in pca_embedding(
        df, dimensions=2).collect()}
    X = np.array([p.embedding for p in pts])
    Xc = X - X.mean(axis=0)
    # numpy reference: eigendecomposition of the covariance
    cov = Xc.T @ Xc / (len(pts) - 1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    P = np.array([out[i] for i in range(60)])
    # projections are centered and their variances match the top
    # eigenvalues (signs/rotations are implementation-defined)
    assert np.allclose(P.mean(axis=0), 0, atol=1e-6)
    got_var = np.sort(P.var(axis=0, ddof=1))[::-1]
    assert np.allclose(got_var, evals[:2], rtol=1e-6)
    # total captured variance dominates: axis 3 is pure noise
    assert got_var.sum() / evals.sum() > 0.95


def test_tsne_separates_clusters(spark):
    """Exact-gradient numpy t-SNE (sphynx/python/tsne.py analog): three
    well-separated 16-D gaussian blobs must land in three separated 2-D
    clusters, deterministically for a fixed seed."""
    import numpy as np

    from lynxkite_spark.operators.embeddings import tsne_embedding

    rng = np.random.default_rng(3)
    centers = np.eye(3).repeat(6, axis=1)[:, :16] * 12.0  # far apart
    X = np.vstack([centers[i // 30] + rng.normal(size=16) * 0.3
                   for i in range(90)])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(90)],
        "vec_id long, embedding array<double>",
    )
    out = tsne_embedding(df, dimensions=2, perplexity=10, seed=5)
    got = {r["id"]: np.array(r["embedding"]) for r in out.collect()}
    assert len(got) == 90 and all(len(v) == 2 for v in got.values())
    Y = np.array([got[i] for i in range(90)])
    labels = np.arange(90) // 30
    # intra-cluster spread far below inter-centroid distance
    cent = np.array([Y[labels == c].mean(axis=0) for c in range(3)])
    intra = max(np.linalg.norm(Y[labels == c] - cent[c], axis=1).mean()
                for c in range(3))
    inter = min(np.linalg.norm(cent[a] - cent[b])
                for a in range(3) for b in range(a + 1, 3))
    assert inter > 3 * intra
    # determinism
    out2 = tsne_embedding(df, dimensions=2, perplexity=10, seed=5)
    got2 = {r["id"]: r["embedding"] for r in out2.collect()}
    assert all(np.allclose(got[i], got2[i]) for i in range(90))


def test_tsne_guards(spark):
    import numpy as np

    from lynxkite_spark.operators.embeddings import tsne_embedding

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="max_rows"):
        tsne_embedding(df, max_rows=10)
    with pytest.raises(ValueError, match="at least 4"):
        tsne_embedding(df.where(F.col("vec_id") < 3))
