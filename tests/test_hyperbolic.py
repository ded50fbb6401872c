"""Tests for the hyperbolic (popularity x similarity) family."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.hyperbolic import (
    hyper_map,
    hyperbolic_distance,
    hyperbolic_edge_probability,
    hyperbolic_prediction,
    phi,
    pso_generate,
)


def test_phi_and_distance_formulas(spark):
    df = spark.range(1).select(
        phi(F.lit(0.5), F.lit(6.0)).alias("p"),
        hyperbolic_distance(F.lit(3.0), F.lit(0.5), F.lit(4.0), F.lit(1.5)).alias("d"),
    )
    row = df.first()
    # phi wraps around the circle
    expect_p = math.pi - abs(math.pi - abs(0.5 - 6.0))
    assert row["p"] == pytest.approx(expect_p)
    expect_d = 3.0 + 4.0 + 2 * math.log((math.pi - abs(math.pi - 1.0)) / 2)
    assert row["d"] == pytest.approx(expect_d)


@pytest.fixture(scope="module")
def pso(spark):
    v = spark.range(200).select(F.col("id"))
    coords, edges = pso_generate(v, external_degree=3.0, internal_degree=1.0,
                                 exponent=0.6, seed=11)
    return coords.cache(), edges.cache()


def test_pso_generate_shape(spark, pso):
    coords, edges = pso
    assert coords.count() == 200
    rows = coords.collect()
    assert all(0.0 <= r["angular"] < 2 * math.pi for r in rows)
    assert all(r["radial"] > 0 for r in rows)
    # symmetric, no self-loops, plausible density for m~3
    e = {(r["src"], r["dst"]) for r in edges.collect()}
    assert all((b, a) in e for a, b in e)
    assert all(a != b for a, b in e)
    n_und = len(e) / 2
    assert 200 <= n_und <= 200 * 8

    # scale-free-ish: popular (early, small radial) vertices get the
    # highest degrees
    deg = edges.groupBy("src").count()
    top = deg.orderBy(F.col("count").desc()).first()["count"]
    med = deg.agg(F.expr("percentile(count, 0.5)")).first()[0]
    assert top > 3 * med


def test_pso_generate_deterministic_and_partition_invariant(spark, pso):
    coords, edges = pso
    v = spark.range(200).select(F.col("id")).repartition(7)
    coords2, edges2 = pso_generate(v, external_degree=3.0, internal_degree=1.0,
                                   exponent=0.6, seed=11)
    assert {tuple(r) for r in coords.collect()} == {tuple(r) for r in coords2.collect()}
    assert {tuple(r) for r in edges.collect()} == {tuple(r) for r in edges2.collect()}


def test_edge_probability_orders_by_distance(spark, pso):
    coords, edges = pso
    g = Graph(vertices=coords.select("id"), edges=edges)
    probs = hyperbolic_edge_probability(g, coords)
    rows = probs.collect()
    assert len(rows) == edges.count()
    assert all(0.0 <= r["probability"] <= 1.0 for r in rows)
    # closer pairs (smaller hyperbolic distance) must get higher
    # probability: compare the extremes among sampled edges
    c = {r["id"]: (r["radial"], r["angular"]) for r in coords.collect()}

    def dist(a, b):
        p = math.pi - abs(math.pi - abs(c[a][1] - c[b][1]))
        return c[a][0] + c[b][0] + 2 * math.log(max(p, 1e-12) / 2)

    scored = sorted(((dist(r["src"], r["dst"]), r["probability"]) for r in rows))
    assert scored[0][1] > scored[-1][1]


def test_hyper_map_recovers_pso_geometry(spark, pso):
    """HyperMap.scala: fit (radial, angular) to a PSO-grown graph.  The
    embedding is only identified up to rotation/reflection, so the check
    is geometric: inferred hyperbolic distance over TRUE edges must be
    clearly smaller than over random non-edges, and radial must follow
    the degree ranking."""
    coords, edges = pso
    g = Graph(vertices=coords.select("id"), edges=edges)
    fitted = hyper_map(g, seed=5)
    assert fitted.count() == coords.count()
    c = {r["id"]: (r["radial"], r["angular"]) for r in fitted.collect()}
    assert all(v[0] > 0 for v in c.values())
    assert all(0 <= v[1] <= 2 * math.pi for v in c.values())

    def dist(a, b):
        p = math.pi - abs(math.pi - abs(c[a][1] - c[b][1]))
        return c[a][0] + c[b][0] + 2 * math.log(max(p, 1e-12) / 2)

    epairs = [(r["src"], r["dst"]) for r in edges.collect()]
    eset = set(epairs)
    ids = sorted(c)
    import random
    rng = random.Random(0)
    non = []
    while len(non) < len(epairs):
        a, b = rng.choice(ids), rng.choice(ids)
        if a != b and (a, b) not in eset:
            non.append((a, b))
    d_edge = sum(dist(a, b) for a, b in epairs) / len(epairs)
    d_non = sum(dist(a, b) for a, b in non) / len(non)
    assert d_edge < d_non - 1.0  # clear separation in avg distance

    # radial ordering = degree ordering (high degree -> small radius)
    from lynxkite_spark.operators.degrees import degree
    degs = {r["id"]: r["degree"]
            for r in degree(g, direction="all").collect()}
    hi = max(ids, key=lambda i: degs[i])
    lo = min(ids, key=lambda i: degs[i])
    assert c[hi][0] < c[lo][0]


def test_hyper_map_partition_invariant(spark, pso):
    coords, edges = pso
    g1 = Graph(vertices=coords.select("id"), edges=edges)
    g2 = Graph(vertices=coords.select("id").repartition(7),
               edges=edges.repartition(5))
    f1 = {tuple(r) for r in hyper_map(g1, seed=5).collect()}
    f2 = {tuple(r) for r in hyper_map(g2, seed=5).collect()}
    assert f1 == f2


def test_hyperbolic_prediction(spark, pso):
    coords, _edges = pso
    pred = hyperbolic_prediction(coords, size=25, external_degree=3.0,
                                 internal_degree=1.0, exponent=0.6)
    rows = pred.collect()
    assert len(rows) == 50  # 25 + symmetrization
    assert all(0.0 <= r["probability"] <= 1.0 for r in rows)
    pairs = {(r["src"], r["dst"]) for r in rows}
    assert all((b, a) in pairs for a, b in pairs)


def test_hyper_map_degenerate_graphs(spark):
    """Edgeless and 2-vertex graphs must not crash (r4 review): gamma
    falls back when no positive degrees exist, and ord >= 1 keeps
    radial = 2*ln(ord) finite even when floor(ln n) == 0."""
    edgeless = Graph(
        vertices=spark.createDataFrame([(1,), (2,)], "id long"),
        edges=spark.createDataFrame([], "src long, dst long"),
    )
    rows = hyper_map(edgeless, seed=1).collect()
    assert len(rows) == 2
    assert all(math.isfinite(r["radial"]) for r in rows)

    tiny = Graph(
        vertices=spark.createDataFrame([(1,), (2,)], "id long"),
        edges=spark.createDataFrame([(1, 2)], "src long, dst long"),
    )
    rows = hyper_map(tiny, seed=1).collect()
    assert len(rows) == 2
    assert all(math.isfinite(r["radial"]) and r["radial"] >= 0 for r in rows)
