"""Hyperbolic (popularity × similarity) operators — PSOGenerator.scala,
HyperbolicEdgeProbability.scala, HyperbolicPrediction.scala re-expressed
Spark-first (paper: Papadopoulos et al., "Popularity versus similarity
in growing networks", arXiv:1205.4384).

The reference COLLECTS the whole vertex set to the driver and walks a
linked list (PSOGenerator.scala:97-126) — single-node by construction.
Here the same candidate structure (each vertex meets its ~K angular
ring neighbors in both directions plus its K predecessors in appearance
order) is built distributed: a range-partitioned angular rank + an
appearance rank, one explode over step offsets, and two rank-equi-joins
— candidate volume Σ2K_i, never all-pairs, no driver collect.

Randomness is value-derived (hash of id and seed → angular), so
coordinates and edges are identical at any parallelism.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.attributes import add_ranking


def phi(a1: Column, a2: Column) -> Column:
    """Angular separation on the circle (HyperDistance.phi)."""
    pi = F.lit(math.pi)
    return pi - F.abs(pi - F.abs(a1 - a2))


def hyperbolic_distance(r1: Column, a1: Column, r2: Column, a2: Column) -> Column:
    """HyperDistance.hyperbolicDistance: r1 + r2 + 2·ln(φ/2)."""
    return r1 + r2 + 2 * F.log(phi(a1, a2) / 2)


def _epso_expected_degree(
    exponent: float, external: float, internal: float, n: int, ord_col: Column
) -> Column:
    """HyperDistance.totalExpectedEPSO / internalConnectionsEPSO."""
    beta = 1 - exponent
    first = (2 * internal * beta) / (
        (1 - float(n) ** (-beta)) ** 2 * (2 * exponent - 1)
    )
    second = F.pow(F.lit(float(n)) / ord_col, 2 * exponent - 1) - 1
    third = 1 - F.pow(ord_col.cast("double"), -beta)
    return F.lit(external) + F.lit(first) * second * third


def _ring_candidates(verts: DataFrame, n: int, log_size: float) -> DataFrame:
    """The reference's linked-list sample, columnar: for each vertex,
    K = ⌊log(n)·expectedDegree⌋ steps along the angular ring in both
    directions plus K steps back along appearance (ord) order.
    ``verts`` needs [id, ord, radial, angular, exp_deg, a_rank, o_rank]
    with ranks in 0..n-1. Returns candidate pairs with both endpoints'
    coordinates."""
    k = F.greatest(
        F.lit(1), F.floor(F.lit(log_size) * F.col("exp_deg")).cast("long")
    )
    steps = verts.withColumn("_k", k).select(
        "id", "ord", "radial", "angular", "exp_deg", "a_rank", "o_rank",
        F.explode(F.sequence(F.lit(1), F.col("_k"))).alias("_j"),
    )
    targets = steps.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    F.lit("a").alias("kind"),
                    F.pmod(F.col("a_rank") + F.col("_j"), F.lit(n)).alias("t"),
                ),
                F.struct(
                    F.lit("a").alias("kind"),
                    F.pmod(F.col("a_rank") - F.col("_j"), F.lit(n)).alias("t"),
                ),
                F.struct(
                    F.lit("o").alias("kind"),
                    (F.col("o_rank") - F.col("_j")).alias("t"),
                ),
            )
        ).alias("_tgt"),
    ).select(
        F.col("id").alias("src"), F.col("radial").alias("r1"),
        F.col("angular").alias("a1"), F.col("exp_deg"),
        "_tgt.kind", "_tgt.t",
    ).where(F.col("t") >= 0)
    dst_a = verts.select(
        F.lit("a").alias("kind"), F.col("a_rank").alias("t"),
        F.col("id").alias("dst"), F.col("radial").alias("r2"),
        F.col("angular").alias("a2"),
    )
    dst_o = verts.select(
        F.lit("o").alias("kind"), F.col("o_rank").alias("t"),
        F.col("id").alias("dst"), F.col("radial").alias("r2"),
        F.col("angular").alias("a2"),
    )
    return (
        targets.join(dst_a.unionByName(dst_o), ["kind", "t"])
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _with_coords(
    vertices: DataFrame, seed: int, n: int, exponent: float,
    external_degree: float, internal_degree: float,
) -> DataFrame:
    """PSOGenerator.scala:72-93: ord = appearance rank + ⌊ln n⌋
    (popularity fading), radial = 2·ln(ord), angular value-derived
    uniform on [0, 2π)."""
    log_size = math.log(n)
    ranked = add_ranking(vertices.select("id"), "o_rank", "id")
    u = (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1 << 40))
         / F.lit(float(1 << 40)))
    verts = ranked.select(
        "id", "o_rank",
        (F.col("o_rank") + int(log_size)).cast("double").alias("ord"),
        (u * 2 * math.pi).alias("angular"),
    ).withColumn("radial", 2 * F.log(F.greatest(F.col("ord"), F.lit(1.0))))
    verts = verts.withColumn(
        "exp_deg",
        _epso_expected_degree(exponent, external_degree, internal_degree, n,
                              F.col("ord")),
    )
    return add_ranking(verts, "a_rank", "angular")


def pso_generate(
    vertices: DataFrame,
    external_degree: float = 2.0,
    internal_degree: float = 1.0,
    exponent: float = 0.6,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """PSOGenerator.scala:50-143 — scale-free, high-clustering edges
    from the E-PSO model: for each vertex keep the ⌊expectedDegree⌋
    hyperbolically-nearest candidates, then symmetrize.

    Returns (coords[id, radial, angular], edges[src, dst])."""
    n = vertices.count()
    verts = _with_coords(
        vertices, seed, n, exponent, external_degree, internal_degree
    ).localCheckpoint(eager=False)
    cand = _ring_candidates(verts, n, math.log(n))
    scored = cand.withColumn(
        "_d",
        hyperbolic_distance(F.col("r1"), F.col("a1"), F.col("r2"), F.col("a2")),
    )
    w = W.partitionBy("src").orderBy(F.col("_d").asc(), F.col("dst").asc())
    picked = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.greatest(F.floor("exp_deg"), F.lit(1)))
        .select("src", "dst")
    )
    sym = picked.unionByName(
        picked.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return verts.select("id", "radial", "angular"), sym


def hyperbolic_edge_probability(
    graph: Graph, coords: DataFrame
) -> DataFrame:
    """HyperbolicEdgeProbability.scala:40-110 — per-edge connection
    probability given hyperbolic coordinates; temperature inferred from
    the average clustering coefficient, exponent from the degree
    distribution's log-log endpoints, like the reference.
    Returns edges + probability."""
    from lynxkite_spark.operators.clustering import clustering_coefficient
    from lynxkite_spark.operators.degrees import degree

    n = coords.count()
    avg_clus = clustering_coefficient(graph).agg(
        F.sum("clustering_coefficient")
    ).first()[0] / n
    guess = (0.9 - avg_clus) * 4 + 0.1
    temperature = guess if 0 < guess < 0.85 else 0.85
    deg = degree(graph, direction="all")
    stats = deg.where(F.col("degree") > 0).agg(
        F.max("degree").alias("hi"), F.min("degree").alias("lo")
    ).first()
    avg_deg = deg.agg(F.avg("degree")).first()[0]
    bottom_count = deg.where(F.col("degree") == stats["lo"]).count()
    if stats["hi"] > stats["lo"]:
        gamma = math.log(bottom_count) / (
            math.log(stats["hi"]) - math.log(stats["lo"])
        )
    else:
        gamma = 0.0
    exponent = 1 / (gamma - 1) if 2 < gamma < 3 else 0.6

    ranked = add_ranking(coords, "_or", "radial").select(
        "id", "radial", "angular", (F.col("_or") + 1).cast("double").alias("ord")
    )
    e = graph.edges.select("src", "dst")
    src_c = ranked.select(F.col("id").alias("src"), F.col("radial").alias("r1"),
                          F.col("angular").alias("a1"), F.col("ord").alias("o1"))
    dst_c = ranked.select(F.col("id").alias("dst"), F.col("radial").alias("r2"),
                          F.col("angular").alias("a2"))
    joined = e.join(src_c, "src").join(dst_c, "dst")
    return joined.select(
        "src", "dst",
        _probability(temperature, exponent, avg_deg).alias("probability"),
    )


def _probability(temperature: float, exponent: float, external: float) -> Column:
    """HyperDistance.probability/expectedConnections over columns
    r1/a1/o1 (source, with appearance rank) and r2/a2 (target)."""
    dist = hyperbolic_distance(F.col("r1"), F.col("a1"), F.col("r2"), F.col("a2"))
    inv_exp = (1 / (1 - exponent)) * (1 - F.pow(F.col("o1"), -(1 - exponent)))
    first = (2 * temperature) / math.sin(temperature * math.pi)
    arg = F.lit(first) * inv_exp / external
    # Java math.log(0) is -Infinity (the reference's path for the
    # radial-minimal vertex, whose inverseExponent is exactly 0 →
    # expected = +inf → probability 1); Spark's log(0) is NULL, so the
    # boundary is restored explicitly
    expected = F.col("r1") - 2 * F.log(arg)
    return F.when(arg <= 0, F.lit(1.0)).otherwise(
        1 / (1 + F.exp((1 / (2 * temperature)) * (dist - expected)))
    )


def hyperbolic_prediction(
    coords: DataFrame,
    size: int,
    external_degree: float = 2.0,
    internal_degree: float = 1.0,
    exponent: float = 0.6,
) -> DataFrame:
    """HyperbolicPrediction.scala:53-150 — most-likely extra edges from
    existing coordinates: PSO candidate structure, probability at the
    reference's pinned temperature 0.45, per-source ⌊expectedDegree⌋
    best, then global top-``size``, symmetrized.
    Returns DataFrame[src, dst, probability]."""
    n = coords.count()
    log_size = math.log(n)
    ranked = add_ranking(coords, "_or", "radial")
    verts = ranked.select(
        "id", "radial", "angular",
        (F.col("_or") + 1).cast("double").alias("ord"),
        F.col("_or").alias("o_rank"),
    ).withColumn(
        "exp_deg",
        _epso_expected_degree(exponent, external_degree, internal_degree, n,
                              F.col("ord")),
    )
    verts = add_ranking(verts, "a_rank", "angular").localCheckpoint(eager=False)
    cand = _ring_candidates(verts, n, log_size)
    src_ord = verts.select(F.col("id").alias("src"), F.col("ord").alias("o1"))
    scored = cand.join(src_ord, "src").select(
        "src", "dst",
        _probability(0.45, exponent, external_degree).alias("probability"),
        "exp_deg",
    )
    w = W.partitionBy("src").orderBy(F.col("probability").desc(), F.col("dst"))
    per_src = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.greatest(F.floor("exp_deg"), F.lit(1)))
    )
    top = per_src.orderBy(F.col("probability").desc(), "src", "dst").limit(size)
    return top.select("src", "dst", "probability").unionByName(
        top.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                   "probability")
    )
