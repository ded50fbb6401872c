"""Centrality measures beyond PageRank.

The reference ships eigenvector/Katz/harmonic/etc. through NetworKit on
a single node (/root/reference/app/.../graph_operations/NetworKit.scala,
sphynx/lynxkite-sphynx/networkit_compute_double_attribute.go:30-84).
Those that are power iterations distribute naturally as DataFrame
gather-scatter loops — same shape as PageRank (SURVEY.md §2.2 notes
"Eigenvector ≈ our PageRank loop without damping redistribution").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph


def eigenvector_centrality(
    graph: Graph,
    tol: float = 1e-6,
    max_iterations: int = 100,
    iterations: int | None = None,
) -> DataFrame:
    """Power iteration x' = A·x / ‖A·x‖₁ over the (weighted) adjacency;
    returns DataFrame[id, eigenvector] normalized to sum 1. Vertices with
    no in-edges converge to 0."""
    g = graph.with_weight()
    spark = g.vertices.sparkSession
    e = g.edges.select("src", "dst", "weight").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = g.vertices.select("id").persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("eigenvector", F.lit(0.0))
    x = vertices.select("id", F.lit(1.0 / n).alias("x")).localCheckpoint(eager=False)
    small = n <= 4_000_000
    limit = iterations if iterations is not None else max_iterations
    for k in range(limit):
        lookup = x.select(F.col("id").alias("src"), "x")
        gathered = e.join(F.broadcast(lookup) if small else lookup, "src")
        ax = gathered.groupBy("dst").agg(F.sum(F.col("x") * F.col("weight")).alias("ax"))
        ax = ax.persist(StorageLevel.MEMORY_AND_DISK)
        norm = ax.agg(F.sum(F.abs(F.col("ax"))).alias("n1"))
        new_x = (
            vertices.crossJoin(F.broadcast(norm))
            .join(ax, vertices.id == ax.dst, "left")
            .select(
                "id",
                F.when(F.col("n1") > 0, F.coalesce(F.col("ax"), F.lit(0.0)) / F.col("n1"))
                .otherwise(F.lit(0.0))
                .alias("x"),
            )
            .localCheckpoint(eager=False)
        )
        if iterations is None:
            delta = (
                new_x.alias("n")
                .join((F.broadcast(x) if small else x).alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.x") - F.col("o.x"))).alias("d"))
                .first()["d"]
            )
            ax.unpersist()
            x = new_x
            if delta is not None and delta < tol:
                break
        else:
            x = new_x
    e.unpersist()
    vertices.unpersist()
    return x.select("id", F.col("x").alias("eigenvector"))


def katz_centrality(
    graph: Graph,
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 20,
) -> DataFrame:
    """Katz: x' = α·Aᵀx + β, fixed iterations (converges for
    α < 1/λ_max). Returns DataFrame[id, katz]."""
    g = graph.with_weight()
    spark = g.vertices.sparkSession
    e = g.edges.select("src", "dst", "weight").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = g.vertices.select("id").persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    small = n <= 4_000_000
    x = vertices.select("id", F.lit(beta).alias("x")).localCheckpoint(eager=False)
    for _ in range(iterations):
        lookup = x.select(F.col("id").alias("src"), "x")
        gathered = e.join(F.broadcast(lookup) if small else lookup, "src")
        ax = gathered.groupBy("dst").agg(F.sum(F.col("x") * F.col("weight")).alias("ax"))
        x = (
            vertices.join(ax, vertices.id == ax.dst, "left")
            .select(
                "id",
                (F.lit(alpha) * F.coalesce(F.col("ax"), F.lit(0.0)) + F.lit(beta)).alias("x"),
            )
            .localCheckpoint(eager=False)
        )
    e.unpersist()
    vertices.unpersist()
    return x.select("id", F.col("x").alias("katz"))


def harmonic_centrality(
    graph: Graph, max_distance: int = 10
) -> DataFrame:
    """Exact harmonic centrality Σ 1/d(u,v) up to ``max_distance`` hops by
    iterated frontier expansion with distinct (source, vertex) pairs.

    NOTE: exact all-pairs state is O(n²) worst case — this is the
    small-graph path (the reference's equivalent runs in NetworKit on one
    node, i.e. the same budget); the 100 TB path would use HyperBall (HLL
    frontier sketches), out of the minimum slice (SURVEY.md §2.2)."""
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # reached[src_v, v, d]: shortest distance d from src_v to v (d ≤ cap)
    reached = graph.vertices.select(
        F.col("id").alias("root"), F.col("id").alias("v"), F.lit(0).alias("d")
    ).localCheckpoint(eager=False)
    frontier = reached
    total = None
    for d in range(1, max_distance + 1):
        nxt = (
            frontier.join(e, frontier.v == e.src)
            .select("root", F.col("dst").alias("v"), F.lit(d).alias("d"))
            .distinct()
        )
        frontier = (
            nxt.join(reached.select("root", "v"), ["root", "v"], "left_anti")
            .localCheckpoint(eager=False)
        )
        if frontier.limit(1).count() == 0:
            break
        reached = reached.unionByName(frontier).localCheckpoint(eager=False)
    harm = (
        reached.where(F.col("d") > 0)
        .groupBy("v")
        .agg(F.sum(1.0 / F.col("d")).alias("harmonic"))
    )
    e.unpersist()
    return (
        graph.vertices.select("id")
        .join(harm, graph.vertices.id == harm.v, "left")
        .select("id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )
