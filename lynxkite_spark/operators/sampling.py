"""Random-walk graph sampling.

Reference: /root/reference/app/.../graph_operations/RandomWalkSample.scala
(203 LoC) — many parallel walkers start from random vertices, walk with a
geometric abortion probability, and the visited set is the sample
(outputs `vertexFirstVisited` / `edgeFirstTraversed` order attributes,
RandomWalkSample.scala:30-33). Its randomness is seed + partition
dependent.

This engine's variant keeps the walker/step/restart shape but replaces
the RNG with value-derived pseudo-randomness (``xxhash64`` of
(seed, walker, step, candidate)) so the sample is **identical at any
parallelism** — the same discipline as the rest of the engine
(SURVEY.md §4.2). Each step is one gather join (walkers ⋈ edges) plus a
per-walker ``max_by`` — the same shuffle shape as PageRank, so it scales
the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph


def random_walk_sample(
    graph: Graph,
    num_walkers: int = 8,
    max_steps: int = 20,
    restart_probability: float = 0.15,
    seed: int = 42,
) -> DataFrame:
    """Deterministic random-walk sample.

    ``num_walkers`` walkers start from the hash-minimal vertices; each
    step every walker either restarts at its start vertex (when the step
    hash falls below ``restart_probability``) or moves to the neighbor
    with the maximal step hash. Returns DataFrame[id, first_visited]
    where ``first_visited`` is the earliest step the vertex was visited
    (the reference's `vertexFirstVisited` semantics); unvisited vertices
    are absent.
    """
    assert 0.0 <= restart_probability < 1.0
    e = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    starts = (
        graph.vertices.select("id")
        .orderBy(F.xxhash64(F.lit(seed), "id"))
        .limit(num_walkers)
        .select(
            F.row_number().over(Window.orderBy("id")).alias("walker"),
            F.col("id").alias("start"),
        )
    )
    # walkers[walker, start, pos]
    walkers = starts.select("walker", "start", F.col("start").alias("pos"))
    walkers = walkers.localCheckpoint(eager=True)
    visited = walkers.select(F.col("pos").alias("id"), F.lit(0).alias("first_visited"))
    visited = visited.localCheckpoint(eager=True)
    for step in range(1, max_steps + 1):
        moved = (
            walkers.join(e, walkers.pos == e.src, "left")
            .groupBy("walker", "start", "pos")
            .agg(
                F.max_by(
                    "dst", F.xxhash64(F.lit(seed), F.lit(step), F.col("walker"), F.col("dst"))
                ).alias("nxt")
            )
        )
        restart = (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(step), F.col("walker")), F.lit(10_000))
            < F.lit(int(restart_probability * 10_000))
        )
        walkers = moved.select(
            "walker",
            "start",
            F.when(restart | F.col("nxt").isNull(), F.col("start"))
            .otherwise(F.col("nxt"))
            .alias("pos"),
        ).localCheckpoint(eager=True)
        visited = (
            visited.unionByName(
                walkers.select(F.col("pos").alias("id"), F.lit(step).alias("first_visited"))
            )
            .groupBy("id")
            .agg(F.min("first_visited").alias("first_visited"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return visited
