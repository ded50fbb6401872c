"""Single-source(-set) shortest path by distributed Bellman-Ford.

Reference: /root/reference/app/.../graph_operations/ShortestPath.scala:27-66
— relax all edges each round (dist' = min(dist, min over in-neighbors
dist+w)), stop when the (count, sum) state signature is unchanged or
after ``max_iterations`` rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph


def shortest_path(
    graph: Graph,
    sources: DataFrame,
    max_iterations: int = 20,
    weighted: bool = False,
) -> DataFrame:
    """``sources``: DataFrame[id, distance] starting distances
    (ShortestPath.scala's startingDistance attribute). Returns
    DataFrame[id, distance] for *reached* vertices only (the reference's
    output attribute is partial — unreachable vertices stay undefined)."""
    g = graph.with_weight()
    e = g.edges.select("src", "dst", "weight" if weighted else F.lit(1.0).alias("weight"))
    from lynxkite_spark.plans.checkpoint import materialize

    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    dist = materialize(sources.select("id", F.col("distance").cast("double")))
    state = dist.agg(
        F.count(F.lit(1)).alias("n"), F.sum("distance").alias("s")
    ).first()
    for it in range(max_iterations):
        relaxed = (
            e.join(dist.hint("shuffle_hash"), e.src == dist.id)
            .select(F.col("dst").alias("id"), (F.col("distance") + F.col("weight")).alias("distance"))
        )
        new_dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
            .localCheckpoint(eager=False)  # materialized by the state check
        )
        new_state = new_dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("distance").alias("s")
        ).first()
        dist = new_dist
        if (new_state["n"], new_state["s"]) == (state["n"], state["s"]):
            break
        state = new_state
    e.unpersist()
    return dist
