"""Degree operators.

Reference: /root/reference/app/.../graph_operations/OutDegree.scala:32-37
(count per src, 0 for vertices with no edges) wrapped by the frontend's
Direction choice (GraphComputationOperations.scala:291-306,
Operations.scala:413-448): out / in / all (="incoming and outgoing") /
symmetric (= min of each direction's multiplicity per neighbor pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph


def degree(graph: Graph, direction: str = "out") -> DataFrame:
    """Returns DataFrame[id: long, degree: long]; isolated vertices get 0."""
    e = graph.edges.select("src", "dst")
    if direction == "out":
        ends = e.select(F.col("src").alias("id"))
    elif direction == "in":
        ends = e.select(F.col("dst").alias("id"))
    elif direction == "all":
        ends = e.select(F.col("src").alias("id")).unionAll(
            e.select(F.col("dst").alias("id"))
        )
    elif direction == "symmetric":
        # per unordered pair: min(#a→b, #b→a), counted for both endpoints
        cnt = e.groupBy("src", "dst").count()
        rev = cnt.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("count").alias("rcount")
        )
        sym = cnt.join(rev, ["src", "dst"]).select(
            "src", F.least("count", "rcount").alias("m")
        )
        out = sym.groupBy("src").agg(F.sum("m").alias("degree"))
        return (
            graph.vertices.select("id")
            .join(out.select(F.col("src").alias("id"), "degree"), "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    counts = ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
    )
