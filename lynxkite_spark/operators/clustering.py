"""Clustering coefficient, embeddedness, modularity — the triangle-adjacent
metrics (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.triangles import canonical_edges, triangle_count


def clustering_coefficient(graph: Graph) -> DataFrame:
    """ClusteringCoefficient.scala:56-90 — exact local clustering
    coefficient over the *union* of in/out neighborhoods with loops
    dropped: closed wedges / possible wedges; vertices with <2 neighbors
    get 1.0 (the reference defines them as fully clustered).

    Expressed via the triangle machinery: coeff(v) =
    2·triangles(v) / (deg(v)·(deg(v)−1)) on the undirected simple graph.
    """
    und = canonical_edges(graph.edges)  # distinct undirected pairs, no loops
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(graph)
    return (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) < 2, F.lit(1.0)
            ).otherwise(
                2.0 * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1))
            ).alias("clustering_coefficient"),
        )
    )


def embeddedness(graph: Graph) -> DataFrame:
    """Embeddedness.scala — per edge, the number of mutual neighbors of
    its endpoints (undirected neighborhoods, loops dropped).
    Returns DataFrame[src, dst, embeddedness]."""
    und = canonical_edges(graph.edges)
    nbr = und.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    left = nbr.select(F.col("v").alias("src"), F.col("n"))
    right = nbr.select(F.col("v").alias("dst"), F.col("n"))
    mutual = (
        e.join(left, "src").join(right, ["dst", "n"])
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("embeddedness"))
    )
    return e.join(mutual, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("embeddedness", F.lit(0)).alias("embeddedness")
    )


def modularity(graph: Graph, belongs_to: DataFrame, label_col: str = "label") -> float:
    """Modularity.scala:quality of a partition:
    Q = Σ_c [ inside_c/|E| − (deg_out_c · deg_in_c)/|E|² ] on the directed
    multigraph. A good convergence-quality metric for LPA output."""
    e = graph.edges.select("src", "dst")
    m = e.count()
    if m == 0:
        return 0.0
    lab = belongs_to.select("id", F.col(label_col).alias("_c"))
    e2 = (
        e.join(lab.withColumnRenamed("id", "src").withColumnRenamed("_c", "c_src"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("_c", "c_dst"), "dst")
    )
    inside = e2.where(F.col("c_src") == F.col("c_dst")).groupBy("c_src").agg(
        F.count(F.lit(1)).alias("inside")
    )
    deg_out = e2.groupBy("c_src").agg(F.count(F.lit(1)).alias("dout"))
    deg_in = e2.groupBy("c_dst").agg(F.count(F.lit(1)).alias("din"))
    per_c = (
        deg_out.join(deg_in, deg_out.c_src == deg_in.c_dst, "full")
        .select(
            F.coalesce("c_src", "c_dst").alias("c"),
            F.coalesce("dout", F.lit(0)).alias("dout"),
            F.coalesce("din", F.lit(0)).alias("din"),
        )
        .join(inside.withColumnRenamed("c_src", "c"), "c", "left")
        .select(
            (
                F.coalesce("inside", F.lit(0)) / F.lit(m)
                - (F.col("dout") * F.col("din")) / F.lit(float(m) ** 2)
            ).alias("q")
        )
    )
    return per_c.agg(F.sum("q")).first()[0]


def dispersion(graph: Graph) -> DataFrame:
    """Dispersion.scala — Backstrom-Kleinberg dispersion per edge: among
    the common neighbors C(u,v) of an edge's endpoints, the number of
    pairs {s,t} that are not themselves adjacent ("absolute dispersion",
    the recognizer of romantic ties in the original paper).
    Returns DataFrame[src, dst, dispersion] over distinct undirected edges.
    """
    und = canonical_edges(graph.edges)
    nbr = und.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    # common neighbors of each edge (u,v): s adjacent to both
    left = nbr.select(F.col("v").alias("a"), F.col("n"))
    right = nbr.select(F.col("v").alias("b"), F.col("n"))
    cn = (
        und.join(left, "a")
        .join(right, ["b", "n"])
        .select("a", "b", F.col("n").alias("s"))
    )
    # pairs of common neighbors
    pairs = (
        cn.alias("x")
        .join(cn.alias("y"), ["a", "b"])
        .where(F.col("x.s") < F.col("y.s"))
        .select("a", "b", F.col("x.s").alias("s"), F.col("y.s").alias("t"))
    )
    adj = und.select(F.col("a").alias("s"), F.col("b").alias("t"))
    non_adj = pairs.join(adj, ["s", "t"], "left_anti")
    disp = non_adj.groupBy("a", "b").agg(F.count(F.lit(1)).alias("dispersion"))
    return und.join(disp, ["a", "b"], "left").select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.coalesce("dispersion", F.lit(0)).alias("dispersion"),
    )
