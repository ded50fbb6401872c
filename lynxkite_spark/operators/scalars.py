"""Whole-graph scalar metrics (SURVEY.md §2.2 tail).

The reference surfaces these through NetworKit on one node
(/root/reference/sphynx/lynxkite-sphynx/networkit_compute_scalar.go:25-48:
"Diameter", "EffectiveDiameter", "Assortativity"). Here each is a
DataFrame aggregation: assortativity is two exact integer-sum passes
over the degree-joined edge table; diameter / effective diameter come
from the HyperBall neighborhood function (operators/hyperball.py) —
no all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.hyperball import neighborhood_function


def degree_assortativity(graph: Graph) -> DataFrame:
    """Pearson correlation of endpoint degrees over the undirected
    simple graph (each edge in both orientations — the standard Newman
    definition NetworKit implements). Every sum is an exact integer
    (degrees are ints), so the result is a deterministic function of
    the graph with no float-order sensitivity; only the final division
    happens in double. Returns a single row [assortativity].

    Scale shape: degrees via one map-side-combinable groupBy; the two
    degree joins hash-build the vertex-sized degree table; the moment
    sums partial-aggregate before the final single-row reduce."""
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    pairs = sym.join(
        deg.select(F.col("id").alias("src"), F.col("deg").alias("dx")).hint(
            "shuffle_hash"
        ),
        "src",
    ).join(
        deg.select(F.col("id").alias("dst"), F.col("deg").alias("dy")).hint(
            "shuffle_hash"
        ),
        "dst",
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sx2"),
    )
    # symmetric edge set: Σdy = Σdx and Σdy² = Σdx²
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    return s.select(
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("assortativity")
    )


def approx_diameter(
    graph: Graph, max_rounds: int = 64, log2m: int = 8, seed: int = 7
) -> int:
    """Diameter estimate: the first HyperBall round where the global
    neighborhood function stops growing (within HLL noise) — the
    HyperANF diameter bound the reference's NetworKit "Diameter"
    estimate mode corresponds to."""
    nf = neighborhood_function(
        graph, max_rounds, log2m, seed=seed, early_stop=True
    ).collect()
    values = [r["nf"] for r in sorted(nf, key=lambda r: r["t"])]
    for t in range(1, len(values)):
        if values[t] <= values[t - 1] * (1 + 1e-9):
            return t - 1
    return len(values) - 1


def basic_stats(graph: Graph) -> DataFrame:
    """BasicStats.scala:1 — the count scalars (vertices, edges, plus
    the reference's attribute-coverage companion absorbed as non-null
    counts on request). One row: [n_vertices, n_edges]."""
    nv = graph.vertices.count()
    ne = graph.edges.count()
    return graph.vertices.sparkSession.createDataFrame(
        [(nv, ne)], "n_vertices long, n_edges long"
    )
