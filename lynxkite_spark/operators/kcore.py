"""k-core decomposition (coreness per vertex).

The reference exposes core decomposition through NetworKit
(/root/reference/sphynx/lynxkite-sphynx/networkit_compute_double_attribute.go:36
"CoreDecomposition"; box at /root/reference/app/.../frontend_operations/
GraphComputationOperations.scala:45-112) — a single-node in-memory
peeling. The distributed formulation here is Montresor-De Pellegrini-
Miorandi ("Distributed k-core decomposition", IEEE TPDS 2013): every
vertex keeps a coreness estimate, initialized to its degree, and
repeatedly lowers it to the h-index of its neighbors' estimates. The
estimates are monotonically non-increasing and converge to the exact
core numbers; each round is one gather (edges ⋈ estimates) plus one
per-vertex h-index, i.e. the same shuffle shape as a PageRank step.

The h-index is computed WITHOUT a raw-neighborhood window: neighbor
estimates are first capped at the vertex's own estimate (provably
equivalent under the subsequent least(est, h)) and histogrammed with a
map-side-combinable groupBy — a hub's million messages collapse to at
most #distinct-capped-values rows before any sort. The per-vertex
h = max over present values t of min(t, #neighbors with capped value
≥ t) (the classic h-index identity) runs on that small histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph


def h_index_per_vertex(msgs: DataFrame, est: DataFrame) -> DataFrame:
    """h-index of each vertex's gathered neighbor estimates,
    window-free on the raw neighborhood: msgs[id, n_est] → h[id, h].

    Neighbor estimates are first capped at the receiving vertex's own
    estimate (equivalent under the caller's least(est, h), and it bounds
    the per-vertex value domain), then histogrammed with a map-side-
    combinable groupBy. The only window runs over that small histogram:
    h = max over present values t of min(t, #neighbors ≥ t)."""
    capped = msgs.join(
        est.select("id", F.col("est").alias("_cap")).hint("shuffle_hash"), "id"
    ).select("id", F.least(F.col("n_est"), F.col("_cap")).alias("t"))
    hist = capped.groupBy("id", "t").agg(F.count(F.lit(1)).alias("c"))
    win = (
        W.partitionBy("id")
        .orderBy(F.col("t").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        hist.withColumn("cum", F.sum("c").over(win))
        .groupBy("id")
        .agg(F.max(F.least(F.col("t"), F.col("cum"))).alias("h"))
    )


def core_decomposition(graph: Graph, max_iterations: int = 100) -> DataFrame:
    """Exact core number per vertex on the undirected simple graph
    (direction ignored, loops and parallel edges dropped — NetworKit's
    CoreDecomposition convention). Returns DataFrame[id, core];
    isolated vertices have core 0.
    """
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vertices = graph.vertices.select("id").persist(StorageLevel.MEMORY_AND_DISK)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("est"))
    est = (
        vertices.join(deg, "id", "left")
        .select("id", F.coalesce("est", F.lit(0)).alias("est"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # gather neighbor estimates onto dst, then per-vertex h-index:
        # sorted desc, h = max(min(est_i, i))
        msgs = sym.join(
            est.select(F.col("id").alias("src"), F.col("est").alias("n_est")).hint(
                "shuffle_hash"
            ),
            "src",
        ).select(F.col("dst").alias("id"), "n_est")
        h = h_index_per_vertex(msgs, est)
        new_est = (
            est.join(h, "id", "left")
            .select(
                "id",
                F.least(F.col("est"), F.coalesce(F.col("h"), F.lit(0))).alias("est"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_est.alias("n")
            .join(est.alias("o"), "id")
            .where(F.col("n.est") != F.col("o.est"))
            .limit(1)
            .count()
        )
        est = new_est
        if changed == 0:
            break
    sym.unpersist()
    vertices.unpersist()
    return est.select("id", F.col("est").alias("core"))
