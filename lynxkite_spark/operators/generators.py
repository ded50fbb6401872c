"""Deterministic distributed graph generators.

The reference generates synthetic graphs via NetworKit (Erdős-Rényi,
Barabási-Albert, hyperbolic, …; sphynx/lynxkite-sphynx/
networkit_create_graph.go:22-89) and two Spark-side generators
(FastRandomEdgeBundle.scala, ScaleFreeEdgeBundle.scala). Ours are
value-derived — edge existence is a pure function of (ids, seed) via
xxhash64 — so any parallelism level generates the identical graph, and
generation is a single declarative plan (no RNG state, no collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph


def create_vertex_set(spark: SparkSession, n: int) -> DataFrame:
    """CreateVertexSet.scala — just a range."""
    return spark.range(n).select(F.col("id"))


def erdos_renyi(spark: SparkSession, n: int, avg_degree: float, seed: int = 42) -> Graph:
    """G(n, p) with p = avg_degree/n, sampled value-derived: for each
    vertex, draw ~avg_degree candidate targets by hashing (src, slot,
    seed) — O(n·d) work, no n² pair enumeration, no RNG state.

    (Slightly multinomial rather than exact binomial per pair — same
    degree distribution in expectation; documented deviation.)"""
    k = max(int(avg_degree * 2), 1)  # 2x slots, thinned by a keep-hash
    v = spark.range(n).select(F.col("id").alias("src"))
    slots = v.select("src", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"))
    h_target = F.abs(F.xxhash64("src", "slot", F.lit(seed))) % n
    h_keep = (F.abs(F.xxhash64("src", "slot", F.lit(seed + 1))) % 1000) / 1000.0
    edges = (
        slots.select(
            "src",
            h_target.alias("dst"),
            h_keep.alias("_k"),
        )
        .where((F.col("_k") < F.lit(avg_degree / k)) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    return Graph(vertices=spark.range(n).select("id"), edges=edges)


def scale_free(spark: SparkSession, n: int, out_degree: int = 3, seed: int = 42) -> Graph:
    """ScaleFreeEdgeBundle.scala analog — preferential-attachment-shaped
    graph, value-derived: vertex i links to ⌊u²·i⌋ for ``out_degree``
    hashes u, skewing targets toward low ids (early vertices accumulate
    degree ∝ power law, the Barabási-Albert shape without sequential
    attachment)."""
    v = spark.range(1, n).select(F.col("id").alias("src"))
    slots = v.select(
        "src", F.explode(F.sequence(F.lit(0), F.lit(out_degree - 1))).alias("slot")
    )
    u = (F.abs(F.xxhash64("src", "slot", F.lit(seed))) % 1_000_000) / 1_000_000.0
    target = F.floor(u * u * F.col("src")).cast("long")
    edges = (
        slots.select("src", target.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return Graph(vertices=spark.range(n).select("id"), edges=edges)


def chung_lu(
    spark: SparkSession,
    degrees: DataFrame,
    seed: int = 42,
    id_col: str = "id",
    degree_col: str = "degree",
) -> Graph:
    """Chung-Lu expected-degree model (the NetworKit generator menu,
    networkit_create_graph.go:22-89): edge (u,v) appears with
    probability min(1, w_u·w_v / S) where S = Σ w. Value-derived
    sampling, O(Σw·d̄) not O(n²): each vertex u draws ~w_u candidate
    endpoints weighted by w_v via hash-ranked sampling against a
    degree-proportional slot table — every candidate pair's existence
    is a pure function of (u, slot, seed), identical at any
    parallelism."""
    degs = degrees.select(
        F.col(id_col).alias("id"), F.col(degree_col).cast("long").alias("w")
    ).where(F.col("w") > 0)
    # slot table: vertex v occupies w_v slots; a hash over (u, slot)
    # picks the endpoint — sampling v with probability w_v / S
    slots = degs.select(
        "id", F.explode(F.sequence(F.lit(1), F.col("w"))).alias("slot_i")
    ).withColumn("slot", F.row_number().over(W.orderBy("id", "slot_i")) - 1)
    # NOTE: the global slot numbering is a one-off setup window (the
    # generator builds a fixture, not a recurring pipeline stage); at
    # true scale replace with the add_ranking two-pass offset trick
    total = slots.count()
    # each u draws w_u candidates
    draws = degs.select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.col("w"))).alias("d"),
    ).withColumn(
        "slot", F.pmod(F.xxhash64("src", "d", F.lit(seed)), F.lit(total))
    )
    edges = (
        draws.join(slots.select("slot", F.col("id").alias("dst")), "slot")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(vertices=degrees.select(F.col(id_col).alias("id")), edges=edges)
