"""Sampled-source Brandes betweenness and closeness centrality.

The reference exposes both through NetworKit on one node
(/root/reference/sphynx/lynxkite-sphynx/networkit_compute_double_attribute.go:30-84
"Betweenness", "Closeness"; boxes in app/.../frontend_operations/
GraphComputationOperations.scala). Exact Brandes is O(V·E); the
distributable formulation is k-source Brandes (Brandes & Pich 2007,
"Centrality estimation in large networks"): run the forward
BFS/σ-counting and backward dependency accumulation from k sampled
roots SIMULTANEOUSLY — every DataFrame carries a ``root`` column, so
one round of the loop advances all k sources at once and the shuffle
volume is k·|frontier|, never |V|².

Forward (per hop): frontier σ-messages flow along edges, partial σ
sums combine map-side; visited set checked with a left-anti join.
Backward (per depth, deepest first): δ(v) += Σ_{w∈succ(v)}
σ(v)/σ(w) · (1 + δ(w)) — one join of the depth-d+1 state against the
reversed edges per level.

Root sampling is value-derived (smallest xxhash64(id, seed)) —
deterministic at any parallelism. The returned score scales the sum of
sampled dependencies by n/k (the standard unbiased estimator); with
k ≥ n every vertex is a root and the result is exact Brandes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph


def _sample_roots(vertices: DataFrame, k: int, seed: int) -> DataFrame:
    return (
        vertices.select("id", F.xxhash64("id", F.lit(seed)).alias("_h"))
        .orderBy("_h", "id")
        .limit(k)
        .select(F.col("id").alias("root"))
    )


def _forward_bfs(
    e: DataFrame, roots: DataFrame, max_depth: int
) -> tuple[DataFrame, int]:
    """Multi-root BFS with path counting. Returns (state, reached_depth);
    state = DataFrame[root, id, d, sigma] for every reached (root, id)."""
    frontier = roots.select(
        "root", F.col("root").alias("id"), F.lit(0).alias("d"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    state = frontier
    depth = 0
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .groupBy("root", F.col("dst").alias("nid"))
            .agg(F.sum("sigma").alias("sigma"))
            .select("root", F.col("nid").alias("id"), F.lit(d).alias("d"), "sigma")
        )
        frontier = nxt.join(
            state.select("root", "id"), ["root", "id"], "left_anti"
        ).localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:
            break
        depth = d
        state = state.unionByName(frontier).localCheckpoint(eager=True)
    return state, depth


def betweenness_centrality(
    graph: Graph,
    k: int = 16,
    max_depth: int = 10,
    seed: int = 11,
    normalized: bool = False,
    roots: DataFrame | None = None,
) -> DataFrame:
    """Sampled-source Brandes over the undirected simple graph
    (NetworKit's Betweenness convention: directed=false). Returns
    DataFrame[id, betweenness] — δ-dependencies summed over k roots,
    scaled by n/k (exact when k ≥ n)."""
    # NOT pre-partitioned (tried in r6, reverted): pinning src- and
    # dst-partitioned copies saved the per-hop exchanges of the edge
    # table but disabled AQE's coalescing of the frontier-join stages,
    # which made the σ-sum partial aggregation compress worse — net
    # shuffle GREW (330→373 MB at sf0.1) and walls were flat-to-worse
    # across repeated A/B runs. Same effect as hyperball's merge join.
    e0 = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    e = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vertices = graph.vertices.select("id").persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    if roots is None:
        k_eff = min(k, n)
        roots = _sample_roots(vertices, k_eff, seed)
    else:
        roots = roots.select(F.col(roots.columns[0]).alias("root"))
        k_eff = roots.count()
    roots = roots.localCheckpoint(eager=True)
    state, depth = _forward_bfs(e, roots, max_depth)
    state = state.persist(StorageLevel.MEMORY_AND_DISK)

    # backward accumulation, deepest level first; delta starts at 0
    delta = state.select("root", "id", "d", "sigma", F.lit(0.0).alias("delta"))
    delta = delta.localCheckpoint(eager=True)
    for d in range(depth - 1, -1, -1):
        succ = delta.where(F.col("d") == d + 1).select(
            "root",
            F.col("id").alias("dst"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        # v at depth d contributes along v→w edges to w at depth d+1
        contrib = (
            succ.join(e, "dst")
            .groupBy("root", F.col("src").alias("id"))
            .agg(
                F.sum((F.lit(1.0) + F.col("delta_w")) / F.col("sigma_w")).alias("_c")
            )
        )
        delta = (
            delta.join(contrib.hint("shuffle_hash"), ["root", "id"], "left")
            .select(
                "root",
                "id",
                "d",
                "sigma",
                F.when(
                    F.col("d") == d,
                    F.col("delta") + F.col("sigma") * F.coalesce("_c", F.lit(0.0)),
                )
                .otherwise(F.col("delta"))
                .alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
    dep = (
        delta.where(F.col("d") > 0)
        .groupBy("id")
        .agg(F.sum("delta").alias("_dep"))
    )
    scale = float(n) / float(k_eff) if k_eff else 0.0
    if normalized and n > 2:
        scale /= (n - 1) * (n - 2)
    out = (
        vertices.join(dep, "id", "left")
        .select(
            "id",
            (F.coalesce("_dep", F.lit(0.0)) * F.lit(scale)).alias("betweenness"),
        )
    )
    e.unpersist()
    return out


def closeness_centrality(
    graph: Graph,
    k: int = 16,
    max_depth: int = 10,
    seed: int = 11,
    roots: DataFrame | None = None,
) -> DataFrame:
    """Sampled closeness (Eppstein-Wang estimator): from the same
    k-root BFS distances, closeness(v) ≈ (n − 1) / (n/k · Σ_{r} d(r, v))
    over the sampled roots that reach v (undirected graph: d(r,v) =
    d(v,r)). Exact harmonic-free NetworKit "Closeness" convention;
    unreachable vertices get 0."""
    e0 = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    e = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vertices = graph.vertices.select("id").persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    if roots is None:
        k_eff = min(k, n)
        roots = _sample_roots(vertices, k_eff, seed)
    else:
        roots = roots.select(F.col(roots.columns[0]).alias("root"))
        k_eff = roots.count()
    roots = roots.localCheckpoint(eager=True)
    state, _ = _forward_bfs(e, roots, max_depth)
    sums = state.where(F.col("d") > 0).groupBy("id").agg(
        F.sum("d").alias("sum_d")
    )
    out = (
        vertices.join(sums, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("sum_d", F.lit(0)) > 0,
                F.lit(float(n - 1))
                / (F.lit(float(n) / float(k_eff)) * F.col("sum_d")),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )
    e.unpersist()
    return out
