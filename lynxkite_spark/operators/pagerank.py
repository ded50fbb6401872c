"""PageRank with the reference's exact semantics, expressed as DataFrame
joins + aggregations.

Reference: /root/reference/app/.../graph_operations/PageRank.scala:43-88
  1. non-positive weights dropped                  (:43-44)
  2. per-source weight normalization               (:54-67)
  3. initial rank 1.0 per vertex (mass sums to |V|) (:70)
  4. per iteration: incoming(dst) = Σ rank(src)·w_norm·damping, then ALL
     leaked mass (dangling + the 1-d factor) redistributed uniformly:
     rank = incoming + (|V| − Σ incoming)/|V|      (:75-88)
  5. the reference runs a fixed iteration count with no convergence test
     (:73, default 5 / damping 0.85,
     GraphComputationOperations.scala:386-389); we add convergence to
     ``tol`` (max |Δrank| < tol), which subsumes fixed N — pass
     ``iterations=N, tol=None`` for numerical equivalence with the
     reference within float reduction-order tolerance (the dangling-mass
     total is an algebraic identity over the rank table, so summation
     order differs; allclose at 1e-6 — the north rule's contract — holds,
     bit-for-bit equality does not).

Direction handling follows the frontend's Direction wrapper
(Operations.scala:413-448): "outgoing edges" uses edges as-is,
"all edges" adds reversed copies first.

Scale notes (SURVEY.md §4):
  * edges are normalized once, repartitioned by ``src`` and cached — every
    iteration reuses that single shuffle for the gather join;
  * the gather join is skew-split HybridRDD-style (plans/skew.py): hub
    sources join against a broadcast of just the hot rank rows;
  * groupBy(dst) skew needs no salting — sum() partial-aggregates
    map-side before the shuffle;
  * lineage is cut with localCheckpoint every few iterations and
    (optionally) a content-addressed parquet checkpoint for resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph
from lynxkite_spark.plans.checkpoint import CheckpointManager, materialize, step_key
from lynxkite_spark.plans.skew import hot_keys, hybrid_join


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    iterations: int | None = None,
    tol: float | None = 1e-6,
    max_iterations: int = 200,
    direction: str = "outgoing",
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 10,
    input_fingerprint: str | None = None,
    skew_threshold: int | None = None,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Returns DataFrame[id: long, pagerank: double].

    ``iterations`` set → fixed count (reference mode). Otherwise iterate
    until ``max |Δrank| < tol`` or ``max_iterations``.
    """
    spark = graph.vertices.sparkSession
    g = graph.with_weight()
    edges = g.edges.select("src", "dst", "weight").where(F.col("weight") > 0.0)
    if direction == "all":
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    elif direction == "incoming":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # normalize per source once; keep partitioned by src for all iterations
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    en = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("wn"))
        .repartition(n_part, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # rank state carries has_out so the dangling-mass total needs no pass
    # over the gathered contributions: per-src normalized weights sum to 1,
    # so Σ incoming = damping · Σ rank over non-dangling vertices — an
    # exact algebraic identity that turns the global total into a scan of
    # the (small, cached) rank table instead of a second consumption of
    # the expensive gather join.
    srcs = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("has_out", F.lit(True))
    )
    vertices = (
        g.vertices.select("id")
        .join(srcs, "id", "left")
        .select("id", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .repartition(n_part, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_vertices = vertices.count()
    if n_vertices == 0:
        return vertices.select("id").withColumn("pagerank", F.lit(0.0))
    en.count()  # materialize the normalized edges once

    # hot-key set for the gather join, computed once (HybridRDD semantics);
    # when no key crosses the threshold the plain shuffle join is used —
    # the hybrid split costs two extra joins per iteration for nothing
    if skew_threshold is None:
        from lynxkite_spark.session import HOT_KEY_THRESHOLD

        skew_threshold = HOT_KEY_THRESHOLD
    hot = hot_keys(en, "src", skew_threshold).persist(StorageLevel.MEMORY_AND_DISK)
    use_hybrid = hot.count() > 0

    params = {"damping": damping, "iterations": iterations, "tol": tol, "direction": direction}
    fp = input_fingerprint or "anon"

    # resume: find the newest checkpointed iteration
    start_iter = 0
    ranks = vertices.select("id", "has_out", F.lit(1.0).alias("pagerank"))
    if checkpoint is not None:
        limit = iterations if iterations is not None else max_iterations
        for k in range(limit, 0, -1):
            key = step_key(fp, "pagerank", params, k)
            cached = checkpoint.load(key)
            if cached is not None:
                if "has_out" in cached.columns:
                    ranks = cached
                else:
                    ranks = vertices.join(cached.select("id", "pagerank"), "id")
                start_iter = k
                break
    ranks = materialize(ranks.repartition(n_part, "id"))

    limit = iterations if iterations is not None else max_iterations
    history: list[dict] = []
    # localCheckpoint output (LogicalRDD) carries no size stats, so
    # Catalyst can't see that the rank table is broadcastable — hint it
    # explicitly while |V| is small. Building a broadcast relation is a
    # SERIAL driver-side step repeated every iteration; measured on this
    # box it stops paying for itself around a few hundred thousand rows,
    # and past that it caps scaling (the parallel join is fast, the
    # broadcast build is not). Above the threshold the co-partitioned
    # shuffle join (or the hybrid hot-key split) takes over.
    broadcast_ranks = n_vertices <= broadcast_threshold

    for k in range(start_iter + 1, limit + 1):
        rank_lookup = ranks.select(F.col("id").alias("src"), "pagerank")
        if broadcast_ranks:
            gathered = en.join(F.broadcast(rank_lookup), "src")
        elif use_hybrid:
            gathered = hybrid_join(en, rank_lookup, "src", hot=hot)
        else:
            # hash join with the rank table as build side: avoids
            # re-sorting the (much larger) edge table every iteration,
            # which SMJ would do despite the stable partitioning
            gathered = en.join(rank_lookup.hint("shuffle_hash"), "src")
        contrib = gathered.groupBy("dst").agg(
            (F.sum(F.col("pagerank") * F.col("wn")) * F.lit(damping)).alias("incoming")
        )
        # dangling-mass total from the cached rank table (identity above):
        # a broadcast 1-row agg in-plan — zero driver actions in the loop
        # body for fixed-iteration mode, one (the delta) for convergence
        tot = ranks.where(F.col("has_out")).agg(
            (F.sum("pagerank") * F.lit(damping)).alias("_tot")
        )
        new_ranks = (
            ranks.crossJoin(F.broadcast(tot))
            .join(
                contrib if broadcast_ranks else contrib.hint("shuffle_hash"),
                ranks.id == contrib.dst,
                "left",
            )
            .select(
                "id",
                "has_out",
                (
                    F.coalesce(F.col("incoming"), F.lit(0.0))
                    + (F.lit(float(n_vertices)) - F.coalesce(F.col("_tot"), F.lit(0.0)))
                    / F.lit(float(n_vertices))
                ).alias("pagerank"),
            )
        )
        if checkpoint is not None and (k % checkpoint_every == 0 or k == limit):
            key = step_key(fp, "pagerank", params, k)
            new_ranks = checkpoint.save(
                new_ranks, key, metrics={"iteration": k, "history": history}
            )
        # cut lineage every iteration (lazily — materialized by the next
        # action): the plan references ranks twice per round, so analysis
        # time is exponential without truncation
        new_ranks = new_ranks.localCheckpoint(eager=False)

        if tol is not None and iterations is None:
            old = F.broadcast(ranks) if broadcast_ranks else ranks
            delta = (
                new_ranks.alias("n")
                .join(old.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.pagerank") - F.col("o.pagerank"))).alias("d"))
                .first()["d"]
            )
            history.append({"iteration": k, "max_delta": delta})
            ranks = new_ranks
            if delta < tol:
                break
        else:
            # fixed mode defers all execution to the caller's action
            ranks = new_ranks

    en.unpersist()
    hot.unpersist()
    vertices.unpersist()
    return ranks.select("id", "pagerank")
