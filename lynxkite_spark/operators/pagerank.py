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

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph
from lynxkite_spark.plans.checkpoint import CheckpointManager, materialize, step_key
from lynxkite_spark.plans.skew import hot_keys, hybrid_join
from lynxkite_spark.plans.spread import plan_is_expensive as _plan_is_expensive


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
    # Pin an expensive-to-recompute RAW edge table once up front — the
    # setup below references it through several derived plans (edge
    # normalization, source set, and — for from_edges graphs — the
    # vertex union), and caching the raw table lets every one of those
    # subtrees hit the cache (a cache of the filtered/weighted view
    # would not match the vertex union's plan). Cheap inputs (bare
    # scans / checkpointed relations) skip the extra copy.
    edges_pinned = None
    if _plan_is_expensive(graph.edges):
        edges_pinned = graph.edges.persist(StorageLevel.MEMORY_AND_DISK)
        graph = replace(graph, edges=edges_pinned)
    g = graph.with_weight()
    edges = g.edges.select("src", "dst", "weight").where(F.col("weight") > 0.0)
    if direction == "all":
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    elif direction == "incoming":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Normalize per source in ONE pass with a window sum over the
    # src-partitioned edges (the groupBy+join-back shape scanned the
    # input twice and paid a second exchange + join); stays partitioned
    # by src for all iterations. Weight sums are per-src float adds in
    # sort order — for the constant-1.0 and integer-count weights every
    # caller uses, the totals are exact, so values are unchanged.
    from pyspark.sql import Window as W

    w_out = F.sum("weight").over(W.partitionBy("src"))
    en = (
        edges.repartition(n_part, "src")
        .select("src", "dst", (F.col("weight") / w_out).alias("wn"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # rank state carries has_out so the dangling-mass total needs no pass
    # over the gathered contributions: per-src normalized weights sum to 1,
    # so Σ incoming = damping · Σ rank over non-dangling vertices — an
    # exact algebraic identity that turns the global total into a scan of
    # the (small, cached) rank table instead of a second consumption of
    # the expensive gather join.
    en.count()  # materialize the normalized edges once
    srcs = (
        en.select(F.col("src").alias("id"))  # from the cache, not the input
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
    if edges_pinned is not None:
        edges_pinned.unpersist()
    if n_vertices == 0:
        return vertices.select("id").withColumn("pagerank", F.lit(0.0))

    # localCheckpoint output (LogicalRDD) carries no size stats, so
    # Catalyst can't see that the rank table is broadcastable — hint it
    # explicitly while |V| is small. Building a broadcast relation is a
    # SERIAL driver-side step repeated every iteration; measured on this
    # box it stops paying for itself around a few hundred thousand rows,
    # and past that it caps scaling (the parallel join is fast, the
    # broadcast build is not). Above the threshold the co-partitioned
    # shuffle join (or the hybrid hot-key split) takes over.
    broadcast_ranks = n_vertices <= broadcast_threshold

    # hot-key set for the gather join, computed once (HybridRDD semantics);
    # when no key crosses the threshold the plain shuffle join is used —
    # the hybrid split costs two extra joins per iteration for nothing.
    # Skipped entirely in broadcast mode (a broadcast join has no skew to
    # split — the aggregate pass would be paid for nothing).
    use_hybrid = False
    hot = None
    if not broadcast_ranks:
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
    # Convergence mode folds the dangling-mass total into the SAME
    # driver action that computes the delta: the previous iteration's
    # agg returns (max |Δ|, Σ rank over has_out) together, and the total
    # enters the next plan as a literal — removing the per-iteration
    # 1-row aggregate subtree + its broadcast build. The literal is the
    # identical double (same partial/final sum plan over the same
    # materialized table; py4j round-trips doubles exactly).
    converge = tol is not None and iterations is None
    tot_lit: float | None = None
    if converge:
        tot_lit = damping * float(
            ranks.where(F.col("has_out"))
            .agg(F.sum("pagerank").alias("s"))
            .first()["s"]
            or 0.0
        )

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
        if converge:
            # dangling-mass total as a literal (computed by the previous
            # iteration's fused delta action — see above)
            uniform = (F.lit(float(n_vertices)) - F.lit(tot_lit)) / F.lit(
                float(n_vertices)
            )
        else:
            # fixed-iteration mode stays fully lazy: the total is a
            # broadcast 1-row agg in-plan over the cached rank table —
            # zero driver actions in the loop body
            tot = ranks.where(F.col("has_out")).agg(
                (F.sum("pagerank") * F.lit(damping)).alias("_tot")
            )
            uniform = (
                F.lit(float(n_vertices)) - F.coalesce(F.col("_tot"), F.lit(0.0))
            ) / F.lit(float(n_vertices))
        base = ranks if converge else ranks.crossJoin(F.broadcast(tot))
        new_ranks = base.join(
            contrib if broadcast_ranks else contrib.hint("shuffle_hash"),
            ranks.id == contrib.dst,
            "left",
        ).select(
            "id",
            "has_out",
            (F.coalesce(F.col("incoming"), F.lit(0.0)) + uniform).alias("pagerank"),
            *([F.col("pagerank").alias("_prev")] if converge else []),
        )
        ckpt_due = checkpoint is not None and (k % checkpoint_every == 0 or k == limit)
        if ckpt_due and not converge:
            key = step_key(fp, "pagerank", params, k)
            new_ranks = checkpoint.save(
                new_ranks, key, metrics={"iteration": k, "history": history}
            )
        # cut lineage every iteration (lazily — materialized by the next
        # action): the plan references ranks twice per round, so analysis
        # time is exponential without truncation
        new_ranks = new_ranks.localCheckpoint(eager=False)

        if converge:
            # ONE action per iteration: materializes the checkpoint and
            # returns (max |Δrank|, next dangling-mass total) together —
            # the old shape joined new vs old ranks in a second pass and
            # ran the total as a separate in-plan aggregate + broadcast
            row = new_ranks.agg(
                F.max(F.abs(F.col("pagerank") - F.col("_prev"))).alias("d"),
                F.sum(F.when(F.col("has_out"), F.col("pagerank"))).alias("s"),
            ).first()
            delta = row["d"]
            tot_lit = damping * float(row["s"] or 0.0)
            history.append({"iteration": k, "max_delta": delta})
            ranks = new_ranks.drop("_prev")
            if ckpt_due:
                # write from the already-materialized local checkpoint
                key = step_key(fp, "pagerank", params, k)
                ranks = checkpoint.save(
                    ranks, key, metrics={"iteration": k, "history": history}
                )
            if delta is not None and delta < tol:
                break
        else:
            # fixed mode defers all execution to the caller's action
            ranks = new_ranks

    # Unpersist unconditionally (r6 measured trade, recorded here):
    # fixed mode returns a LAZY plan whose per-iteration checkpoints
    # still reference en/vertices, so the caller's action recomputes
    # the edge normalization once per iteration reference. Retaining
    # the caches instead was measured ~20% faster per scaling leg —
    # but it leaks session-lifetime cache entries sized like the edge
    # table (CacheManager entries are not cleaned by reference GC), a
    # real cost for any long-lived session calling fixed-mode pagerank
    # repeatedly (the oracle-gate session runs dozens). The memory-
    # safe release stays; converge mode has executed everything by
    # now, so for it this is pure cleanup.
    en.unpersist()
    if hot is not None:
        hot.unpersist()
    vertices.unpersist()
    return ranks.select("id", "pagerank")
