"""Community detection by label propagation (synchronous, deterministic).

The reference delegates to NetworKit PLP — Raghavan et al. async label
propagation whose result is thread-count dependent
(/root/reference/app/.../graph_operations/NetworKit.scala:181-228,
sphynx/lynxkite-sphynx/networkit_community_detection.go:23-33; tests pin
NETWORKIT_THREADS, test_backend.sh:25-27). A partition-dependent result
is unacceptable at cluster scale, so our spec is the *synchronous*
variant with deterministic tie-breaking (SURVEY.md §2.1):

  label(v) ← argmax over neighbor labels by (weight desc, label asc)

iterated until no label changes or ``max_iterations`` (sync LPA can
2-cycle on bipartite structures; the cap guarantees termination).
Edges are treated as undirected (reference passes directed=false).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lynxkite_spark.graph import Graph


def label_propagation(
    graph: Graph,
    max_iterations: int = 30,
    weighted: bool = False,
    checkpoint=None,
    checkpoint_every: int = 10,
    input_fingerprint: str | None = None,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Returns belongs_to: DataFrame[id: long, label: long].

    With a ``CheckpointManager`` the label table is written every
    ``checkpoint_every`` rounds (per-partition lineage sidecar like
    PageRank's) and a rerun resumes from the newest stored round —
    labels are exact longs, so a resumed run is bit-identical."""
    spark = graph.vertices.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    g = graph.with_weight()
    e = g.edges.select("src", "dst", "weight").where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    if not weighted:
        sym = sym.withColumn("weight", F.lit(1.0))
    sym = sym.repartition(n_part, "src").persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()

    from lynxkite_spark.plans.checkpoint import materialize, step_key

    params = {"max_iterations": max_iterations, "weighted": weighted}
    fp = input_fingerprint or "anon"
    start_iter = 0
    labels = graph.vertices.select("id", F.col("id").alias("label"))
    if checkpoint is not None:
        for k in range(max_iterations, 0, -1):
            cached = checkpoint.load(step_key(fp, "lpa", params, k))
            if cached is not None:
                labels = cached
                start_iter = k
                break
    labels = materialize(labels.repartition(n_part, "id"))
    # Broadcast the vertex-sized label table into the gather join while
    # it is small (same trade as pagerank's broadcast_ranks): the big
    # edge stream is then never exchanged OR sorted per round — the only
    # corpus-sized shuffle left is the map-side-combinable vote count.
    # Above the threshold the shuffle-hash gather takes over (building a
    # multi-million-row broadcast is serial driver work that caps
    # scaling).
    broadcast_labels = graph.vertices.count() <= broadcast_threshold

    for it in range(start_iter, max_iterations):
        # gather neighbor labels onto dst; per-(dst,label) weight sums are
        # map-side combinable, so hub vertices don't skew the shuffle
        # hash-build the vertex-sized label table: the big edge stream is
        # never sorted per round (PageRank gather-join discipline)
        lbl = F.broadcast(labels) if broadcast_labels else labels.hint("shuffle_hash")
        votes = (
            sym.join(lbl, sym.src == labels.id)
            .groupBy("dst", "label")
            .agg(F.sum("weight").alias("w"))
        )
        # argmax by (w desc, label asc) — deterministic: max_by on an
        # ordered struct (invert label sign for the asc tie-break)
        best = votes.groupBy("dst").agg(
            F.max_by("label", F.struct(F.col("w"), -F.col("label"))).alias("new_label")
        )
        best = F.broadcast(best) if broadcast_labels else best
        # carry the previous label through the checkpoint so the change
        # check is a scan of the new table, not a second join (the join
        # shape cost one more exchange + action per round)
        new_labels = (
            labels.join(best, labels.id == best.dst, "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                F.col("label").alias("_old"),
            )
            .localCheckpoint(eager=False)  # materialized by the change check
        )
        changed = (
            new_labels.where(F.col("label") != F.col("_old")).limit(1).count()
        )
        labels = new_labels.drop("_old")
        if checkpoint is not None and (it + 1) % checkpoint_every == 0:
            labels = checkpoint.save(
                labels,
                step_key(fp, "lpa", params, it + 1),
                metrics={"iteration": it + 1, "changed": changed},
            )
        if changed == 0:
            break
    sym.unpersist()
    return labels
