"""Graph structure transformations (SURVEY.md §2.3).

Each function cites the reference operation it re-expresses; all are
single declarative DataFrame plans — Catalyst handles pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from lynxkite_spark.graph import Graph


def add_reversed_edges(edges: DataFrame) -> DataFrame:
    """AddReversedEdges.scala:1 — 'For each A->B edge it adds a B<-A edge'."""
    return edges.unionByName(reverse_edges(edges))


def reverse_edges(edges: DataFrame) -> DataFrame:
    """ReverseEdges.scala."""
    others = [c for c in edges.columns if c not in ("src", "dst")]
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *others
    )


def make_symmetric(edges: DataFrame) -> DataFrame:
    """MakeEdgeBundleSymmetric.scala:1 — 'Keeps the smaller set of A->B and
    B->A edges': per ordered pair keep min(#a→b, #b→a) copies, in both
    directions."""
    cnt = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    rev = cnt.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("n").alias("rn")
    )
    kept = cnt.join(rev, ["src", "dst"]).select(
        "src", "dst", F.least("n", "rn").alias("k")
    )
    return kept.select(
        "src", "dst", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("_i")
    ).drop("_i")


def strip_duplicate_edges(edges: DataFrame) -> DataFrame:
    """StripDuplicateEdgesFromBundle.scala — one arbitrary A→B edge kept."""
    return edges.dropDuplicates(["src", "dst"])


def remove_non_symmetric_edges(edges: DataFrame) -> DataFrame:
    """RemoveNonSymmetricEdges.scala:1-6 — discard every A→B edge with
    no B→A edge (multiplicity preserved on the kept side, unlike
    make_symmetric's min-multiplicity).  One semi-join on the reversed
    pair set."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).distinct()
    return edges.join(rev, ["src", "dst"], "left_semi")


def loop_edges(vertices: DataFrame) -> DataFrame:
    """LoopEdgeBundle.scala — a self-loop per vertex."""
    return vertices.select(F.col("id").alias("src"), F.col("id").alias("dst"))


def edge_graph(graph: Graph) -> Graph:
    """EdgeGraph.scala — the line graph: edges become vertices; two edge
    vertices are connected when e1.dst == e2.src. Edge identity is the
    canonical (src, dst, row-index-within-duplicates) triple so the result
    is value-derived and partition-invariant."""
    w = W.partitionBy("src", "dst").orderBy("src")
    e = graph.edges.select("src", "dst").withColumn("dup", F.row_number().over(w))
    e = e.select(F.xxhash64("src", "dst", "dup").alias("id"), "src", "dst")
    left = e.select(F.col("id").alias("src_e"), F.col("dst").alias("mid"))
    right = e.select(F.col("id").alias("dst_e"), F.col("src").alias("mid"))
    new_edges = left.join(right, "mid").select(
        F.col("src_e").alias("src"), F.col("dst_e").alias("dst")
    )
    return Graph(vertices=e.select("id"), edges=new_edges)


def merge_vertices(graph: Graph, attr: str) -> tuple[Graph, DataFrame]:
    """MergeVertices.scala — merge vertices equal on ``attr``; the
    representative is the min id per group (deterministic, unlike the
    reference's arbitrary pick). Edges are remapped through the mapping
    (InducedEdgeBundle.scala semantics). Returns (merged graph,
    mapping[id, new_id])."""
    mapping = graph.vertices.select("id", attr).withColumn(
        "new_id", F.min("id").over(W.partitionBy(attr))
    ).select("id", "new_id")
    new_vertices = (
        graph.vertices.join(mapping, "id")
        .where(F.col("id") == F.col("new_id"))
        .drop("new_id")
    )
    e = induced_edges(graph.edges, mapping)
    return Graph(vertices=new_vertices, edges=e), mapping


def induced_edges(
    edges: DataFrame,
    mapping: DataFrame,
    on_src: bool = True,
    on_dst: bool = True,
) -> DataFrame:
    """InducedEdgeBundle.scala:1-8 — re-map edge endpoints through a
    vertex mapping[id, new_id]; edges whose endpoint is absent from the
    mapping are dropped (filter semantics)."""
    others = [c for c in edges.columns if c not in ("src", "dst")]
    e = edges
    if on_src:
        m = mapping.select(F.col("id").alias("src"), F.col("new_id").alias("_new_src"))
        e = e.join(m, "src", "inner").select(
            F.col("_new_src").alias("src"), "dst", *others
        )
    if on_dst:
        m = mapping.select(F.col("id").alias("dst"), F.col("new_id").alias("_new_dst"))
        e = e.join(m, "dst", "inner").select(
            "src", F.col("_new_dst").alias("dst"), *others
        )
    return e


def concatenate_bundles(
    ab: DataFrame, bc: DataFrame, keep_multiplicity: bool = False
) -> DataFrame:
    """ConcatenateBundles.scala — compose A→B with B→C into A→C, weights
    multiplied along paths and summed per (a, c); ConcatenateBundlesMulti
    keeps per-path multiplicity instead."""
    a = ab.select(F.col("src"), F.col("dst").alias("mid"), F.coalesce(F.col("weight"), F.lit(1.0)).alias("w1")) \
        if "weight" in ab.columns else ab.select("src", F.col("dst").alias("mid"), F.lit(1.0).alias("w1"))
    b = bc.select(F.col("src").alias("mid"), F.col("dst"), F.coalesce(F.col("weight"), F.lit(1.0)).alias("w2")) \
        if "weight" in bc.columns else bc.select(F.col("src").alias("mid"), "dst", F.lit(1.0).alias("w2"))
    paths = a.join(b, "mid").select("src", "dst", (F.col("w1") * F.col("w2")).alias("weight"))
    if keep_multiplicity:
        return paths
    return paths.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


def edges_from_attribute_matches(vertices: DataFrame, attr: str) -> DataFrame:
    """EdgesFromAttributeMatches.scala ('Connect vertices on attribute') —
    all ordered pairs of distinct vertices sharing ``attr``. Self-equi-join;
    heavy attr values are exactly the skew case AQE splits."""
    a = vertices.select(F.col("id").alias("src"), F.col(attr).alias("_k"))
    b = vertices.select(F.col("id").alias("dst"), F.col(attr).alias("_k"))
    return (
        a.join(b, "_k")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


def segmentation_to_edges(belongs_to: DataFrame, min_overlap: int = 1) -> DataFrame:
    """SetOverlap.scala — connect segments sharing ≥ k members."""
    a = belongs_to.select(F.col("id"), F.col("segment").alias("s1"))
    b = belongs_to.select(F.col("id"), F.col("segment").alias("s2"))
    return (
        a.join(b, "id")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .where(F.col("overlap") >= min_overlap)
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"), "overlap")
    )


def _star_edges(belongs_to: DataFrame) -> DataFrame:
    """Per-member star: each vertex links its smallest segment to its
    other segments — m−1 edges instead of m·(m−1)/2 per m-segment
    member; sharing ≥1 member is exactly edge-connectivity. Symmetric
    output."""
    w_min = F.min("segment").over(W.partitionBy("id"))
    starred = belongs_to.select(
        "id", "segment", w_min.alias("_hub")
    ).where(F.col("segment") != F.col("_hub"))
    one_dir = starred.select(
        F.col("_hub").alias("src"), F.col("segment").alias("dst")
    ).distinct()
    return one_dir.unionByName(
        one_dir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def segmentation_to_edges_for_cc(
    belongs_to: DataFrame, min_overlap: int = 1,
    max_segment_size: int | None = None,
) -> DataFrame:
    """SetOverlapForCC.scala:36-130 — edges between overlapping segments
    with a weaker-but-cheaper contract: NOT all justified edges, only
    enough that connected components over the output equal CC over the
    full SetOverlap graph.  This is the reference's performant variant
    for heavily-overlapping segmentations (infocom community search),
    where the plain member self-join pays quadratic per shared member.

    ``min_overlap == 1``: a pure-SQL star per member — each vertex links
    its lexicographically-smallest segment to its other segments, m−1
    edges instead of m·(m−1)/2 per m-segment member; sharing ≥1 member
    is exactly edge-connectivity, so components are preserved.

    ``min_overlap > 1``: the reference's per-member bucket algorithm —
    each member's bucket holds its segments' sorted member arrays; pairs
    are verified by sorted-merge intersection, deduplicated across
    buckets by the pair's minimal common element (only the bucket of
    that minimal member emits), and pruned by a BFS so a segment whose
    in-bucket component is known stops generating checks.  Runs as
    applyInPandas per member bucket — the same shuffle volume as the
    reference's groupByKey, with the quadratic verify bounded per
    bucket and each qualifying pair verified once globally.

    ``max_segment_size`` (k>1 only): the bucket path replicates each
    segment's full member array into every member's bucket — the same
    shuffle volume as the reference's groupByKey, but a single
    10M-member segment would replicate a 10M-element array 10M times.
    Segments larger than the cap spill to the k=1 star path instead
    (VERDICT r4 item 4): their star edges keep every component
    connected, at a documented semantic relaxation — an over-cap
    segment connects to neighbors on ≥1 shared member rather than
    ≥ ``min_overlap``. The reference has no cap (its groupByKey pays
    the full replication); at 100 TB the cap bounds per-bucket bytes to
    O(segments_per_member × max_segment_size).

    Returns symmetric DataFrame[src, dst] (no overlap counts — the
    contract is component parity, not pair enumeration)."""
    if min_overlap <= 1:
        return _star_edges(belongs_to)

    import pandas as pd

    spill = None
    if max_segment_size is not None:
        big = (
            belongs_to.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_segment_size)
            .select("segment")
        )
        # over-cap segments are few by construction — broadcast the set.
        # Spill edges: (big segment) — (any segment sharing ≥1 member),
        # built per shared member, so only big-incident pairs relax;
        # small–small pairs stay exactly ≥ min_overlap via the bucket
        # path below. Per member this is |big segs| × |segs| pairs —
        # bounded by segments-per-member, never by segment size.
        big_side = belongs_to.join(F.broadcast(big), "segment").select(
            "id", F.col("segment").alias("src"))
        one_dir = (
            big_side.join(
                belongs_to.select("id", F.col("segment").alias("dst")), "id")
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        spill = one_dir.unionByName(
            one_dir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        belongs_to = belongs_to.join(F.broadcast(big), "segment", "left_anti")

    members = belongs_to.groupBy("segment").agg(
        F.sort_array(F.collect_set("id")).alias("_members")
    )
    buckets = belongs_to.join(members, "segment").select(
        "id", "segment", "_members"
    )

    def edges_for(pdf: pd.DataFrame) -> pd.DataFrame:
        vid = pdf["id"].iloc[0]
        segs = list(zip(pdf["segment"], [list(m) for m in pdf["_members"]]))
        out_src, out_dst = [], []

        def min_intersection(a: list, b: list):
            """Sorted-merge intersection test; returns the minimal common
            element iff |a ∩ b| ≥ min_overlap, else None."""
            ai = bi = hits = 0
            smallest = None
            while ai < len(a) and bi < len(b):
                if a[ai] == b[bi]:
                    hits += 1
                    if smallest is None or a[ai] < smallest:
                        smallest = a[ai]
                    if hits >= min_overlap:
                        return smallest
                    ai += 1
                    bi += 1
                elif a[ai] < b[bi]:
                    ai += 1
                else:
                    bi += 1
            return None

        remaining = list(range(len(segs)))
        while remaining:
            todo = [remaining[0]]
            while todo:
                current = todo.pop(0)
                kept = []
                for other in remaining:
                    if other == current:
                        continue
                    minimal = min_intersection(segs[current][1], segs[other][1])
                    if minimal is None:
                        kept.append(other)
                    else:
                        todo.append(other)
                        # the bucket of the minimal common member owns
                        # this pair — every other shared member's bucket
                        # skips it (or a path exists there already)
                        if minimal >= vid:
                            out_src += [segs[current][0], segs[other][0]]
                            out_dst += [segs[other][0], segs[current][0]]
                remaining = kept
        return pd.DataFrame({"src": out_src, "dst": out_dst})

    seg_type = dict(belongs_to.dtypes)["segment"]
    bucket_edges = (
        buckets.groupBy("id")
        .applyInPandas(edges_for, schema=f"src {seg_type}, dst {seg_type}")
        .distinct()
    )
    if spill is not None:
        bucket_edges = bucket_edges.unionByName(spill).distinct()
    return bucket_edges


def vertex_set_union(*vertex_sets: DataFrame) -> DataFrame:
    """Unions.scala:32 — disjoint union with deterministic re-numbering:
    new id = xxhash64(set index, old id)."""
    parts = []
    for i, vs in enumerate(vertex_sets):
        parts.append(
            vs.select(
                F.xxhash64(F.lit(i), F.col("id")).alias("id"),
                F.col("id").alias("original_id"),
                F.lit(i).alias("source_set"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def split_vertices(vertices: DataFrame, count_attr: str) -> DataFrame:
    """SplitVertices.scala — replicate each vertex ``round(count)`` times;
    output carries (id = xxhash64(old, index), original_id, index)."""
    n = F.col(count_attr).cast("long")
    return (
        vertices.where(n > 0)
        .select("id", F.explode(F.sequence(F.lit(1), n)).alias("index"))
        .select(
            F.xxhash64("id", "index").alias("id"),
            F.col("id").alias("original_id"),
            "index",
        )
    )

def split_edges(edges: DataFrame, count_attr: str) -> DataFrame:
    """SplitEdges.scala — replicate each edge round(count) times (the
    inverse of merge-edges, like split_vertices for edges). Output keeps
    (src, dst), a value-derived new edge id and the 1-based replica
    ``index`` (the reference's indexAttr); original edge identity is
    recoverable from (src, dst, index) or the carried columns."""
    n = F.col(count_attr).cast("long")
    return (
        edges.where(n > 0)
        .select("src", "dst", F.explode(F.sequence(F.lit(1), n)).alias("index"))
        .select(
            F.xxhash64("src", "dst", "index").alias("edge_id"),
            "src",
            "dst",
            "index",
        )
    )


def compare_segmentation_edges(
    golden_edges: DataFrame, test_edges: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """CompareSegmentationEdges.scala:1-80 — precision/recall of a test
    edge set against a golden edge set over the same vertex universe;
    parallel edges count once.

    Returns (scalars[precision, recall],
             test_edges + present_in_golden,
             golden_edges + present_in_test) — the flag columns mirror
    the reference's partially-defined 1.0 attributes (NULL when the
    counterpart is missing).  Two distincts + one semi-join-shaped
    aggregate; both sides shuffle once on (src, dst)."""
    g = golden_edges.select("src", "dst").distinct()
    t = test_edges.select("src", "dst").distinct()
    both = g.join(t, ["src", "dst"], "inner")
    n_g, n_t, n_b = g.count(), t.count(), both.count()
    spark = golden_edges.sparkSession
    scalars = spark.createDataFrame(
        [(n_b / n_t if n_t else 0.0, n_b / n_g if n_g else 0.0)],
        "precision double, recall double",
    )
    flag = F.lit(1.0)
    test_flagged = t.join(
        both.select("src", "dst", flag.alias("present_in_golden")),
        ["src", "dst"], "left",
    )
    golden_flagged = g.join(
        both.select("src", "dst", flag.alias("present_in_test")),
        ["src", "dst"], "left",
    )
    return scalars, test_flagged, golden_flagged
