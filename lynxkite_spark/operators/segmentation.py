"""Segmentation operators (SURVEY.md §2.3 segmentation rows).

A segmentation is a ``belongs_to[id, segment]`` table (§1.2); these ops
build and transform them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from lynxkite_spark.graph import Graph


def edges_from_segmentation(belongs_to: DataFrame) -> DataFrame:
    """EdgesFromSegmentation.scala — clique edges between all ordered
    pairs of co-members within each segment. Segment sizes are the skew
    axis: a giant segment is a quadratic blowup, which is why the
    reference also ships SampleEdgesFromSegmentation; cap with
    ``sample_edges_from_segmentation`` at scale."""
    a = belongs_to.select(F.col("segment"), F.col("id").alias("src"))
    b = belongs_to.select(F.col("segment"), F.col("id").alias("dst"))
    return (
        a.join(b, "segment")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


def sample_edges_from_segmentation(
    belongs_to: DataFrame, max_pairs_per_segment: int = 1000, seed: int = 42
) -> DataFrame:
    """SampleEdgesFromSegmentation.scala — bounded, deterministic sample
    of each segment's clique: rank members by a value-derived hash and
    pair only the first ⌈√cap⌉ with each other."""
    k = int(max_pairs_per_segment ** 0.5) + 1
    w = W.partitionBy("segment").orderBy(F.xxhash64("id", F.lit(seed)), "id")
    ranked = belongs_to.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    a = ranked.select("segment", F.col("id").alias("src"))
    b = ranked.select("segment", F.col("id").alias("dst"))
    return a.join(b, "segment").where(F.col("src") != F.col("dst")).select("src", "dst")


def grow_segmentation(graph: Graph, belongs_to: DataFrame) -> DataFrame:
    """GrowSegmentation.scala — add each member's parent-graph neighbors
    to its segments (one hop, both directions)."""
    e = graph.edges.select("src", "dst")
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    grown = (
        belongs_to.join(sym, belongs_to.id == sym.src)
        .select(F.col("dst").alias("id"), "segment")
    )
    return belongs_to.select("id", "segment").unionByName(grown).distinct()


def combine_segmentations(a: DataFrame, b: DataFrame) -> DataFrame:
    """CombineSegmentations.scala — the intersection segmentation: one
    segment per (segment_a, segment_b) pair, membership = in both.
    Segment ids are value-derived (xxhash64 of the pair) → deterministic
    across runs and parallelism."""
    aa = a.select("id", F.col("segment").alias("_sa"))
    bb = b.select("id", F.col("segment").alias("_sb"))
    return (
        aa.join(bb, "id")
        .select("id", F.xxhash64("_sa", "_sb").alias("segment"))
    )


def segmentation_sizes(belongs_to: DataFrame) -> DataFrame:
    return belongs_to.groupBy("segment").agg(F.count(F.lit(1)).alias("size"))


def segment_by_vector_attribute(
    vertices: DataFrame, attr: str, id_col: str = "id"
) -> tuple[DataFrame, DataFrame]:
    """SegmentByVectorAttribute.scala:43-59 — one segment per distinct
    element value of a vector (array) attribute; each vertex links to
    the segment of every element occurrence (the reference's
    ``flatMapValues(v => v)`` keeps multiplicity, so a repeated element
    yields parallel belongs-to edges).

    Segments are keyed by the element value itself (the reference's
    Bucketing assigns synthetic ids but labels each segment with the
    value — value-as-key is the partition-invariant form of that).
    Returns (segments[segment, size], belongs_to[id, segment]).

    Scale shape: one explode + one aggregation; the element value is
    the shuffle key, so a viral element (huge segment) is the skew axis
    — the same axis as edges_from_segmentation's cap."""
    belongs_to = vertices.where(F.col(attr).isNotNull()).select(
        F.col(id_col).alias("id"), F.explode(attr).alias("segment")
    )
    segments = belongs_to.groupBy("segment").agg(F.count(F.lit(1)).alias("size"))
    return segments, belongs_to


def vertex_set_intersection(*vertex_sets: DataFrame) -> DataFrame:
    """Intersections.scala — vertices present in every input set."""
    out = vertex_sets[0].select("id").distinct()
    for vs in vertex_sets[1:]:
        out = out.join(vs.select("id").distinct(), "id", "left_semi")
    return out


def sample_vertices(vertices: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """SampleVertices.scala — unbiased vertex sample. NOTE: df.sample is
    partition-dependent; for a value-derived (partition-invariant) sample
    use ``deterministic_sample``."""
    return vertices.sample(fraction=fraction, seed=seed)


def deterministic_sample(vertices: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Value-derived sampling: keep id iff hash(id, seed) < fraction —
    bit-identical at any parallelism (our partition-invariance discipline,
    SURVEY.md §4.2)."""
    bound = int(fraction * (1 << 63))
    return vertices.where(F.abs(F.xxhash64("id", F.lit(seed))) < bound)


def segment_by_interval(
    vertices: DataFrame, attr: str, interval: float, name: str = "segment"
) -> DataFrame:
    """'Segment by interval' (BuildSegmentationOperations.scala:598) —
    bucket a numeric attribute into fixed-width intervals; segment id =
    floor(value/interval)."""
    return vertices.where(F.col(attr).isNotNull()).select(
        "id", F.floor(F.col(attr) / F.lit(interval)).cast("long").alias(name)
    )


def segment_by_event_sequence(
    events: DataFrame,
    person_col: str = "user_id",
    time_col: str = "ts",
    location_col: str = "event_type",
    sequence_length: int = 2,
    time_window_step: float = 3600.0,
    time_window_length: float = 7200.0,
    algorithm: str = "continuous",
) -> DataFrame:
    """SegmentByEventSequence (reference: SegmentByEventSequence.scala,
    ContinuousEventsSegmentGenerator): merge each person's consecutive
    same-location events into spans, slide a ``sequence_length`` window
    over the spans, and emit one segment per (time bucket, location
    sequence) — buckets range from
    floor(max(first.start, last.end − window_length)/step) to
    floor(first.end/step).

    The reference folds each person's full history in one closure; here
    every step is columnar: run-length merge via lag + cumulative sum,
    the sliding window via ``lead`` chains, bucket fan-out via
    ``sequence``+``explode`` — all partitioned by person, no per-person
    collect. Returns [person, time_bucket, locations] where locations
    is the comma-joined location sequence.

    ``algorithm="with-gaps"`` runs the reference's
    EventsWithGapsSegmentGenerator instead: from every event, the
    longest in-window suffix, then ALL order-preserving location
    subsequences of length ``sequence_length`` — a combinatorial
    per-person enumeration (like the reference's closure), so it runs
    in ``applyInPandas`` per person."""
    if algorithm == "with-gaps":
        return _segment_with_gaps(
            events, person_col, time_col, location_col,
            sequence_length, time_window_step, time_window_length,
        )
    L = sequence_length
    dtype = dict(events.dtypes).get(time_col, "")
    if dtype.startswith("timestamp"):
        # whole epoch seconds (UTC session), truncated like the DuckDB
        # oracle's floor(epoch(ts))
        t = F.unix_timestamp(F.col(time_col)).cast("double")
    else:
        t = F.col(time_col).cast("double")
    ev = events.select(
        F.col(person_col).alias("person"),
        t.alias("t"),
        F.col(location_col).cast("string").alias("loc"),
        F.col(events.columns[0]).alias("_tie"),
    )
    w = W.partitionBy("person").orderBy("t", "loc", "_tie")
    is_new = F.when(
        F.lag("loc").over(w).isNull() | (F.lag("loc").over(w) != F.col("loc")), 1
    ).otherwise(0)
    runs = ev.withColumn(
        "run", F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = runs.groupBy("person", "run").agg(
        F.min("t").alias("start"),
        F.max("t").alias("end"),
        F.first("loc").alias("loc"),
    )
    w2 = W.partitionBy("person").orderBy("run")
    loc_chain = [F.col("loc")] + [F.lead("loc", i).over(w2) for i in range(1, L)]
    windows = spans.select(
        "person",
        "start",
        "end",
        F.concat_ws(",", *loc_chain).alias("locations"),
        (F.lead("end", L - 1).over(w2) if L > 1 else F.col("end")).alias("last_end"),
        (F.lead("loc", L - 1).over(w2) if L > 1 else F.col("loc")).alias("_complete"),
    ).where(F.col("_complete").isNotNull())
    min_b = F.floor(
        F.greatest(F.col("start"), F.col("last_end") - F.lit(time_window_length))
        / F.lit(time_window_step)
    )
    max_b = F.floor(F.col("end") / F.lit(time_window_step))
    return (
        windows.select(
            "person",
            "locations",
            F.explode(
                F.when(min_b <= max_b, F.sequence(min_b, max_b)).otherwise(
                    F.array().cast("array<bigint>")
                )
            ).alias("time_bucket"),
        )
        .select("person", "time_bucket", "locations")
        .distinct()
    )


def _segment_with_gaps(
    events: DataFrame,
    person_col: str,
    time_col: str,
    location_col: str,
    sequence_length: int,
    time_window_step: float,
    time_window_length: float,
) -> DataFrame:
    """EventsWithGapsSegmentGenerator (SegmentByEventSequence.scala:87-108):
    literal port of the per-person fold, run per person group."""
    from itertools import combinations

    import pandas as pd

    dtype = dict(events.dtypes).get(time_col, "")
    t = (
        F.unix_timestamp(F.col(time_col)).cast("double")
        if dtype.startswith("timestamp")
        else F.col(time_col).cast("double")
    )
    ev = events.select(
        F.col(person_col).alias("person"),
        t.alias("t"),
        F.col(location_col).cast("string").alias("loc"),
        F.col(events.columns[0]).alias("_tie"),
    )
    L, step, wlen = sequence_length, time_window_step, time_window_length

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "loc", "_tie"])
        times = list(pdf["t"])
        locs = list(pdf["loc"])
        person = pdf["person"].iloc[0]
        out = set()
        for i in range(len(times)):
            j = i
            while j < len(times) and times[j] < times[i] + wlen:
                j += 1
            window = locs[i:j]
            bucket = int((times[i] // step))
            for idxs in combinations(range(len(window)), L):
                out.add((bucket, ",".join(window[k] for k in idxs)))
        return pd.DataFrame(
            [(person, b, s) for b, s in sorted(out)],
            columns=["person", "time_bucket", "locations"],
        )

    return ev.groupBy("person").applyInPandas(
        fold, "person long, time_bucket long, locations string"
    )
