"""Neighborhood / segmentation aggregation (SURVEY.md §2.6).

Reference engine: /root/reference/app/.../graph_operations/Aggregate.scala
(564 LoC): AggregateByEdgeBundle (neighbor attribute → vertex),
AggregateFromEdges (edge attribute → endpoint), global variants, and the
aggregator catalog (Aggregate.scala:309-564). Here each aggregator is a
Spark SQL aggregate expression — partial (map-side) combine for free —
and skew needs no special path because every listed aggregator is
algebraic or uses Spark's own skew-aware implementations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph

def _elementwise(value: Column, combine) -> Column:
    """Fold collected vectors elementwise (Elementwise* aggregators,
    Aggregate.scala:395-404). Scale note: this collects the group's
    vectors like the reference's ItemAggregator does; for hub-degree
    groups prefer posexplode + groupBy(id, pos) (same result, no
    per-group materialization)."""
    lst = F.collect_list(value)
    zero = F.transform(F.element_at(lst, 1), lambda x: x)  # first vector
    rest = F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0)))
    return F.aggregate(rest, zero, lambda acc, v: F.zip_with(acc, v, combine))


def _elementwise_avg(value: Column) -> Column:
    lst = F.collect_list(value)
    s = _elementwise(value, lambda a, b: a + b)
    return F.transform(s, lambda x: x / F.size(lst))


def _majority(value: Column, fraction: float) -> Column:
    """Majority(frac), Aggregate.scala:487-498: the mode, or "" when the
    mode covers < fraction of the values. Deterministic tie-break:
    smallest value wins (the reference's maxBy over a Scala map is
    tie-unstable; a partition-dependent result is unacceptable here).
    Collects the group's values (the reference's LocalAggregator does
    the same); fine for neighborhood-sized groups.

    Single pass: the mode is the longest equal-run in the sorted value
    array (O(n log n) per group vs the earlier O(distinct * n) nested
    filter, which also re-sorted the list once per distinct value —
    quadratic on hub-degree groups). Ascending order + strictly-greater
    improvement keeps the smallest-value tie-break."""
    s = value.cast("string")
    lst = F.sort_array(F.collect_list(s))
    n = F.count(s)  # collect_list and count(col) both skip NULLs

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = run > acc["c"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["c"]).alias("c"),
            F.when(better, x).otherwise(acc["v"]).alias("v"),
        )

    best = F.aggregate(
        lst,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(-1).cast("long").alias("c"),
            F.lit("").alias("v"),
        ),
        step,
    )
    return F.when(best["c"] >= F.lit(fraction) * n, best["v"]).otherwise(
        F.lit("")
    )


# aggregator catalog: name -> fn(value_col, weight_col) -> Column
# (reference names, Aggregate.scala:309-564)
AGGREGATORS: dict[str, callable] = {
    "count": lambda v, w: F.count(v),
    "sum": lambda v, w: F.sum(v),
    "avg": lambda v, w: F.avg(v),
    "min": lambda v, w: F.min(v),
    "max": lambda v, w: F.max(v),
    "first": lambda v, w: F.first(v),
    "std_deviation": lambda v, w: F.stddev_samp(v),
    "median": lambda v, w: F.median(v),
    "count_distinct": lambda v, w: F.count_distinct(v),
    "most_common": lambda v, w: F.mode(v),
    "vector": lambda v, w: F.collect_list(v),
    "set": lambda v, w: F.collect_set(v),
    "weighted_sum": lambda v, w: F.sum(v * w),
    "weighted_average": lambda v, w: F.sum(v * w) / F.sum(w),
    "by_max_weight": lambda v, w: F.max_by(v, w),
    "by_min_weight": lambda v, w: F.min_by(v, w),
    "sum_of_weights": lambda v, w: F.sum(w),
    # catalog tail (Aggregate.scala:395-498)
    "majority_50": lambda v, w: _majority(v, 0.5),
    "majority_100": lambda v, w: _majority(v, 1.0),
    "concatenate": lambda v, w: F.flatten(F.collect_list(v)),
    "elementwise_sum": lambda v, w: _elementwise(v, lambda a, b: a + b),
    "elementwise_min": lambda v, w: _elementwise(v, lambda a, b: F.least(a, b)),
    "elementwise_max": lambda v, w: _elementwise(v, lambda a, b: F.greatest(a, b)),
    "elementwise_avg": lambda v, w: _elementwise_avg(v),
}


def majority(fraction: float):
    """Parametric Majority(frac) aggregator (Aggregate.scala:487-498);
    pass the returned callable wherever an AGGREGATORS entry fits."""
    return lambda v, w: _majority(v, fraction)


def _agg_expr(aggregator: str, value: Column, weight: Column, alias: str) -> Column:
    if aggregator not in AGGREGATORS:
        raise ValueError(f"unknown aggregator {aggregator!r}; options: {sorted(AGGREGATORS)}")
    return AGGREGATORS[aggregator](value, weight).alias(alias)


def aggregate_on_neighbors(
    graph: Graph,
    attr: str,
    aggregator: str = "avg",
    direction: str = "in",
    weight_attr: str | None = None,
    alias: str | None = None,
) -> DataFrame:
    """AggregateByEdgeBundle: aggregate a *neighbor's* vertex attribute
    onto each vertex along edges (Aggregate.scala:34-76; frontend
    'Aggregate on neighbors', AttributePropagationOperations.scala:17-155).

    ``direction='in'``: each vertex aggregates over its in-neighbors' attr
    (values travel src→dst). ``'out'``: over out-neighbors. ``'all'``: both.
    Returns DataFrame[id, <alias>] — only vertices with ≥1 neighbor value,
    like the reference (partial attribute)."""
    alias = alias or f"{aggregator}_{attr}"
    e = graph.edges.select("src", "dst")
    if direction == "out":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "all":
        e = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    vals = graph.vertices.select(
        F.col("id").alias("src"),
        F.col(attr).alias("_v"),
        (F.col(weight_attr) if weight_attr else F.lit(1.0)).alias("_w"),
    ).where(F.col("_v").isNotNull())
    gathered = e.join(vals, "src").select(F.col("dst").alias("id"), "_v", "_w")
    return gathered.groupBy("id").agg(
        _agg_expr(aggregator, F.col("_v"), F.col("_w"), alias)
    )


def aggregate_from_edges(
    graph: Graph,
    edge_attr: str,
    aggregator: str = "sum",
    endpoint: str = "dst",
    alias: str | None = None,
) -> DataFrame:
    """AggregateFromEdges (Aggregate.scala:90+): aggregate an *edge*
    attribute onto one endpoint."""
    alias = alias or f"{aggregator}_{edge_attr}"
    rows = graph.edges.select(
        F.col(endpoint).alias("id"), F.col(edge_attr).alias("_v"), F.lit(1.0).alias("_w")
    ).where(F.col("_v").isNotNull())
    return rows.groupBy("id").agg(_agg_expr(aggregator, F.col("_v"), F.col("_w"), alias))


def aggregate_to_segmentation(
    belongs_to: DataFrame,
    vertices: DataFrame,
    attr: str,
    aggregator: str = "avg",
    alias: str | None = None,
) -> DataFrame:
    """'Aggregate to segmentation': per-segment aggregate of a member
    attribute; belongs_to[id, segment]."""
    alias = alias or f"{aggregator}_{attr}"
    seg_col = [c for c in belongs_to.columns if c != "id"][0]
    rows = belongs_to.join(
        vertices.select("id", F.col(attr).alias("_v")), "id"
    ).where(F.col("_v").isNotNull())
    return rows.groupBy(seg_col).agg(
        _agg_expr(aggregator, F.col("_v"), F.lit(1.0), alias)
    )


def global_aggregate(df: DataFrame, attr: str, aggregator: str = "sum") -> float:
    """Global variants → Scalar (ScalarOperations.scala:21-84)."""
    return df.agg(_agg_expr(aggregator, F.col(attr), F.lit(1.0), "v")).first()["v"]


def histogram(df: DataFrame, attr: str, buckets: int = 10) -> DataFrame:
    """AttributeHistogram.scala / Bucketing.scala — equal-width buckets.
    Returns DataFrame[bucket, lo, hi, count]. One agg for bounds + one
    groupBy — both map-side combinable."""
    lo, hi = df.agg(F.min(attr), F.max(attr)).first()
    if lo is None or hi is None or lo == hi:
        return df.where(F.col(attr).isNotNull()).agg(
            F.lit(0).alias("bucket"),
            F.lit(lo).cast("double").alias("lo"),
            F.lit(hi).cast("double").alias("hi"),
            F.count(F.lit(1)).alias("count"),
        )
    width = (hi - lo) / buckets
    b = F.least(
        F.floor((F.col(attr) - F.lit(lo)) / F.lit(width)), F.lit(buckets - 1)
    ).cast("int")
    return (
        df.where(F.col(attr).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "count",
        )
        .orderBy("bucket")
    )
