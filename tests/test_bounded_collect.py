"""The shared driver-collection guard (VERDICT r4 items 2 & 5): every
driver-side reference-parity operator must refuse an over-budget input
BEFORE materializing it. Each test hands the operator a multi-million-row
DataFrame with a tiny budget — if the guard collected first (round 4's
steiner bug), these would OOM/stall instead of raising promptly."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.bounded import bounded_collect
from lynxkite_spark.graph import Graph

BIG = 5_000_000  # far beyond every budget below; cheap as a range scan


def big_vertices(spark):
    return spark.range(BIG).select("id")


def test_bounded_collect_under_limit_returns_all_sorted(spark):
    rows = bounded_collect(
        spark.range(100).select("id").sort(F.col("id").desc()), 100, "t")
    assert [r[0] for r in rows] == list(range(99, -1, -1))


def test_bounded_collect_over_limit_raises_and_bounds_transfer(spark):
    with pytest.raises(ValueError, match="max_rows=1000"):
        bounded_collect(big_vertices(spark), 1000, "t")


def test_steiner_guard_fires_before_collect(spark):
    from lynxkite_spark.operators.steiner import prize_collecting_steiner_tree

    g = Graph(
        vertices=big_vertices(spark).withColumn("gain", F.lit(1.0)),
        edges=spark.range(10).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")),
    )
    with pytest.raises(ValueError, match="prize_collecting_steiner_tree"):
        prize_collecting_steiner_tree(g, max_elements=500)


def test_steiner_edge_budget_shares_max_elements(spark):
    from lynxkite_spark.operators.steiner import prize_collecting_steiner_tree

    g = Graph(
        vertices=spark.range(10).select("id").withColumn("gain", F.lit(1.0)),
        edges=spark.range(BIG).select(
            (F.col("id") % 10).alias("src"), ((F.col("id") + 1) % 10).alias("dst")),
    )
    with pytest.raises(ValueError, match="edges"):
        prize_collecting_steiner_tree(g, max_elements=500)


def test_tsne_guard_fires_before_collect(spark):
    from lynxkite_spark.operators.embeddings import tsne_embedding

    df = big_vertices(spark).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.0), F.lit(1.0)).alias("embedding"))
    with pytest.raises(ValueError, match="tsne_embedding"):
        tsne_embedding(df, max_rows=100)


def test_gcn_guard_fires_before_collect(spark):
    from lynxkite_spark.operators.gcn import train_gcn_classifier

    g = Graph(
        vertices=big_vertices(spark),
        edges=spark.range(10).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")),
    )
    feats = spark.range(10).select(
        "id", F.array(F.lit(1.0)).alias("features"))
    labels = spark.range(10).select("id", (F.col("id") % 2).alias("label"))
    with pytest.raises(ValueError, match="GCN training"):
        train_gcn_classifier(g, feats, labels, max_rows=100)


def test_hyper_map_landmark_guard(spark):
    from lynxkite_spark.operators.hyperbolic import hyper_map

    edges = spark.range(2_000).select(
        (F.col("id") % 500).alias("src"), ((F.col("id") * 7) % 500).alias("dst"))
    g = Graph(vertices=spark.range(500).select("id"), edges=edges)
    with pytest.raises(ValueError, match="hyper_map"):
        hyper_map(g, max_landmarks=2)
