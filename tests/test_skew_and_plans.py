"""Skew handling (HybridRDD semantics) + physical-plan assertions."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.corpus import synth_corpus
from lynxkite_spark.derive import derive_file_edges, derive_repo_edges
from lynxkite_spark.graph import Graph
from lynxkite_spark.operators import pagerank
from lynxkite_spark.plans.skew import hot_keys, hybrid_join, salted_join


def test_hybrid_join_equals_plain_join(spark):
    """The hybrid split must be a pure execution-strategy change."""
    big = spark.createDataFrame(
        [(i % 5, i) for i in range(1000)], "k long, payload long"
    )
    lookup = spark.createDataFrame([(i, i * 10) for i in range(5)], "k long, v long")
    hot = hot_keys(big, "k", threshold=150)  # keys 0..4 each have 200 rows
    assert hot.count() == 5
    a = sorted(tuple(r) for r in hybrid_join(big, lookup, "k", hot=hot).collect())
    b = sorted(tuple(r) for r in big.join(lookup, "k").collect())
    assert a == b


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame([(i % 3, i) for i in range(300)], "k long, payload long")
    lookup = spark.createDataFrame([(i, i * 10) for i in range(3)], "k long, v long")
    a = sorted(tuple(r) for r in salted_join(big, lookup, "k", salts=8).collect())
    b = sorted(tuple(r) for r in big.join(lookup, "k").collect())
    assert a == b


def test_pagerank_on_skewed_hub_corpus(spark):
    """FIXTURES.md skew fixture: ≥30% of files import the hub repo.
    PageRank with a tiny skew threshold (forces the hybrid path) must
    match PageRank with the hybrid path disabled."""
    corpus = synth_corpus(spark, n_repos=30, n_files=600, seed=42, hub_fraction=0.4)
    edges, _ = derive_repo_edges(corpus)
    g = Graph.from_edges(edges)
    # hub in-degree check: repo 0 should dominate
    hub_w = (
        edges.groupBy("dst").agg(F.sum("weight").alias("w")).orderBy(F.col("w").desc())
    )
    top = hub_w.first()
    total = edges.agg(F.sum("weight")).first()[0]
    assert top["w"] / total > 0.25

    r_plain = {
        r["id"]: r["pagerank"]
        for r in pagerank(g, iterations=5, tol=None, skew_threshold=10**9).collect()
    }
    r_hybrid = {
        r["id"]: r["pagerank"]
        for r in pagerank(g, iterations=5, tol=None, skew_threshold=1).collect()
    }
    assert set(r_plain) == set(r_hybrid)
    for k in r_plain:
        assert r_plain[k] == pytest.approx(r_hybrid[k], abs=1e-9)


def test_parquet_scan_prunes_columns(spark):
    """SURVEY §4.1: column pruning must reach the parquet scan — the
    reference needed ProtoTable.minimize for this; we get it from
    Catalyst, but verify it actually happens."""
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = (
        df.select("l_orderkey", "l_partkey")
        .where(F.col("l_orderkey") > 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "l_extendedprice" not in plan  # unused columns pruned
    assert "ReadSchema" in plan or "Scan parquet" in plan


def test_parquet_scan_pushes_filters(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = (
        df.where(F.col("l_orderkey") == 42)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("PushedFilters")[1][:200]


def test_dictionary_join_is_broadcast(spark):
    """derive.py broadcasts the repo dictionary — assert the plan says so."""
    corpus = synth_corpus(spark, n_repos=10, n_files=50, seed=42)
    edges, _ = derive_repo_edges(corpus)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_pagerank_join_paths_equivalent(spark):
    """The broadcast / hybrid / shuffle-hash gather paths are pure
    execution-strategy choices: identical ranks from all three."""
    from lynxkite_spark.operators.generators import erdos_renyi

    g = erdos_renyi(spark, n=400, avg_degree=8, seed=7)
    r_bcast = {
        r["id"]: r["pagerank"]
        for r in pagerank(g, iterations=5, tol=None, broadcast_threshold=10**9).collect()
    }
    r_shuffle = {
        r["id"]: r["pagerank"]
        for r in pagerank(g, iterations=5, tol=None, broadcast_threshold=0).collect()
    }
    assert set(r_bcast) == set(r_shuffle)
    for k in r_bcast:
        assert r_bcast[k] == pytest.approx(r_shuffle[k], abs=1e-12)


def test_shuffle_hash_hint_respected(spark):
    """The iterative loops hint shuffle_hash on the small state side so
    the big edge table is never re-sorted per iteration (and AQE must
    not flip it back to a driver-built broadcast — that serial build is
    the scaling killer this engine avoids; see session.py)."""
    big = spark.range(0, 200_000).select(
        (F.col("id") % 50_000).alias("src"), F.col("id").alias("v")
    )
    lookup = spark.range(0, 2_000_000).select(
        F.col("id").alias("src"), (F.col("id") * 2).alias("x")
    )
    j = big.join(lookup.hint("shuffle_hash"), "src")
    j.count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
