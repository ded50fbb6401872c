"""Deterministic corpus shuffle + training-shard layout: assignment is
a pure function of (ids, num_shards, seed), shards are hash-balanced,
positions are dense, the writer round-trips in order, and re-running on
own output overwrites cleanly."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.functions.curation import (
    shard_assignments,
    write_training_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), "id").alias("text")
    )


def test_assignment_partition_invariant(spark, docs):
    a = shard_assignments(docs.repartition(3), 8, seed=3).collect()
    b = shard_assignments(docs.repartition(17), 8, seed=3).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["shard_pos"]) for r in rows)  # noqa: E731
    assert key(a) == key(b)


def test_shards_balanced_and_positions_dense(spark, docs):
    rows = shard_assignments(docs, 8, seed=3).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == set(range(8))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 2 * min(sizes)  # hash balance at n=500
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_seed_reshuffles(spark, docs):
    a = {r["doc_id"]: r["shard"] for r in shard_assignments(docs, 8, seed=0).collect()}
    b = {r["doc_id"]: r["shard"] for r in shard_assignments(docs, 8, seed=1).collect()}
    assert any(a[k] != b[k] for k in a)  # epoch-level reshuffle


def test_rerunnable_on_own_output(spark, docs):
    once = shard_assignments(docs, 8, seed=3)
    twice = shard_assignments(once, 8, seed=3)
    assert twice.columns.count("shard") == 1
    assert sorted(r["shard_pos"] for r in twice.collect()) == sorted(
        r["shard_pos"] for r in once.collect()
    )


def test_writer_roundtrip_in_shard_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, num_shards=4, seed=3)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) == set(
        range(4)
    )
    # file order within a shard == shard_pos order (the loader contract)
    one = (
        spark.read.parquet(f"{path}/shard=1")
        .withColumn("_file_order", F.monotonically_increasing_id())
        .collect()
    )
    in_file = [r["shard_pos"] for r in sorted(one, key=lambda r: r["_file_order"])]
    assert in_file == sorted(in_file)
    # round-trip matches the recomputed assignment exactly
    want = {
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in shard_assignments(docs, 4, seed=3).collect()
    }
    got = {(r["doc_id"], r["shard"], r["shard_pos"]) for r in back.collect()}
    assert got == want
