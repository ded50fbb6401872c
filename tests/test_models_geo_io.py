"""Tests for the pyspark.ml model family (models.py), the geo operators
(geo.py), segment-by-vector, and the connector contracts (sources/io.py).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lynxkite_spark.models import (
    classify_with_model,
    lloyd_kmeans,
    predict_from_model,
    train_decision_tree,
    train_kmeans,
    train_logistic_regression,
)


@pytest.fixture(scope="module")
def blobs(spark):
    """Three well-separated deterministic 2-d blobs, 30 points each."""
    rows = []
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]
    for cid, (cx, cy) in enumerate(centers):
        for i in range(30):
            # value-derived jitter in [-1, 1): no RNG state
            jx = ((i * 7919 + cid * 104729) % 2000) / 1000.0 - 1.0
            jy = ((i * 104729 + cid * 7919) % 2000) / 1000.0 - 1.0
            rows.append(Row(id=cid * 30 + i, x=cx + jx, y=cy + jy, blob=cid))
    return spark.createDataFrame(rows)


def test_train_kmeans_recovers_blobs(spark, blobs):
    m = train_kmeans(blobs, ["x", "y"], k=3, max_iterations=20, seed=7)
    assert m.method == "KMeans clustering"
    assert m.statistics["cost"] < 90 * 2.0  # within-blob jitter only
    out = classify_with_model(m, blobs)
    # clusters must be the blobs exactly (up to relabeling)
    joined = out.join(blobs, "id")
    purity = (
        joined.groupBy("blob")
        .agg(F.countDistinct("classification").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert purity == 1
    assert out.select("classification").distinct().count() == 3


def test_train_kmeans_empty_raises(spark, blobs):
    with pytest.raises(ValueError, match="empty"):
        train_kmeans(blobs.where(F.col("id") < 0), ["x", "y"], k=2)


def test_logistic_regression_separable(spark, blobs):
    df = blobs.withColumn("label", (F.col("blob") == 2).cast("double"))
    m = train_logistic_regression(df, ["x", "y"], "label", max_iterations=20)
    pred = classify_with_model(m, df).join(df, "id")
    acc = pred.where(F.col("classification") == F.col("label")).count() / 90
    assert acc == 1.0  # linearly separable
    zs = m.statistics["z_values"]
    assert len(zs) == 3  # two coefficients + intercept
    assert all(isinstance(z, float) for z in zs)
    cert = classify_with_model(m, df).select(F.min("certainty")).first()[0]
    assert 0.5 <= cert <= 1.0


def test_logistic_regression_degenerate_labels(spark, blobs):
    df = blobs.withColumn("label", F.lit(0.0))
    m = train_logistic_regression(df, ["x", "y"], "label")
    assert m.statistics["z_values"][-1] == -math.inf
    df1 = blobs.withColumn("label", F.lit(1.0))
    m1 = train_logistic_regression(df1, ["x", "y"], "label")
    assert m1.statistics["z_values"][-1] == math.inf


def test_decision_tree_with_string_features(spark, blobs):
    df = blobs.withColumn(
        "side", F.when(F.col("x") > 5, F.lit("east")).otherwise(F.lit("west"))
    ).withColumn("label", (F.col("blob") == 1).cast("double"))
    m = train_decision_tree(df, ["side", "y"], "label", max_depth=3, seed=1)
    assert m.statistics["accuracy"] == 1.0  # blob 1 == east side
    assert m.string_mappings["side"] == {"east": 0.0, "west": 1.0}
    pred = predict_from_model(m, df).join(df, "id")
    assert pred.where(F.col("prediction") != F.col("label")).count() == 0


def test_lloyd_kmeans_deterministic_and_exact(spark):
    rows = [
        Row(vec_id=i, embedding=[float((i * 31 + d * 17) % 13) / 3.0 for d in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    out1 = {r["cluster"]: (r["size"], r["s0"]) for r in lloyd_kmeans(
        df, k=3, iterations=2, quantize=100).collect()}
    # repartitioned input must give bit-identical results (exact integer
    # arithmetic — no float summation order anywhere)
    out2 = {r["cluster"]: (r["size"], r["s0"]) for r in lloyd_kmeans(
        df.repartition(7), k=3, iterations=2, quantize=100).collect()}
    assert out1 == out2
    assert sum(s for s, _ in out1.values()) == 40

    # independent pure-Python replay
    import numpy as np

    X = np.array([[math.floor(v * 100 + 0.5) for v in r.embedding] for r in rows],
                 dtype=np.int64)
    cent = {c: (X[c].copy(), 1) for c in range(3)}
    for _ in range(2):
        assign = {}
        for vid in range(40):
            best = min(
                (float((X[vid] * n - s).astype(np.int64) @ (X[vid] * n - s)) / (n * n), c)
                for c, (s, n) in cent.items()
            )
            assign[vid] = best[1]
        cent = {
            c: (sum(X[v] for v in assign if assign[v] == c),
                sum(1 for v in assign if assign[v] == c))
            for c in set(assign.values())
        }
    expect = {c: (n, int(s[0])) for c, (s, n) in cent.items()}
    assert out1 == expect


def test_segment_by_vector_attribute(spark):
    from lynxkite_spark.operators.segmentation import segment_by_vector_attribute

    df = spark.createDataFrame(
        [Row(id=1, tags=["a", "b", "a"]), Row(id=2, tags=["b"]),
         Row(id=3, tags=None)]
    )
    segments, belongs = segment_by_vector_attribute(df, "tags")
    sizes = {r["segment"]: r["size"] for r in segments.collect()}
    # multiplicity preserved: vertex 1 contributes 'a' twice
    assert sizes == {"a": 2, "b": 2}
    assert belongs.count() == 4


def test_lookup_region_boxes_and_polygon(spark):
    from lynxkite_spark.geo import lookup_region

    regions = spark.createDataFrame([
        Row(region="box_a", min_lat=0.0, max_lat=10.0, min_lon=0.0, max_lon=10.0),
        Row(region="box_b", min_lat=5.0, max_lat=15.0, min_lon=5.0, max_lon=15.0),
    ])
    pts = spark.createDataFrame([
        Row(id=1, lat=1.0, lon=1.0),    # only box_a
        Row(id=2, lat=7.0, lon=7.0),    # both -> min = box_a
        Row(id=3, lat=12.0, lon=12.0),  # only box_b
        Row(id=4, lat=50.0, lon=50.0),  # neither -> NULL
    ])
    out = {r["id"]: r["region"] for r in lookup_region(pts, regions).collect()}
    assert out == {1: "box_a", 2: "box_a", 3: "box_b", 4: None}

    # triangle polygon: (0,0) (10,0) (0,10); (6,6) is outside it but
    # inside the bounding box -- the ray cast must reject it
    tri = [Row(lat=0.0, lon=0.0), Row(lat=10.0, lon=0.0), Row(lat=0.0, lon=10.0)]
    regions_p = spark.createDataFrame([
        Row(region="tri", min_lat=0.0, max_lat=10.0, min_lon=0.0, max_lon=10.0,
            polygon=tri),
    ])
    pts_p = spark.createDataFrame([
        Row(id=1, lat=2.0, lon=2.0),   # inside triangle
        Row(id=2, lat=6.0, lon=6.0),   # inside box, outside triangle
    ])
    out_p = {r["id"]: r["region"] for r in lookup_region(pts_p, regions_p).collect()}
    assert out_p == {1: "tri", 2: None}


def test_geographical_proximity_haversine(spark):
    from lynxkite_spark.geo import haversine_m, segment_by_geographical_proximity

    # Paris (48.8566, 2.3522) <-> London (51.5074, -0.1278) ~ 343-344 km
    d = spark.range(1).select(
        haversine_m(F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278))
    ).first()[0]
    assert 340_000 < d < 348_000

    regions = spark.createDataFrame([
        Row(region="paris", lat=48.8566, lon=2.3522),
        Row(region="brussels", lat=50.8503, lon=4.3517),
    ])
    pts = spark.createDataFrame([
        Row(id=1, lat=48.8, lon=2.4),     # near Paris
        Row(id=2, lat=51.5074, lon=-0.1278),  # London: near neither at 200km
    ])
    links = segment_by_geographical_proximity(pts, regions, 200_000)
    got = {(r["id"], r["region"]) for r in links.collect()}
    assert got == {(1, "paris")}


def test_partition_attribute_train_test_workflow(spark):
    """PartitionAttribute.scala: split an attribute by role, train on
    the train side, score MAPE on the held-out test side — the
    reference's standard ML workflow shape."""
    from lynxkite_spark.models import predict_from_model, train_regression
    from lynxkite_spark.operators.attributes import partition_attribute

    rows = [(i, float(i), 3.0 * i + 1.0,
             "train" if i % 3 else "test") for i in range(1, 61)]
    df = spark.createDataFrame(rows, "id long, x double, y double, role string")

    test_y, train_y = partition_attribute(df, "y")
    assert test_y.count() == 20 and train_y.count() == 40
    assert {r["role"] for r in df.join(test_y.select("id"), "id").select("role").distinct().collect()} == {"test"}

    # role=null / attr=null rows are undefined on both sides
    df2 = df.unionByName(spark.createDataFrame(
        [(100, 1.0, None, "test"), (101, 1.0, 2.0, None)],
        "id long, x double, y double, role string"))
    t2, tr2 = partition_attribute(df2, "y")
    assert t2.count() == 20 and tr2.count() == 40

    train_df = df.join(train_y.select("id"), "id", "left_semi")
    m = train_regression(train_df, ["x"], "y")
    preds = predict_from_model(m, df.join(test_y.select("id"), "id", "left_semi"))
    scored = preds.join(df, "id").select(
        "prediction", F.col("y").alias("label"))
    mape = scored.agg(F.avg(
        F.abs(F.col("prediction") / F.col("label") - 1.0)) * 100).first()[0]
    assert mape < 1.0  # exact linear data -> near-zero held-out error


def test_geographical_proximity_antimeridian_wrap(spark):
    """A vertex at lon 179.9 and a region at -179.9 are ~0.2 deg apart;
    the bounding prefilter must wrap the lon delta instead of seeing
    359.8 and dropping a genuinely in-range link."""
    from lynxkite_spark.geo import segment_by_geographical_proximity

    regions = spark.createDataFrame([Row(region="fiji", lat=-17.0, lon=-179.9)])
    pts = spark.createDataFrame([Row(id=1, lat=-17.0, lon=179.9)])
    for strategy in ("broadcast", "grid"):
        links = segment_by_geographical_proximity(
            pts, regions, 100_000, strategy=strategy)
        assert {(r["id"], r["region"]) for r in links.collect()} == {(1, "fiji")}, strategy


def test_geographical_proximity_grid_matches_broadcast(spark):
    """strategy='grid' (shuffle-join on grid cells, for region tables too
    big to broadcast) returns exactly the broadcast path's links —
    including polar-cap and antimeridian pairs — and its plan contains
    no cartesian/nested-loop join."""
    import random

    from lynxkite_spark.geo import segment_by_geographical_proximity

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [Row(id=i, lat=rng.uniform(-90, 90), lon=rng.uniform(-180, 180))
         for i in range(120)]
        + [Row(id=1000, lat=86.0, lon=10.0),      # polar cap
           Row(id=1001, lat=85.5, lon=-170.0),
           Row(id=1002, lat=40.0, lon=179.95)]    # seam
    )
    regions = spark.createDataFrame(
        [Row(region=f"r{i}", lat=rng.uniform(-90, 90), lon=rng.uniform(-180, 180))
         for i in range(40)]
        + [Row(region="pole", lat=85.8, lon=-120.0),
           Row(region="seam", lat=40.1, lon=-179.98)]
    )
    for dist in (50_000, 400_000, 2_000_000):
        b = segment_by_geographical_proximity(pts, regions, dist)
        g = segment_by_geographical_proximity(pts, regions, dist, strategy="grid")
        got_b = {(r["id"], r["region"]) for r in b.collect()}
        got_g = {(r["id"], r["region"]) for r in g.collect()}
        assert got_g == got_b, f"dist={dist}"
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jdbc_roundtrip_via_derby(spark, tmp_path):
    """The JDBC path end-to-end against the Derby engine that ships in
    Spark's own jars — proves the connector contract works when a driver
    is present, not just that the error is clean."""
    from lynxkite_spark.sources.io import read_table, write_table

    url = f"jdbc:derby:{tmp_path}/contractdb;create=true"
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )
    write_table(df, "people", format="jdbc", mode="overwrite", url=url,
                dbtable="people", driver="org.apache.derby.jdbc.EmbeddedDriver")
    back = read_table(spark, "people", format="jdbc", url=url,
                      dbtable="people",
                      driver="org.apache.derby.jdbc.EmbeddedDriver")
    assert back.count() == 10
    assert back.agg(F.sum("doubled")).first()[0] == 90


def test_lakehouse_contract_errors(spark, tmp_path):
    """Delta/Iceberg jars are absent in the sandbox: the routed error
    must be the documented RuntimeError naming the fix, not an opaque
    ClassNotFound."""
    from lynxkite_spark.sources.io import read_table

    for fmt in ("delta", "iceberg"):
        with pytest.raises(RuntimeError, match="spark-submit --packages"):
            read_table(spark, str(tmp_path / "t"), format=fmt)


def test_unknown_format_rejected(spark):
    from lynxkite_spark.sources.io import read_table

    with pytest.raises(ValueError, match="unknown format"):
        read_table(spark, "/tmp/x", format="wat")


def test_neo4j_export_contract_error(spark):
    """ExportToNeo4j analog: without the connector jar the routed error
    names the fix; the write options are the connector's public
    contract (asserted by the error, not an opaque ClassNotFound)."""
    from lynxkite_spark.sources.io import export_graph_to_neo4j

    v = spark.range(3).select(F.col("id"))
    e = spark.createDataFrame([Row(src=0, dst=1), Row(src=1, dst=2)])
    with pytest.raises(RuntimeError, match="neo4j connector not available"):
        export_graph_to_neo4j(v, e, url="neo4j://localhost:7687")


def test_embedding_near_duplicates_banded(spark):
    """Banded near-dup recall: planted near-duplicate pairs (cosine
    ~0.999) must all surface; the single-bucket signature is a subset."""
    from lynxkite_spark.functions.similarity import embedding_near_duplicates

    rows = []
    for i in range(50):
        base = [float((i * 31 + d * 17) % 13) - 6.0 for d in range(16)]
        rows.append(Row(vec_id=i, embedding=base))
        if i < 10:  # planted near-dup: tiny perturbation
            rows.append(Row(vec_id=100 + i,
                            embedding=[v + 0.01 for v in base]))
    df = spark.createDataFrame(rows)
    got = {(r["a"], r["b"]) for r in embedding_near_duplicates(
        df, threshold=0.99, dim=16).collect()}
    planted = {(i, 100 + i) for i in range(10)}
    assert planted <= got
