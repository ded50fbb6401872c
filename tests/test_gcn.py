"""Tests for operators/gcn.py — numpy GCN training (reference:
sphynx/python/train_GCN_*.py) + distributed prediction parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.gcn import (
    _collect_dense,
    _forward_convs,
    _forward_regressor,
    _gcn_norm,
    predict_with_gcn,
    train_gcn_classifier,
    train_gcn_regressor,
)


@pytest.fixture(scope="module")
def community_graph(spark):
    """Two 8-cliques bridged by one edge; 2-d features = noisy cluster
    indicator (value-derived noise, deterministic)."""
    edges = []
    for base in (0, 8):
        for i in range(8):
            for j in range(8):
                if i != j:
                    edges.append(Row(src=base + i, dst=base + j))
    edges.append(Row(src=0, dst=8))
    edges.append(Row(src=8, dst=0))
    feats = []
    for i in range(16):
        c = i // 8
        n1 = ((i * 7919) % 97) / 97.0 - 0.5
        n2 = ((i * 104729) % 89) / 89.0 - 0.5
        feats.append(Row(id=i, features=[1.0 - c + 0.4 * n1, float(c) + 0.4 * n2]))
    g = Graph(
        vertices=spark.createDataFrame([Row(id=i) for i in range(16)]),
        edges=spark.createDataFrame(edges),
    )
    return g, spark.createDataFrame(feats)


def test_gcn_classifier_learns_and_predicts_distributed(spark, community_graph):
    g, feats = community_graph
    # half the vertices labeled (4 per clique)
    label = spark.createDataFrame(
        [Row(id=i, label=i // 8) for i in range(16) if i % 2 == 0])
    model = train_gcn_classifier(
        g, feats, label, hidden_size=8, iterations=150, seed=3)
    assert model.train_metric >= 0.9
    pred = {r["id"]: r["prediction"] for r in
            predict_with_gcn(g, feats, model).collect()}
    assert len(pred) == 16
    acc = np.mean([pred[i] == i // 8 for i in range(16)])
    assert acc >= 0.9
    # distributed forward == driver-side numpy forward, vertex by vertex
    ids, X, y, src, dst = _collect_dense(g, feats, label, "id", "features",
                                         "label", 50_000)
    out, _ = _forward_convs(model, _gcn_norm(src, dst, len(ids)), X)
    for i, v in enumerate(ids):
        assert pred[v] == float(out[i].argmax())


def test_gcn_regressor_parity_and_fit(spark, community_graph):
    g, feats = community_graph
    # smooth target: first feature coordinate scaled
    label = spark.createDataFrame(
        [Row(id=i, label=float(3.0 * (1.0 - i // 8))) for i in range(16)
         if i % 2 == 0])
    model = train_gcn_regressor(
        g, feats, label, hidden_size=8, iterations=300, seed=3)
    assert model.train_metric < 0.5
    pred = {r["id"]: r["prediction"] for r in
            predict_with_gcn(g, feats, model).collect()}
    ids, X, y, src, dst = _collect_dense(g, feats, label, "id", "features",
                                         "label", 50_000)
    drv, _ = _forward_regressor(model, _gcn_norm(src, dst, len(ids)), X)
    for i, v in enumerate(ids):
        assert pred[v] == pytest.approx(drv[i], abs=1e-9)
    # cliques get clearly different predictions
    lo = np.mean([pred[i] for i in range(8, 16)])
    hi = np.mean([pred[i] for i in range(8)])
    assert hi - lo > 1.0


def test_gcn_forget_mode(spark, community_graph):
    g, feats = community_graph
    label = spark.createDataFrame(
        [Row(id=i, label=i // 8) for i in range(16) if i % 2 == 0])
    model = train_gcn_classifier(
        g, feats, label, hidden_size=8, iterations=150, forget=True,
        batch_size=4, seed=3)
    assert model.forget
    with pytest.raises(ValueError, match="forget"):
        predict_with_gcn(g, feats, model)
    pred = {r["id"]: r["prediction"] for r in
            predict_with_gcn(g, feats, model, label=label).collect()}
    acc = np.mean([pred[i] == i // 8 for i in range(16)])
    assert acc >= 0.8


def test_gcn_guards(spark, community_graph):
    g, feats = community_graph
    label = spark.createDataFrame([Row(id=0, label=0)])
    with pytest.raises(ValueError, match="max_rows"):
        train_gcn_classifier(g, feats, label, max_rows=4)
    with pytest.raises(ValueError, match="no labeled"):
        train_gcn_classifier(g, feats, label.where(F.col("id") < 0))
    with pytest.raises(NotImplementedError, match="GatedGraphConv"):
        from lynxkite_spark.operators.gcn import _check_conv_op

        _check_conv_op("GatedGraphConv")
