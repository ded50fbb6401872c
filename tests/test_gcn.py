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
    with pytest.raises(NotImplementedError, match="SAGEConv"):
        from lynxkite_spark.operators.gcn import _check_conv_op

        _check_conv_op("SAGEConv")


def test_gated_classifier_and_distributed_parity(spark, community_graph):
    g, feats = community_graph
    label = spark.createDataFrame(
        [Row(id=i, label=i // 8) for i in range(16) if i % 2 == 0])
    model = train_gcn_classifier(
        g, feats, label, hidden_size=8, iterations=150,
        conv_op="GatedGraphConv", seed=3)
    assert model.gated is not None and model.train_metric >= 0.9
    pred = {r["id"]: r["prediction"] for r in
            predict_with_gcn(g, feats, model).collect()}
    acc = np.mean([pred[i] == i // 8 for i in range(16)])
    assert acc >= 0.9
    from lynxkite_spark.operators.gcn import _forward_gated_net

    ids, X, y, src, dst = _collect_dense(g, feats, label, "id", "features",
                                         "label", 50_000)
    out, _ = _forward_gated_net(model, (src, dst, np.ones(len(src))), X)
    for i, v in enumerate(ids):
        assert pred[v] == float(out[i].argmax())


def test_gated_regressor_distributed_parity(spark, community_graph):
    g, feats = community_graph
    label = spark.createDataFrame(
        [Row(id=i, label=float(3.0 * (1.0 - i // 8))) for i in range(16)
         if i % 2 == 0])
    model = train_gcn_regressor(
        g, feats, label, hidden_size=8, iterations=200,
        conv_op="GatedGraphConv", seed=3)
    pred = {r["id"]: r["prediction"] for r in
            predict_with_gcn(g, feats, model).collect()}
    from lynxkite_spark.operators.gcn import _forward_gated_net

    ids, X, y, src, dst = _collect_dense(g, feats, label, "id", "features",
                                         "label", 50_000)
    drv, _ = _forward_gated_net(model, (src, dst, np.ones(len(src))), X)
    for i, v in enumerate(ids):
        assert pred[v] == pytest.approx(drv[i], abs=1e-9)


def _numeric_grad(loss, params, analytic, atol=1e-5):
    """Central-difference check on a few coordinates of every tensor."""
    eps = 1e-6
    for p, g in zip(params, analytic):
        flat_p, flat_g = p.ravel(), np.asarray(g).ravel()
        step = max(1, flat_p.size // 5)
        for j in range(0, flat_p.size, step):
            orig = flat_p[j]
            flat_p[j] = orig + eps
            up = loss()
            flat_p[j] = orig - eps
            dn = loss()
            flat_p[j] = orig
            assert abs((up - dn) / (2 * eps) - flat_g[j]) < atol, (
                p.shape, j, (up - dn) / (2 * eps), flat_g[j])


def test_gcnconv_backward_matches_numeric():
    """Hand-derived GCNConv backprop vs central differences (CE loss)."""
    from lynxkite_spark.operators.gcn import (
        GCNModel, _backward_convs, _forward_convs,
    )

    rng = np.random.default_rng(0)
    n, d, h, c = 7, 3, 4, 2
    src = np.array([0, 1, 2, 3, 4, 5, 6, 0])
    dst = np.array([1, 2, 3, 4, 5, 6, 0, 3])
    X = rng.normal(size=(n, d))
    y = np.array([0, 1, 0, 1, 0, 1, 0])
    model = GCNModel(
        conv_weights=[(rng.normal(size=(d, h)), rng.normal(size=h)),
                      (rng.normal(size=(h, c)), rng.normal(size=c))],
        is_classification=True, forget=False, num_classes=c)
    Ahat = _gcn_norm(src, dst, n)

    def ce():
        out, _ = _forward_convs(model, Ahat, X)
        z = out - out.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        return -np.mean(np.log(p[np.arange(n), y]))

    out, caches = _forward_convs(model, Ahat, X)
    z = out - out.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    dZ = p.copy()
    dZ[np.arange(n), y] -= 1.0
    dZ /= n
    grads = _backward_convs(model, Ahat, dZ, caches)
    params = [a for Wb in model.conv_weights for a in Wb]
    _numeric_grad(ce, params, grads)


def test_gated_backward_matches_numeric():
    """BPTT through the GRU steps vs central differences (MSE loss)."""
    from lynxkite_spark.operators.gcn import (
        GCNModel, _backward_gated_net, _forward_gated_net, _gated_flat,
        _gated_init,
    )

    rng = np.random.default_rng(1)
    n, d, h = 6, 3, 4
    src = np.array([0, 1, 2, 3, 4, 5])
    dst = np.array([1, 2, 3, 4, 5, 0])
    prop = (src, dst, np.ones(len(src)))
    X = rng.normal(size=(n, d))
    y = rng.normal(size=n)
    model = GCNModel(
        conv_weights=[], is_classification=False, forget=False,
        conv_op="GatedGraphConv",
        lin1=(rng.normal(size=(d, h)), rng.normal(size=h)),
        lin2=(rng.normal(size=(h, 1)), rng.normal(size=1)),
        gated=_gated_init(rng, h, 2))

    def mse():
        pred, _ = _forward_gated_net(model, prop, X)
        return float(np.mean((pred - y) ** 2))

    pred, caches = _forward_gated_net(model, prop, X)
    dpred = 2.0 * (pred - y) / n
    grads = _backward_gated_net(model, prop, dpred, caches)
    params = [*model.lin1, *_gated_flat(model.gated), *model.lin2]
    _numeric_grad(mse, params, grads)
