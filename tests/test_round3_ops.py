"""Tests for the round-3 gap-closers: regression trainers,
remove_non_symmetric_edges, check_cliques, basic_stats."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph


def test_train_regression_recovers_line(spark):
    from lynxkite_spark.models import predict_from_model, train_regression

    # y = 3x1 - 2x2 + 100, exactly (offset keeps labels away from 0,
    # where the reference's MAPE is infinite by its own double math)
    rows = [
        Row(id=i, x1=float(i % 7), x2=float((i * 3) % 5),
            y=3.0 * (i % 7) - 2.0 * ((i * 3) % 5) + 100.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    m = train_regression(df, ["x1", "x2"], "y", method="Linear regression")
    coefs = m.statistics["coefficients"]
    assert abs(coefs[0] - 3.0) < 1e-6 and abs(coefs[1] + 2.0) < 1e-6
    assert abs(coefs[2] - 100.0) < 1e-6
    assert m.statistics["r2"] > 0.999999
    assert m.statistics["mape"] < 1e-6
    assert len(m.statistics["t_values"]) == 3  # unbiased solver only
    pred = predict_from_model(m, df).join(df, "id")
    assert pred.agg(F.max(F.abs(F.col("prediction") - F.col("y")))).first()[0] < 1e-6


def test_train_regression_methods(spark):
    from lynxkite_spark.models import train_regression

    rows = [Row(id=i, x=float(i), y=2.0 * i + 1.0) for i in range(20)]
    df = spark.createDataFrame(rows)
    ridge = train_regression(df, ["x"], "y", method="Ridge regression")
    lasso = train_regression(df, ["x"], "y", method="Lasso")
    assert "t_values" in ridge.statistics       # elastic_net = 0
    assert "t_values" not in lasso.statistics   # biased solver
    # both regularized fits still track the line closely
    assert abs(ridge.statistics["coefficients"][0] - 2.0) < 0.05
    assert abs(lasso.statistics["coefficients"][0] - 2.0) < 0.05
    with pytest.raises(ValueError, match="unknown method"):
        train_regression(df, ["x"], "y", method="wat")


def test_decision_tree_regressor(spark):
    from lynxkite_spark.models import predict_from_model, train_decision_tree_regressor

    # piecewise-constant target over a coarse feature (6 distinct
    # values, well under maxBins): a depth-2 tree fits it exactly
    rows = [Row(id=i, x=float(i // 10),
                y=10.0 if i < 20 else (20.0 if i < 40 else 30.0))
            for i in range(60)]
    df = spark.createDataFrame(rows)
    m = train_decision_tree_regressor(df, ["x"], "y", max_depth=3, seed=1)
    assert m.statistics["mape"] < 1e-9
    pred = predict_from_model(m, df).join(df, "id")
    assert pred.where(F.col("prediction") != F.col("y")).count() == 0


def test_remove_non_symmetric_edges(spark):
    from lynxkite_spark.operators.structure import remove_non_symmetric_edges

    e = spark.createDataFrame([
        Row(src=1, dst=2), Row(src=2, dst=1), Row(src=1, dst=2),  # symmetric pair, multiplicity 2 one way
        Row(src=3, dst=4),                                        # one-way: dropped
    ])
    out = {(r["src"], r["dst"]) for r in remove_non_symmetric_edges(e).collect()}
    assert out == {(1, 2), (2, 1)}
    # multiplicity preserved on the kept side (unlike make_symmetric)
    assert remove_non_symmetric_edges(e).count() == 3


@pytest.fixture()
def clique_graph(spark):
    # K4 on {0,1,2,3} plus vertex 4 attached to all of {0,1,2} only
    edges = []
    for i in range(4):
        for j in range(4):
            if i < j:
                edges.append(Row(src=i, dst=j))
    for i in range(3):
        edges.append(Row(src=i, dst=4))
    v = spark.createDataFrame([Row(id=i) for i in range(5)])
    return Graph(vertices=v, edges=spark.createDataFrame(edges))


def test_check_cliques(spark, clique_graph):
    from lynxkite_spark.operators.cliques import check_cliques

    bt = spark.createDataFrame(
        # c_good: the maximal clique {0,1,2,3}
        [Row(clique_id="c_good", id=i) for i in range(4)]
        # c_notclique: {1,2,4} ∪ {3} — 3-4 not adjacent
        + [Row(clique_id="c_notclique", id=i) for i in (1, 2, 3, 4)]
        # c_notmax: {0,1,2} is a clique but extendable by both 3 and 4
        + [Row(clique_id="c_notmax", id=i) for i in (0, 1, 2)]
    )
    invalid = {r["clique_id"] for r in check_cliques(clique_graph, bt).collect()}
    assert invalid == {"c_notclique", "c_notmax"}

    only = {r["clique_id"] for r in check_cliques(
        clique_graph, bt, cliques_to_check=["c_good", "c_notmax"]).collect()}
    assert only == {"c_notmax"}


def test_check_cliques_validates_find_max_cliques(spark, clique_graph):
    """End-to-end: every clique emitted by find_max_cliques passes the
    reference's validation check."""
    from lynxkite_spark.operators.cliques import check_cliques, find_max_cliques

    bt = find_max_cliques(clique_graph, min_clique_size=3)
    assert bt.select("clique_id").distinct().count() >= 2
    assert check_cliques(clique_graph, bt).count() == 0


def test_check_cliques_both_directions(spark):
    from lynxkite_spark.operators.cliques import check_cliques

    # directed triangle 0->1->2->0: a clique when one direction is
    # enough, NOT a clique when both directions are required
    g = Graph(
        vertices=spark.createDataFrame([Row(id=i) for i in range(3)]),
        edges=spark.createDataFrame(
            [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=0)]
        ),
    )
    bt = spark.createDataFrame([Row(clique_id="t", id=i) for i in range(3)])
    assert check_cliques(g, bt).count() == 0
    assert {r["clique_id"] for r in check_cliques(
        g, bt, needs_both_directions=True).collect()} == {"t"}


def test_check_cliques_one_direction_extension_is_not_invalid(spark):
    """CheckClique.scala intersects the out-fold with the in-fold BEFORE
    comparing against members: a vertex reachable from every member in
    only ONE direction is not a valid extension, so the clique stays
    maximal and must NOT be flagged."""
    from lynxkite_spark.operators.cliques import check_cliques

    # 0 <-> 1 is a maximal both-direction clique; vertex 2 is an
    # out-only candidate (0->2, 1->2) — in ∩out-sets but not ∩in-sets.
    g = Graph(
        vertices=spark.createDataFrame([Row(id=i) for i in range(3)]),
        edges=spark.createDataFrame(
            [Row(src=0, dst=1), Row(src=1, dst=0),
             Row(src=0, dst=2), Row(src=1, dst=2)]
        ),
    )
    bt = spark.createDataFrame([Row(clique_id="c", id=i) for i in range(2)])
    assert check_cliques(g, bt, needs_both_directions=True).count() == 0


def test_basic_stats(spark, clique_graph):
    from lynxkite_spark.operators.scalars import basic_stats

    row = basic_stats(clique_graph).first()
    assert row["n_vertices"] == 5 and row["n_edges"] == 9


def test_pyfiles_artifact_importable(tmp_path):
    """The spark-submit --py-files zip must be importable standalone
    (north rule: runs via spark-submit --py-files) and byte-identical
    across builds (deterministic packaging)."""
    import subprocess
    import sys as _sys

    out1 = str(tmp_path / "a.zip")
    out2 = str(tmp_path / "b.zip")
    for out in (out1, out2):
        subprocess.run(
            [_sys.executable, "tools/package_pyfiles.py", out],
            check=True, cwd="/root/repo", capture_output=True,
        )
    assert open(out1, "rb").read() == open(out2, "rb").read()
    probe = subprocess.run(
        [_sys.executable, "-c",
         f"import sys; sys.path.insert(0, {out1!r}); "
         "import lynxkite_spark.operators.pagerank as p; "
         "import lynxkite_spark.models, lynxkite_spark.geo; "
         "print('ok')"],
        capture_output=True, text=True,
    )
    assert probe.returncode == 0 and probe.stdout.strip() == "ok", probe.stderr


def test_compare_segmentation_edges(spark):
    from lynxkite_spark.operators.structure import compare_segmentation_edges

    golden = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4),
         Row(src=1, dst=2)]  # parallel edge counts once
    )
    test = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=9, dst=9)]
    )
    scalars, test_f, golden_f = compare_segmentation_edges(golden, test)
    row = scalars.first()
    assert row["precision"] == pytest.approx(2 / 3)
    assert row["recall"] == pytest.approx(2 / 3)
    tf = {(r["src"], r["dst"]): r["present_in_golden"] for r in test_f.collect()}
    assert tf == {(1, 2): 1.0, (2, 3): 1.0, (9, 9): None}
    gf = {(r["src"], r["dst"]): r["present_in_test"] for r in golden_f.collect()}
    assert gf == {(1, 2): 1.0, (2, 3): 1.0, (3, 4): None}


def test_vertex_neighborhood(spark):
    from lynxkite_spark.operators.sampling import vertex_neighborhood

    # path graph 0-1-2-3-4 plus an isolated 9
    g = Graph(
        vertices=spark.createDataFrame([Row(id=i) for i in [0, 1, 2, 3, 4, 9]]),
        edges=spark.createDataFrame(
            [Row(src=i, dst=i + 1) for i in range(4)]
        ),
    )
    got = {r["id"]: r["distance"] for r in vertex_neighborhood(
        g, [0], radius=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    # cap keeps nearest-first
    capped = {r["id"] for r in vertex_neighborhood(g, [0], radius=4,
                                                   max_count=3).collect()}
    assert capped == {0, 1, 2}
    # two centers merge
    two = {r["id"]: r["distance"] for r in vertex_neighborhood(
        g, [0, 4], radius=1).collect()}
    assert two == {0: 0, 4: 0, 1: 1, 3: 1}


def test_vertex_bucket_grid(spark):
    from lynxkite_spark.operators.sampling import vertex_bucket_grid

    v = spark.createDataFrame(
        [Row(id=i, x=float(i), y=float(i % 2)) for i in range(8)]
    )
    grid = {(r["x_bucket"], r["y_bucket"]): r["count"]
            for r in vertex_bucket_grid(v, "x", "y", x_buckets=2,
                                        y_buckets=2).collect()}
    # x splits at 3.5; y values 0/1 land in buckets 0/1
    assert sum(grid.values()) == 8
    assert grid[(0, 0)] == 2 and grid[(0, 1)] == 2
    assert grid[(1, 0)] == 2 and grid[(1, 1)] == 2
