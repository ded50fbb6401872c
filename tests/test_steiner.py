"""Tests for operators/steiner.py — prize-collecting Steiner tree
(reference: sphynx/dapcstp, the Leitner et al. dual-ascent primal
heuristic)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.steiner import (
    _PCST,
    _dual_ascent,
    prize_collecting_steiner_tree,
)


def _butterfly_bow() -> _PCST:
    """The reference's ButterflyBowGraph fixture (dual_test.go:7-22)."""
    g = _PCST(
        n=5, m=6,
        src=[0, 1, 2, 0, 3, 4],
        dst=[1, 2, 0, 3, 4, 0],
        cost=[1.0, 2.0, 0.0, 4.0, 4.0, 0.0],
        prize=[0.0, 0.0, 3.5, 0.0, 2.0],
        fixed=[False, False, False, True, False],
        terminal=[False, False, True, True, True],
        incoming=[[2, 5], [0], [1], [3], [4]],
        outgoing=[[0, 3], [1], [2], [4], [5]],
        root=0)
    return g


def test_dual_ascent_matches_reference_fixture():
    """Exact parity with TestDualAscent (dual_test.go:50-77): lower
    bound 9, reduced costs [0,0,0,0,2,0], residual prizes
    [0,0,0.5,0,0]."""
    lb, cr, pi = _dual_ascent(_butterfly_bow())
    assert lb == pytest.approx(9.0)
    assert cr == pytest.approx([0.0, 0.0, 0.0, 0.0, 2.0, 0.0])
    assert pi == pytest.approx([0.0, 0.0, 0.5, 0.0, 0.0])


def test_pcst_operator_selects_profitable_subtree(spark):
    """Root candidate 1; terminal 3 (prize 10, path cost 5) is kept,
    terminal 5 (prize 1, path cost 12) is strong-pruned away."""
    v = spark.createDataFrame([
        Row(id=1, gain=None, root_costs=0.0),
        Row(id=2, gain=None, root_costs=None),
        Row(id=3, gain=10.0, root_costs=None),
        Row(id=4, gain=None, root_costs=None),
        Row(id=5, gain=1.0, root_costs=None),
    ])
    e = spark.createDataFrame([
        Row(src=1, dst=2, cost=2.0),
        Row(src=2, dst=3, cost=3.0),
        Row(src=1, dst=4, cost=4.0),
        Row(src=4, dst=5, cost=8.0),
    ])
    res = prize_collecting_steiner_tree(Graph(vertices=v, edges=e))
    assert res.profit == pytest.approx(5.0)
    assert {r["id"] for r in res.nodes.collect()} == {1, 2, 3}
    assert {(r["src"], r["dst"]) for r in res.arcs.collect()} == {
        (1, 2), (2, 3)}
    assert {r["id"] for r in res.roots.collect()} == {1}


def test_pcst_picks_cheaper_root(spark):
    """Two root candidates with different root costs: the solution
    reaches the terminal through the cheaper one."""
    v = spark.createDataFrame([
        Row(id=1, gain=None, root_costs=5.0),
        Row(id=2, gain=None, root_costs=0.5),
        Row(id=3, gain=4.0, root_costs=None),
    ])
    e = spark.createDataFrame([
        Row(src=1, dst=3, cost=1.0),
        Row(src=2, dst=3, cost=1.0),
    ])
    res = prize_collecting_steiner_tree(Graph(vertices=v, edges=e))
    assert {r["id"] for r in res.roots.collect()} == {2}
    assert res.profit == pytest.approx(4.0 - 1.0 - 0.5)


def test_pcst_guard(spark):
    v = spark.createDataFrame([Row(id=i, gain=1.0, root_costs=0.0)
                               for i in range(10)])
    e = spark.createDataFrame([Row(src=i, dst=i + 1, cost=1.0)
                               for i in range(9)])
    with pytest.raises(ValueError, match="max_elements"):
        prize_collecting_steiner_tree(
            Graph(vertices=v, edges=e), max_elements=5)
