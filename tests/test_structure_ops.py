"""Structure transformation semantics (SURVEY.md §2.3)."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph, example_graph
from lynxkite_spark.operators.structure import (
    add_reversed_edges,
    concatenate_bundles,
    edge_graph,
    edges_from_attribute_matches,
    induced_edges,
    loop_edges,
    make_symmetric,
    merge_vertices,
    reverse_edges,
    segmentation_to_edges,
    split_vertices,
    strip_duplicate_edges,
    vertex_set_union,
)


def pairs(df):
    return sorted((r["src"], r["dst"]) for r in df.select("src", "dst").collect())


def test_add_and_reverse_edges(spark):
    g = example_graph(spark)
    assert pairs(reverse_edges(g.edges)) == sorted([(1, 0), (0, 1), (0, 2), (1, 2)])
    rev = add_reversed_edges(g.edges)
    assert rev.count() == 8
    # reversal keeps edge attributes attached
    assert set(rev.columns) == set(g.edges.columns)


def test_make_symmetric_keeps_min_multiplicity(spark):
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (3, 4)], "src long, dst long"
    )
    # 1→2 twice, 2→1 once → keep one in each direction; 3→4 has no reverse
    assert pairs(make_symmetric(e)) == [(1, 2), (2, 1)]


def test_strip_duplicates_and_loops(spark):
    e = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "src long, dst long")
    assert pairs(strip_duplicate_edges(e)) == [(1, 2), (2, 1)]
    v = spark.createDataFrame([(7,), (9,)], "id long")
    assert pairs(loop_edges(v)) == [(7, 7), (9, 9)]


def test_merge_vertices_on_gender(spark):
    """MergeVertices.scala semantics on the example graph: merging on
    gender leaves 2 vertices (min-id representatives 0 and 1) and remaps
    all 4 edges through the mapping."""
    g = example_graph(spark)
    merged, mapping = merge_vertices(g, "gender")
    assert sorted(r["id"] for r in merged.vertices.collect()) == [0, 1]
    m = {r["id"]: r["new_id"] for r in mapping.collect()}
    assert m == {0: 0, 1: 1, 2: 0, 3: 0}
    assert pairs(merged.edges) == sorted([(0, 1), (1, 0), (0, 0), (0, 1)])


def test_induced_edges_filters(spark):
    g = example_graph(spark)
    keep = spark.createDataFrame([(0, 0), (1, 1)], "id long, new_id long")
    assert pairs(induced_edges(g.edges, keep)) == [(0, 1), (1, 0)]


def test_concatenate_bundles(spark):
    ab = spark.createDataFrame([(1, 10, 2.0), (1, 11, 3.0)], "src long, dst long, weight double")
    bc = spark.createDataFrame([(10, 20, 5.0), (11, 20, 1.0)], "src long, dst long, weight double")
    out = concatenate_bundles(ab, bc).collect()
    assert len(out) == 1
    assert out[0]["src"] == 1 and out[0]["dst"] == 20
    assert out[0]["weight"] == pytest.approx(2.0 * 5.0 + 3.0 * 1.0)
    multi = concatenate_bundles(ab, bc, keep_multiplicity=True)
    assert multi.count() == 2


def test_edge_graph_line_graph(spark):
    g = example_graph(spark)
    lg = edge_graph(g)
    assert lg.vertices.count() == 4
    # e0=0→1, e1=1→0, e2=2→0, e3=2→1: pairs with e1.dst==e2.src:
    # e0→e1, e1→e0, e2→e0, e3→e1 → 4 line-graph edges
    assert lg.edges.count() == 4


def test_edges_from_attribute_matches(spark):
    g = example_graph(spark)
    e = edges_from_attribute_matches(g.vertices, "gender")
    # Males: 0,2,3 → 6 ordered pairs
    assert e.count() == 6


def test_segmentation_overlap(spark):
    bt = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (2, 200), (3, 200), (9, 300)],
        "id long, segment long",
    )
    out = {(r["src"], r["dst"]): r["overlap"] for r in segmentation_to_edges(bt, 2).collect()}
    assert out == {(100, 200): 2}


def test_vertex_set_union_disjoint_renumber(spark):
    a = spark.createDataFrame([(1,), (2,)], "id long")
    b = spark.createDataFrame([(1,), (3,)], "id long")
    u = vertex_set_union(a, b)
    assert u.count() == 4
    assert u.select("id").distinct().count() == 4  # no collisions
    back = u.groupBy("source_set").count().collect()
    assert {r["source_set"]: r["count"] for r in back} == {0: 2, 1: 2}


def test_split_vertices(spark):
    v = spark.createDataFrame([(1, 3.0), (2, 0.0), (3, 1.0)], "id long, copies double")
    out = split_vertices(v, "copies")
    per = {r["original_id"]: r["n"] for r in out.groupBy("original_id").agg(F.count("*").alias("n")).collect()}
    assert per == {1: 3, 3: 1}
    assert out.select("id").distinct().count() == 4


def test_split_edges(spark):
    from lynxkite_spark.operators.structure import split_edges
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 0.0), (3, 4, 1.4)], "src long, dst long, n double"
    )
    out = split_edges(e, "n").collect()
    by_pair = {}
    for r in out:
        by_pair.setdefault((r["src"], r["dst"]), []).append(r["index"])
    # round-to-count replication: 2.0 -> 2 copies, 0 -> dropped, 1.4 -> 1
    assert by_pair == {(1, 2): [1, 2], (3, 4): [1]}
    assert len({r["edge_id"] for r in out}) == 3
