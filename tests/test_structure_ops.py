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


def test_set_overlap_for_cc_component_parity(spark):
    """SetOverlapForCC: the cheap variant must yield the same connected
    components as the full SetOverlap graph, at both min_overlap levels,
    on a heavy-overlap fixture — while emitting far fewer edges."""
    import itertools
    import random

    from lynxkite_spark.graph import Graph
    from lynxkite_spark.operators.components import connected_components
    from lynxkite_spark.operators.structure import segmentation_to_edges_for_cc

    rng = random.Random(11)
    rows = []
    # two heavy-overlap families of 20 segments over shared member pools
    # (every pair overlaps a lot), plus sparse random segments
    for fam, base in ((0, 100), (1, 500)):
        pool = list(range(base, base + 30))
        for s in range(20):
            for m in rng.sample(pool, 12):
                rows.append((m, fam * 1000 + s))
    for s in range(40, 60):
        for m in rng.sample(range(1000, 1100), 3):
            rows.append((m, 2000 + s))
    bt = spark.createDataFrame(rows, "id long, segment long").distinct()

    def components(edges_df):
        segs = bt.select(F.col("segment").alias("id")).distinct()
        g = Graph(vertices=segs, edges=edges_df.select("src", "dst"))
        comp = {r["id"]: r["component"]
                for r in connected_components(g).collect()}
        groups: dict = {}
        for k, v in comp.items():
            groups.setdefault(v, set()).add(k)
        return {frozenset(v) for v in groups.values()}

    for k in (1, 2, 5):
        full = segmentation_to_edges(bt, k).select(
            "src", "dst")
        cheap = segmentation_to_edges_for_cc(bt, k)
        assert components(full) == components(cheap), f"min_overlap={k}"
        # bounded output: the heavy-overlap families must not enumerate
        # all pairs (full graph has ~2*190 pairs just in the families)
        if k > 1:
            assert cheap.count() < 2 * full.count()

    # planted worst case: 30 identical segments (every pair qualifies).
    # Full enumeration = 435 pairs; the CC variant emits a linear number.
    ident = spark.createDataFrame(
        [(m, s) for s in range(30) for m in range(10)],
        "id long, segment long",
    )
    full_n = segmentation_to_edges(ident, 5).count()
    cheap_n = segmentation_to_edges_for_cc(ident, 5).count() // 2
    assert full_n == 435
    assert cheap_n <= 2 * 29  # spanning-star scale, not quadratic
    assert components(segmentation_to_edges(ident, 5).select("src", "dst")) == \
        components(segmentation_to_edges_for_cc(ident, 5))


def test_set_overlap_for_cc_max_segment_size_cap(spark):
    """VERDICT r4 item 4: a planted mega-segment must spill to the
    star path — per-bucket member arrays stay bounded by the cap —
    while components stay identical to the uncapped run (the fixture's
    big-incident overlaps all exceed min_overlap, so the documented
    ≥1-member relaxation on big-incident edges changes nothing here)."""
    from lynxkite_spark.graph import Graph
    from lynxkite_spark.operators.components import connected_components
    from lynxkite_spark.operators.structure import segmentation_to_edges_for_cc

    rows = []
    # chain of 30 small segments: s and s+1 share members {10s, 10s+1}
    for s in range(30):
        for m in range(10 * s, 10 * s + 12):
            rows.append((m, s))
    # mega-segment 999: 5000 members incl. 2 members of segment 0 only
    rows += [(m, 999) for m in range(100_000, 105_000)]
    rows += [(0, 999), (1, 999)]
    # isolated small pair sharing just 1 member with nothing else (stays
    # its own component at min_overlap=2)
    rows += [(200_000, 50), (200_001, 50), (200_001, 51), (200_002, 51)]
    bt = spark.createDataFrame(rows, "id long, segment long").distinct()

    def comps(edges_df):
        segs = bt.select(F.col("segment").alias("id")).distinct()
        g = Graph(vertices=segs, edges=edges_df.select("src", "dst"))
        comp = {r["id"]: r["component"]
                for r in connected_components(g).collect()}
        groups: dict = {}
        for k, v in comp.items():
            groups.setdefault(v, set()).add(k)
        return {frozenset(v) for v in groups.values()}

    exact = segmentation_to_edges_for_cc(bt, min_overlap=2)
    capped = segmentation_to_edges_for_cc(
        bt, min_overlap=2, max_segment_size=100)
    assert comps(exact) == comps(capped)
    # the cap really bounds what reaches the bucket path: replaying the
    # split, no surviving segment exceeds the cap (the 5002-member
    # mega-segment is excluded from every bucket's member arrays)
    sizes = bt.groupBy("segment").count()
    big = sizes.where(F.col("count") > 100).select("segment")
    survivors = bt.join(big, "segment", "left_anti").groupBy("segment").count()
    assert survivors.agg(F.max("count")).first()[0] <= 100
    assert big.count() == 1
    # mega-segment still connected to segment 0 via the spill edges
    assert capped.where(
        (F.col("src") == 999) & (F.col("dst") == 0)).count() == 1


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
