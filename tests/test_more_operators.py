"""k-core, Lin/average-distance/sfigality/Laplacian centralities,
random-walk sampling."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph, graph_from_adjacency
from lynxkite_spark.operators.centrality import (
    average_distance,
    laplacian_centrality,
    lin_centrality,
    sfigality,
)
from lynxkite_spark.operators.kcore import core_decomposition
from lynxkite_spark.operators.sampling import random_walk_sample


def _as_map(df, key="id", val=None):
    val = val or [c for c in df.columns if c != key][0]
    return {r[key]: r[val] for r in df.collect()}


# ------------------------------------------------------------------ k-core


def test_kcore_triangle_with_pendant(spark):
    """Triangle {0,1,2} core 2; pendant 3 core 1; isolated 4 core 0."""
    g = graph_from_adjacency(spark, {0: [1, 2, 3], 1: [2], 4: []})
    got = _as_map(core_decomposition(g))
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 0}


def test_kcore_clique_and_chain(spark):
    """4-clique core 3 everywhere; chain hanging off it degrades to 1."""
    adj = {0: [1, 2, 3], 1: [2, 3], 2: [3], 3: [4], 4: [5]}
    got = _as_map(core_decomposition(graph_from_adjacency(spark, adj)))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}


def test_kcore_direction_and_duplicates_ignored(spark):
    """Parallel edges, loops and direction must not change core numbers."""
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(3)], "id long")
    got = _as_map(core_decomposition(Graph(vertices=v, edges=e)))
    assert got == {0: 2, 1: 2, 2: 2}


# ------------------------------------------------- Lin / average distance


def test_lin_and_average_distance_on_path(spark):
    """Directed path 0→1→2, coreachable orientation
    (HyperBallCentrality.scala:68-100 conventions)."""
    g = graph_from_adjacency(spark, {0: [1], 1: [2]})
    lin = _as_map(lin_centrality(g))
    assert lin[0] == pytest.approx(1.0)  # empty coreachable set → 1.0
    assert lin[1] == pytest.approx(4.0)  # size 2² / sum 1
    assert lin[2] == pytest.approx(3.0)  # size 3² / sum 3
    avg = _as_map(average_distance(g))
    assert avg[0] == pytest.approx(0.0)
    assert avg[1] == pytest.approx(1.0)
    assert avg[2] == pytest.approx(1.5)


def test_lin_respects_distance_cap(spark):
    """With max_distance=1 the 2-hop root is invisible to vertex 2."""
    g = graph_from_adjacency(spark, {0: [1], 1: [2]})
    lin = _as_map(lin_centrality(g, max_distance=1))
    assert lin[2] == pytest.approx(4.0)  # only {2, 1} reach within 1 hop


# ------------------------------------------------- sfigality / Laplacian


def test_sfigality_star(spark):
    """Leaves' single neighbor out-degrees them → 1.0; hub → 0.0."""
    g = graph_from_adjacency(spark, {0: [1, 2, 3], 4: []})
    got = _as_map(sfigality(g))
    assert got[0] == pytest.approx(0.0)
    assert got[1] == got[2] == got[3] == pytest.approx(1.0)
    assert got[4] == pytest.approx(0.0)


def test_laplacian_centrality_path(spark):
    """Path 0-1-2: LC = deg² + deg + 2·Σ neighbor deg."""
    g = graph_from_adjacency(spark, {0: [1], 1: [2]})
    got = _as_map(laplacian_centrality(g))
    assert got == {0: 6.0, 1: 10.0, 2: 6.0}


# ------------------------------------------------------ random walk sample


def test_random_walk_sample_valid_and_deterministic(spark):
    adj = {i: [(i + 1) % 10, (i + 3) % 10] for i in range(10)}
    g = graph_from_adjacency(spark, adj)
    s1 = _as_map(random_walk_sample(g, num_walkers=2, max_steps=8, seed=7))
    assert all(v in range(10) for v in s1)
    assert 0 in set(s1.values())  # start vertices visited at step 0
    # partition invariance: same sample at a different layout
    g2 = Graph(vertices=g.vertices.repartition(13), edges=g.edges.repartition(17))
    s2 = _as_map(random_walk_sample(g2, num_walkers=2, max_steps=8, seed=7))
    assert s1 == s2


def test_random_walk_restarts_trap_free(spark):
    """A walker that hits a sink restarts rather than stalling null."""
    g = graph_from_adjacency(spark, {0: [1], 1: []})
    s = _as_map(random_walk_sample(g, num_walkers=1, max_steps=5, seed=1))
    assert set(s) <= {0, 1} and len(s) >= 1


# --------------------------------------------------- modular clustering


def test_louvain_two_triangles(spark):
    """Two triangles joined by one edge: Louvain must find exactly the
    two triangles as communities."""
    from lynxkite_spark.operators.modular import modular_clustering

    adj = {0: [1, 2], 1: [2], 3: [4, 5], 4: [5], 2: [3]}
    g = graph_from_adjacency(spark, adj)
    labels = _as_map(modular_clustering(g), val="label")
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]


def test_louvain_improves_modularity_and_is_partition_invariant(spark):
    """On a 4-clique-ring the partition found must score high modularity
    and be identical at any input partitioning."""
    from lynxkite_spark.operators.clustering import modularity
    from lynxkite_spark.operators.modular import modular_clustering

    adj = {}
    for c in range(4):  # 4 cliques of 5, ring-connected
        base = c * 5
        for i in range(5):
            adj.setdefault(base + i, []).extend(
                base + j for j in range(i + 1, 5)
            )
        adj.setdefault(base, []).append(((c + 1) % 4) * 5)
    g = graph_from_adjacency(spark, adj)
    bt = modular_clustering(g)
    labels = _as_map(bt, val="label")
    # each clique is one community
    for c in range(4):
        vals = {labels[c * 5 + i] for i in range(5)}
        assert len(vals) == 1
    q = modularity(g, bt.select("id", "label"), "label")
    assert q > 0.5

    g2 = Graph(vertices=g.vertices.repartition(7), edges=g.edges.repartition(11))
    labels2 = _as_map(modular_clustering(g2), val="label")
    assert labels == labels2


def test_segment_by_event_sequence_matches_reference_fold(spark):
    """Columnar SegmentByEventSequence vs a literal Python port of the
    reference's ContinuousEventsSegmentGenerator fold."""
    import math

    from lynxkite_spark.operators.segmentation import segment_by_event_sequence

    rows = []
    # person 1: A A B A with times inside/outside the window
    data = {
        1: [(0.0, "A"), (100.0, "A"), (3000.0, "B"), (9000.0, "A")],
        2: [(500.0, "X"), (600.0, "Y"), (20000.0, "X")],
        3: [(42.0, "Z")],
    }
    eid = 0
    for p, evs in data.items():
        for t, loc in evs:
            rows.append((eid, p, float(t), loc))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, event_type string")

    L, step, wlen = 2, 1000.0, 2500.0
    got = {
        (r["person"], r["time_bucket"], r["locations"])
        for r in segment_by_event_sequence(
            df, time_col="ts", sequence_length=L,
            time_window_step=step, time_window_length=wlen,
        ).collect()
    }

    expected = set()
    for p, evs in data.items():
        evs = sorted(evs)
        # merge runs of equal location
        spans = []
        for t, loc in evs:
            if spans and spans[-1][2] == loc:
                spans[-1] = (spans[-1][0], t, loc)
            else:
                spans.append((t, t, loc))
        for i in range(len(spans) - L + 1):
            win = spans[i : i + L]
            first, last = win[0], win[-1]
            locs = ",".join(s[2] for s in win)
            min_b = math.floor(max(first[0], last[1] - wlen) / step)
            max_b = math.floor(first[1] / step)
            for b in range(min_b, max_b + 1):
                expected.add((p, b, locs))
    assert got == expected


def test_segment_by_event_sequence_with_gaps(spark):
    """EventsWithGapsSegmentGenerator: all order-preserving location
    pairs within each event's forward time window."""
    from lynxkite_spark.operators.segmentation import segment_by_event_sequence

    rows = [
        (0, 1, 0.0, "A"),
        (1, 1, 10.0, "B"),
        (2, 1, 20.0, "C"),
        (3, 1, 5000.0, "D"),
        (4, 2, 0.0, "X"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts double, event_type string")
    got = {
        (r["person"], r["time_bucket"], r["locations"])
        for r in segment_by_event_sequence(
            df, time_col="ts", sequence_length=2,
            time_window_step=1000.0, time_window_length=100.0,
            algorithm="with-gaps",
        ).collect()
    }
    # person 1, window 100s: from A -> [A,B,C]: AB, AC, BC; from B -> [B,C]:
    # BC; from C -> [C]; from D -> [D]; all bucket 0 except D (bucket 5,
    # no pair). person 2: single event, no pair.
    assert got == {
        (1, 0, "A,B"),
        (1, 0, "A,C"),
        (1, 0, "B,C"),
    }
