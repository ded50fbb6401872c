"""FindMaxCliques — distributed maximal-clique enumeration.

Reference: /root/reference/app/com/lynxanalytics/biggraph/graph_operations/
FindMaxCliques.scala — Bron-Kerbosch with degree pivoting; the reference
broadcasts the whole compact graph to every task and starts one BK per
vertex. That broadcast is the non-distributable part, so this
implementation uses the Eppstein-Löffler-Strash decomposition instead:

  * order vertices by (degree, id) — a degeneracy-style total order;
  * every maximal clique is reported exactly once, by its ORDER-MINIMAL
    member v: run Bron-Kerbosch on P = N⁺(v) (neighbors after v),
    X = N⁻(v) (neighbors before v);
  * the per-vertex subproblem only needs the subgraph induced on N(v):
    exactly the triangle-edge lists, built with the same oriented
    two-join as EnumerateTriangles (each triangle emitted once, then
    rotated to its three centers) — never a broadcast of the graph;
  * the local BK (with max-degree pivoting, like the reference) runs in
    a ``cogroup().applyInPandas`` over (neighbor-list, neighborhood-
    edge-list) — Python is sanctioned here: the per-task work is a
    worst-case-exponential local enumeration, not a row-wise map.

Output matches the reference's Segmentation: belongs_to rows
[clique_id, id] with deterministic value-derived clique ids (md5 of the
sorted member list), cliques of size ≥ ``min_clique_size`` only.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.triangles import canonical_edges, enumerate_triangles


def _bron_kerbosch(adj: dict, r: list, p: set, x: set, out: list) -> None:
    if not p and not x:
        out.append(sorted(r))
        return
    pivot_candidates = p | x
    pivot = max(pivot_candidates, key=lambda u: (len(adj.get(u, set()) & p), -u))
    for v in sorted(p - adj.get(pivot, set())):
        nv = adj.get(v, set())
        _bron_kerbosch(adj, r + [v], p & nv, x & nv, out)
        p = p - {v}
        x = x | {v}


def find_max_cliques(
    graph: Graph,
    min_clique_size: int = 3,
    needs_both_directions: bool = False,
) -> DataFrame:
    """Returns belongs_to DataFrame[clique_id: string, id: long] — one
    row per (maximal clique, member); clique_id is md5 of the sorted
    member ids (deterministic at any parallelism)."""
    e = canonical_edges(graph.edges, needs_both_directions)
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("deg"))

    # neighbor lists with the (deg, id) order flag relative to the center
    adj = (
        sym.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("dv")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("dn")), "b")
        .select(
            F.col("a").alias("v"),
            F.col("b").alias("nbr"),
            (
                (F.col("dn") > F.col("dv"))
                | ((F.col("dn") == F.col("dv")) & (F.col("b") > F.col("a")))
            ).alias("after"),
        )
    )

    # neighborhood edges: every triangle, rotated to its three centers
    tri = enumerate_triangles(graph, needs_both_directions)
    nbr_edges = (
        tri.select(F.col("a").alias("v"), F.col("b").alias("x"), F.col("c").alias("y"))
        .unionByName(
            tri.select(F.col("b").alias("v"), F.col("a").alias("x"), F.col("c").alias("y"))
        )
        .unionByName(
            tri.select(F.col("c").alias("v"), F.col("a").alias("x"), F.col("b").alias("y"))
        )
    )

    min_size = min_clique_size

    def bk_per_vertex(key, adj_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(key[0])
        nbrs_after = set(adj_pdf.loc[adj_pdf["after"], "nbr"].astype("int64"))
        nbrs_before = set(adj_pdf.loc[~adj_pdf["after"], "nbr"].astype("int64"))
        local: dict[int, set] = {}
        for x, y in zip(edges_pdf["x"].astype("int64"), edges_pdf["y"].astype("int64")):
            local.setdefault(int(x), set()).add(int(y))
            local.setdefault(int(y), set()).add(int(x))
        found: list[list[int]] = []
        _bron_kerbosch(local, [v], set(nbrs_after), set(nbrs_before), found)
        rows = []
        for clique in found:
            if len(clique) < min_size:
                continue
            cid = hashlib.md5(",".join(map(str, clique)).encode()).hexdigest()
            rows.extend((cid, m) for m in clique)
        return pd.DataFrame(rows, columns=["clique_id", "id"])

    grouped_adj = adj.groupBy("v")
    grouped_edges = nbr_edges.groupBy("v")
    return grouped_adj.cogroup(grouped_edges).applyInPandas(
        bk_per_vertex, "clique_id string, id long"
    )


def check_cliques(
    graph: Graph,
    belongs_to: DataFrame,
    needs_both_directions: bool = False,
    cliques_to_check: list | None = None,
) -> DataFrame:
    """CheckClique.scala:44-90 — validate a clique segmentation: a
    clique is valid iff the intersection of its members'
    (self ∪ neighbors) sets equals the member set, which catches BOTH a
    missing internal edge (intersection shrinks) and a missed extension
    vertex, i.e. non-maximality (intersection grows).

    The reference folds each clique's sets in one closure; here it is
    columnar: count, per (clique, candidate u), the members v with
    u ∈ {v} ∪ N(v) — u is in the intersection iff the count equals the
    clique size; valid iff intersection == members.  With
    ``needs_both_directions`` the out- and in-neighbor intersections
    are computed separately and both must equal the member set.

    Returns DataFrame[clique_id] of INVALID cliques (empty = all valid;
    the reference returns the first 100 as a scalar — ``.limit(100)``).
    """
    bt = belongs_to.select("clique_id", F.col("id").alias("v"))
    if cliques_to_check is not None:
        keep = F.col("clique_id").isin([str(c) for c in cliques_to_check])
        bt = bt.where(keep)
    sizes = bt.groupBy("clique_id").agg(F.count(F.lit(1)).alias("sz"))
    e = graph.edges.select("src", "dst")
    out_pairs = e.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    in_pairs = e.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    self_pairs = bt.select("v", F.col("v").alias("u")).distinct()

    def intersection_for(pairs: DataFrame) -> DataFrame:
        """DataFrame[clique_id, u]: u ∈ ∩_{v∈members} ({v} ∪ N(v))."""
        adj = pairs.unionByName(self_pairs.select("v", "u")).distinct()
        counts = (
            bt.join(adj, "v")
            .groupBy("clique_id", "u")
            .agg(F.count(F.lit(1)).alias("c"))
            .join(sizes, "clique_id")
        )
        return counts.where(F.col("c") == F.col("sz")).select(
            "clique_id", F.col("u")
        )

    if needs_both_directions:
        # CheckClique.scala intersects the out-set fold with the in-set
        # fold FIRST, then compares the combined set against members: a
        # vertex that extends the clique in only one direction is not a
        # valid extension, so it must NOT flag the clique as non-maximal.
        inter = intersection_for(out_pairs).join(
            intersection_for(in_pairs), ["clique_id", "u"]
        )
    else:
        inter = intersection_for(out_pairs.unionByName(in_pairs))

    # symmetric difference between the intersection and members, per clique
    members = bt.select("clique_id", F.col("v").alias("u"))
    extra = inter.join(members, ["clique_id", "u"], "left_anti")
    missing = members.join(inter, ["clique_id", "u"], "left_anti")
    return extra.select("clique_id").unionByName(
        missing.select("clique_id")
    ).distinct()
