"""FindMaxCliques vs an independent pure-Python Bron-Kerbosch."""

from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.cliques import find_max_cliques


def _simple_bk_all(vertices, edges):
    """Pivot-free reference Bron-Kerbosch over the whole graph."""
    adj = {v: set() for v in vertices}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = []

    def bk(r, p, x):
        if not p and not x:
            out.append(tuple(sorted(r)))
            return
        for v in sorted(p):
            bk(r | {v}, p & adj[v], x & adj[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(vertices), set())
    return out


def _er(spark, n=30, seed=5, mod=4):
    v = spark.range(n).select("id")
    e = (
        v.alias("a")
        .crossJoin(v.alias("b"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .where(F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(mod)) == 0)
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(vertices=v, edges=e)


def _collect_cliques(df):
    groups = {}
    for r in df.collect():
        groups.setdefault(r["clique_id"], []).append(r["id"])
    return {tuple(sorted(m)) for m in groups.values()}


def test_max_cliques_match_reference_bk(spark):
    g = _er(spark)
    got = _collect_cliques(find_max_cliques(g, min_clique_size=3))
    vs = [r["id"] for r in g.vertices.collect()]
    es = [(r["src"], r["dst"]) for r in g.edges.collect()]
    expected = {c for c in _simple_bk_all(vs, es) if len(c) >= 3}
    assert got == expected


def test_max_cliques_min_size_and_overlap(spark):
    # two overlapping triangles + a 4-clique
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (5, 6), (5, 7), (5, 8),
             (6, 7), (6, 8), (7, 8)]
    v = spark.range(1, 9).select("id")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    g = Graph(vertices=v, edges=e)
    got = _collect_cliques(find_max_cliques(g, min_clique_size=3))
    assert got == {(1, 2, 3), (2, 3, 4), (5, 6, 7, 8)}
    got4 = _collect_cliques(find_max_cliques(g, min_clique_size=4))
    assert got4 == {(5, 6, 7, 8)}
