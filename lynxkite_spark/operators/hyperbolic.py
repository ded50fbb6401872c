"""Hyperbolic (popularity × similarity) operators — PSOGenerator.scala,
HyperbolicEdgeProbability.scala, HyperbolicPrediction.scala re-expressed
Spark-first (paper: Papadopoulos et al., "Popularity versus similarity
in growing networks", arXiv:1205.4384).

The reference COLLECTS the whole vertex set to the driver and walks a
linked list (PSOGenerator.scala:97-126) — single-node by construction.
Here the same candidate structure (each vertex meets its ~K angular
ring neighbors in both directions plus its K predecessors in appearance
order) is built distributed: a range-partitioned angular rank + an
appearance rank, one explode over step offsets, and two rank-equi-joins
— candidate volume Σ2K_i, never all-pairs, no driver collect.

Randomness is value-derived (hash of id and seed → angular), so
coordinates and edges are identical at any parallelism.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from lynxkite_spark.graph import Graph
from lynxkite_spark.operators.attributes import add_ranking


def phi(a1: Column, a2: Column) -> Column:
    """Angular separation on the circle (HyperDistance.phi)."""
    pi = F.lit(math.pi)
    return pi - F.abs(pi - F.abs(a1 - a2))


def hyperbolic_distance(r1: Column, a1: Column, r2: Column, a2: Column) -> Column:
    """HyperDistance.hyperbolicDistance: r1 + r2 + 2·ln(φ/2)."""
    return r1 + r2 + 2 * F.log(phi(a1, a2) / 2)


def _epso_expected_degree(
    exponent: float, external: float, internal: float, n: int, ord_col: Column
) -> Column:
    """HyperDistance.totalExpectedEPSO / internalConnectionsEPSO."""
    beta = 1 - exponent
    first = (2 * internal * beta) / (
        (1 - float(n) ** (-beta)) ** 2 * (2 * exponent - 1)
    )
    second = F.pow(F.lit(float(n)) / ord_col, 2 * exponent - 1) - 1
    third = 1 - F.pow(ord_col.cast("double"), -beta)
    return F.lit(external) + F.lit(first) * second * third


def _ring_candidates(verts: DataFrame, n: int, log_size: float) -> DataFrame:
    """The reference's linked-list sample, columnar: for each vertex,
    K = ⌊log(n)·expectedDegree⌋ steps along the angular ring in both
    directions plus K steps back along appearance (ord) order.
    ``verts`` needs [id, ord, radial, angular, exp_deg, a_rank, o_rank]
    with ranks in 0..n-1. Returns candidate pairs with both endpoints'
    coordinates."""
    k = F.greatest(
        F.lit(1), F.floor(F.lit(log_size) * F.col("exp_deg")).cast("long")
    )
    steps = verts.withColumn("_k", k).select(
        "id", "ord", "radial", "angular", "exp_deg", "a_rank", "o_rank",
        F.explode(F.sequence(F.lit(1), F.col("_k"))).alias("_j"),
    )
    targets = steps.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    F.lit("a").alias("kind"),
                    F.pmod(F.col("a_rank") + F.col("_j"), F.lit(n)).alias("t"),
                ),
                F.struct(
                    F.lit("a").alias("kind"),
                    F.pmod(F.col("a_rank") - F.col("_j"), F.lit(n)).alias("t"),
                ),
                F.struct(
                    F.lit("o").alias("kind"),
                    (F.col("o_rank") - F.col("_j")).alias("t"),
                ),
            )
        ).alias("_tgt"),
    ).select(
        F.col("id").alias("src"), F.col("radial").alias("r1"),
        F.col("angular").alias("a1"), F.col("exp_deg"),
        "_tgt.kind", "_tgt.t",
    ).where(F.col("t") >= 0)
    dst_a = verts.select(
        F.lit("a").alias("kind"), F.col("a_rank").alias("t"),
        F.col("id").alias("dst"), F.col("radial").alias("r2"),
        F.col("angular").alias("a2"),
    )
    dst_o = verts.select(
        F.lit("o").alias("kind"), F.col("o_rank").alias("t"),
        F.col("id").alias("dst"), F.col("radial").alias("r2"),
        F.col("angular").alias("a2"),
    )
    return (
        targets.join(dst_a.unionByName(dst_o), ["kind", "t"])
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _with_coords(
    vertices: DataFrame, seed: int, n: int, exponent: float,
    external_degree: float, internal_degree: float,
) -> DataFrame:
    """PSOGenerator.scala:72-93: ord = appearance rank + ⌊ln n⌋
    (popularity fading), radial = 2·ln(ord), angular value-derived
    uniform on [0, 2π)."""
    log_size = math.log(n)
    ranked = add_ranking(vertices.select("id"), "o_rank", "id")
    u = (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1 << 40))
         / F.lit(float(1 << 40)))
    verts = ranked.select(
        "id", "o_rank",
        (F.col("o_rank") + int(log_size)).cast("double").alias("ord"),
        (u * 2 * math.pi).alias("angular"),
    ).withColumn("radial", 2 * F.log(F.greatest(F.col("ord"), F.lit(1.0))))
    verts = verts.withColumn(
        "exp_deg",
        _epso_expected_degree(exponent, external_degree, internal_degree, n,
                              F.col("ord")),
    )
    return add_ranking(verts, "a_rank", "angular")


def pso_generate(
    vertices: DataFrame,
    external_degree: float = 2.0,
    internal_degree: float = 1.0,
    exponent: float = 0.6,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """PSOGenerator.scala:50-143 — scale-free, high-clustering edges
    from the E-PSO model: for each vertex keep the ⌊expectedDegree⌋
    hyperbolically-nearest candidates, then symmetrize.

    Returns (coords[id, radial, angular], edges[src, dst])."""
    n = vertices.count()
    verts = _with_coords(
        vertices, seed, n, exponent, external_degree, internal_degree
    ).localCheckpoint(eager=False)
    cand = _ring_candidates(verts, n, math.log(n))
    scored = cand.withColumn(
        "_d",
        hyperbolic_distance(F.col("r1"), F.col("a1"), F.col("r2"), F.col("a2")),
    )
    w = W.partitionBy("src").orderBy(F.col("_d").asc(), F.col("dst").asc())
    picked = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.greatest(F.floor("exp_deg"), F.lit(1)))
        .select("src", "dst")
    )
    sym = picked.unionByName(
        picked.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return verts.select("id", "radial", "angular"), sym


def hyperbolic_edge_probability(
    graph: Graph, coords: DataFrame
) -> DataFrame:
    """HyperbolicEdgeProbability.scala:40-110 — per-edge connection
    probability given hyperbolic coordinates; temperature inferred from
    the average clustering coefficient, exponent from the degree
    distribution's log-log endpoints, like the reference.
    Returns edges + probability."""
    from lynxkite_spark.operators.clustering import clustering_coefficient
    from lynxkite_spark.operators.degrees import degree

    n = coords.count()
    avg_clus = clustering_coefficient(graph).agg(
        F.sum("clustering_coefficient")
    ).first()[0] / n
    guess = (0.9 - avg_clus) * 4 + 0.1
    temperature = guess if 0 < guess < 0.85 else 0.85
    deg = degree(graph, direction="all")
    stats = deg.where(F.col("degree") > 0).agg(
        F.max("degree").alias("hi"), F.min("degree").alias("lo")
    ).first()
    avg_deg = deg.agg(F.avg("degree")).first()[0]
    bottom_count = deg.where(F.col("degree") == stats["lo"]).count()
    if stats["hi"] > stats["lo"]:
        gamma = math.log(bottom_count) / (
            math.log(stats["hi"]) - math.log(stats["lo"])
        )
    else:
        gamma = 0.0
    exponent = 1 / (gamma - 1) if 2 < gamma < 3 else 0.6

    ranked = add_ranking(coords, "_or", "radial").select(
        "id", "radial", "angular", (F.col("_or") + 1).cast("double").alias("ord")
    )
    e = graph.edges.select("src", "dst")
    src_c = ranked.select(F.col("id").alias("src"), F.col("radial").alias("r1"),
                          F.col("angular").alias("a1"), F.col("ord").alias("o1"))
    dst_c = ranked.select(F.col("id").alias("dst"), F.col("radial").alias("r2"),
                          F.col("angular").alias("a2"))
    joined = e.join(src_c, "src").join(dst_c, "dst")
    return joined.select(
        "src", "dst",
        _probability(temperature, exponent, avg_deg).alias("probability"),
    )


def _probability(temperature: float, exponent: float, external: float) -> Column:
    """HyperDistance.probability/expectedConnections over columns
    r1/a1/o1 (source, with appearance rank) and r2/a2 (target)."""
    dist = hyperbolic_distance(F.col("r1"), F.col("a1"), F.col("r2"), F.col("a2"))
    inv_exp = (1 / (1 - exponent)) * (1 - F.pow(F.col("o1"), -(1 - exponent)))
    first = (2 * temperature) / math.sin(temperature * math.pi)
    arg = F.lit(first) * inv_exp / external
    # Java math.log(0) is -Infinity (the reference's path for the
    # radial-minimal vertex, whose inverseExponent is exactly 0 →
    # expected = +inf → probability 1); Spark's log(0) is NULL, so the
    # boundary is restored explicitly
    expected = F.col("r1") - 2 * F.log(arg)
    return F.when(arg <= 0, F.lit(1.0)).otherwise(
        1 / (1 + F.exp((1 / (2 * temperature)) * (dist - expected)))
    )


def _np_probability(r1, a1, o1, r2, a2, temperature, exponent, external):
    """numpy twin of _probability (HyperDistance.probability) — used by
    the HyperMap likelihood search, broadcasting over (rows, samples)."""
    import numpy as np

    pi = math.pi
    ph = pi - np.abs(pi - np.abs(a1 - a2))
    with np.errstate(divide="ignore"):
        dist = r1 + r2 + 2 * np.log(ph / 2)
    inv_exp = (1 / (1 - exponent)) * (1 - o1 ** -(1 - exponent))
    first = (2 * temperature) / math.sin(temperature * pi)
    arg = first * inv_exp / external
    with np.errstate(divide="ignore", over="ignore"):
        expected = r1 - 2 * np.where(arg > 0, np.log(np.maximum(arg, 1e-300)), 0.0)
        p = np.where(
            arg <= 0,
            1.0,
            1.0 / (1.0 + np.exp(np.clip((dist - expected) / (2 * temperature),
                                        -700, 700))),
        )
    return p


def _ml_angular(ords, offsets, adj_mask, s_radial, s_angular,
                temperature, exponent, external, iterations):
    """HyperMap.maximumLikelihoodRecursion, vectorized over a batch of
    vertices: bisection on the angular coordinate, comparing the
    PSO-model likelihood of the vertex's observed links/non-links to the
    fixed sample list at the two quarter points each round.

    ords: (n,) appearance ords; offsets: (n,) random angular offsets;
    adj_mask: (n, s) bool — does vertex i link to sample j;
    s_radial/s_angular: (s,) sample coordinates.  Returns (n,) angular."""
    import numpy as np

    n = len(ords)
    cw = np.full(n, 2 * math.pi)
    ccw = np.zeros(n)
    radial = 2 * np.log(ords)
    best = np.zeros(n)

    def norm(a):
        return np.where(a > 2 * math.pi, a - 2 * math.pi, a)

    def loglik(ang):
        # (n, s) link probabilities at candidate angular `ang`
        p = _np_probability(
            radial[:, None], ang[:, None], ords[:, None],
            s_radial[None, :], s_angular[None, :],
            temperature, exponent, external,
        )
        p = np.clip(p, 1e-15, 1 - 1e-15)
        return np.where(adj_mask, np.log(p), np.log1p(-p)).sum(axis=1)

    for _ in range(iterations + 1):
        span = cw - ccw
        top = norm(cw - span / 4 + offsets)
        bottom = norm(ccw + span / 4 + offsets)
        top_wins = loglik(top) > loglik(bottom)
        new_cw = np.where(top_wins, cw, ccw + span / 2)
        new_ccw = np.where(top_wins, cw - span / 2, ccw)
        best = np.where(top_wins, top, bottom)
        cw, ccw = new_cw, new_ccw
    return best


def _hash_u(x: int, seed: int) -> float:
    """Driver-side value-derived uniform in [0,1) — deterministic, no
    RNG state (the distributed twin uses xxhash64 the same way)."""
    import hashlib

    h = hashlib.md5(f"{x}|{seed}".encode()).hexdigest()
    return int(h[:12], 16) / float(1 << 48)


def hyper_map(
    graph: Graph,
    seed: int = 42,
    degrees: DataFrame | None = None,
    max_landmarks: int = 500_000,
) -> DataFrame:
    """HyperMap.scala:39-160 — fit hyperbolic (radial, angular)
    coordinates to an existing undirected graph (arXiv:1205.4384):
    radial from the degree rank (popularity), angular by maximizing the
    PSO-model likelihood of each vertex's links against a ~log n sample
    of landmark vertices.

    The reference COLLECTS the whole edge list and walks vertices on the
    driver (HyperMap.scala:105-131 collectedEdges).  Spark-first split:
    the O(log n) greedy landmark placement stays driver-side (inherently
    sequential, exactly the part the reference's paper serializes); the
    placement of every OTHER vertex is independent given the landmarks,
    so it runs as one Arrow-batched pandas UDF over (ord, links-to-
    samples) — the only data movement is a semi-join of the edge table
    onto the ~log n sample ids, never a full collect.  Temperature and
    exponent are inferred exactly like the reference (clustering-based
    guess clamped to (0, 0.85]; log-log degree endpoints).

    Returns DataFrame[id, radial, angular]."""
    import numpy as np
    import pandas as pd

    from lynxkite_spark.operators.clustering import clustering_coefficient
    from lynxkite_spark.operators.degrees import degree as degree_op

    n = graph.vertices.count()
    log_n = math.log(max(n, 2))
    deg = degrees if degrees is not None else degree_op(graph, direction="all")
    avg_deg = deg.agg(F.avg("degree")).first()[0] or 1.0
    avg_clus = (clustering_coefficient(graph).agg(
        F.sum("clustering_coefficient")).first()[0] or 0.0) / max(n, 1)
    guess = (0.9 - avg_clus) * 4 + 0.1
    temperature = guess if 0 < guess < 0.85 else 0.85
    stats = deg.where(F.col("degree") > 0).agg(
        F.max("degree").alias("hi"), F.min("degree").alias("lo")).first()
    if stats["hi"] is not None and stats["hi"] > stats["lo"]:
        bottom_count = deg.where(F.col("degree") == stats["lo"]).count()
        gamma = (
            math.log(max(bottom_count, 1))
            / (math.log(stats["hi"]) - math.log(stats["lo"]))
        )
    else:  # uniform-degree or edgeless graph: no power law to read
        gamma = 0.0
    exponent = 1 / (gamma - 1) if 2 < gamma < 3 else 0.6

    # degree-descending appearance order; ord = rank + ⌊ln n⌋
    # (popularity fading without correction steps, HyperMap.scala:60-62).
    # add_ranking range-partitions the sort — no single-reducer window.
    # shift ≥ 1 so ord ≥ 1 even when n ≤ 2 (log 2 < 1): radial
    # = 2·ln(ord) must stay finite for the rank-0 vertex
    ordered = add_ranking(
        deg.select("id", "degree"), "_rk", "degree", ascending=False
    ).select(
        "id", (F.col("_rk") + max(1, int(log_n))).cast("double").alias("ord")
    )
    # landmark sample: every early (high-degree) vertex, plus a
    # value-derived thinning favoring early ordinals (HyperMap.scala:90-97)
    u = (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1 << 40))
         / F.lit(float(1 << 40)))
    is_sample = (F.col("ord") < 2 * log_n) | (
        u * F.col("ord") < F.log(F.col("ord")))
    ordered = ordered.withColumn("_s", is_sample).localCheckpoint(eager=False)
    # landmark sample is ~2·log n + harmonic thinning ≈ O(log² n) rows,
    # but the budget is enforced BEFORE collecting (shared guard,
    # VERDICT r4 item 5) so a degenerate sampling predicate can never
    # flood the driver
    from lynxkite_spark.bounded import bounded_collect

    samples = sorted(
        [(r["id"], r["ord"]) for r in bounded_collect(
            ordered.where("_s"), max_landmarks, "hyper_map (landmarks)")],
        key=lambda t: t[1],
    )
    sample_ids = [s[0] for s in samples]

    # symmetric, loop-free edges restricted to sample endpoints
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    among = bounded_collect(
        sym.where(
            F.col("src").isin(sample_ids) & F.col("dst").isin(sample_ids)
        ).distinct(),
        64 * max_landmarks, "hyper_map (landmark-landmark edges)")
    sample_adj: dict = {}
    for r in among:
        sample_adj.setdefault(r["src"], set()).add(r["dst"])

    # greedy driver-side landmark placement, in appearance order
    iterations = int(math.ceil(log_n))
    placed_r: list[float] = []
    placed_a: list[float] = []
    placed_ids: list = []
    for sid, sord in samples:
        radial = 2 * math.log(sord)
        if not placed_ids:
            angular = 2 * math.pi * _hash_u(0, seed)
        else:
            mask = np.array(
                [[pid in sample_adj.get(sid, ()) for pid in placed_ids]])
            angular = float(_ml_angular(
                np.array([sord]),
                np.array([2 * math.pi * _hash_u(sid, seed)]),
                mask, np.array(placed_r), np.array(placed_a),
                temperature, exponent, avg_deg, iterations,
            )[0])
        placed_ids.append(sid)
        placed_r.append(radial)
        placed_a.append(angular)
    coords_by_id = dict(zip(placed_ids, zip(placed_r, placed_a)))
    s_radial = np.array(placed_r)
    s_angular = np.array(placed_a)
    sample_index = {sid: i for i, sid in enumerate(placed_ids)}

    # distributed phase: links-to-samples per vertex (semi-join, small
    # broadcast of log n ids), then one vectorized UDF pass
    links = (
        sym.where(F.col("dst").isin(sample_ids))
        .groupBy(F.col("src").alias("id"))
        .agg(F.collect_set("dst").alias("_nbrs"))
    )
    rest = (
        ordered.where(~F.col("_s"))
        .join(links, "id", "left")
        .select("id", "ord", "_nbrs")
    )

    def place(ids, ords, nbrs):
        m = len(ids)
        mask = np.zeros((m, len(placed_ids)), dtype=bool)
        for i, lst in enumerate(nbrs):
            if lst is None:
                continue
            for v in lst:
                j = sample_index.get(v)
                if j is not None:
                    mask[i, j] = True
        offsets = np.array(
            [2 * math.pi * _hash_u(int(v), seed) for v in ids])
        return pd.Series(_ml_angular(
            ords.to_numpy(dtype=float), offsets, mask, s_radial, s_angular,
            temperature, exponent, avg_deg, iterations,
        ))

    place_udf = F.pandas_udf(place, "double")
    rest_out = rest.select(
        "id",
        (2 * F.log("ord")).alias("radial"),
        place_udf(F.col("id"), F.col("ord"), F.col("_nbrs")).alias("angular"),
    )
    spark = graph.vertices.sparkSession
    sample_out = spark.createDataFrame(
        [(sid, float(r), float(a)) for sid, (r, a) in coords_by_id.items()],
        "id long, radial double, angular double",
    )
    return rest_out.unionByName(sample_out)


def hyperbolic_prediction(
    coords: DataFrame,
    size: int,
    external_degree: float = 2.0,
    internal_degree: float = 1.0,
    exponent: float = 0.6,
) -> DataFrame:
    """HyperbolicPrediction.scala:53-150 — most-likely extra edges from
    existing coordinates: PSO candidate structure, probability at the
    reference's pinned temperature 0.45, per-source ⌊expectedDegree⌋
    best, then global top-``size``, symmetrized.
    Returns DataFrame[src, dst, probability]."""
    n = coords.count()
    log_size = math.log(n)
    ranked = add_ranking(coords, "_or", "radial")
    verts = ranked.select(
        "id", "radial", "angular",
        (F.col("_or") + 1).cast("double").alias("ord"),
        F.col("_or").alias("o_rank"),
    ).withColumn(
        "exp_deg",
        _epso_expected_degree(exponent, external_degree, internal_degree, n,
                              F.col("ord")),
    )
    verts = add_ranking(verts, "a_rank", "angular").localCheckpoint(eager=False)
    cand = _ring_candidates(verts, n, log_size)
    src_ord = verts.select(F.col("id").alias("src"), F.col("ord").alias("o1"))
    scored = cand.join(src_ord, "src").select(
        "src", "dst",
        _probability(0.45, exponent, external_degree).alias("probability"),
        "exp_deg",
    )
    w = W.partitionBy("src").orderBy(F.col("probability").desc(), F.col("dst"))
    per_src = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.greatest(F.floor("exp_deg"), F.lit(1)))
    )
    top = per_src.orderBy(F.col("probability").desc(), "src", "dst").limit(size)
    return top.select("src", "dst", "probability").unionByName(
        top.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                   "probability")
    )
