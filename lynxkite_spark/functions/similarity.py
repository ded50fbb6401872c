"""Similarity search over embedding columns (``array<float>``).

  * brute-force cosine top-k — the exact baseline: a crossJoin pruned by
    broadcasting the (small) query set; dot products via builtin
    ``zip_with``/``aggregate`` (JVM, codegen — no Python);
  * LSH-bucketed ANN — random-hyperplane signatures bucket the corpus; a
    query only joins its own bucket(s): the 100 TB path;
  * IVF-style variant — k centroids learned by a few Lloyd iterations in
    DataFrames; probe the nearest ``nprobe`` centroids' inverted lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from lynxkite_spark.plans.spread import spread_small


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays; elementwise in float64 in
    array order — deterministic and engine-portable."""
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. The query set is broadcast; the
    corpus streams by — one pass, no shuffle until the per-query top-k
    aggregation. Ties broken by corpus id (deterministic).
    Returns DataFrame[query_id, neighbor_id, cosine_sim, rank]."""
    # norms once per vector, not once per (query, corpus) pair
    q = F.broadcast(
        _as_double(queries, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
            norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = _as_double(spread_small(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = c.crossJoin(q).where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cosine_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a seeded hash — value-
    derived, no RNG state, identical on every executor/run."""
    import math

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = (p * 1_000_003 + d * 7919 + seed) & 0xFFFFFFFF
            h = (h * 2654435761) & 0xFFFFFFFF
            u = h / 2**32
            h2 = ((h ^ 0x9E3779B9) * 2246822519) & 0xFFFFFFFF
            u2 = max(h2 / 2**32, 1e-9)
            row.append(math.sqrt(-2 * math.log(u2)) * math.cos(2 * math.pi * u))
        planes.append(row)
    return planes


def _plane_lit(plane: list[float]) -> Column:
    """One hyperplane as a single array<double> literal. A numpy array
    becomes ONE py4j literal; a list comprehension of F.lit() built a
    64-deep CreateArray through 64 py4j round trips per plane — at 32
    planes that was ~2000 driver round trips (~1 s of plan-build wall)
    per signature expression. Identical doubles either way."""
    import numpy as np

    return F.lit(np.ascontiguousarray(plane, dtype=np.float64))


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p = (vec · plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = dot(vec, _plane_lit(plane))
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def banded_codes(vec: Column, planes: list[list[float]], n_planes: int,
                 bands: int) -> list[Column]:
    """Per-band sign-pattern codes: band b packs the sign bits of planes
    [b*n_planes, (b+1)*n_planes)."""
    codes = []
    for b in range(bands):
        code = F.lit(0).cast("long")
        for p in range(n_planes):
            d = dot(vec, _plane_lit(planes[b * n_planes + p]))
            code = code + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
        codes.append(code)
    return codes


_BAND_MENU = [(8, 4), (6, 5), (5, 6), (4, 8), (3, 11), (2, 16)]


def auto_band_geometry(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_recall: float = 0.9,
    corpus_sample: int = 1024,
    query_sample: int = 32,
    dim: int = 64,
    seed: int = 42,
) -> tuple[int, int]:
    """Pick the banded-LSH geometry (rows-per-band r, bands b) from the
    corpus's OWN neighbor signal, so the DEFAULT profile is defensible
    on any corpus instead of tuned for one.

    Method: take a deterministic sample (sort(id).limit — compiles to
    TakeOrdered, no full sort), brute-force the true top-k pairs within
    the sample driver-side (numpy, ≤ query_sample × corpus_sample dot
    products — bounded work regardless of corpus size), then for each
    candidate geometry SIMULATE the index's actual hyperplanes on the
    sample and measure the fraction of true pairs that share ≥1 band
    code.  The LARGEST r (cheapest geometry) whose measured sample
    recall meets ``target_recall`` wins.  Measuring the real planes
    (not the 1−(1−p^r)^b independence model) also absorbs any
    correlation in the deterministic plane generator.  A sampled corpus
    has fewer close neighbors than the full one, so the sample top-k
    pairs are farther than the true ones and the pick errs toward more
    recall.  The floor is the (2, 16) high-recall geometry — measured
    recall@10 ≈ 0.95 even on a structure-free corpus."""
    import math

    import numpy as np

    def take(df: DataFrame, n: int) -> tuple[list, np.ndarray]:
        rows = (
            _as_double(df, vec_col)
            .select(id_col, vec_col)
            .sort(id_col)
            .limit(n)
            .collect()
        )
        ids = [r[0] for r in rows]
        m = np.array([r[1] for r in rows], dtype=np.float64)
        return ids, m

    n_total = corpus.count()
    cids, C = take(corpus, corpus_sample)
    qids, Q = take(queries, query_sample)
    if len(cids) <= k or len(qids) == 0:
        return _BAND_MENU[-1]
    # sample-dilution correction: a 5% corpus sample holds ~5% of each
    # query's true top-k, so the sample's top-⌈k·frac⌉ pairs are the
    # right proxies for the full corpus's top-k neighbor distances —
    # without this the sample's rank-k neighbor is far too distant and
    # auto over-pays for recall on clustered corpora
    frac = min(1.0, len(cids) / max(n_total, 1))
    k = max(1, int(math.ceil(k * frac)))
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    sims = Qn @ Cn.T
    cid_index = {v: i for i, v in enumerate(cids)}
    for qi, qid in enumerate(qids):
        ci = cid_index.get(qid)
        if ci is not None:
            sims[qi, ci] = -2.0  # mask self-match
    topk = np.argsort(sims, axis=1)[:, -k:]  # (n_q, k) corpus indices
    d = min(dim, C.shape[1])
    for r, b in _BAND_MENU:
        planes = np.array(random_hyperplanes(dim, r * b, seed))[:, :d]
        # sign bits of the exact planes the index will use (sign is
        # norm-invariant, so raw vectors are fine)
        sc = (C[:, :d] @ planes.T) > 0  # (n_c, r*b)
        sq = (Q[:, :d] @ planes.T) > 0
        # band match: all r bits of some band equal
        eq = sq[:, None, :] == sc[topk]  # (n_q, k, r*b)
        band_eq = eq.reshape(len(qids), k, b, r).all(axis=3).any(axis=2)
        if float(band_eq.mean()) >= target_recall:
            return r, b
    return _BAND_MENU[-1]


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    multi_probe: int = 0,
    bands: int | None = None,
    profile: str | None = "auto",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates only from matching LSH buckets,
    exact cosine within the candidates.

    ``profile`` picks the band geometry.  The default ``"auto"``
    measures the corpus's own neighbor signal on a bounded sample and
    picks the cheapest geometry expected to hit recall@k ≥ 0.9 (see
    auto_band_geometry) — on a clustered corpus that lands on the cheap
    (8, 4) end, on a structure-free corpus it degrades gracefully
    toward (2, 16) instead of silently returning 0.2 recall.  Explicit
    ``n_planes``/``bands`` bypass auto (then unset halves default to
    8 planes / 4 bands).  ``"balanced"`` = 4 bits × 8 bands;
    ``"high_recall"`` = 2 bits × 16 bands (measured recall@10 ≈ 0.95
    even on a corpus with near-zero neighborhood structure — see
    BENCH/BASELINE.md's sweep; the candidate fraction rises
    accordingly, which is intrinsic to low-signal data, not a property
    of this index).

    Default signature is banded OR-of-ANDs (``bands=4`` bands of
    ``n_planes`` sign bits each, ``n_planes*bands`` hyperplanes total):
    a pair is a candidate iff ANY band's full code matches — the same
    recall shape as the minhash-LSH dedup path.  Candidate recall for a
    pair whose per-bit agreement is p is 1-(1-p^r)^b; at the defaults
    (r=8, b=4) that is ~0.9 for cosine≈0.95 neighbors while a random
    pair only collides with probability ~4·2⁻⁸ ≈ 1.6% — the corpus
    fans out ×bands but each band join stays bucket-local, so the
    100 TB cost story is unchanged.  Round-2 measured the old
    single-bucket default at recall 0.04-0.25, which is why banded is
    now the default.

    ``bands=1`` reverts to the single-bucket signature; there
    ``multi_probe=1`` additionally probes every bucket at Hamming
    distance 1 (query side only fans out ×(n_planes+1)).

    ``max_bucket_size`` is the viral-bucket guard (the ANN twin of
    minhash's ``max_doc_freq`` stop-shingle guard): a (band, code)
    bucket larger than the cap is dropped from the corpus side, so a
    mega-cluster of near-identical vectors cannot turn the bucket join
    quadratic — at the cost of recall inside that cluster.  Off by
    default; set it on 100 TB-scale corpora.

    Returns DataFrame[query_id, neighbor_id, cosine_sim, rank]."""
    if profile == "balanced":
        n_planes, bands = 4, 8
    elif profile == "high_recall":
        n_planes, bands = 2, 16
    elif profile == "auto":
        if n_planes is None and bands is None:
            # memoize on the corpus DataFrame object: a pipeline calling
            # ann_lsh_topk per query batch over one corpus pays the
            # sample + count of auto_band_geometry once, not per batch
            memo_key = (k, id_col, vec_col, dim, seed)
            memo = getattr(corpus, "_lk_auto_geometry", None)
            if memo is not None and memo[0] == memo_key:
                n_planes, bands = memo[1]
            else:
                n_planes, bands = auto_band_geometry(
                    corpus, queries, k, id_col, vec_col, dim=dim, seed=seed)
                try:
                    corpus._lk_auto_geometry = (memo_key, (n_planes, bands))
                except Exception:
                    pass
    elif profile is not None:
        raise ValueError(f"unknown profile {profile!r}")
    n_planes = 8 if n_planes is None else n_planes
    bands = 4 if bands is None else bands
    # the per-row signature math (n_planes*bands interpreted HOF dots)
    # serializes on an under-split tiny corpus: widen it first
    corpus = spread_small(corpus)
    # Vectors and norms are joined back AFTER the (band, code) join +
    # dedup: the exploded candidate stream is the big thing here (corpus
    # ×bands rows, then up to |q|×|bucket| candidate pairs), so it must
    # stay SKINNY — (id, band, code) only, never carrying the embedding
    # array through the join and the dropDuplicates shuffle (round-5
    # perf fix: carrying 64 doubles per row made that shuffle ~17×
    # fatter than needed).  Norms are computed ONCE per vector here, not
    # once per candidate pair.
    c_vec = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    q_vec = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )

    def score(cand: DataFrame) -> DataFrame:
        # cand: skinny distinct (query_id, neighbor_id) pairs; the
        # vector re-joins are id-equi-joins Catalyst/AQE can broadcast
        # when a side is small (the query side virtually always is)
        return (
            cand.join(c_vec, "neighbor_id")
            .join(q_vec, "query_id")
            .select(
                "query_id", "neighbor_id",
                (dot(F.col("_qv"), F.col("_cv"))
                 / (F.col("_qn") * F.col("_cn"))).alias("cosine_sim"),
            )
        )

    if bands > 1:
        planes = random_hyperplanes(dim, n_planes * bands, seed)

        def with_bands(df: DataFrame, out_id: str) -> DataFrame:
            d = _as_double(df, vec_col)
            codes = banded_codes(F.col(vec_col), planes, n_planes, bands)
            probes = F.array(*[
                F.struct(F.lit(b).alias("band"), codes[b].alias("code"))
                for b in range(bands)
            ])
            return d.select(
                F.col(id_col).alias(out_id),
                F.explode(probes).alias("_p"),
            ).select(out_id, "_p.band", "_p.code")

        c = with_bands(corpus, "neighbor_id")
        q = with_bands(queries, "query_id")
        if max_bucket_size is not None:
            ok = (
                c.groupBy("band", "code")
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") <= max_bucket_size)
                .select("band", "code")
            )
            c = c.join(ok, ["band", "code"], "left_semi")
        cand = (
            c.join(q, ["band", "code"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        scored = score(cand)
    else:
        planes = random_hyperplanes(dim, n_planes, seed)
        c = _as_double(corpus, vec_col).select(
            F.col(id_col).alias("neighbor_id"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        q = _as_double(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        if multi_probe:
            probes = F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(n_planes)
                ],
            )
            q = q.select(
                "query_id", F.explode(probes).alias("bucket")
            )
        cand = (
            c.join(q, "bucket")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        if multi_probe:
            cand = cand.dropDuplicates(["query_id", "neighbor_id"])
        scored = score(cand)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b) via the same banded
    OR-of-ANDs signature as ann_lsh_topk: a true near-dup at
    cosine 0.98 has per-bit agreement p ≈ 0.94, so r=8 × b=4 catches it
    with probability 1-(1-0.94⁸)⁴ ≈ 0.97 while random pairs only
    collide at ~4·2⁻⁸ (bands=1 reverts to the old single-bucket
    signature). Returns DataFrame[a, b, cosine_sim]."""
    planes = random_hyperplanes(dim, max(n_planes * bands, n_planes), seed)
    d = _as_double(spread_small(corpus), vec_col)
    # skinny candidate stream + single norm per vector (see ann_lsh_topk:
    # the bucket self-join and its dedup must never carry the embedding)
    vecs = d.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n2"),
    )
    if bands > 1:
        codes = banded_codes(F.col(vec_col), planes, n_planes, bands)
        probes = F.array(*[
            F.struct(F.lit(i).alias("band"), codes[i].alias("code"))
            for i in range(bands)
        ])
        c = d.select(
            F.col(id_col).alias("_id"),
            F.explode(probes).alias("_p"),
        ).select("_id", "_p.band", "_p.code")
        key = ["band", "code"]
    else:
        c = d.select(
            F.col(id_col).alias("_id"),
            lsh_bucket(F.col(vec_col), planes[:n_planes]).alias("bucket"),
        )
        key = ["bucket"]
    if max_bucket_size is not None:
        # viral-bucket guard (see ann_lsh_topk): self-join cost per
        # bucket is quadratic, so the cap matters doubly here
        ok = (
            c.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_bucket_size)
            .select(*key)
        )
        c = c.join(ok, key, "left_semi")
    a = c.select(F.col("_id").alias("a"), *key)
    b = c.select(F.col("_id").alias("b"), *key)
    pairs = a.join(b, key).where(F.col("a") < F.col("b")).select("a", "b")
    if bands > 1:
        pairs = pairs.dropDuplicates(["a", "b"])
    va = vecs.select(F.col("_id").alias("a"), F.col("_v").alias("_va"),
                     F.col("_n2").alias("_na"))
    vb = vecs.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"),
                     F.col("_n2").alias("_nb"))
    return (
        pairs.join(va, "a").join(vb, "b")
        .select("a", "b",
                (dot(F.col("_va"), F.col("_vb"))
                 / (F.col("_na") * F.col("_nb"))).alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    lloyd_iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: learn ``n_centroids`` centroids with a few Lloyd
    iterations (pure DataFrame aggregation), assign the corpus to inverted
    lists, probe each query's ``nprobe`` nearest lists with exact cosine.

    Centroid init is value-derived (hash-sampled rows), so the index is
    deterministic. Scale shape: assignment is one broadcast join per Lloyd
    round (centroids are tiny); the query join touches nprobe/n_centroids
    of the corpus.
    """
    # norms once per corpus row / query / centroid — the centroid
    # crossJoins otherwise recompute norm(_v) n_centroids times per row
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_vn"),
    )

    def with_cnorm(df: DataFrame) -> DataFrame:
        return df.select("cid", "cv", norm(F.col("cv")).alias("cvn"))

    # deterministic init: the n_centroids rows with smallest hash
    init = (
        c.withColumn("_h", F.xxhash64("_id", F.lit(seed)))
        .orderBy("_h")
        .limit(n_centroids)
        .select(F.monotonically_increasing_id().alias("cid"), F.col("_v").alias("cv"))
    )
    cent = F.broadcast(with_cnorm(init))
    for _ in range(lloyd_iterations):
        assigned = (
            c.crossJoin(cent)
            .withColumn("_sim", dot(F.col("_v"), F.col("cv"))
                        / (F.col("_vn") * F.col("cvn")))
            .withColumn(
                "_rk",
                F.row_number().over(
                    W.partitionBy("_id").orderBy(F.col("_sim").desc(), F.col("cid"))
                ),
            )
            .where(F.col("_rk") == 1)
        )
        cent = F.broadcast(with_cnorm(
            assigned.select("cid", "_v")
            .groupBy("cid")
            .agg(F.collect_list("_v").alias("vs"))
            .select(
                "cid",
                F.expr(
                    "transform(sequence(0, size(vs[0]) - 1),"
                    " i -> aggregate(vs, cast(0.0 as double),"
                    " (acc, v) -> acc + v[i]) / size(vs))"
                ).alias("cv"),
            )
        ))
    lists = (
        c.crossJoin(cent)
        .withColumn("_sim", dot(F.col("_v"), F.col("cv"))
                    / (F.col("_vn") * F.col("cvn")))
        .withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy("_id").orderBy(F.col("_sim").desc(), F.col("cid"))
            ),
        )
        .where(F.col("_rk") == 1)
        .select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_cv2"),
                F.col("_vn").alias("_cn2"), "cid")
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    q_probe = (
        q.crossJoin(cent)
        .withColumn("_sim", dot(F.col("_qv"), F.col("cv"))
                    / (F.col("_qn") * F.col("cvn")))
        .withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cid"))
            ),
        )
        .where(F.col("_rk") <= nprobe)
        .select("query_id", "_qv", "_qn", "cid")
    )
    scored = (
        q_probe.join(lists, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("_qv"), F.col("_cv2"))
             / (F.col("_qn") * F.col("_cn2"))).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
