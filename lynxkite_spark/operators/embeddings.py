"""Graph/vector embedding operators without torch, re-expressing the
reference's Sphynx Python ops with Spark-native machinery:

  * ``node2vec_embedding`` — sphynx/python/node2vec.py: the reference
    feeds uniform random walks (its PyG call leaves p=q=1) of
    ``walk_length`` steps, ``walks_per_node`` per vertex — with
    self-loops added at dead ends — into a skip-gram model
    (``context_size`` window, ``iterations`` epochs).  Here the walks
    are generated distributed and *value-derived* (hash-indexed pick
    into a per-vertex neighbor array — identical walks at any
    parallelism, no RNG state), and the skip-gram model is Spark
    MLlib's Word2Vec.
  * ``pca_embedding`` — sphynx/python/pca.py: sklearn's PCA
    fit_transform = center columns, project onto the top-k principal
    axes; here StandardScaler(withMean) + pyspark.ml PCA, one
    distributed pass each.
  * ``tsne_embedding`` — sphynx/python/tsne.py: sklearn TSNE over all
    vectors in one process; here the same exact-gradient algorithm in
    numpy on the driver with a hard ``max_rows`` guard (the loss
    couples every pair — inherently single-node in the reference too).

Scale shape: walk generation is ``walk_length`` hash-lookup joins
against a broadcast-friendly neighbor-array table (one row per vertex;
a hub's array rides along with each walker that visits it — cap with
``max_neighbors`` to bound hub rows, sampled value-derived).  Word2Vec
and PCA are MLlib's distributed implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph


def random_walks(
    graph: Graph,
    walk_length: int = 10,
    walks_per_node: int = 3,
    seed: int = 42,
    max_neighbors: int | None = None,
) -> DataFrame:
    """Uniform vertex walks as string sequences (Word2Vec's input
    contract). Dead ends self-loop (node2vec.py:15-22). Deterministic:
    step choice = xxhash64(walker, step, seed) mod degree.
    Returns DataFrame[walker_id, walk  array<string>]."""
    e = graph.edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    v = graph.vertices.select(F.col("id").cast("long"))
    # dead-end self-loops so every vertex has an outgoing choice
    deadends = v.join(e.select(F.col("src").alias("id")).distinct(), "id", "left_anti")
    e = e.unionByName(deadends.select(F.col("id").alias("src"), F.col("id").alias("dst")))
    if max_neighbors is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("src").orderBy(F.xxhash64("src", "dst", F.lit(seed)), "dst")
        e = e.withColumn("_r", F.row_number().over(w)).where(
            F.col("_r") <= max_neighbors
        ).drop("_r")
    # one row per vertex, reused by every step join — materialize once
    # instead of recomputing the groupBy walk_length times
    adj = e.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    ).localCheckpoint(eager=False)
    walkers = v.select(
        F.col("id"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        (F.col("id") * walks_per_node + F.col("w")).alias("walker_id"),
        F.col("id").alias("cur"),
        F.array(F.col("id").cast("string")).alias("walk"),
    )
    for step in range(walk_length - 1):
        walkers = (
            walkers.join(adj, walkers.cur == adj.src)
            .select(
                "walker_id",
                F.element_at(
                    "nbrs",
                    (
                        F.pmod(
                            F.xxhash64("walker_id", F.lit(step), F.lit(seed)),
                            F.size("nbrs"),
                        )
                        + 1
                    ).cast("int"),
                ).alias("cur"),
                "walk",
            )
            .select(
                "walker_id", "cur",
                F.concat("walk", F.array(F.col("cur").cast("string"))).alias("walk"),
            )
        )
        if step % 5 == 4:
            walkers = walkers.localCheckpoint(eager=False)
    return walkers.select("walker_id", "walk")


def node2vec_embedding(
    graph: Graph,
    dimensions: int = 16,
    walk_length: int = 10,
    walks_per_node: int = 3,
    context_size: int = 5,
    iterations: int = 1,
    seed: int = 42,
    max_neighbors: int | None = None,
) -> DataFrame:
    """Node2Vec (sphynx/python/node2vec.py parameter surface) = uniform
    walks + skip-gram; returns DataFrame[id, embedding array<double>].
    Vertices whose id never appears in a sampled context (possible only
    for walk_length=1) are absent, like any embedding lookup."""
    from pyspark.ml.feature import Word2Vec

    walks = random_walks(graph, walk_length, walks_per_node, seed, max_neighbors)
    w2v = Word2Vec(
        vectorSize=dimensions, windowSize=context_size, maxIter=iterations,
        seed=seed, minCount=1, inputCol="walk", outputCol="_vec",
    )
    from pyspark.ml.functions import vector_to_array

    model = w2v.fit(walks)
    return model.getVectors().select(
        F.col("word").cast("long").alias("id"),
        vector_to_array(F.col("vector")).alias("embedding"),
    )


def tsne_embedding(
    df: DataFrame,
    vec_col: str = "embedding",
    dimensions: int = 2,
    perplexity: float = 30.0,
    id_col: str = "vec_id",
    iterations: int = 400,
    learning_rate: float | None = None,
    seed: int = 42,
    max_rows: int = 10_000,
) -> DataFrame:
    """t-SNE dimensionality reduction (sphynx/python/tsne.py runs
    sklearn.manifold.TSNE over ALL vectors in one Python process; this
    is the same single-process algorithm, exact-gradient numpy).

    The reference op is inherently single-node — t-SNE's loss couples
    every pair of points — so like the reference we collect to the
    driver, but with an explicit ``max_rows`` guard instead of an
    unbounded collect: above it, raise and tell the caller to sample
    or PCA-reduce first (``df.orderBy(rand).limit`` / fit on a sample).
    Exact t-SNE is O(n²) memory — 10k rows ≈ 800 MB of float64
    pairwise tables, the sensible driver ceiling.

    Standard Barnes-Hut-free recipe (van der Maaten & Hinton 2008):
    perplexity-calibrated Gaussian affinities (binary search on the
    per-point bandwidth), symmetrized; Student-t low-dim kernel;
    early exaggeration ×12 for the first quarter of the iterations;
    momentum 0.5 → 0.8; per-coordinate adaptive gains; learning rate
    defaults to sklearn's 'auto' rule max(n/48, 50) — a fixed large
    rate overshoots badly at small n (measured: KL 1.06 vs 0.43 on a
    3-blob fixture).  Deterministic for a given seed.  Returns
    DataFrame[id, embedding array<double>].
    """
    import numpy as np

    from lynxkite_spark.bounded import bounded_collect

    rows = bounded_collect(
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .sort(id_col),
        max_rows,
        "tsne_embedding (sample first, or pca_embedding down then sample)",
    )
    n = len(rows)
    ids = [r[0] for r in rows]
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    if n < 4:
        raise ValueError("t-SNE needs at least 4 points")
    perplexity = min(perplexity, (n - 1) / 3.0)
    if learning_rate is None:
        learning_rate = max(n / 48.0, 50.0)

    # pairwise squared distances
    sq = np.sum(X * X, axis=1)
    D = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0)

    # per-point bandwidth: binary-search beta_i so that the conditional
    # distribution's entropy hits log(perplexity)
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):
        Di = np.delete(D[i], i)
        beta, lo, hi = 1.0, 0.0, np.inf
        for _ in range(50):
            expd = np.exp(-Di * beta)
            s = max(expd.sum(), 1e-300)
            H = np.log(s) + beta * float((Di * expd).sum()) / s
            if abs(H - target) < 1e-5:
                break
            if H > target:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = (beta + lo) / 2
        Pi = np.exp(-Di * beta)
        Pi /= max(Pi.sum(), 1e-300)
        P[i, np.arange(n) != i] = Pi
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    rng = np.random.default_rng(seed)
    Y = rng.normal(0.0, 1e-4, size=(n, dimensions))
    dY = np.zeros_like(Y)
    gains = np.ones_like(Y)
    exag_until = max(iterations // 4, 50)
    P_run = P * 12.0
    for it in range(iterations):
        if it == exag_until:
            P_run = P
        ysq = np.sum(Y * Y, axis=1)
        num = 1.0 / (1.0 + np.maximum(
            ysq[:, None] + ysq[None, :] - 2.0 * (Y @ Y.T), 0.0))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / max(num.sum(), 1e-300), 1e-12)
        W = (P_run - Q) * num
        grad = 4.0 * ((np.diag(W.sum(axis=1)) - W) @ Y)
        momentum = 0.5 if it < exag_until else 0.8
        gains = np.where(np.sign(grad) != np.sign(dY),
                         gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        dY = momentum * dY - learning_rate * gains * grad
        Y = Y + dY
        Y = Y - Y.mean(axis=0)

    spark = df.sparkSession
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    schema = StructType([
        StructField("id", id_field.dataType, True),
        StructField("embedding", ArrayType(DoubleType()), False),
    ])
    return spark.createDataFrame(
        [(i, [float(x) for x in y]) for i, y in zip(ids, Y)], schema)


def pca_embedding(
    df: DataFrame,
    vec_col: str = "embedding",
    dimensions: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """PCA projection mirroring sklearn fit_transform
    (sphynx/python/pca.py): center each coordinate, project onto the
    top-``dimensions`` principal axes.  Returns
    DataFrame[id, embedding array<double>].  Sign of each axis is
    implementation-defined (as in sklearn); tests assert on variance
    and reconstruction, not signs."""
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    assembled = df.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_raw"),
    )
    scaler = StandardScaler(
        withMean=True, withStd=False, inputCol="_raw", outputCol="_centered"
    ).fit(assembled)
    centered = scaler.transform(assembled)
    pca = PCA(k=dimensions, inputCol="_centered", outputCol="_proj").fit(centered)
    return pca.transform(centered).select(
        "id", vector_to_array("_proj").alias("embedding")
    )
