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
