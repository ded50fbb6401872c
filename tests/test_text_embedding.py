"""Deterministic hashed text embeddings (TextEmbedding stand-in)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lynxkite_spark.functions.text_embedding import (
    _feature_vector,
    encode_text,
    text_embedding,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox leaps over the lazy dog"),  # near-dup of 1
    (3, "import numpy as np from pyspark.sql import functions"),
    (4, "SELECT count(*) FROM lineitem GROUP BY l_returnflag"),
    (5, ""),
    (6, None),
]


def test_unit_norm_and_shape(spark):
    out = text_embedding(_docs(spark, CORPUS), dim=32).collect()
    by_id = {r["doc_id"]: r["embedding"] for r in out}
    assert len(by_id) == 6
    for i in (1, 2, 3, 4):
        v = np.array(by_id[i])
        assert v.shape == (32,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    assert np.linalg.norm(by_id[5]) == 0.0  # empty text → zero vector
    assert by_id[6] is None  # null in, null out


def test_deterministic_and_partition_invariant(spark):
    df = _docs(spark, CORPUS)
    a = {r["doc_id"]: r["embedding"] for r in text_embedding(df, dim=64).collect()}
    b = {
        r["doc_id"]: r["embedding"]
        for r in text_embedding(df.repartition(7), dim=64).collect()
    }
    for k in a:
        if a[k] is None:
            assert b[k] is None
        else:
            assert a[k] == b[k]


def test_cosine_geometry(spark):
    """Near-duplicate texts must be far closer than unrelated texts."""
    by_id = {
        r["doc_id"]: np.array(r["embedding"])
        for r in text_embedding(_docs(spark, CORPUS[:4]), dim=128).collect()
    }
    near = float(by_id[1] @ by_id[2])
    far = max(float(by_id[1] @ by_id[3]), float(by_id[1] @ by_id[4]))
    assert near > 0.8
    assert near > far + 0.3


def test_wide_dim_digest_extension():
    """dim > 512 exercises the digest-stream extension path."""
    v = _feature_vector("token", 600)
    assert v.shape == (600,)
    assert set(np.unique(v)) == {-1.0, 1.0}
    # deterministic
    assert np.array_equal(v, _feature_vector("token", 600))
    # prefix property: the first 512 entries match the unextended digest
    assert np.array_equal(v[:512], _feature_vector("token", 512))


def test_cache_cap_does_not_change_values():
    cache = {}
    a = encode_text("alpha beta gamma", 16, cache)
    cache.clear()  # simulate the cap-triggered reset
    b = encode_text("alpha beta gamma", 16, cache)
    assert np.array_equal(a, b)


def test_feeds_ann_pipeline(spark):
    """text_embedding → ann_lsh_topk end-to-end: the planted near-dup is
    its twin's nearest neighbor."""
    from lynxkite_spark.functions.similarity import ann_lsh_topk

    rows = [(i, f"unrelated filler document number {i} with words w{i} x{i} y{i}") for i in range(20, 60)]
    rows += CORPUS[:4]
    emb = text_embedding(_docs(spark, rows), dim=64).withColumnRenamed("doc_id", "vec_id")
    res = ann_lsh_topk(emb, emb.filter("vec_id = 1"), k=2, dim=64, profile="high_recall")
    top = [r["neighbor_id"] for r in res.orderBy("rank").collect()]
    assert top[0] == 2  # the near-dup (self-matches are excluded)
