"""Deterministic text embeddings without pretrained weights.

The reference's TextEmbedding operator (sphynx/python/text_embedding.py:1-30)
wraps SentenceTransformers — pretrained torch weights that do not exist in
this environment. This module provides the same Spark-side contract (text
column in, fixed-dim unit-norm ``array<double>`` out, Arrow-batched, no
per-row Python outside the vectorized UDF) backed by a fully deterministic
public-technique encoder:

* feature extraction: lower-cased word unigrams + character trigrams
* hashing trick (Weinberger et al., "Feature Hashing for Large Scale
  Multitask Learning", ICML 2009): a feature's BLAKE2b digest *is* its
  signed random-projection row — bit ``j`` of the digest gives a
  Rademacher ±1 entry for output dimension ``j``. Achlioptas (2003)
  shows ±1 entries satisfy the Johnson–Lindenstrauss lemma, so cosine
  structure of the (implicit, huge) feature space survives the
  projection to ``dim``.
* sublinear tf weighting (``1 + log tf``) and L2 normalization.

Docs sharing many features land near each other in cosine space — exactly
the geometry the downstream ANN / near-dup operators
(:mod:`lynxkite_spark.functions.similarity`) consume. On a cluster where
real model weights exist, swap :func:`encode_batch` for the model's
``encode``; every Spark-side piece (schema, batching, partitioning) stays
the same.

100 TB story: embedding is a map-only pass (no shuffle); the per-partition
feature-vector cache is capped, so executor memory is bounded regardless
of vocabulary size; output is ``dim`` doubles per doc independent of text
length, so downstream joins never touch the raw text.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_WORD_RE = re.compile(r"[a-z0-9]+")

# Per-partition cache cap: at dim=64 float64 this is ~100 MB worst case,
# far below executor memory; when full the cache is simply dropped and
# rebuilt (correctness is unaffected — vectors are pure functions).
_CACHE_MAX = 200_000


def _feature_vector(feature: str, dim: int) -> np.ndarray:
    """Deterministic ±1 projection row for one feature (hashing trick)."""
    nbytes = (dim + 7) // 8
    digest = hashlib.blake2b(feature.encode("utf-8"), digest_size=min(64, nbytes)).digest()
    while len(digest) < nbytes:  # extend the stream for dim > 512
        digest += hashlib.blake2b(digest[-64:], digest_size=64).digest()
    bits = np.unpackbits(np.frombuffer(digest[:nbytes], dtype=np.uint8))[:dim]
    return bits.astype(np.float64) * 2.0 - 1.0


def _features(text: str) -> Counter:
    """Word unigrams + character trigrams of the normalized text."""
    lowered = (text or "").lower()
    words = _WORD_RE.findall(lowered)
    feats: Counter = Counter(words)
    joined = " ".join(words)
    feats.update(joined[i : i + 3] for i in range(len(joined) - 2))
    return feats


def encode_text(text: str, dim: int, cache: dict) -> np.ndarray:
    """Encode one document to a unit-norm ``dim``-vector."""
    vec = np.zeros(dim, dtype=np.float64)
    for feat, tf in _features(text).items():
        row = cache.get(feat)
        if row is None:
            if len(cache) >= _CACHE_MAX:
                cache.clear()
            row = cache[feat] = _feature_vector(feat, dim)
        vec += (1.0 + math.log(tf)) * row
    norm = float(np.linalg.norm(vec))
    return vec / norm if norm > 0 else vec


def encode_batch(texts: "pd.Series", dim: int, cache: dict) -> list:
    """Encode a pandas batch; the cache persists across batches of one
    partition, so repeated vocabulary is hashed once per partition."""
    return [encode_text(t, dim, cache) if t is not None else None for t in texts]


def text_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    alias: str = "embedding",
) -> DataFrame:
    """(id, text) → (id, embedding array<double>) via ``mapInPandas``.

    Map-only (no shuffle); Arrow-batched; deterministic across runs and
    partitionings. Contract mirrors the reference's TextEmbedding output
    (sphynx/python/text_embedding.py): one fixed-dim vector per row,
    ready for :func:`lynxkite_spark.functions.similarity.ann_lsh_topk`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            vecs = encode_batch(pdf[text_col], dim, cache)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    alias: [None if v is None else v.tolist() for v in vecs],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    from lynxkite_spark.plans.spread import spread_small

    # widen under-split inputs: the encoder is per-row CPU work, and a
    # one-row-group parquet table otherwise encodes on a single core
    return spread_small(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, {alias} array<double>"
    )
