"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard — each as a declarative DataFrame plan.

Scale shapes:
  * exact        — one hash-groupBy (map-side combinable);
  * minhash LSH  — shingle→minhash→band→bucket-join: candidate pairs only
                   ever meet inside a band bucket, never all-pairs;
  * simhash      — 64-bit signature, duplicates = equal signatures (or
                   banded Hamming buckets);
  * n-gram Jaccard — exact verify step for LSH candidates (or small sets).

Hashing is xxhash64 (JVM built-in, seedable via value mixing) — no Python
in the row path; shingling uses builtin ``sequence``/``transform``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def normalized(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group identical normalized texts; keeper = min id.
    Returns DataFrame[<id>, keeper, is_duplicate]."""
    keyed = df.select(F.col(id_col), normalized(F.col(text_col)).alias("_k"))
    keeper = F.min(id_col).over(W.partitionBy("_k"))
    return keyed.select(
        id_col,
        keeper.alias("keeper"),
        (F.col(id_col) != keeper).alias("is_duplicate"),
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles via builtin array ops (no UDF):
    split → slide a window with transform over index sequence."""
    toks = F.split(normalized(text), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document: h_i = min over shingles of
    xxhash64(shingle, i). Computed columnar: explode shingles once,
    aggregate all num_hashes minima in one groupBy pass.
    Returns DataFrame[<id>, sig: array<bigint>]."""
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("sh")
    )
    mins = [F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signatures and self-join per (band, band-hash) bucket —
    the classic LSH candidate generation: only same-bucket docs meet.
    Returns distinct candidate pairs DataFrame[a, b] with a < b."""
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col(id_col).alias("a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → exact Jaccard
    verify on shingle sets → pairs with jaccard ≥ threshold.
    Returns DataFrame[a, b, jaccard]."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    cand = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    return ngram_jaccard_pairs(df, text_col, id_col, threshold, shingle_k, candidates=cand)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs: |A∩B| via a shingle
    equi-join, |A∪B| = |A|+|B|−|A∩B|. With ``candidates`` given, only
    those pairs are scored (the LSH verify step); otherwise all pairs
    sharing ≥1 shingle are considered (small corpora only).
    Returns DataFrame[a, b, jaccard] with a < b, jaccard ≥ threshold."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("sh"),
    ).distinct()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.select(F.col("_id").alias("a"), "sh")
        .join(sh.select(F.col("_id").alias("b"), "sh"), "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["a", "b"], "left_semi")
    scored = (
        inter.join(sizes.select(F.col("_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    shingle_k: int = 2,
) -> DataFrame:
    """SimHash: per bit, sign of Σ over features of (±1 by feature-hash
    bit). Columnar: explode shingles, per-bit conditional sums in one
    aggregation. Returns DataFrame[<id>, simhash: bigint]."""
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_k)).alias("sh")
    ).withColumn("h", F.xxhash64("sh"))
    one = F.lit(1).cast("long")
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = sh.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return agg.select(id_col, sig.alias("simhash"))


def simhash_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Docs whose 64-bit SimHash collides exactly → near-dup groups.
    Returns DataFrame[<id>, keeper, is_duplicate]."""
    sigs = simhash(df, text_col, id_col)
    keeper = F.min(id_col).over(W.partitionBy("simhash"))
    return sigs.select(
        id_col, keeper.alias("keeper"), (F.col(id_col) != keeper).alias("is_duplicate")
    )
