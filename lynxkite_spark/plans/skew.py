"""Skew handling: hot-key detection + hybrid broadcast/shuffle joins.

Re-creates the reference's HybridRDD strategy
(/root/reference/app/.../spark_util/HybridRDD.scala:73-163): count rows
per key (sampled at scale), split the stream into small-key rows (normal
shuffle join) and large-key rows (joined against a broadcast map of just
the hot keys' lookup values), and union the results. Default threshold is
the reference's 40,000 rows/key (HybridRDD.scala:78-80).

AQE's skew-join is enabled as a backstop (session.py), but deterministic
salting/broadcast of *known* hub keys avoids the skewed shuffle entirely
rather than re-planning around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lynxkite_spark.session import HOT_KEY_THRESHOLD


def hot_keys(df: DataFrame, key: str, threshold: int = HOT_KEY_THRESHOLD) -> DataFrame:
    """Keys with more than ``threshold`` rows. One aggregation with
    map-side partial combine; output is tiny by construction
    (≤ total_rows/threshold keys — HybridRDD.scala:43-47 argument)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("_cnt")).where(
        F.col("_cnt") > threshold
    ).select(key)


def split_hot(df: DataFrame, key: str, hot: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (cold rows, hot rows) by membership of ``key`` in
    the (small) hot-key set; the hot set is broadcast on both sides."""
    cold = df.join(F.broadcast(hot), key, "left_anti")
    hot_rows = df.join(F.broadcast(hot), key, "left_semi")
    return cold, hot_rows


def hybrid_join(
    big: DataFrame,
    lookup: DataFrame,
    key: str,
    hot: DataFrame | None = None,
    threshold: int = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """Join ``big`` (many rows per key, skewed) with ``lookup`` (one row
    per key) without shuffling the hot keys:

      cold keys → ordinary shuffle join (Catalyst SMJ / shuffled hash);
      hot keys  → broadcast join against only the hot keys' lookup rows.

    Equivalent results to ``big.join(lookup, key)`` for unique-key lookups.
    """
    if hot is None:
        hot = hot_keys(big, key, threshold)
    cold_big, hot_big = split_hot(big, key, hot)
    cold = cold_big.join(lookup, key, "inner")
    hot_lookup = lookup.join(F.broadcast(hot), key, "left_semi")
    hot_j = hot_big.join(F.broadcast(hot_lookup), key, "inner")
    return cold.unionByName(hot_j)


def salted_join(
    big: DataFrame,
    lookup: DataFrame,
    key: str,
    salts: int = 16,
) -> DataFrame:
    """Alternative skew strategy (north rule: salting): replicate each
    lookup row into ``salts`` copies keyed (key, salt); the big side picks
    a deterministic salt from its other columns, spreading one hot key
    over ``salts`` reducers. Use when the hot side is too large even for
    a hot-subset broadcast."""
    salted_lookup = lookup.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    other = [c for c in big.columns if c != key][:1]
    salt_src = F.xxhash64(*other) if other else F.xxhash64(F.col(key))
    salted_big = big.withColumn("_salt", F.pmod(salt_src, F.lit(salts)).cast("int"))
    return salted_big.join(salted_lookup, [key, "_salt"], "inner").drop("_salt")
