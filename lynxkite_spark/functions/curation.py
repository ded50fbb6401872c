"""Training-data curation beyond dedup: repetition/quality gating
(Gopher-style rules), benchmark decontamination, deterministic
stratified sampling with domain-mix planning, and token-window
sequence packing.

Everything here is JVM-side SQL (whole-stage-codegen'd, zero Python in
the row path) and is designed around the 100 TB cost model:

* :func:`gopher_quality_flags` — strictly row-local (higher-order
  functions over the token/line arrays; no shuffle at all).
* :func:`contaminated_docs` — benchmark n-gram set is DISTINCT'd and
  broadcast; the corpus side is a map + broadcast-semi-join, so the
  only shuffle is the per-doc hit aggregation over *matched* rows
  (contamination is rare by construction, so that shuffle is tiny).
* :func:`stratified_sample` — map-only predicate on an engine-portable
  hash; no shuffle, no sampling state, rerunnable with identical output
  on any cluster size.
* :func:`pack_sequences` — windows are partitioned by a hash-derived
  pack group, so the layout sort is ``num_groups`` independent local
  sorts (one shuffle by group), never a global order-by.

The quality rules follow the public Gopher data-curation heuristics
(Rae et al. 2021, "Scaling Language Models", Appendix A1.1); the
decontamination scheme is the public n-gram-overlap method used by GPT-3
/ PaLM appendix evaluations.  The reference engine (lynxkite) has no
corpus-curation surface; these are the training-pipeline extensions the
brief asks for, built in its operator style (DataFrame in → DataFrame
out, deterministic, oracle-checkable).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from lynxkite_spark.functions.dedup import portable_hash64, portable_hash64_sql
from lynxkite_spark.functions.hof import let_array
from lynxkite_spark.plans.spread import spread_small


# --------------------------------------------------------------- helpers

def _words(col: Column) -> Column:
    """Whitespace words, empty text -> empty array (matches text.tokens)."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _lines(col: Column) -> Column:
    """Non-empty trimmed lines of the document."""
    return F.filter(
        F.transform(F.split(col, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


# The words-side SQL twins (DuckDB) used by oracle generation.  DuckDB's
# regexp split keeps empty fragments the same way Spark's does, so the
# guards mirror exactly.
WORDS_SQL = (
    "CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)
LINES_SQL = (
    "list_filter(list_transform(regexp_split_to_array(text, '\\n'), "
    "l -> trim(l)), l -> l <> '')"
)


# ----------------------------------------------- Gopher-style quality rules

# Gopher Appendix A1.1 stopword-presence list.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Paper-faithful defaults (Rae et al. 2021, Appendix A1.1) — production
# use gets the published thresholds (ADVICE r4: relaxed defaults
# under-filter). The one proxy: the paper's n-gram repetition fractions
# are approximated by the most-frequent-word share, kept row-local.
GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,     # chars, English prose band 3..10
    max_mean_word_len=10.0,
    min_alpha_word_frac=0.8,   # words containing >=1 alphabetic char
    min_stopword_hits=2,       # of the 8-word list above
    max_dup_line_frac=0.3,
    max_dup_line_char_frac=0.2,
    max_top_word_frac=0.2,     # repetition proxy: most frequent word's share
)

# Relaxed profile for tiny-document corpora (unit fixtures, code
# snippets, multilingual shards where the English stopword test is
# wrong). Pass explicitly: gopher_quality_flags(df, **GOPHER_RELAXED).
GOPHER_RELAXED = dict(
    min_words=5,
    min_mean_word_len=2.0,
    max_mean_word_len=12.0,
    min_alpha_word_frac=0.6,
    min_stopword_hits=1,
)


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", **thresholds
) -> DataFrame:
    """Append Gopher-style repetition/quality metrics and a ``keep`` flag.

    All metrics are computed with higher-order functions over the
    row-local token and line arrays — the operator is a pure map, no
    shuffle, and survives any scale the scan survives.  The
    ``top_word_frac`` metric sorts the token array and takes the longest
    equal-run (O(words log words) per row) — row-local on purpose: it
    keeps the whole computation inside one stage instead of exploding
    tokens into a corpus-wide shuffle.

    Appended columns: ``n_words``, ``mean_word_len``,
    ``alpha_word_frac``, ``stopword_hits``, ``dup_line_frac``,
    ``dup_line_char_frac``, ``top_word_frac``, ``keep``.
    """
    p = dict(GOPHER_DEFAULTS, **thresholds)
    # Materialize the token/line arrays as real columns once: as inline
    # subtrees they would re-evaluate per consuming expression — and,
    # inside the stopword filter lambda, once per stopword (HOFs are
    # interpreted, no common-subexpression elimination).
    tmp = ("_gw", "_glower", "_glines", "_gdlines")
    base = (
        spread_small(df).drop(*tmp)
        .withColumn("_gw", _words(F.col(text_col)))
        .withColumn("_glower", F.transform(F.col("_gw"), lambda x: F.lower(x)))
        .withColumn("_glines", _lines(F.col(text_col)))
        .withColumn("_gdlines", F.array_distinct(F.col("_glines")))
    )
    w = F.col("_gw")
    lines = F.col("_glines")
    n_words = F.size(w)
    nz = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ).cast("double") / nz
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))).cast("double") / nz
    )
    lower = F.col("_glower")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stopword_hits = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(lower, s))
    )
    n_lines = F.size(lines)
    nlz = F.greatest(n_lines, F.lit(1)).cast("double")
    distinct_lines = F.col("_gdlines")
    dup_line_frac = (n_lines - F.size(distinct_lines)).cast("double") / nlz
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    distinct_line_chars = F.aggregate(
        distinct_lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_line_char_frac = (line_chars - distinct_line_chars).cast("double") / (
        F.greatest(line_chars, F.lit(1)).cast("double")
    )
    # max word frequency = longest equal-run in the sorted token array:
    # O(n log n) per row vs the O(distinct * n) nested-filter shape
    # (measured: the nested shape was ~2/3 of the whole gopher stage
    # wall at 1M docs). One aggregate pass with a (prev, run, best)
    # struct accumulator; empty array finishes at best=0 like before.
    def _run_step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_word_count = F.aggregate(
        F.array_sort(lower),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _run_step,
        lambda acc: acc["best"],
    )
    top_word_frac = top_word_count.cast("double") / nz
    out = (
        base.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("stopword_hits", stopword_hits.cast("long"))
        .withColumn("dup_line_frac", dup_line_frac)
        .withColumn("dup_line_char_frac", dup_line_char_frac)
        .withColumn("top_word_frac", top_word_frac)
    )
    keep = (
        (F.col("n_words") >= p["min_words"])
        & (F.col("n_words") <= p["max_words"])
        & (F.col("mean_word_len") >= p["min_mean_word_len"])
        & (F.col("mean_word_len") <= p["max_mean_word_len"])
        & (F.col("alpha_word_frac") >= p["min_alpha_word_frac"])
        & (F.col("stopword_hits") >= p["min_stopword_hits"])
        & (F.col("dup_line_frac") <= p["max_dup_line_frac"])
        & (F.col("dup_line_char_frac") <= p["max_dup_line_char_frac"])
        & (F.col("top_word_frac") <= p["max_top_word_frac"])
    )
    # opaque_true: a caller's where("keep") must evaluate the metric
    # columns above, once, at the spread parallelism — not re-derive the
    # whole HOF suite inside a filter pushed to the (possibly single-
    # partition) scan (plans.spread.opaque_true)
    from lynxkite_spark.plans.spread import opaque_true

    return out.withColumn("keep", keep & opaque_true(out)).drop(*tmp)


# -------------------------------------------- Gopher A1.2 n-gram repetition

# Rae et al. 2021, Table A1: drop a document when the fraction of
# characters in the most frequent {2,3,4}-gram exceeds {0.20, 0.18,
# 0.16}, or the fraction of characters in duplicated {5..10}-grams
# exceeds {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}.
GOPHER_REPETITION_DEFAULTS = dict(
    max_top_2gram_char_frac=0.20,
    max_top_3gram_char_frac=0.18,
    max_top_4gram_char_frac=0.16,
    max_dup_5gram_char_frac=0.15,
    max_dup_6gram_char_frac=0.14,
    max_dup_7gram_char_frac=0.13,
    max_dup_8gram_char_frac=0.12,
    max_dup_9gram_char_frac=0.11,
    max_dup_10gram_char_frac=0.10,
)


_REP_NAMES = [f"top_{n}gram_char_frac" for n in (2, 3, 4)] + [
    f"dup_{n}gram_char_frac" for n in range(5, 11)
]

# Java \s character class, verbatim — Python's re \s is unicode-aware
# while Java's and RE2's are ASCII-only by default, and all three
# engines (Spark word split, this UDF, the DuckDB oracle) must
# tokenize identically.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def repetition_metrics_py(text: str | None) -> list[float]:
    """The nine Gopher A1.2 repetition fractions of one document, in
    ``_REP_NAMES`` order. Pure Python (Counter over word n-grams) —
    shared by the Arrow UDF below and the tests.

    top_{2,3,4}: (count × chars of the most repetitious n-gram) /
    document chars; a most common n-gram occurring only ONCE does not
    count — otherwise every short document fails on its own longest
    n-gram, so the standard implementations skip singletons.
    dup_{5..10}: Σ over n-grams with count c ≥ 2 of (c-1) × chars —
    characters in duplicate occurrences beyond the first (the
    DataTrove-style non-overlapping count); overlapping n-grams count
    per occurrence, so these fractions can exceed 1 on heavily looped
    text. Document chars = length of the lowercased
    whitespace-normalized join."""
    t = (text or "").strip()
    wl = [w.lower() for w in _JAVA_WS.split(t)] if t else []
    doc_chars = float(max(len(" ".join(wl)), 1))
    out = []
    for n in range(2, 11):
        counts = Counter(
            " ".join(wl[i : i + n]) for i in range(len(wl) - n + 1)
        )
        if n <= 4:
            v = max(
                (c * len(g) for g, c in counts.items() if c >= 2), default=0
            )
        else:
            v = sum((c - 1) * len(g) for g, c in counts.items() if c >= 2)
        out.append(v / doc_chars)
    return out


# StructType object, not a DDL string: string return types are parsed
# at decoration time and would require an active SparkSession at import
_REP_SCHEMA = StructType(
    [StructField(name, DoubleType()) for name in _REP_NAMES]
)


@F.pandas_udf(_REP_SCHEMA)
def _rep_metrics_udf(text):
    import pandas as pd

    rows = [repetition_metrics_py(t) for t in text]
    return pd.DataFrame(rows, columns=_REP_NAMES)


def gopher_repetition_flags(
    df: DataFrame, text_col: str = "text", **thresholds
) -> DataFrame:
    """The REAL Gopher A1.2 n-gram repetition rules (Rae et al. 2021,
    Table A1) — this replaces round 4's documented proxy
    (``top_word_frac`` in :func:`gopher_quality_flags` approximated the
    family with the most-frequent-word share).

    Appends the nine fractions of :func:`repetition_metrics_py` plus
    ``rep_keep``. Fractions are exact-integer ratios divided once, so
    the doubles are bit-identical across engines (the gate oracle
    replays them relationally via unnest + GROUP BY per n).

    Scale shape: ONE Arrow ``pandas_udf`` computes all nine metrics per
    document — a pure map, zero shuffle; the 100 TB cost is the scan
    plus ~0.2 ms/doc of Counter work in the Arrow batch. A first
    implementation used Spark higher-order-function sort+folds; HOFs
    are CodegenFallback (interpreted), and the 18 giant fold trees
    measured ~9 ms/doc to evaluate plus ~9 s of driver-side plan
    compilation — the Arrow path is ~50x faster end to end, the same
    trade the text-embedding encoder makes (git history holds the HOF
    version)."""
    p = dict(GOPHER_REPETITION_DEFAULTS, **thresholds)
    out_cols = ["rep_keep", *_REP_NAMES]
    base = spread_small(df).drop(*[c for c in out_cols if c in df.columns])
    m = _rep_metrics_udf(F.coalesce(F.col(text_col), F.lit("")))
    with_m = base.withColumn("_rep", m)
    keep = F.lit(True)
    for name in _REP_NAMES:
        keep = keep & (F.col("_rep")[name] <= F.lit(p[f"max_{name}"]))
    # opaque_true: stop a downstream where("rep_keep") from cloning the
    # Arrow UDF below the filter (§4.4 duplicated ArrowEvalPython)
    from lynxkite_spark.plans.spread import opaque_true

    return with_m.select(
        *base.columns,
        *[F.col("_rep")[name].alias(name) for name in _REP_NAMES],
        (keep & opaque_true(with_m)).alias("rep_keep"),
    )


# ------------------------------------------------------- decontamination

def _ngram_hashes_of_words(w: Column, n: int, portable: bool) -> Column:
    """n-gram hashes over an already-BOUND lowered-words array (a lambda
    variable or materialized column — never an inline tokenizer subtree;
    see :func:`_let_words` for why that matters)."""
    count = F.size(w) - F.lit(n - 1)
    # Guard: sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty.
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    if portable:
        return F.transform(
            idx,
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat(F.array_join(F.slice(w, i, n), " "), F.lit("|0"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        )
    return F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(w, i, n), " ")))


def _let_words(col: Column, body) -> Column:
    """Let-bind the lowered words array ONCE per row and apply ``body``
    (words -> array column) to it.

    Spark HOFs are CodegenFallback — interpreted, with no common-
    subexpression elimination — so a words subtree referenced inside a
    per-gram lambda re-splits and re-lowercases the document for EVERY
    n-gram: O(grams x words) per row.  Binding the array as the element
    of a single-element-array transform makes it a lambda VARIABLE
    inside ``body`` — evaluated once per row.  The win grows with
    document length: measured ~2.5x at the sf0.1 table's ~50-word docs,
    6-9x at 400-word docs."""
    w = F.transform(_words(col), lambda x: F.lower(x))
    return let_array(w, body)


def ngram_hashes(col: Column, n: int, portable: bool = False) -> Column:
    """64-bit hashes of the word n-grams of a text column, built
    row-locally (sequence + slice under higher-order transform); a doc
    with fewer than ``n`` words yields an empty array.

    Default is ``xxhash64`` (one JVM intrinsic per n-gram — the hot-path
    choice at corpus scale); ``portable=True`` switches to the
    md5-derived 60-bit hash that DuckDB can replay (oracle parity), same
    trade as dedup.portable_hash64.
    """
    return _let_words(col, lambda w: _ngram_hashes_of_words(w, n, portable))


def ngram_hashes_sql(n: int, text_expr: str = "text") -> str:
    """DuckDB twin of :func:`ngram_hashes` for oracle generation."""
    w = (
        f"CASE WHEN trim({text_expr}) = '' THEN []::VARCHAR[] ELSE "
        f"list_transform(regexp_split_to_array(trim({text_expr}), '\\s+'), "
        "x -> lower(x)) END"
    )
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 1}, 0) + 1), "
        f"i -> CAST(('0x' || substr(md5(array_to_string("
        f"list_slice({w}, i, i + {n - 1}), ' ') || '|0'), 1, 15)) AS BIGINT))"
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Benchmark decontamination: docs sharing any word ``n``-gram with
    the benchmark set, with the count of distinct matched n-grams.

    The benchmark n-gram set (small by definition — eval suites are
    MB-scale against a TB-scale corpus) is distinct'd and broadcast, so
    the corpus side is scan → row-local n-gram hashing → explode →
    broadcast LEFT SEMI join.  Only *matching* (doc, ngram) rows reach
    the final per-doc aggregation, so the one real shuffle is
    proportional to contamination, not corpus size.

    Returns ``(id_col, n_hits)`` for contaminated docs only.
    """
    bench_grams = (
        benchmark.select(
            F.explode(ngram_hashes(F.col(text_col), n, portable)).alias("g")
        )
        .distinct()
    )
    doc_grams = spread_small(docs).select(
        F.col(id_col), F.explode(ngram_hashes(F.col(text_col), n, portable)).alias("g")
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
    return hits.groupBy(id_col).agg(F.count_distinct("g").alias("n_hits"))


# -------------------------------------------- stratified sampling / mixing

def sample_hash_unit(col: Column, seed: int = 0) -> Column:
    """Deterministic uniform [0,1) value per key — the portable 60-bit
    hash scaled down.  Same doc always gets the same draw, on any
    cluster, any partitioning, any run."""
    return (portable_hash64(col, seed) % F.lit(1_000_000)).cast("double") / 1e6


def sample_hash_unit_sql(expr: str, seed: int = 0) -> str:
    return f"(({portable_hash64_sql(expr, seed)}) % 1000000) / 1e6"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row iff its deterministic hash draw falls under its
    stratum's fraction.  Map-only (no shuffle, no state): the sampling
    decision is a pure function of (key, seed), so the sample is
    reproducible across runs and cluster sizes and composes with
    incremental ingestion — re-running over a grown corpus keeps
    exactly the previously kept rows plus new draws.
    """
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.where(sample_hash_unit(F.col(key_col), seed) < frac)


def domain_mix_plan(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    target_shares: dict[str, float],
) -> DataFrame:
    """Compute per-stratum sampling fractions that realize a target mix.

    Given available weight (e.g. token count) per stratum and target
    shares summing to 1, the largest achievable corpus without
    upsampling is ``N = min_s available_s / share_s``; each stratum then
    samples ``fraction_s = share_s * N / available_s``.  One tiny
    aggregation plus an unpartitioned min over the (few) strata rows —
    driver-scale by construction.

    Returns ``(strata_col, available, target_share, fraction)``.
    """
    share = F.lit(None).cast("double")
    for k, v in sorted(target_shares.items()):
        share = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(share)
    avail = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col)).cast("double").alias("available")
    ).withColumn("target_share", share).where(F.col("target_share").isNotNull())
    from pyspark.sql import Window

    achievable = F.min(
        F.col("available") / F.col("target_share")
    ).over(Window.partitionBy())
    return avail.select(
        strata_col,
        "available",
        "target_share",
        F.least(
            F.lit(1.0),
            F.col("target_share") * achievable / F.col("available"),
        ).alias("fraction"),
    )


# ----------------------------------------------------- sequence packing

def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str,
    key_col: str = "doc_id",
    num_groups: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Token-offset chunk packing for training-window assembly.

    Documents are laid out consecutively in ``key_col`` order inside
    ``num_groups`` independent pack groups (group = portable hash of the
    key); a document belongs to the chunk that contains its starting
    token offset, so ``(pack_group, chunk)`` is the training-window id.
    Chunks hold ~``max_tokens`` tokens; a document longer than the
    remaining room runs over into the next chunk boundary (standard
    causal-LM packing with document boundaries preserved — the consumer
    splits at attention-mask level, not here).

    Scale shape: one shuffle (hash by pack group), then ``num_groups``
    *independent* local sorts — never a global order-by.  Each group's
    window state is a running sum, so memory per task is O(1).  At
    100 TB, set ``num_groups`` ≈ a few × cluster cores: determinism is
    per-(key-set, num_groups, seed) and does not depend on executor
    count.

    Returns the input plus ``pack_group``, ``start_offset``, ``chunk``.
    """
    from pyspark.sql import Window

    g = (portable_hash64(F.col(key_col), seed) % num_groups).alias("pack_group")
    w = Window.partitionBy("pack_group").orderBy(key_col)
    toks = F.col(token_col).cast("long")
    cum = F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("pack_group", g)
        .withColumn("start_offset", (cum - toks).cast("long"))
        .withColumn(
            "chunk", F.floor(F.col("start_offset") / F.lit(int(max_tokens)))
        )
    )


# -------------------------------------- deterministic shuffle + shard layout

def shard_assignments(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic global corpus shuffle into ``num_shards`` training
    shards: shard = hash(id, seed) mod num_shards, position within the
    shard = rank by (hash, id). The layout is a pure function of
    (id set, num_shards, seed) — identical on any cluster size, any
    partitioning, and reproducible for a training restart; changing
    ``seed`` is a fresh epoch-level reshuffle.

    Scale shape: one shuffle keyed by shard (num_shards ≈ a few × the
    consumer's file-level parallelism), then ``num_shards`` independent
    local sorts for the within-shard order — never a global order-by.
    Hash-balanced shard sizes by construction. Appends ``shard``
    (int) and ``shard_pos`` (0-based long).

    Beyond the reference (its export story is plain partitioned writes,
    `ExportOperations.scala`): a pretraining data loader needs a
    REPRODUCIBLE shuffled order, which parquet write order alone does
    not give."""
    out_cols = ("shard", "shard_pos")
    base = df.drop(*[c for c in out_cols if c in df.columns])
    from pyspark.sql import Window

    h = (
        portable_hash64(F.col(id_col), seed)
        if portable
        else F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    )
    with_h = base.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(num_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        with_h.withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        ).drop("_h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Materialize the deterministic shuffle: one directory per shard
    (``shard=N/``), rows stored in shard order. One shuffle
    (repartition by shard) + per-shard local sort; consumers stream
    shards independently. ``max_records_per_file`` splits oversized
    shards into sequentially ordered files without re-shuffling."""
    out = shard_assignments(df, num_shards, id_col=id_col, seed=seed)
    writer = (
        out.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.format(fmt).save(path)


# ----------------------------------------------- C4-style line cleaning

C4_BAD_LINE_WORDS = ["javascript", "cookie", "privacy policy", "terms of use"]
C4_PAGE_DROP_STRINGS = ["lorem ipsum", "{"]


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2019, C4 appendix):
    keep only lines that end in terminal punctuation, have at least
    ``min_line_words`` words, and contain none of the boilerplate
    markers; drop whole pages containing ``lorem ipsum`` / ``{`` or with
    fewer than ``min_kept_lines`` surviving lines.

    Entirely row-local (higher-order functions over the line array — no
    shuffle, no Python), like the Gopher gate it complements: Gopher
    judges the document, C4 repairs it line by line.

    Appends ``clean_text`` (kept lines re-joined), ``n_lines_kept``,
    ``n_lines_dropped``, ``keep_page``.
    """
    lines = _lines(F.col(text_col))
    lower = F.lower(F.col(text_col))

    def line_ok(l: Column) -> Column:
        words = F.size(F.split(l, r"\s+"))
        terminal = l.rlike('[.!?"]$')
        low = F.lower(l)
        bad = None
        for m in C4_BAD_LINE_WORDS:
            hit = low.contains(m)
            bad = hit if bad is None else (bad | hit)
        return terminal & (words >= min_line_words) & ~bad

    kept = F.filter(lines, line_ok)
    n_kept = F.size(kept)
    page_bad = None
    for m in C4_PAGE_DROP_STRINGS:
        hit = lower.contains(m)
        page_bad = hit if page_bad is None else (page_bad | hit)
    return (
        df.withColumn("clean_text", F.array_join(kept, "\n"))
        .withColumn("n_lines_kept", n_kept.cast("long"))
        .withColumn(
            "n_lines_dropped", (F.size(lines) - n_kept).cast("long")
        )
        .withColumn(
            "keep_page", (~page_bad) & (n_kept >= F.lit(min_kept_lines))
        )
    )


# --------------------------------------------------------- PII masking

# Conservative, RE2/Java-portable patterns (no lookarounds) so the same
# regex runs in Spark (Java) and the DuckDB (RE2) oracle.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]\d{2,4}[- ]\d{3,4}[- ]\d{3,4}",
}


def mask_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "masked_text"
) -> DataFrame:
    """Replace emails, IPv4 addresses, and international phone numbers
    with ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens and count the hits
    per category. Pure ``regexp_replace`` / ``regexp_count`` chain —
    map-only, codegen'd, idempotent (the mask tokens never re-match).

    The patterns are deliberately conservative (high precision): a
    training-data pipeline masks what it is sure about and routes the
    rest to review, because a false positive destroys real text.
    """
    col = F.col(text_col)
    masked = col
    for k, p in PII_PATTERNS.items():
        masked = F.regexp_replace(masked, p, f"<{k.upper() if k != 'ipv4' else 'IP'}>")
    # withColumn (not select('*', ...)) so pre-existing n_*/out_col
    # columns are overwritten, making the operator re-runnable on its
    # own output schema (ADVICE r4)
    out = df
    for k, p in PII_PATTERNS.items():
        out = out.withColumn(f"n_{k}", F.regexp_count(col, F.lit(p)).cast("long"))
    return out.withColumn(out_col, masked)


# ------------------------------------- DSIR importance resampling (round 5)

def hashed_ngram_buckets(
    col: Column,
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    portable: bool = False,
) -> Column:
    """Hashed n-gram feature buckets per document (DSIR, Xie et al.
    2023 §3: unigram+bigram hashes folded into a fixed bucket space).
    One array element per n-gram OCCURRENCE — bucket collisions and
    repeats are the model, exactly as in the paper.  Row-local (no
    shuffle); ``portable=True`` switches to the md5-derived hash DuckDB
    can replay (oracle parity), same trade as dedup.portable_hash64.

    The words array is let-bound once per row across ALL ``ns`` (see
    :func:`_let_words`)."""

    def body(w: Column) -> Column:
        parts = [
            F.transform(
                _ngram_hashes_of_words(w, n, portable),
                lambda h: F.pmod(h, F.lit(n_buckets)).cast("int"),
            )
            for n in ns
        ]
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, p)
        return out

    return _let_words(col, body)


def hashed_ngram_buckets_sql(
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`hashed_ngram_buckets` (portable hash)."""
    parts = [
        f"list_transform({ngram_hashes_sql(n, text_expr)}, "
        f"h -> CAST(h % {n_buckets} AS INT))"
        for n in ns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = f"list_concat({out}, {p})"
    return out


LOGW_SCALE = 1_000_000  # quantization: 1e-6 in log space


def _dsir_bucket_logprobs(
    docs: DataFrame,
    text_col: str,
    n_buckets: int,
    ns: tuple[int, ...],
    alpha: float,
    portable: bool,
) -> DataFrame:
    """Laplace-smoothed bag-of-buckets model: DataFrame[bucket, logp]
    covering EVERY bucket (zero-count buckets get the smoothing mass).

    ONE pass over ``docs``: explode + map-side-combinable count, and the
    <= ``n_buckets`` count rows (driver-small by construction — they ARE
    the bag model) come back to the driver once.  The logprob table is
    rebuilt as a LOCAL DataFrame with the identical log expression, so
    downstream plans embed a 2×``n_buckets``-row local relation instead
    of a full corpus scan — the earlier shape left the counts inside the
    lazy plan, so every downstream execution re-tokenized the corpus
    (the dominant cost at scale; the fit itself shuffles <= ``n_buckets``
    combined rows either way).  ``logp`` stays bit-identical: same JVM
    expression over the same BIGINT counts and the same ``denom``."""
    spark = docs.sparkSession
    rows = (
        spread_small(docs).select(
            F.explode(
                hashed_ngram_buckets(F.col(text_col), n_buckets, ns, portable)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: <= n_buckets rows by construction
    )
    counts = {r["bucket"]: r["cnt"] for r in rows}
    total = sum(counts.values())  # exact integer sum
    denom = float(total) + alpha * n_buckets
    # Arrow-backed local relation: one batch instead of n_buckets
    # pickled rows (the list-of-tuples path cost ~0.5 s per fit at 4096
    # buckets; two fits per dsir call). Identical rows and schema.
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "bucket": np.arange(n_buckets, dtype=np.int32),
            "cnt": np.asarray(
                [counts.get(b, 0) for b in range(n_buckets)], dtype=np.int64
            ),
        }
    )
    local = spark.createDataFrame(pdf, "bucket int, cnt bigint")
    return local.select(
        "bucket",
        F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
              / F.lit(denom)).alias("logp"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    portable: bool = False,
) -> DataFrame:
    """Per-document DSIR log importance weight log p_target(x) -
    log p_raw(x) under hashed n-gram bag models (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    Returns DataFrame[id_col, dsir_logw_q, n_grams] where
    ``dsir_logw_q`` is the weight QUANTIZED to ``LOGW_SCALE`` ticks and
    summed as a BIGINT: per-bucket log-ratios are rounded once, so the
    per-doc sum is exact integer arithmetic — identical on any
    partitioning, any executor count, and any SQL engine (float sums
    are association-ordered; this is not).  Docs with no n-grams get
    weight 0.

    Scale shape: two bag-model fits (explode + map-side-combinable
    count; each materializes its <= ``n_buckets`` count rows once, so
    the returned plan holds the quantized ratio table as a local
    relation, not a corpus scan), one broadcast join of that ratio
    table onto the exploded corpus, one groupBy(id) integer sum.  The
    only per-document driver traffic is zero; no text is shuffled — the
    exploded stream is (id, bucket:int) pairs.  Net corpus passes: one
    per side for the fit + one over ``raw`` for the weight sum."""
    t = _dsir_bucket_logprobs(target, text_col, n_buckets, ns, alpha, portable)
    r = _dsir_bucket_logprobs(raw, text_col, n_buckets, ns, alpha, portable)
    ratio = (
        t.alias("t")
        .join(r.alias("r"), "bucket")
        .select(
            "bucket",
            F.round((F.col("t.logp") - F.col("r.logp")) * LOGW_SCALE)
            .cast("long")
            .alias("ratio_q"),
        )
    )
    grams = spread_small(raw).select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), n_buckets, ns, portable)
        ).alias("bucket"),
    )
    return (
        grams.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("ratio_q"), F.lit(0)).cast("long").alias("dsir_logw_q"),
            F.count("bucket").alias("n_grams"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Select ``k`` documents from ``raw`` by Gumbel-top-k sampling
    proportional to the DSIR importance weights (the paper's sampling
    without replacement, expressed as one deterministic key per doc:
    key = logw + Gumbel(hash(id, seed))).

    Returns raw's columns + ``dsir_logw_q`` + ``selected``.  The
    Gumbel noise is hash-derived, so the selection is a pure function
    of (corpus, target, k, seed) — reproducible across runs, cluster
    sizes, and engines.  Top-k is orderBy+limit (TakeOrdered: per-
    partition partial top-k, merged once — never a global sort), then a
    broadcast semi-join marks the winners; k is assumed driver-small."""
    # drop pre-existing output columns so the operator is re-runnable
    # on its own output schema (same contract as mask_pii, ADVICE r4)
    raw = raw.drop("dsir_logw_q", "selected")
    w = dsir_log_weights(raw, target, id_col, text_col, n_buckets, ns,
                         alpha, portable)
    u = (F.pmod(portable_hash64(F.col(id_col), seed), F.lit(LOGW_SCALE))
         .cast("double") + F.lit(0.5)) / F.lit(float(LOGW_SCALE))
    # keyed is referenced twice below (the TakeOrdered top-k AND the
    # final join), so cut the lineage: without this the full weight
    # computation — including the raw-corpus explode+sum — executes
    # twice.  The checkpointed frame is three 8-byte columns per doc.
    keyed = w.select(
        id_col, "dsir_logw_q",
        (F.col("dsir_logw_q")
         + F.round(-F.log(-F.log(u)) * LOGW_SCALE).cast("long")).alias("_key"),
    ).localCheckpoint(eager=False)
    top = keyed.orderBy(F.col("_key").desc(), F.col(id_col)).limit(k).select(id_col)
    return (
        raw.join(keyed.select(id_col, "dsir_logw_q"), id_col)
        .join(
            F.broadcast(top.select(F.col(id_col).alias("_sel"))),
            F.col(id_col) == F.col("_sel"),
            "left",
        )
        .select(*raw.columns, "dsir_logw_q",
                F.col("_sel").isNotNull().alias("selected"))
    )
