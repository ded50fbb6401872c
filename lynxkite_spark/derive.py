"""Corpus → dependency edge tables (the engine's ingestion path).

Parses import statements out of ``content`` with an Arrow-vectorized
pandas UDF (pandas ``str.findall`` — no per-row Python UDFs), resolves
the imported module names against the repo dictionary, and aggregates to
a weighted repo→repo edge table. Mirrors the reference's
ImportEdgesForExistingVertices semantics
(/root/reference/app/.../graph_operations/ImportGraphFromTable.scala:46-106):
endpoints are resolved against a unique name attribute and unresolvable
(dangling) references are dropped.

Scale shape: the regex scan is embarrassingly parallel over file
partitions; the groupBy(src,dst) is one shuffle with map-side partial
aggregation; the dictionary join broadcasts (the repo dictionary is tiny
relative to the corpus even at 10^12 files ~ 10^8 repos).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one pattern per language; capture group = dotted module path
IMPORT_PATTERNS = {
    "python": re.compile(r"^import\s+([A-Za-z_][\w.]*)", re.M),
    "java": re.compile(r"^import\s+([A-Za-z_][\w.]*)\s*;", re.M),
    "go": re.compile(r'"([A-Za-z_][\w.]*)"'),
}
_MODULE_RE = re.compile(r"^org_repo_(\d{5})")


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_imports(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Vectorized import extraction: per Arrow batch, one findall pass per
    language group (pandas str engine, not row-at-a-time)."""
    out = pd.Series([[]] * len(content), index=content.index, dtype=object)
    for lg, pat in IMPORT_PATTERNS.items():
        mask = lang == lg
        if mask.any():
            out[mask] = content[mask].str.findall(pat)
    return out


def extract_imports_builtin(content, lang):
    """The same extraction as :func:`extract_imports` but entirely
    JVM-side (``regexp_extract_all`` inside whole-stage codegen — no
    Arrow boundary at all). The north rule's contract is the
    pandas/Arrow form, which stays the default; this variant exists to
    quantify the Python-boundary cost (bench: q_corpus_derive vs
    q_corpus_derive_builtin) and as the faster choice when the
    vectorized-UDF requirement doesn't apply."""
    jvm_patterns = {
        "python": r"(?m)^import\s+([A-Za-z_][\w.]*)",
        "java": r"(?m)^import\s+([A-Za-z_][\w.]*)\s*;",
        "go": r'"([A-Za-z_][\w.]*)"',
    }
    expr = F.array().cast("array<string>")
    for lg, pat in jvm_patterns.items():
        expr = F.when(
            lang == lg, F.regexp_extract_all(content, F.lit(pat), F.lit(1))
        ).otherwise(expr)
    return expr


def module_to_repo(col):
    """Module name → repo name (``org_repo_00017.mod_3`` → ``org/repo-00017``)."""
    return F.concat(
        F.lit("org/repo-"), F.regexp_extract(col, r"^org_repo_(\d{5})", 1)
    )


def derive_repo_edges(
    corpus: DataFrame, extractor: str = "pandas"
) -> tuple[DataFrame, DataFrame]:
    """Corpus → (repo_edges[src,dst,weight], repo_ids[id,repo]).

    * IDs are value-derived ``xxhash64(repo)`` — identical across runs and
      parallelism (SURVEY.md §4.2).
    * weight = number of importing file references (FIXTURES.md §F2).
    * self-imports and unresolvable targets are dropped.
    """
    repos = corpus.select("repo").distinct()
    repo_ids = repos.select(F.xxhash64("repo").alias("id"), "repo")

    imports = (
        extract_imports_builtin(F.col("content"), F.col("lang"))
        if extractor == "builtin"
        else extract_imports("content", "lang")
    )
    refs = (
        corpus.select("repo", F.explode(imports).alias("module"))
        .withColumn("dst_repo", module_to_repo(F.col("module")))
        .where(F.col("dst_repo") != F.col("repo"))
        .where(F.regexp_extract("module", r"^org_repo_(\d{5})", 1) != "")
    )
    # resolve dst against the dictionary (drop dangling refs); broadcast —
    # the dictionary is orders of magnitude smaller than the reference stream
    resolved = refs.join(
        F.broadcast(repos.select(F.col("repo").alias("dst_repo"))), "dst_repo", "inner"
    )
    edges = (
        resolved.groupBy("repo", "dst_repo")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
        .select(
            F.xxhash64("repo").alias("src"),
            F.xxhash64("dst_repo").alias("dst"),
            "weight",
        )
    )
    return edges, repo_ids


def derive_file_edges(corpus: DataFrame) -> DataFrame:
    """File→file edges: importing file → every file of the imported repo
    whose module matches. For the synthetic corpus, a module reference
    ``org_repo_X.mod_M`` maps to files of repo X with path ``.../mod_M.*``."""
    files = corpus.select(
        F.xxhash64("repo", "path").alias("file_id"),
        "repo",
        F.regexp_extract("path", r"mod_(\d+)\.", 1).alias("mod"),
    )
    refs = (
        corpus.select(
            F.xxhash64("repo", "path").alias("src"),
            "repo",
            F.explode(extract_imports("content", "lang")).alias("module"),
        )
        .select(
            "src",
            module_to_repo(F.col("module")).alias("dst_repo"),
            F.regexp_extract("module", r"\.mod_(\d+)$", 1).alias("dst_mod"),
            "repo",
        )
        .where(F.col("dst_repo") != F.col("repo"))
    )
    target = files.select(
        F.col("file_id").alias("dst"), F.col("repo").alias("dst_repo"), F.col("mod").alias("dst_mod")
    )
    return (
        refs.join(target, ["dst_repo", "dst_mod"], "inner")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
