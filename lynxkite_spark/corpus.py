"""Deterministic synthetic source-code corpus (FIXTURES.md §F1).

One row per file: ``(repo, path, commit, lang, content)`` with seeded
import statements referencing other repos. All randomness is
*value-derived* from the file index via splitmix64 — NOT partition- or
RNG-state-derived — so any parallelism level generates the bit-identical
corpus (this replaces the reference's partition-stride ID trick,
/root/reference/app/.../spark_util/RDDUtils.scala:304-359, with a
stateless scheme that is resumable and partition-invariant).

Generation itself is distributed: ``spark.range(n_files)`` →
``mapInPandas`` with numpy-vectorized mixing, so a 10^12-row corpus is
just a bigger range — no driver-side loops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go"]

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless 64-bit mixer (public splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic uniform[0,1) per (file index, stream)."""
    h = _splitmix64(idx.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(stream * 7919 + seed))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def repo_name(i: int) -> str:
    return f"org/repo-{i:05d}"


def _module_of(repo_idx: np.ndarray) -> np.ndarray:
    """Importable module name for a repo (what content references)."""
    return np.char.add("org_repo_", np.char.zfill(repo_idx.astype("U8"), 5))


def synth_corpus(
    spark: SparkSession,
    n_repos: int = 200,
    n_files: int = 2_000,
    seed: int = 42,
    max_imports: int = 5,
    hub_fraction: float = 0.0,
) -> DataFrame:
    """Distributed deterministic corpus.

    Skew: repo popularity for *placement* is quadratic (repo 0 holds the
    most files) and import *targets* are quadratically skewed toward low
    repo indices, so repo 0 is a hub — the salting path gets exercised.
    ``hub_fraction`` > 0 additionally forces that share of all files to
    import repo 0 (FIXTURES.md skew fixture: ≥30%).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            n = len(idx)
            if n == 0:
                continue
            # placement: file -> repo, quadratically skewed
            u_repo = _u01(idx, 1, seed)
            repo_idx = np.minimum((u_repo * u_repo * n_repos).astype(np.int64), n_repos - 1)
            lang_idx = (_splitmix64(idx.astype(np.uint64) + np.uint64(seed)) % np.uint64(3)).astype(np.int64)
            # imports: k targets per file, each quadratically skewed + self-excluded
            k = (_u01(idx, 2, seed) * (max_imports + 1)).astype(np.int64)
            targets = []
            for j in range(max_imports):
                u_t = _u01(idx, 10 + j, seed)
                t = np.minimum((u_t * u_t * n_repos).astype(np.int64), n_repos - 1)
                targets.append(np.where(j < k, t, -1))
            if hub_fraction > 0:
                forced = _u01(idx, 99, seed) < hub_fraction
                targets[0] = np.where(forced, 0, np.where(0 < k, targets[0], -1))
            tmat = np.stack(targets, axis=1)  # n x max_imports, -1 = absent

            repos = np.array([repo_name(i) for i in range(n_repos)])[repo_idx]
            # Everything below is numpy-vectorized string assembly —
            # byte-identical to the per-row f-string loop it replaced
            # (tests pin determinism; the derive bench depends on it),
            # but ~8x faster per batch: the Python loop was the dominant
            # cost of every corpus materialization.
            ext = np.array(["py", "java", "go"])[lang_idx]
            paths = np.char.add(
                np.char.add(
                    np.char.add(
                        np.char.add("src/pkg_", np.char.mod("%d", (idx >> 4) % 13)),
                        "/mod_",
                    ),
                    np.char.mod("%d", idx % 97),
                ),
                np.char.add(".", ext),
            )
            # per-(row, target) module names; invalid cells become ""
            valid = (tmat >= 0) & (tmat != repo_idx[:, None])
            mod_names = np.char.add(
                np.char.add(
                    np.char.add("org_repo_", np.char.mod("%05d", np.maximum(tmat, 0))),
                    ".mod_",
                ),
                np.char.mod("%d", (idx[:, None] + tmat) % 97),
            )
            is_py = lang_idx == 0
            is_java = lang_idx == 1
            # one import line per valid cell, language-specific framing
            prefix = np.where(is_py, "import ", np.where(is_java, "import ", '    "'))[
                :, None
            ]
            suffix = np.where(is_py, "\n", np.where(is_java, ";\n", '"\n'))[:, None]
            cell = np.where(
                valid,
                np.char.add(np.char.add(prefix, mod_names), suffix),
                "",
            )
            imports = cell[:, 0]
            for j in range(1, cell.shape[1]):
                imports = np.char.add(imports, cell[:, j])
            has_mods = valid.any(axis=1)
            go_wrap = np.char.add(np.char.add("import (\n", imports), ")\n")
            imports = np.where(
                is_py | is_java, imports, np.where(has_mods, go_wrap, "")
            )
            istr = np.char.mod("%d", idx)
            mstr = np.char.mod("%d", idx % 1000)
            body_py = np.char.add(
                np.char.add(np.char.add("def fn_", istr), "():\n    return "),
                np.char.add(mstr, "\n"),
            )
            body_java = np.char.add(
                np.char.add(np.char.add("class C", istr), " { int x = "),
                np.char.add(mstr, "; }\n"),
            )
            body_go = np.char.add(
                np.char.add(np.char.add("func fn", istr), "() int { return "),
                np.char.add(mstr, " }\n"),
            )
            body = np.where(is_py, body_py, np.where(is_java, body_java, body_go))
            contents = np.char.add(
                np.char.add(np.char.add("// file ", istr), "\n"),
                np.char.add(imports, body),
            )
            commits = [
                hashlib.sha1(f"{seed}:{r_}:{p_}".encode()).hexdigest()
                for r_, p_ in zip(repos, paths)
            ]
            yield pd.DataFrame(
                {
                    "repo": repos,
                    "path": paths,
                    "commit": commits,
                    "lang": np.array(LANGS)[lang_idx],
                    "content": contents,
                }
            )

    base = spark.range(0, n_files)
    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def with_sha256(df: DataFrame, col: str = "content") -> DataFrame:
    """The per-row integrity invariant: ``sha256 = sha2(binary(content))``
    must be equality-preserved through every transform (BASELINE.json:15).
    JVM-side — no Python in the hot path."""
    return df.withColumn("sha256", F.sha2(F.col(col).cast("binary"), 256))
