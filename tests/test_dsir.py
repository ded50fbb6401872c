"""DSIR importance resampling (Xie et al. 2023): hashed n-gram bag
models, quantized integer log-weights, Gumbel-top-k selection.  The
quantization claim — per-doc weights are exact BIGINT sums, so they are
invariant to partitioning — is tested directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.functions.curation import (
    LOGW_SCALE,
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_buckets,
)


def _corpus(spark):
    """Two disjoint vocabularies: 'sports' docs (target-like) and
    'finance' docs, plus an empty doc."""
    sports = [
        "the match went to extra time and the crowd cheered the goal",
        "a late goal won the match for the home team in extra time",
        "the team trained hard before the final match of the season",
        "fans of the team cheered every goal in the final",
    ]
    finance = [
        "the bank raised interest rates and the bond market fell",
        "quarterly earnings beat the estimate and the stock rallied",
        "the fund rebalanced its bond and stock allocation this quarter",
        "inflation data moved the market and rates rose again",
    ]
    rows = [(i, t) for i, t in enumerate(sports + finance)] + [(99, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark):
    return spark.createDataFrame(
        [
            (0, "the team scored a goal in the match and the fans cheered"),
            (1, "extra time in the final match and the home crowd cheered"),
        ],
        "doc_id long, text string",
    )


def test_buckets_row_local_and_bounded(spark):
    df = _corpus(spark).select(
        hashed_ngram_buckets(F.col("text"), n_buckets=64).alias("b")
    )
    rows = df.collect()
    for r in rows:
        assert all(0 <= x < 64 for x in r["b"])
    # unigrams + bigrams: n words -> n + (n-1) occurrences
    n_words = 12
    assert len(rows[0]["b"]) == n_words + n_words - 1


def test_weights_favor_target_like_docs(spark):
    raw, target = _corpus(spark), _target(spark)
    w = {
        r["doc_id"]: r["dsir_logw_q"]
        for r in dsir_log_weights(raw, target, n_buckets=512, alpha=0.1).collect()
    }
    sports = [w[i] for i in range(4)]
    finance = [w[i] for i in range(4, 8)]
    assert min(sports) > max(finance)
    assert w[99] == 0  # empty doc: defined weight, not a dropped row


def test_weights_partition_invariant_exact(spark):
    raw, target = _corpus(spark), _target(spark)
    a = sorted(
        (r["doc_id"], r["dsir_logw_q"])
        for r in dsir_log_weights(raw, target, n_buckets=256).collect()
    )
    b = sorted(
        (r["doc_id"], r["dsir_logw_q"])
        for r in dsir_log_weights(
            raw.repartition(7), target.repartition(3), n_buckets=256
        ).collect()
    )
    assert a == b  # EXACT: integer sums, no float association drift


def test_portable_and_fast_hash_both_work(spark):
    raw, target = _corpus(spark), _target(spark)
    for portable in (False, True):
        w = {
            r["doc_id"]: r["dsir_logw_q"]
            for r in dsir_log_weights(
                raw, target, n_buckets=512, alpha=0.1, portable=portable
            ).collect()
        }
        assert min(w[i] for i in range(4)) > max(w[i] for i in range(4, 8))


def test_resample_selects_k_target_like(spark):
    # the empty doc is excluded here: its bag likelihood ratio is an
    # empty product (logw exactly 0), which on this tiny corpus — where
    # heavy smoothing drags every weight negative — would outrank all
    # real docs; at realistic gram-to-bucket ratios weights center near
    # zero and this does not arise
    raw = _corpus(spark).where("doc_id < 90")
    target = _target(spark)
    out = dsir_resample(raw, target, k=3, n_buckets=512, alpha=0.1, seed=1)
    assert set(out.columns) == {"doc_id", "text", "dsir_logw_q", "selected"}
    rows = out.collect()
    assert len(rows) == raw.count()  # every raw row present, marked
    sel = sorted(r["doc_id"] for r in rows if r["selected"])
    assert len(sel) == 3
    # Gumbel noise is ~O(1) in log space while the vocab split puts
    # sports docs many log-units above finance: all picks are sports
    assert all(i < 4 for i in sel)


def test_resample_rerunnable_on_own_output(spark):
    # pre-existing dsir_logw_q/selected columns are overwritten, not
    # duplicated (same re-runnability contract as mask_pii)
    raw, target = _corpus(spark), _target(spark)
    once = dsir_resample(raw, target, k=3, n_buckets=512, seed=1)
    twice = dsir_resample(once, target, k=3, n_buckets=512, seed=1)
    assert twice.columns.count("dsir_logw_q") == 1
    assert twice.columns.count("selected") == 1
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_resample_deterministic_across_runs_and_seeds_differ(spark):
    raw, target = _corpus(spark), _target(spark)

    def picks(seed):
        return tuple(sorted(
            r["doc_id"]
            for r in dsir_resample(
                raw, target, k=3, n_buckets=512, seed=seed
            ).collect()
            if r["selected"]
        ))

    assert picks(1) == picks(1)
    seeds = {picks(s) for s in (1, 2, 3, 4, 5)}
    assert len(seeds) >= 2  # the noise actually depends on the seed


def test_quantization_scale_sane():
    assert LOGW_SCALE == 1_000_000


@pytest.mark.parametrize("n_buckets", [16, 256])
def test_bucket_model_covers_all_buckets(spark, n_buckets):
    from lynxkite_spark.functions.curation import _dsir_bucket_logprobs

    lp = _dsir_bucket_logprobs(
        _target(spark), "text", n_buckets, (1, 2), 1.0, False
    )
    rows = lp.collect()
    assert len(rows) == n_buckets
    assert all(r["logp"] < 0 for r in rows)
