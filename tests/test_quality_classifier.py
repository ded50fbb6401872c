"""FastText-style quality classifier: featurizer parity, EXACT
distributed-vs-numpy trainer agreement (the integer-tick determinism
contract), partition invariance, separation quality, scorer exactness
and re-runnability, and the map-only plan shape of the scoring path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lynxkite_spark.functions.curation import hashed_ngram_buckets
from lynxkite_spark.functions.quality_classifier import (
    py_buckets,
    score_quality,
    synthetic_quality_training_set,
    train_numpy,
    train_quality_classifier,
)

B = 64  # small bucket space keeps collisions interesting and tests fast


@pytest.fixture(scope="module")
def labeled(spark):
    texts, labels = synthetic_quality_training_set()
    return spark.createDataFrame(
        list(zip(texts, labels)), "text string, label int"
    )


def test_py_buckets_matches_spark_featurizer(spark):
    texts = [
        "The committee published a detailed report.",
        "  spaced   out\ttokens\nand lines  ",
        "one",
        "",
        None,
        "UPPER lower MiXeD case words repeated words repeated",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        hashed_ngram_buckets(
            F.coalesce(F.col("text"), F.lit("")), B, (1, 2), portable=True
        ).alias("bk")
    ).collect()
    for t, row in zip(texts, got):
        assert row["bk"] == py_buckets(t, B), repr(t)


def test_distributed_trainer_equals_numpy_twin_exactly(spark, labeled):
    texts, labels = synthetic_quality_training_set()
    want = train_numpy(texts, labels, n_buckets=B, iterations=12, lr=1.0)
    got = train_quality_classifier(
        labeled.repartition(7),
        n_buckets=B,
        iterations=12,
        lr=1.0,
        portable=True,
    )
    # EXACT agreement — every cross-doc reduction is an integer-tick sum
    assert got["weights_q"] == want["weights_q"]
    assert got["bias_q"] == want["bias_q"]


def test_training_partition_invariant(spark, labeled):
    a = train_quality_classifier(
        labeled.repartition(2), n_buckets=B, iterations=6, portable=True
    )
    b = train_quality_classifier(
        labeled.repartition(13), n_buckets=B, iterations=6, portable=True
    )
    assert a["weights_q"] == b["weights_q"]
    assert a["bias_q"] == b["bias_q"]


def test_classifier_separates_held_out(spark, labeled):
    # train on 2/3 of the synthetic set, score the held-out 1/3
    texts, labels = synthetic_quality_training_set()
    train_rows = [(t, y) for i, (t, y) in enumerate(zip(texts, labels)) if i % 3]
    test_rows = [(t, y) for i, (t, y) in enumerate(zip(texts, labels)) if not i % 3]
    train_df = spark.createDataFrame(train_rows, "text string, label int")
    model = train_quality_classifier(
        train_df, n_buckets=256, iterations=30, portable=True
    )
    test_df = spark.createDataFrame(test_rows, "text string, label int")
    scored = score_quality(test_df, model, portable=True).collect()
    acc = sum(r["keep"] == bool(r["label"]) for r in scored) / len(scored)
    assert acc >= 0.9, acc
    # probabilities are calibrated-ish: positives above negatives on average
    pos = [r["quality_prob"] for r in scored if r["label"] == 1]
    neg = [r["quality_prob"] for r in scored if r["label"] == 0]
    assert min(pos) > max(neg) or np.mean(pos) > np.mean(neg) + 0.3


def test_scorer_matches_python_and_is_rerunnable(spark, labeled):
    texts, labels = synthetic_quality_training_set()
    model = train_numpy(texts, labels, n_buckets=B, iterations=8)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts[:20])], "doc_id long, text string"
    )
    out = score_quality(df, model, portable=True)
    w = model["weights_q"]
    for r in out.collect():
        bk = py_buckets(r["text"], B)
        n_eff = max(len(bk), 1)
        s = model["bias_q"] * n_eff + sum(w[b] for b in bk)
        assert (r["n_grams"], r["score_q"], r["keep"]) == (len(bk), s, s > 0)
        assert r["quality_prob"] == pytest.approx(
            1.0 / (1.0 + np.exp(-s / (n_eff * 1e6)))
        )
    # re-running on its own output overwrites, not duplicates (ADVICE r4)
    twice = score_quality(out, model, portable=True)
    assert twice.columns.count("score_q") == 1
    assert [r["score_q"] for r in twice.orderBy("doc_id").collect()] == [
        r["score_q"] for r in out.orderBy("doc_id").collect()
    ]


def test_arrow_scorer_matches_jvm_exactly(spark):
    texts, labels = synthetic_quality_training_set()
    model = train_numpy(texts, labels, n_buckets=B, iterations=8)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts + ["", None, "   ", "word"])],
        "doc_id long, text string",
    )
    jvm = {r["doc_id"]: r for r in score_quality(df, model).collect()}
    arw = {r["doc_id"]: r for r in score_quality(df, model, arrow=True).collect()}
    assert set(jvm) == set(arw)
    for k in jvm:
        assert (jvm[k]["n_grams"], jvm[k]["score_q"], jvm[k]["keep"]) == (
            arw[k]["n_grams"], arw[k]["score_q"], arw[k]["keep"]
        )
        assert jvm[k]["quality_prob"] == pytest.approx(arw[k]["quality_prob"])


def test_arrow_scorer_rejects_xxhash_models(spark, labeled):
    model = train_quality_classifier(labeled, n_buckets=B, iterations=1)
    assert model["hash"] == "xxhash64"
    with pytest.raises(ValueError, match="portable"):
        score_quality(labeled, model, arrow=True)
    # and the default portable flag now follows the model's featurization
    pm = train_quality_classifier(labeled, n_buckets=B, iterations=1,
                                  portable=True)
    assert pm["hash"] == "portable"


def test_scoring_plan_is_map_only(spark, labeled):
    texts, labels = synthetic_quality_training_set()
    model = train_numpy(texts, labels, n_buckets=B, iterations=4)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    plan = score_quality(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: the corpus-scale path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_and_degenerate_docs(spark):
    texts, labels = synthetic_quality_training_set()
    model = train_numpy(texts, labels, n_buckets=B, iterations=4)
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "   "), (3, "word")],
        "doc_id long, text string",
    )
    rows = score_quality(df, model, portable=True).orderBy("doc_id").collect()
    assert [r["n_grams"] for r in rows] == [0, 0, 0, 1]
    # empty docs score exactly the bias
    assert rows[0]["score_q"] == model["bias_q"] == rows[1]["score_q"]


def test_empty_training_set_raises(spark):
    df = spark.createDataFrame([], "text string, label int")
    with pytest.raises(ValueError, match="empty training set"):
        train_quality_classifier(df, n_buckets=B, iterations=1)
