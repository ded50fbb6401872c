"""Gopher A1.2 n-gram repetition rules: Spark metrics vs a direct
Counter-based reference, planted-repetition behavior, paper-threshold
keep flag, re-runnability, and the zero-shuffle plan shape."""

import re
from collections import Counter

from pyspark.sql import functions as F

from lynxkite_spark.functions.curation import (
    GOPHER_REPETITION_DEFAULTS,
    gopher_repetition_flags,
)

NAMES = [f"top_{n}gram_char_frac" for n in (2, 3, 4)] + [
    f"dup_{n}gram_char_frac" for n in range(5, 11)
]


def _ref(text):
    t = (text or "").strip()
    wl = [w.lower() for w in re.split(r"\s+", t)] if t else []
    doc_chars = max(len(" ".join(wl)), 1)
    out = {}
    for n in range(2, 11):
        c = Counter(" ".join(wl[i : i + n]) for i in range(len(wl) - n + 1))
        if n <= 4:
            v = max(
                (cnt * len(g) for g, cnt in c.items() if cnt >= 2), default=0
            )
            out[f"top_{n}gram_char_frac"] = v / doc_chars
        else:
            v = sum((cnt - 1) * len(g) for g, cnt in c.items() if cnt >= 2)
            out[f"dup_{n}gram_char_frac"] = v / doc_chars
    return out


TEXTS = [
    "The committee published a detailed report on regional history "
    "and the museum restored an archive of early photographs with "
    "community support over several months.",
    "buy cheap now " * 30,
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two",
    "",
    None,
    "word",
]


def test_fractions_match_counter_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    rows = gopher_repetition_flags(df).orderBy("doc_id").collect()
    for r, t in zip(rows, TEXTS):
        want = _ref(t)
        for name in NAMES:
            assert r[name] == want[name], (name, t)


def test_planted_repetition_fails_paper_thresholds(spark):
    df = spark.createDataFrame(
        [(0, TEXTS[0]), (1, TEXTS[1]), (2, TEXTS[2])],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_repetition_flags(df).collect()}
    assert rows[0]["rep_keep"]  # clean prose passes
    assert not rows[1]["rep_keep"]  # "buy cheap now" x30: top-2gram soaked
    assert rows[1]["top_2gram_char_frac"] > 0.3
    # a fully duplicated 10-word block trips the dup-{5..10}gram rules
    assert not rows[2]["rep_keep"]
    assert rows[2]["dup_10gram_char_frac"] > GOPHER_REPETITION_DEFAULTS[
        "max_dup_10gram_char_frac"
    ]


def test_short_and_empty_docs_keep(spark):
    # fewer words than n => no n-grams => fractions 0 => keep
    df = spark.createDataFrame(
        [(0, "one two"), (1, ""), (2, None), (3, "word")],
        "doc_id long, text string",
    )
    rows = gopher_repetition_flags(df).collect()
    for r in rows:
        assert r["rep_keep"]
        for name in NAMES:
            assert r[name] == 0.0


def test_rerunnable_and_threshold_override(spark):
    df = spark.createDataFrame([(0, TEXTS[2])], "doc_id long, text string")
    once = gopher_repetition_flags(df)
    twice = gopher_repetition_flags(once)
    assert twice.columns.count("rep_keep") == 1
    assert twice.first()["dup_5gram_char_frac"] == once.first()[
        "dup_5gram_char_frac"
    ]
    # dup fractions are NOT bounded by 1 (overlapping n-grams count per
    # occurrence), so "fully relaxed" needs a large bound, not 1.0
    relaxed = gopher_repetition_flags(
        df, **{k: 1e9 for k in GOPHER_REPETITION_DEFAULTS}
    )
    assert relaxed.first()["rep_keep"]  # all rules relaxed away


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS if t], "text string")
    plan = (
        gopher_repetition_flags(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure map, zero shuffle
    # ONE Arrow batch evaluation, never row-at-a-time Python (the HOF
    # formulation was interpreted and ~50x slower — see docstring)
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
