"""Training-data curation family: Gopher quality rules, benchmark
decontamination, deterministic stratified sampling, domain-mix planning,
and token-window sequence packing."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.functions.curation import (
    GOPHER_DEFAULTS,
    GOPHER_RELAXED,
    contaminated_docs,
    domain_mix_plan,
    gopher_quality_flags,
    ngram_hashes,
    pack_sequences,
    sample_hash_unit,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # good doc: enough words, normal shape
        (0, "the quick brown fox jumps over the lazy dog and runs away to the hills", "good"),
        # repetitive doc: one word dominates
        (1, "spam spam spam spam spam spam spam spam spam spam eggs and the ham", "rep"),
        # duplicate lines
        (2, "the same line here\nthe same line here\nthe same line here\nand one more with that", "dup"),
        # too short
        (3, "hi there", "short"),
        # empty
        (4, "", "empty"),
        # no stopwords / non-alpha heavy
        (5, "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666", "nums"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tag string")


def test_gopher_flags_basic(docs):
    out = {r["tag"]: r for r in gopher_quality_flags(docs, **GOPHER_RELAXED).collect()}
    assert out["good"]["keep"] is True
    # repetition: 10/14 words are "spam"
    assert out["rep"]["top_word_frac"] > 0.7 and out["rep"]["keep"] is False
    # 2 of 4 lines are duplicates
    assert out["dup"]["dup_line_frac"] == pytest.approx(0.5)
    assert out["dup"]["keep"] is False
    assert out["short"]["n_words"] == 2 and out["short"]["keep"] is False
    assert out["empty"]["n_words"] == 0 and out["empty"]["keep"] is False
    assert out["nums"]["alpha_word_frac"] == 0.0 and out["nums"]["keep"] is False


def test_gopher_flags_row_local_plan(docs):
    # pure map: no exchange in the plan
    plan = gopher_quality_flags(docs, **GOPHER_RELAXED)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_hashes_short_doc(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "")], "id long, text string")
    out = df.select(F.size(ngram_hashes(F.col("text"), 5)).alias("n")).collect()
    assert [r["n"] for r in out] == [0, 0]


def test_contaminated_docs_planted(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "beta gamma delta epsilon zeta"
            (1, "xx beta gamma delta epsilon zeta yy zz ww vv"),
            # clean
            (2, "totally unrelated words in this document right here ok"),
            # case-insensitive match
            (3, "ALPHA BETA GAMMA DELTA EPSILON more words follow here"),
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_hits"] for r in
            contaminated_docs(corpus, bench, n=5).collect()}
    assert 1 in hits and 3 in hits and 2 not in hits


def test_stratified_sample_deterministic_and_bounded(spark):
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    frac = {"src0": 0.5, "src1": 0.1, "src2": 0.0}
    a = stratified_sample(df, "source", frac, "doc_id", default_fraction=0.9)
    b = stratified_sample(df.repartition(13), "source", frac, "doc_id",
                          default_fraction=0.9)
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert ra == rb  # partitioning-invariant determinism
    got = {r["source"]: r["n"] for r in
           a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got.get("src2", 0) == 0
    assert abs(got["src0"] / 5000 - 0.5) < 0.05
    assert abs(got["src1"] / 5000 - 0.1) < 0.03
    assert abs(got["src3"] / 5000 - 0.9) < 0.05  # default fraction


def test_sample_composes_with_corpus_growth(spark):
    """Hash sampling must keep exactly the same rows when the corpus
    grows (incremental ingestion) — the draw is per-key, not per-run."""
    small = spark.range(1000).select(F.col("id").alias("doc_id"),
                                     F.lit("s").alias("source"))
    big = spark.range(2000).select(F.col("id").alias("doc_id"),
                                   F.lit("s").alias("source"))
    f = {"s": 0.3}
    kept_small = {r["doc_id"] for r in
                  stratified_sample(small, "source", f, "doc_id").collect()}
    kept_big = {r["doc_id"] for r in
                stratified_sample(big, "source", f, "doc_id").collect()}
    assert kept_small == {k for k in kept_big if k < 1000}


def test_domain_mix_plan(spark):
    df = spark.createDataFrame(
        [("wiki", 100), ("wiki", 100), ("web", 1000), ("books", 50)],
        "source string, n_tokens long",
    )
    plan = {r["source"]: r for r in domain_mix_plan(
        df, "source", "n_tokens",
        {"wiki": 0.5, "web": 0.3, "books": 0.2}).collect()}
    # books binds: achievable = 50 / 0.2 = 250 tokens total
    assert plan["books"]["fraction"] == pytest.approx(1.0)
    assert plan["wiki"]["fraction"] == pytest.approx(0.5 * 250 / 200)
    assert plan["web"]["fraction"] == pytest.approx(0.3 * 250 / 1000)
    # realized mix == target shares
    total = sum(p["fraction"] * p["available"] for p in plan.values())
    for s, share in [("wiki", 0.5), ("web", 0.3), ("books", 0.2)]:
        realized = plan[s]["fraction"] * plan[s]["available"] / total
        assert realized == pytest.approx(share, abs=1e-9)


def test_pack_sequences_offsets_and_chunks(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).alias("n_tokens"),
    )
    out = pack_sequences(df, max_tokens=100, token_col="n_tokens",
                         num_groups=4).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["pack_group"], []).append(r)
    assert len(by_group) == 4
    for rows in by_group.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["start_offset"] == off  # consecutive layout in key order
            assert r["chunk"] == off // 100  # chunk containing the start offset
            off += r["n_tokens"]


def test_pack_sequences_partition_invariance(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 11 + 1).alias("n_tokens"))
    a = pack_sequences(df, 64, "n_tokens", num_groups=8).collect()
    b = pack_sequences(df.repartition(7), 64, "n_tokens", num_groups=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["pack_group"], r["start_offset"],
                               r["chunk"]) for r in rows)
    assert key(a) == key(b)


def test_sample_hash_unit_range(spark):
    df = spark.range(5000).select(sample_hash_unit(F.col("id")).alias("u"))
    row = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                 F.avg("u").alias("mu")).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0
    assert abs(row["mu"] - 0.5) < 0.03


def test_gopher_flags_compose_with_streaming(spark, tmp_path):
    """The quality gate is a stateless row-local map, so the identical
    call works on a readStream and yields the batch result when drained
    (the streaming form of corpus curation: gate documents on ingest)."""
    docs = spark.createDataFrame(
        [(i, ("the quick brown fox jumps over a lazy dog and that " * 3)
          if i % 2 == 0 else "spam " * 30) for i in range(20)],
        "doc_id long, text string",
    )
    src = tmp_path / "docs_in"
    src.mkdir()
    docs.coalesce(1).write.parquet(str(src / "batch0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "batch0"))
    q = (
        gopher_quality_flags(stream, **GOPHER_RELAXED).select("doc_id", "keep")
        .writeStream.format("memory").queryName("stream_gopher")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["keep"]
           for r in spark.sql("SELECT * FROM stream_gopher").collect()}
    want = {r["doc_id"]: r["keep"]
            for r in gopher_quality_flags(docs, **GOPHER_RELAXED).select("doc_id", "keep").collect()}
    assert got == want
    assert any(v for v in want.values()) and not all(v for v in want.values())


def test_c4_line_filter_paths(spark):
    from lynxkite_spark.functions.curation import c4_line_filter

    df = spark.createDataFrame(
        [
            (1, "A good first sentence with enough words here.\n"
                "Enable javascript to continue please right now.\n"
                "Too short.\n"
                "Second proper sentence with plenty of words follows!\n"
                "Third proper sentence with plenty of words concludes."),
            (2, "lorem ipsum dolor sit amet and then some more words.\n"
                "A fine sentence with many good words inside it.\n"
                "Another fine sentence with many good words inside it.\n"
                "Yet another fine sentence with many good words appears."),
            (3, "no terminal punctuation on this only line at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["n_lines_kept"] == 3 and out[1]["keep_page"] is True
    assert "javascript" not in out[1]["clean_text"]
    assert "Too short." not in out[1]["clean_text"]
    # lorem ipsum kills the page even though enough lines survive
    assert out[2]["n_lines_kept"] == 4 and out[2]["keep_page"] is False
    assert out[3]["n_lines_kept"] == 0 and out[3]["clean_text"] == ""
    assert out[3]["keep_page"] is False


def test_mask_pii_planted_and_idempotent(spark):
    from lynxkite_spark.functions.curation import mask_pii

    df = spark.createDataFrame(
        [(1, "Mail a.b-c_d@sub.example.co.uk or 192.168.0.1 / +44-20-7946-0958 ok"),
         (2, "Nothing sensitive in here at all")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in mask_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 1)
    m = out[1]["masked_text"]
    assert "<EMAIL>" in m and "<IP>" in m and "<PHONE>" in m
    assert "example" not in m and "192.168" not in m and "7946" not in m
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["masked_text"] == "Nothing sensitive in here at all"
    # idempotent: masking a masked text changes nothing
    again = mask_pii(
        mask_pii(df).select("doc_id", F.col("masked_text").alias("text"))
    ).collect()
    for r in again:
        assert r["masked_text"] == out[r["doc_id"]]["masked_text"]
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)
    # schema-level re-runnability (ADVICE r4): masking the FULL output —
    # which already carries n_email/n_ipv4/n_phone/masked_text — must
    # overwrite those columns, not duplicate them
    rerun = mask_pii(mask_pii(df))
    assert sorted(rerun.columns) == sorted(
        ["doc_id", "text", "n_email", "n_ipv4", "n_phone", "masked_text"])
    assert rerun.count() == 2


def test_gopher_defaults_are_paper_faithful():
    """ADVICE r4: production defaults must be Rae et al. 2021 A1.1, not
    the test-relaxed profile (which is opt-in via GOPHER_RELAXED)."""
    assert GOPHER_DEFAULTS["min_words"] == 50
    assert GOPHER_DEFAULTS["min_stopword_hits"] == 2
    assert GOPHER_DEFAULTS["min_alpha_word_frac"] == 0.8
    assert GOPHER_DEFAULTS["min_mean_word_len"] == 3.0
    assert GOPHER_DEFAULTS["max_mean_word_len"] == 10.0
    assert GOPHER_RELAXED["min_words"] == 5


def test_gopher_paper_defaults_drop_short_docs(spark):
    """A 15-word doc passes the relaxed profile but fails the paper
    default min_words=50."""
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog and runs away "
             "to the hills")],
        "doc_id long, text string")
    assert gopher_quality_flags(df, **GOPHER_RELAXED).first()["keep"] is True
    assert gopher_quality_flags(df).first()["keep"] is False


def test_curation_pipeline_end_to_end(spark):
    """The full curation chain composes: exact dedup -> Gopher gate ->
    C4 line cleaning -> benchmark decontamination -> stratified sample
    -> sequence packing. Plants one defect per stage and checks each is
    removed exactly once, in order."""
    from lynxkite_spark.functions.curation import c4_line_filter, contaminated_docs
    from lynxkite_spark.functions.dedup import exact_duplicates
    from lynxkite_spark.functions.text import tokens

    base = ("This is a perfectly reasonable opening sentence with words.\n"
            "Here's another quality sentence that survives the line rules.\n"
            "And a third proper sentence to keep the page alive today.")
    rows = []
    for i in range(400):
        text = base + f"\nDocument {i} has its own distinctive closing sentence number {i * 7}."
        if i % 50 == 0 and i > 0:
            text = rows[0][1]                      # exact duplicate of doc 0
        elif i % 97 == 0 and i > 0:
            text = "spam " * 40                    # repetitive -> gopher kills
        rows.append((i, text, f"src{i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(9999, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string")
    # plant benchmark contamination into doc 7
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7,
               F.concat(F.col("text"),
                        F.lit("\nalpha beta gamma delta epsilon zeta eta theta appears here too.")))
        .otherwise(F.col("text")))

    d1 = docs.join(
        exact_duplicates(docs).where(~F.col("is_duplicate")).select("doc_id"),
        "doc_id")
    d2 = gopher_quality_flags(d1, **GOPHER_RELAXED).where("keep")
    d3 = c4_line_filter(d2, text_col="text").where("keep_page") \
        .select("doc_id", F.col("clean_text").alias("text"), "source")
    bad = contaminated_docs(d3, bench, n=5)
    d4 = d3.join(bad.select("doc_id"), "doc_id", "left_anti")
    # DSIR composes mid-pipeline (round 5): weigh the cleaned corpus
    # against a target slice and keep everything (k = corpus size) —
    # here only the schema/row contract is asserted; selection quality
    # has its own tests in test_dsir.py
    from lynxkite_spark.functions.curation import dsir_resample

    target = d4.where(F.col("doc_id") % 10 == 1).select("doc_id", "text")
    d4w = dsir_resample(d4, target, k=1000, n_buckets=256, seed=3)
    assert d4w.count() == d4.count()
    d4 = d4w.where("selected").drop("dsir_logw_q", "selected")
    d5 = stratified_sample(d4, "source", {"src0": 1.0, "src1": 1.0, "src2": 0.0},
                           "doc_id")
    packed = pack_sequences(
        d5.select("doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tokens")),
        max_tokens=128, token_col="n_tokens", num_groups=4)
    out = packed.collect()

    kept_ids = {r["doc_id"] for r in out}
    assert 0 in kept_ids
    assert not any(i % 50 == 0 and i > 0 for i in kept_ids)   # dups gone
    assert not any(i % 97 == 0 and i > 0 for i in kept_ids)   # spam gone
    assert 7 not in kept_ids                                  # contaminated gone
    assert all(r["source"] != "src2" for r in out)            # sampled out
    assert len(kept_ids) > 200                                # most docs survive
    # packing invariant holds on the surviving set
    by_group = {}
    for r in out:
        by_group.setdefault(r["pack_group"], []).append(r)
    for rows_g in by_group.values():
        rows_g.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows_g:
            assert r["start_offset"] == off
            off += r["n_tokens"]
