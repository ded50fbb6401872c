"""Training-data pipeline functions: text analysis, dedup, similarity,
multimodal plumbing — over the driver's documents/embeddings tables."""

import pytest
from pyspark.sql import functions as F

from lynxkite_spark.functions.dedup import (
    exact_duplicates,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_duplicates,
)
from lynxkite_spark.functions.multimodal import (
    attach_media_metadata,
    extract_features,
    sample_frames,
    synth_media,
)
from lynxkite_spark.functions.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    embedding_near_duplicates,
)
from lynxkite_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame([(1, "a b  c"), (2, ""), (3, "  x ")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(df).collect()}
    assert got == {1: 3, 2: 0, 3: 1}
    bpe = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_ish_token_count(df).collect()}
    assert bpe[1] == 3


def test_quality_and_fingerprint(docs):
    q = quality_score(docs)
    rows = q.select("quality_score", "q_alpha_ratio").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    fp = fingerprint(docs)
    # normalization: whitespace-insensitive
    assert fp.select("fingerprint").distinct().count() <= docs.count()


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it was good"),
            (2, "der hund ist nicht in das haus und"),
            (3, "le chat est dans la maison et il"),
            (4, "xyzzy qqq zzz"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keeper"], r["is_duplicate"]) for r in exact_duplicates(df).collect()}
    assert got == {1: (1, False), 2: (1, True), 3: (3, False)}


def test_ngram_jaccard_and_minhash(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words describing unrelated things entirely here now"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs

    sigs = minhash_signatures(df, num_hashes=32)
    assert sigs.count() == 3 and len(sigs.first()["sig"]) == 32
    cand = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    assert (1, 2) in {(r["a"], r["b"]) for r in cand.collect()}
    dd = {(r["a"], r["b"]) for r in minhash_dedup(df, num_hashes=32, bands=8, threshold=0.5).collect()}
    assert dd == {(1, 2)}

    # signature-estimate verify: no second pass over texts; the
    # agreement fraction must approximate the true Jaccard
    est = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_dedup(
            df, num_hashes=32, bands=8, threshold=0.5, verify="estimate"
        ).collect()
    }
    assert set(est) == {(1, 2)}
    assert abs(est[(1, 2)] - pairs[(1, 2)]) < 0.3

    # portable (md5-derived) hash path: same near-dup decision
    ddp = {
        (r["a"], r["b"])
        for r in minhash_dedup(
            df, num_hashes=32, bands=8, threshold=0.5, hash_fn="portable"
        ).collect()
    }
    assert ddp == {(1, 2)}


def test_minhash_viral_bucket_guard(spark):
    """A planted cluster of identical docs lands the same signature in
    the same bucket in EVERY band; without the cap the candidate
    self-join is quadratic in the cluster (10k docs -> ~50M pairs at
    100 TB corpus scale).  With max_bucket_size the over-cap buckets are
    semi-joined away before pairing, while normal-sized near-dup groups
    keep their pairs."""
    n_cluster = 60
    rows = [(i, "identical boilerplate text repeated across the corpus body")
            for i in range(n_cluster)]
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows += [(1000, base), (1001, base.replace("today", "tomorrow"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, num_hashes=32)

    uncapped = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    assert uncapped.count() >= n_cluster * (n_cluster - 1) // 2

    capped = minhash_lsh_candidates(
        sigs, bands=8, rows_per_band=4, max_bucket_size=10)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    # mega-cluster pairs gone, the honest near-dup pair survives
    assert (1000, 1001) in got
    assert not any(a < n_cluster and b < n_cluster for a, b in got)

    # end-to-end forward through minhash_dedup
    dd = {(r["a"], r["b"]) for r in minhash_dedup(
        df, num_hashes=32, bands=8, threshold=0.5, max_bucket_size=10
    ).collect()}
    assert (1000, 1001) in dd
    assert not any(a < n_cluster and b < n_cluster for a, b in dd)


def test_simhash(spark):
    df = spark.createDataFrame(
        [(1, "aaa bbb ccc ddd"), (2, "aaa bbb ccc ddd"), (3, "zzz yyy xxx www")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert sh[1] == sh[2] and sh[1] != sh[3]
    dup = {r["doc_id"]: r["is_duplicate"] for r in simhash_duplicates(df).collect()}
    assert dup == {1: False, 2: True, 3: False}


def test_near_duplicate_clusters_transitive_closure(spark):
    """Pairs A~B and B~C without A~C must still land A,B,C in ONE
    cluster with min-id keeper; singletons keep their own id."""
    from lynxkite_spark.functions.dedup import near_duplicate_clusters

    docs = spark.createDataFrame(
        [(10, "x"), (11, "x"), (12, "x"), (30, "y"), (31, "y"), (50, "z")],
        "doc_id long, text string",
    )
    # hand-made chain: 10~11, 11~12 (no 10~12 pair) + isolated pair 30~31
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (30, 31)], "a long, b long"
    )
    got = {
        r["doc_id"]: (r["cluster"], r["is_duplicate"])
        for r in near_duplicate_clusters(docs, pairs=pairs).collect()
    }
    assert got == {
        10: (10, False),
        11: (10, True),
        12: (10, True),
        30: (30, False),
        31: (30, True),
        50: (50, False),
    }

    # end-to-end through minhash: the two identical texts cluster, the
    # outlier stays a singleton keeper
    docs2 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "completely different words describing unrelated things"),
        ],
        "doc_id long, text string",
    )
    got2 = {
        r["doc_id"]: (r["cluster"], r["is_duplicate"])
        for r in near_duplicate_clusters(
            docs2, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert got2 == {1: (1, False), 2: (1, True), 3: (3, False)}


def test_brute_force_topk_self_consistent(spark, embs):
    queries = embs.where(F.col("vec_id") < 3)
    out = brute_force_topk(embs, queries, k=5)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append((r["rank"], r["cosine_sim"]))
    for q, lst in per.items():
        lst.sort()
        sims = [s for _, s in lst]
        assert sims == sorted(sims, reverse=True)
        assert len(lst) == 5


def test_ann_lsh_recall(spark, embs):
    queries = embs.where(F.col("vec_id") < 10)
    exact = brute_force_topk(embs, queries, k=3)
    approx = ann_lsh_topk(embs, queries, k=3, n_planes=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3  # 4 planes / 16 buckets on 500 vecs: loose sanity bound

    nd = embedding_near_duplicates(embs, threshold=0.99)
    assert all(r["a"] < r["b"] for r in nd.collect())


def test_multimodal_plumbing(spark):
    media = synth_media(spark, n=30)
    meta = attach_media_metadata(media)
    assert meta.where(F.col("payload_sha256").isNull()).count() == 0
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30 and all(len(r["feature"]) == 16 for r in rows)
    # determinism: same payload → same features
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)
    frames = sample_frames(media, every_ms=1000)
    vids = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids


def test_session_udfs_are_builtin_sql_macros(spark):
    """The reference's session UDFs (geodistance, string_intersect) are
    SQL macros, not Python lambdas — no BatchEvalPython in the plan."""
    from lynxkite_spark.sql import register_udfs

    register_udfs(spark)
    df = spark.sql("""
        SELECT geodistance(48.8566, 2.3522, 51.5074, -0.1278) AS d,
               string_intersect('b,a,c', 'c,b,x') AS s
    """)
    row = df.first()
    assert abs(row["d"] - 343_556) < 1000  # Paris-London ~343.5 km
    assert row["s"] == ["b", "c"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_connector_formats_routed_with_clear_error(spark):
    """Neo4j/BigQuery route through the unified reader and fail with an
    actionable message when the connector jar is absent (sandbox)."""
    import pytest as _pytest

    from lynxkite_spark.sources.io import read_table

    with _pytest.raises(RuntimeError, match="neo4j connector not available"):
        read_table(spark, "", format="neo4j", labels=":Person")
    with _pytest.raises(RuntimeError, match="bigquery connector not available"):
        read_table(spark, "proj.ds.tbl", format="bigquery")


def test_multimodal_real_codecs(spark):
    """PPM decode/resize and WAV decode/feature kernels are REAL numpy
    code — round-trip and invariants checked without any codec lib."""
    import numpy as np

    from lynxkite_spark.functions.multimodal import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        media_features,
        resize_images,
        synth_media,
    )

    # PPM round-trip
    img = (np.arange(12 * 8 * 3, dtype=np.uint8)).reshape(8, 12, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()

    media = synth_media(spark, n=30)
    imgs = media.where(F.col("kind") == "image")
    # distributed resize: every output payload is a valid PPM of the
    # requested size
    out = resize_images(imgs, width=4, height=4).collect()
    assert len(out) == imgs.count()
    for r in out:
        arr = decode_ppm(bytes(r["payload"]))
        assert arr.shape == (4, 4, 3)

    # WAV decode: synth audio is a pure sine at 110+i Hz — RMS energy of
    # a sine is ~0.707 * amplitude; check via the feature kernel
    audio = media.where(F.col("kind") == "audio").first()
    samples, rate = decode_wav(bytes(audio["payload"]))
    assert rate == 8000 and samples.shape[1] == 1
    f = media_features(bytes(audio["payload"]), "audio/wav", dim=8)
    rms = f[:6]
    expected = (12000 / 32768.0) * (2 ** -0.5)
    assert all(abs(x - expected) < 0.05 for x in rms)
    assert abs(f[7] - samples.shape[0] / rate) < 1e-6  # duration feature

    # video payloads (no codec) fall back to the deterministic hash path
    vid = media.where(F.col("kind") == "video").first()
    a = media_features(bytes(vid["payload"]), "video/mp4", dim=16)
    b = media_features(bytes(vid["payload"]), "video/mp4", dim=16)
    assert (a == b).all()


def test_ngram_jaccard_stop_shingle_guard(spark):
    """max_doc_freq prunes viral shingles from the pairwise join only:
    near-dup pairs still found via their rare shingles; set sizes (the
    denominator) stay exact."""
    viral = "the quick brown fox jumps over the lazy dog"
    rows = [(i, f"{viral} unique{i} filler{i} words{i}") for i in range(20)]
    rows.append((100, f"{viral} special shared tail goes here now"))
    rows.append((101, f"{viral} special shared tail goes here today"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.4).collect()
    }
    pruned = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.1, max_doc_freq=5).collect()
    }
    assert (100, 101) in full and (100, 101) in pruned
    # pruning under-counts: the numerator loses the viral shingles, the
    # denominator stays exact, so pruned <= full for every pair
    assert pruned[(100, 101)] <= full[(100, 101)] + 1e-12
    # and the rare boundary shingles alone still surface the near-dup
    # pair while pairs related ONLY through the viral prefix vanish
    assert all(a == 100 or b == 101 or pruned[(a, b)] < full.get((a, b), 1.0)
               for (a, b) in pruned)


def test_ann_multi_probe_improves_recall(spark, embs):
    """Hamming-1 multi-probe must not lower recall vs single-probe, and
    the single-probe result set is a subset of the multi-probe one."""
    from lynxkite_spark.functions.similarity import ann_lsh_topk, brute_force_topk

    q = embs.where(F.col("vec_id") < 30)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embs, q, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(embs, q, k=5, n_planes=8, bands=1).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(embs, q, k=5, n_planes=8, bands=1,
                              multi_probe=1).collect()
    }
    recall_single = len(single & exact) / len(exact)
    recall_multi = len(multi & exact) / len(exact)
    # measured on this data: 0.04 single vs 0.247 multi at 8 planes
    assert recall_multi >= 3 * recall_single
    assert recall_multi > 0.15
    assert single <= multi | single  # probe set only grows


def test_ann_banded_profiles(spark, embs):
    """The banded default beats the old single-bucket signature, and the
    high_recall profile reaches >=0.8 recall@5 even on this
    structure-free corpus (rank-10 cosine barely above the random-pair
    max -- see BENCH/BASELINE.md)."""
    from lynxkite_spark.functions.similarity import ann_lsh_topk, brute_force_topk

    q = embs.where(F.col("vec_id") < 30)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embs, q, k=5).collect()
    }

    def recall(**kw):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_lsh_topk(embs, q, k=5, **kw).collect()
        }
        return len(got & exact) / len(exact)

    r_single = recall(n_planes=8, bands=1)
    r_default = recall()
    r_high = recall(profile="high_recall")
    assert r_default > r_single
    assert r_high >= 0.8
    # the auto default measures the (lack of) neighbor signal and picks a
    # high-recall geometry on this corpus — no more 0.2-recall defaults
    assert r_default >= 0.8


def test_ann_auto_band_geometry(spark):
    """auto_band_geometry reads the corpus's neighbor signal: a tightly
    clustered corpus gets the cheap wide-band geometry, a structure-free
    corpus falls back to the high-recall floor."""
    import math
    import random

    from lynxkite_spark.functions.similarity import (
        _BAND_MENU, auto_band_geometry)

    rng = random.Random(3)
    dim = 16

    def vec(center, spread):
        return [c + rng.gauss(0, spread) for c in center]

    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(8)]
    clustered = spark.createDataFrame(
        [(i, vec(centers[i % 8], 0.05)) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    qs = clustered.where(F.col("vec_id") < 16)
    r, b = auto_band_geometry(clustered, qs, k=5)
    assert (r, b) == _BAND_MENU[0]  # strong signal -> cheapest geometry

    noise = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    qn = noise.where(F.col("vec_id") < 16)
    r2, b2 = auto_band_geometry(noise, qn, k=5)
    assert r2 < r  # weak signal -> narrower bands, more of them
    # expected-recall formula sanity: the pick meets the target for the
    # p it measured, by construction
    assert (r2, b2) in _BAND_MENU


def test_ann_auto_geometry_memoized(spark):
    """r4 review: profile='auto' memoizes the measured geometry on the
    corpus DataFrame object, so per-batch calls over one corpus don't
    re-run the sample + count every time."""
    import random

    from lynxkite_spark.functions.similarity import ann_lsh_topk

    rng = random.Random(5)
    corpus = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    q = corpus.where(F.col("vec_id") < 8)
    assert not hasattr(corpus, "_lk_auto_geometry")
    ann_lsh_topk(corpus, q, k=5).count()
    memo = corpus._lk_auto_geometry
    assert memo[0] == (5, "vec_id", "embedding", 64, 42)
    # second call with the same params reuses the memo (same object)
    ann_lsh_topk(corpus, q, k=5).count()
    assert corpus._lk_auto_geometry is memo
    # different params miss the memo and re-measure
    ann_lsh_topk(corpus, q, k=3).count()
    assert corpus._lk_auto_geometry[0][0] == 3


def test_ann_viral_bucket_guard(spark, embs):
    """max_bucket_size drops oversized corpus buckets: results shrink
    (or stay equal), never error, and survivors are still ranked."""
    from lynxkite_spark.functions.similarity import ann_lsh_topk

    q = embs.where(F.col("vec_id") < 5)
    full = ann_lsh_topk(embs, q, k=5).count()
    capped = ann_lsh_topk(embs, q, k=5, max_bucket_size=3)
    assert capped.count() <= full
    # rank column still well-formed on the survivors
    assert capped.where(F.col("rank") > 5).count() == 0
