"""Dedup / text / similarity operator unit tests on crafted docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import dedup as D
from nt_data_pipelines_spark.operators import multimodal as M
from nt_data_pipelines_spark.operators import similarity as SIM
from nt_data_pipelines_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog"),  # near dup
        (4, "completely different words entirely here now"),
        (5, "el perro y el gato en la casa"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_min_survivor(docs):
    got = D.exact_dedup(docs, "doc_id", "text").collect()
    by_n = {r["survivor_id"]: r["n_dups"] for r in got}
    assert by_n[1] == 2  # docs 1,2 collapse; min id survives
    assert len(got) == 4


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    keyed = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert keyed[(1, 2)] == pytest.approx(1.0)
    assert keyed[(1, 3)] > 0.7  # one word changed
    assert (1, 4) not in keyed


def test_minhash_lsh_candidates_contain_dups(docs):
    cands = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    assert (1, 2) in cands  # identical word sets always collide
    assert (1, 5) not in cands


def test_simhash_identical_and_distant(docs):
    fp = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    hamming = bin(fp[1] ^ fp[4]).count("1")
    assert hamming > 0


def test_simhash_banded_equals_pair_scan(spark):
    # Adversarial fingerprints: exact dup, 1/3/4-bit flips across
    # different chunk positions, plus far-away values. The banded
    # equi-join must reproduce the O(n^2) scan's pair set exactly
    # (pigeonhole recall) and find nothing beyond it (verify step).
    fps = spark.createDataFrame(
        [
            (1, 0b1010_1100_0011_0101),
            (2, 0b1010_1100_0011_0101),  # hamming 0 vs 1
            (3, 0b1010_1100_0011_0100),  # hamming 1 vs 1 (chunk 0 differs)
            (4, 0b0010_1100_1011_0101),  # hamming 2 vs 1, bits in chunks 1 & 3
            (5, 0b1010_0100_0011_1111),  # hamming 3 vs 1, spread over 3 chunks
            (6, 0b0101_0011_1100_1010),  # complement of 1: hamming 16
            (7, 0b1110_1100_0011_0111),  # hamming 2 vs 1, bits in chunks 0 & 3
        ],
        "doc_id int, simhash long",
    )
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_pairs(fps, "doc_id", "simhash", max_hamming=3).collect()
    }
    banded_df = D.simhash_banded_pairs(fps, "doc_id", "simhash", max_hamming=3, bits=16)
    banded = {(r["id_a"], r["id_b"], r["hamming"]) for r in banded_df.collect()}
    assert banded == full and (1, 2, 0) in full and (1, 5, 3) in full
    assert not any(p[0] == 6 or p[1] == 6 for p in full)  # far doc never pairs
    # the scale property: candidates come from an equi-join, not a pair scan
    plan = banded_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_simhash_banded_64bit_negative_fingerprints(spark):
    """Full-width signed simhashes (ADVICE r2): chunk extraction must
    be exact integer bit ops — float division loses bits past the
    53-bit mantissa and mangles negatives, silently missing pairs."""
    def s64(u):  # wrap to signed 64-bit like a JVM long
        u &= (1 << 64) - 1
        return u - (1 << 64) if u >= (1 << 63) else u

    x1 = -1  # all 64 bits set
    fps = spark.createDataFrame(
        [
            (1, x1),
            (2, s64(x1 ^ 1)),                        # hamming 1, low chunk
            (3, s64(x1 ^ (1 << 40) ^ (1 << 12))),    # hamming 2, two chunks
            (4, s64(x1 ^ (1 << 63))),                # hamming 1, sign bit chunk
            (5, 0x0F0F0F0F0F0F0F0F),                 # far away (hamming 32)
        ],
        "doc_id int, simhash long",
    )
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_pairs(fps, "doc_id", "simhash", max_hamming=3).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_banded_pairs(
            fps, "doc_id", "simhash", max_hamming=3, bits=64
        ).collect()
    }
    assert banded == full
    assert (1, 2, 1) in full and (1, 3, 2) in full and (1, 4, 1) in full
    assert not any(5 in (a, b) for a, b, _ in full)


def test_quality_features_values(spark):
    df = spark.createDataFrame([(1, "ab cd 12!")], ["doc_id", "text"])
    r = TX.quality_features(df, "text").collect()[0]
    assert r["q_chars"] == 9
    assert r["q_words"] == 3
    assert r["q_digit_ratio"] == pytest.approx(2 / 9)
    assert r["q_tokens"] == 4  # ab, cd, 12, !


def test_language_id_argmax(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in TX.language_id(docs, "doc_id", "text").collect()}
    assert got[1] == "en"
    assert got[5] == "es"
    assert got[4] == "und"  # no lexicon hits


def test_fingerprint_stable_under_suffix(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in TX.bigram_fingerprint(df, "doc_id", "text").collect()}
    # doc 2 adds bigrams; min over a superset can only stay or shrink —
    # here the shared prefix dominates, typically equal fingerprints
    assert fp[1] and fp[2]


def test_cosine_topk_and_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2]
    dups = SIM.near_dup_pairs(emb, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in dups} == {(0, 1)}


def test_lsh_ann_recall_on_clusters(spark):
    import numpy as np

    rng = np.random.RandomState(21)
    base = rng.normal(size=(4, 16))
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(10):
            v = base[c] + rng.normal(0, 0.01, 16)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"]).select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id").isin(0, 10, 20, 30))
    exact = SIM.brute_force_topk(emb, queries, k=3).collect()
    approx = SIM.lsh_ann_topk(emb, queries, k=3, num_planes=6, dim=16).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.75  # tight clusters land in shared buckets


def test_lsh_near_dup_composition_on_clusters(spark):
    # Clustered vectors: the LSH-blocked pairs must (a) be a subset of
    # the exact quadratic pairs, (b) recover nearly all of them (tight
    # clusters land in one bucket), and (c) feed group resolution to
    # the same components the exact pairs produce.
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=(4, 16)) * 3
    rows = [
        (c * 25 + i, [float(x) for x in base[c] + rng.normal(0, 0.03, 16)])
        for c in range(4)
        for i in range(25)
    ]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    exact = SIM.near_dup_pairs(corpus, threshold=0.95)
    blocked = SIM.lsh_near_dup_pairs(corpus, threshold=0.95, num_planes=4, dim=16)
    e = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    b = {(r["id_a"], r["id_b"]) for r in blocked.collect()}
    assert b <= e and len(e) > 0
    assert len(b) / len(e) >= 0.9  # tight clusters: near-total recall
    groups = D.resolve_dup_groups_distributed(blocked, "id_a", "id_b")
    canon = {r["doc_id"]: r["canonical_id"] for r in groups.collect()}
    # every clustered doc resolves to its cluster's minimum id
    for doc, root in canon.items():
        assert root == min(x for x in canon if x // 25 == doc // 25)


def test_multimodal_plumbing(spark, docs):
    media = M.documents_as_media(docs, "doc_id", "text")
    feats = M.extract_features(media, decode_stub="fake").collect()
    assert len(feats) == docs.count()
    r = {f["media_id"]: f for f in feats}
    assert r[1]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert 0 < r[1]["mean_byte"] < 255


def test_multimodal_resize_contract(spark, docs):
    media = M.documents_as_media(docs, "doc_id", "text")
    resized = M.resize_images(media, width=8, height=4, decode_stub="fake").collect()
    assert len(resized) == docs.count()
    assert all(r["n_bytes"] == 8 * 4 for r in resized)  # exact target size
    assert all(len(r["payload"]) == 32 for r in resized)
    # deterministic: same input -> same bytes
    again = M.resize_images(media, width=8, height=4, decode_stub="fake").collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in resized} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }


def test_multimodal_frame_sampling_fanout(spark, docs):
    media = M.documents_as_media(docs, "doc_id", "text")
    frames = M.sample_frames(media, every_n_bytes=16, max_frames=3, decode_stub="fake")
    got = frames.collect()
    assert len(got) > docs.count()  # one-to-many fan-out happened
    per = {}
    for r in got:
        per.setdefault(r["media_id"], []).append(r["frame_index"])
    assert all(sorted(v) == list(range(len(v))) and len(v) <= 3 for v in per.values())


def test_multimodal_fake_path_bit_stable(spark):
    # The fake decode feeds oracle hash checks, so it must be
    # BIT-stable: fixed input -> fixed output digest, across runs.
    import hashlib

    media = spark.createDataFrame(
        [(1, b"abc", "image/png", 3, "x"), (2, b"0123456789", "image/png", 10, "y")],
        M.MEDIA_SCHEMA,
    )
    runs = []
    for _ in range(2):
        rows = M.resize_images(media, 4, 3, decode_stub="fake").orderBy("media_id").collect()
        runs.append([hashlib.sha256(bytes(r["payload"])).hexdigest() for r in rows])
        assert all(r["n_bytes"] == 12 for r in rows)
    assert runs[0] == runs[1]
    # pinned goldens: tiling 'abc' / '0123456789' to 12 bytes
    assert runs[0][0] == hashlib.sha256(b"abcabcabcabc").hexdigest()
    assert runs[0][1] == hashlib.sha256(b"012345678901").hexdigest()


def test_multimodal_auto_resolution(spark, docs):
    # 'auto' must resolve to the real codec iff it is installed;
    # in this container that means the deterministic fake.
    media = M.documents_as_media(docs).limit(1)
    if M.HAS_PIL:
        import pytest as _pytest

        # text bytes are not a decodable image: PIL path must raise
        with _pytest.raises(Exception):
            M.resize_images(media, 2, 2, decode_stub="auto").collect()
    else:
        got = M.resize_images(media, 2, 2, decode_stub="auto").collect()
        assert got and got[0]["n_bytes"] == 4
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="PIL"):
            M.resize_images(media, 2, 2, decode_stub="pil")


def test_sample_frames_ffmpeg_probe(spark, docs):
    """'auto' resolves to real keyframe sampling iff ffmpeg is on
    PATH; otherwise the deterministic fake (golden unchanged) and an
    explicit 'ffmpeg' request fails loudly."""
    media = M.documents_as_media(docs, "doc_id", "text").limit(2)
    if M.HAS_FFMPEG:
        # text bytes are not decodable media: the real path must raise
        with pytest.raises(Exception):
            M.sample_frames(media, decode_stub="auto").collect()
    else:
        got = M.sample_frames(media, every_n_bytes=16, max_frames=3, decode_stub="auto")
        fake = M.sample_frames(media, every_n_bytes=16, max_frames=3, decode_stub="fake")
        key = lambda r: (r["media_id"], r["frame_index"], bytes(r["frame_payload"]))
        assert sorted(map(key, got.collect())) == sorted(map(key, fake.collect()))
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            M.sample_frames(media, decode_stub="ffmpeg")


def test_multimodal_error_stub(spark, docs):
    media = M.documents_as_media(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        M.extract_features(media, decode_stub="error").collect()


def test_repetition_stats_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),            # all one word
            (2, "a b c d"),                        # no repetition
            (3, "x y x y x y"),                    # repeated bigrams
            (4, "solo"),                           # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TX.repetition_stats(df, "doc_id").collect()}
    assert got[1]["dup_word_ratio"] == pytest.approx(0.75)
    assert got[1]["top_word_ratio"] == 1.0
    assert got[1]["dup_bigram_ratio"] == pytest.approx(2 / 3)
    assert got[2]["dup_word_ratio"] == 0.0 and got[2]["dup_bigram_ratio"] == 0.0
    assert got[3]["dup_bigram_ratio"] == pytest.approx(1 - 2 / 5)
    assert got[4]["dup_bigram_ratio"] is None  # no bigrams -> null, not 0/0


def test_deterministic_stratified_sample(spark):
    rows = [(i, "view" if i % 2 else "click") for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    got = TX.deterministic_stratified_sample(
        df, "event_type", "event_id", {"view": 0.2, "click": 0.8}
    )
    again = TX.deterministic_stratified_sample(
        df.repartition(7), "event_type", "event_id", {"view": 0.2, "click": 0.8}
    )
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == sorted(r["event_id"] for r in again.collect())  # repartition-stable
    by_type = {"view": 0, "click": 0}
    for r in got.collect():
        by_type[r["event_type"]] += 1
    assert by_type["view"] == pytest.approx(0.2 * 1000, rel=0.2)
    assert by_type["click"] == pytest.approx(0.8 * 1000, rel=0.1)
    # unlisted strata default to dropped
    extra = spark.createDataFrame([(99999, "other")], "event_id long, event_type string")
    assert TX.deterministic_stratified_sample(
        extra, "event_type", "event_id", {"view": 1.0}
    ).count() == 0


def test_pack_sequences_properties(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (10 + i % 50))) for i in range(300)],
        "doc_id long, text string",
    )
    got = TX.pack_sequences(docs, "doc_id", capacity=100, num_shards=8).collect()
    assert len(got) == 300
    per_shard: dict = {}
    for r in got:
        per_shard.setdefault(r["shard"], []).append((r["doc_id"], r["n_tokens"], r["bin_id"]))
    for shard, rows in per_shard.items():
        rows.sort()
        offset = 0
        for _doc, n, b in rows:
            assert b == offset // 100  # bin = starting offset // capacity
            offset += n
    # deterministic across runs
    again = TX.pack_sequences(docs.repartition(5), "doc_id", capacity=100, num_shards=8)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_scrub_pii_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact john.doe+x@example.co.uk for details"),
            (2, "call 555-123-4567 or 4111 1111 1111 1111 now"),
            (3, "clean text with short 123 number"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in TX.scrub_pii(df, "text").collect()}
    assert got[1] == "contact [EMAIL] for details"
    assert got[2] == "call [NUMBER] or [NUMBER] now"
    assert got[3] == "clean text with short 123 number"  # short digits untouched


def test_benchmark_contamination_crafted(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # shares 'the quick brown', 'quick brown fox'
            (2, "totally unrelated training text here"),
            (3, "a b"),                              # too short for 3-grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs away")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in TX.benchmark_contamination(corpus, bench, "doc_id").collect()}
    assert got[1]["n_grams"] == 4
    assert got[1]["n_contaminated"] == 2  # 'the quick brown', 'quick brown fox'
    assert got[1]["overlap_ratio"] == pytest.approx(0.5)
    assert got[2]["n_contaminated"] == 0 and got[2]["overlap_ratio"] == 0.0
    assert got[3]["n_grams"] == 0 and got[3]["overlap_ratio"] is None


def test_audio_features_fake_pcm_math(spark, docs):
    # fake path: payload bytes as centered 8-bit PCM; verify the
    # feature math against a direct numpy computation
    import numpy as np

    media = M.documents_as_media(docs, "doc_id", "text")
    feats = {r["media_id"]: r for r in M.audio_features(media, decode_stub="fake").collect()}
    assert len(feats) == docs.count()
    text = "the quick brown fox jumps over the lazy dog"
    x = (np.frombuffer(text.encode(), dtype=np.uint8).astype(np.float64) - 128) / 128.0
    r = feats[1]
    assert r["n_samples"] == len(x)
    assert r["duration_s"] == pytest.approx(len(x) / 16000.0)
    assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))
    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    assert r["zero_crossing_rate"] == pytest.approx(zc)


def test_audio_features_ffmpeg_gated(spark, docs):
    media = M.documents_as_media(docs, "doc_id", "text")
    if not M.HAS_FFMPEG:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            M.audio_features(media, decode_stub="ffmpeg")
    else:  # pragma: no cover - env dependent
        M.audio_features(media, decode_stub="auto").collect()


def test_duplicated_ngram_fraction_signal(spark):
    from nt_data_pipelines_spark.operators.text import duplicated_ngram_fraction

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"          # 10 words -> 3 8-grams
    docs = spark.createDataFrame(
        [
            (1, base),                               # shares all grams with 2
            (2, base + " tail"),                     # superset of 1's grams
            (3, "a b c d e f g h unique tail here"), # no shared grams
            (4, "too short"),                        # < n words -> 0 grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_ngram_frac"])
        for r in duplicated_ngram_fraction(docs, n=8).collect()
    }
    assert got[1] == (3, 1.0)            # every gram of doc 1 re-occurs in doc 2
    n2, frac2 = got[2]
    assert n2 == 4 and frac2 == pytest.approx(3 / 4)  # 'tail' gram is unique
    assert got[3][1] == 0.0
    assert got[4] == (0, 0.0)


def test_quantize_embeddings_error_bound(spark):
    """Dequantization error is bounded by scale/2 per component; zero
    vectors quantize to zeros with scale 0."""
    from nt_data_pipelines_spark.operators.similarity import (
        dequantize_error,
        quantize_embeddings,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.125]),
        (2, [100.0, -50.0, 0.0, 1.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = quantize_embeddings(df, bits=8)
    got = {r["vec_id"]: r for r in q.collect()}
    assert got[3]["q_scale"] == 0.0 and got[3]["q_vec"] == [0, 0, 0, 0]
    assert max(abs(v) for v in got[2]["q_vec"]) == 127  # max component hits qmax
    errs = {r["vec_id"]: (r["q_scale"], r["max_abs_err"])
            for r in dequantize_error(df, q).collect()}
    for vid, (scale, err) in errs.items():
        assert err <= scale / 2 + 1e-12, (vid, scale, err)


def test_lsh_recall_harness(spark):
    """Planted clusters: few planes -> recall 1.0 on identical vectors;
    the harness reports None (not 100%) when no exact pairs exist."""
    import numpy as np
    from pyspark.sql import types as T

    from nt_data_pipelines_spark.operators.similarity import lsh_recall

    rng = np.random.default_rng(2)
    base = rng.normal(size=(10, 64)).round(3)
    rows = []
    for i in range(50):
        rows.append((i, [float(x) for x in base[i % 10]]))  # 10 clusters of clones
    emb = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    got = lsh_recall(emb, threshold=0.999, num_planes=4, sample_size=50)
    assert got["exact_pairs"] == 10 * (5 * 4 // 2)  # 10 clusters of 5 clones
    assert got["recall"] == 1.0  # identical vectors share every bucket
    # no qualifying pairs -> None, never a fake 100%
    lonely = emb.filter("vec_id < 10")  # one of each cluster
    got2 = lsh_recall(lonely, threshold=0.999, num_planes=4, sample_size=50)
    assert got2["exact_pairs"] == 0 and got2["recall"] is None


def test_banded_hyperplane_recall_amplification(spark):
    """OR-amplification: recall rises monotonically with band count and
    matches 1-(1-p^k)^L on the fixture (measured 0.13 -> 0.44 -> 0.88
    for L=1,4,16 at k=4, threshold 0.3)."""
    from nt_data_pipelines_spark.operators.similarity import (
        banded_lsh_recall,
        lsh_recall,
    )
    from nt_data_pipelines_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    single = lsh_recall(emb, threshold=0.3, num_planes=4, sample_size=200)
    banded = banded_lsh_recall(
        emb, threshold=0.3, planes_per_band=4, num_bands=8, sample_size=200
    )
    assert single["exact_pairs"] == banded["exact_pairs"] > 0
    assert banded["recall"] > single["recall"]
    # every LSH pair is exact-verified, so precision is 1 by construction
    assert banded["hits"] == banded["lsh_pairs"]


def test_knn_graph_hot_bucket_bounded(spark):
    """A hot bucket (near-identical boilerplate embeddings) must not go
    quadratic: candidates are O(bucket x cap) after salt-splitting, and
    every row still receives its k edges."""
    from pyspark.sql import types as T

    from nt_data_pipelines_spark.operators.similarity import (
        _knn_candidates,
        knn_graph,
    )

    n, cap = 1000, 64
    vec = [1.0] * 64
    emb = spark.createDataFrame(
        [(i, vec) for i in range(n)],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    n_cand = _knn_candidates(emb, bucket_cap=cap).count()
    assert n_cand < n * (n - 1) / 4          # nowhere near the n^2 self-join
    assert n_cand <= 4 * n * cap             # the O(bucket x cap) bound
    # the graph still delivers k edges per row (groups >> k)
    assert knn_graph(emb, k=3, bucket_cap=cap).count() == n * 3


def test_knn_graph_cap_no_op_below_threshold(spark):
    """Buckets at/below the cap keep their exact pair set: the capped
    graph equals the uncapped graph on a normal corpus."""
    from nt_data_pipelines_spark.operators.similarity import knn_graph
    from nt_data_pipelines_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    capped = set(map(tuple, knn_graph(emb, k=3, bucket_cap=1024).collect()))
    uncapped = set(map(tuple, knn_graph(emb, k=3, bucket_cap=None).collect()))
    assert capped == uncapped and capped


def test_verified_dup_edges_rejects_soft_collisions(spark):
    """The giant-component regression (round 7): unverified band
    collisions + transitive closure collapse a shared-vocabulary corpus
    into one dup group. Verified edges keep only true J >= threshold
    pairs, so moderately-overlapping docs never fuse."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " extra"),                       # true near-dup of 1
        # shares half its words with base — a soft-collision candidate
        (3, "alpha beta gamma delta epsilon one two three four five"),
        (4, "totally unrelated content with fresh vocabulary only"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    edges = D.minhash_verified_dup_edges(docs, "doc_id", threshold=0.7)
    got = {(r["id_a"], r["id_b"]) for r in edges.collect()}
    assert (1, 2) in got
    assert all(3 not in e and 4 not in e for e in got), got


def test_verified_dup_edges_hot_bucket_star(spark):
    """A bucket above bucket_cap connects via a verified hub-star:
    O(bucket) edges, full connectivity for a true dup cluster."""
    text = "one two three four five six seven eight nine ten"
    n = 12
    docs = spark.createDataFrame([(i, text) for i in range(n)], ["doc_id", "text"])
    edges = D.minhash_verified_dup_edges(docs, "doc_id", threshold=0.9, bucket_cap=4)
    got = {(r["id_a"], r["id_b"]) for r in edges.collect()}
    assert got == {(0, i) for i in range(1, n)}          # star from min-id hub
    groups = D.resolve_dup_groups_auto(edges.select("id_a", "id_b"))
    assert groups.select("canonical_id").distinct().count() == 1
    assert groups.count() == n


def test_verified_dup_edges_matches_clique_truth_on_testdata(spark):
    """On the sf0.001 documents table the verified edge set must connect
    exactly the same docs as exhaustive Jaccard pairs >= threshold do
    (component MEMBERSHIP can differ only for docs whose every true dup
    edge is LSH-missed; assert the survivor count stays within the LSH
    recall budget)."""
    from nt_data_pipelines_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    verified = D.minhash_verified_dup_edges(docs, "doc_id", threshold=0.7)
    truth = D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.7).select("id_a", "id_b")
    v = {(r["id_a"], r["id_b"]) for r in verified.select("id_a", "id_b").collect()}
    t = {(r["id_a"], r["id_b"]) for r in truth.collect()}
    assert v <= t                                  # verification: zero false edges
    # recall of DOCS REACHED (what dup-group resolution consumes)
    vd = {d for e in v for d in e}
    td = {d for e in t for d in e}
    assert len(vd) >= 0.95 * len(td), (len(vd), len(td))


def test_dedup_new_against_corpus(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different corpus content right here"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),   # dup of 1
            (11, "the quick brown fox jumps over a lazy dog"),     # near-dup of 1
            (12, "fresh unseen material with novel vocabulary"),   # keep
            (13, "fresh unseen material with novel vocabulary"),   # intra-batch dup of 12: kept BY DESIGN
        ],
        ["doc_id", "text"],
    )
    kept = D.dedup_new_against_corpus(new, corpus, "doc_id", threshold=0.7)
    assert {r["doc_id"] for r in kept.collect()} == {12, 13}


def test_containment_pairs_catch_doc_inside_doc(spark):
    inner = "alpha beta gamma delta epsilon"
    outer = inner + " " + "one two three four five six seven eight nine ten"
    rows = [
        (1, inner),
        (2, outer),                                  # contains doc 1 whole
        (3, "unrelated fresh vocabulary only here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # bands=8 (2 rows/band): high-containment SIZE-SKEWED pairs match
    # each MinHash component only with p = |A∩B|/|A∪B|, so candidate
    # recall needs shorter bands than the symmetric tier — exactly the
    # caveat the operator docstring carries
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.containment_pairs(docs, "doc_id", threshold=0.9, bands=8).collect()
    }
    # Jaccard(1,2) = 5/15 = 0.33 — symmetric near-dup misses it;
    # containment = 5/5 = 1.0
    assert got.get((1, 2)) == pytest.approx(1.0)
    assert all(3 not in k for k in got)


def test_minhash_jaccard_estimate_tracks_exact(spark):
    """Estimator contract: 1.0 on identical word sets, and within the
    k=16 binomial error band of the exact Jaccard on true near-dups
    (the md5 hashing is deterministic, so these bounds are exact facts
    about these texts, not flaky statistics)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "lazy dog the quick brown fox jumps over"),       # same word SET
        (3, "the quick brown fox jumps over a lazy dog"),     # J = 8/10
        (4, "completely different words entirely over here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in D.minhash_jaccard_estimate(docs, "doc_id").collect()
    }
    assert est[(1, 2)] == pytest.approx(1.0)
    assert est[(1, 3)] >= 0.5                 # true J = 0.8, k=16 band
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.0).collect()
    }
    for pair, e in est.items():
        if pair in exact:
            assert abs(e - exact[pair]) <= 0.35, (pair, e, exact[pair])


# ---- round-8: hot-bucket caps for the triage/containment tiers ----


def test_bounded_candidates_hub_selection(spark):
    """Unit contract of _bounded_band_candidates: small buckets emit all
    pairs; hot buckets emit a star to the FIRST member under hub_order
    (here: largest set_size, min-id ties) — the containment tier's
    superset-survivor hub."""
    rows = [
        # one bucket of 4 (hot at cap=3); doc 30 is the largest
        *[(i, "band_0", "h1", sz) for i, sz in [(10, 5), (20, 5), (30, 9), (40, 2)]],
        # one bucket of 2 (small): all pairs
        (50, "band_0", "h2", 3),
        (60, "band_0", "h2", 4),
    ]
    long = spark.createDataFrame(rows, ["doc_id", "band", "band_hash", "set_size"])
    got = {
        (r["id_a"], r["id_b"])
        for r in D._bounded_band_candidates(
            long, "doc_id", bucket_cap=3,
            hub_order=[F.col("set_size").desc(), F.col("doc_id")],
        ).collect()
    }
    assert got == {(10, 30), (20, 30), (30, 40), (50, 60)}
    # default hub (min id) on the same frame
    got_min = {
        (r["id_a"], r["id_b"])
        for r in D._bounded_band_candidates(long, "doc_id", bucket_cap=3).collect()
    }
    assert got_min == {(10, 20), (10, 30), (10, 40), (50, 60)}


def test_capped_equals_uncapped_on_normal_corpus(spark):
    """When no bucket exceeds the cap, the capped code path (window
    sizing + hub computation + small/star union) must reproduce the
    all-pairs form EXACTLY — for both newly-capped tiers. The cap is
    set to the corpus's real max bucket size, so every bucket takes
    the small-pairs branch."""
    from nt_data_pipelines_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    max_bucket = (
        D.banded_minhash(docs, "doc_id", "text")
        .groupBy("band", "band_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

    def rows(df):
        return {tuple(r) for r in df.collect()}

    capped = D.containment_pairs(docs, "doc_id", threshold=0.9, bucket_cap=max_bucket)
    uncapped = D.containment_pairs(docs, "doc_id", threshold=0.9, bucket_cap=10**9)
    assert rows(capped) == rows(uncapped)

    est_c = D.minhash_jaccard_estimate(docs, "doc_id", bucket_cap=max_bucket)
    est_u = D.minhash_jaccard_estimate(docs, "doc_id", bucket_cap=10**9)
    assert rows(est_c) == rows(est_u)


def test_hot_bucket_candidates_stay_linear(spark):
    """One-hot-bucket corpus (n identical texts): uncapped candidates
    are O(n^2); the capped tiers must emit O(n) rows — the star to the
    hub — and still verify them all (identical texts: containment and
    estimate are 1.0)."""
    n = 120
    text = "shared boilerplate words repeated across every single page"
    docs = spark.createDataFrame([(i, text) for i in range(n)], ["doc_id", "text"])

    cp = D.containment_pairs(docs, "doc_id", threshold=0.9, bucket_cap=16).collect()
    assert len(cp) == n - 1                      # star, not clique
    assert all(r["containment"] == pytest.approx(1.0) for r in cp)

    est = D.minhash_jaccard_estimate(docs, "doc_id", bucket_cap=16).collect()
    assert len(est) == n - 1
    assert all(r["est_jaccard"] == pytest.approx(1.0) for r in est)

    # uncapped really would be quadratic — the cap is doing the work
    unc = D.minhash_jaccard_estimate(docs, "doc_id", bucket_cap=10**9)
    assert unc.count() == n * (n - 1) // 2


# ---- round-8: persisted-state incremental corpus dedup ----


def test_dedup_against_corpus_from_persisted_state(spark, tmp_path):
    """The scale path: corpus bands/shingles precomputed once, persisted,
    and joined per batch — result identical to the derive-from-corpus
    path, and the plan reads the STATE parquet, never the corpus."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different corpus content right here"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumps over a lazy dog"),
            (12, "fresh unseen material with novel vocabulary"),
        ],
        ["doc_id", "text"],
    )
    bands_df, shingles_df = D.corpus_dedup_state(corpus, "doc_id", "text")
    bpath, spath = str(tmp_path / "state_bands"), str(tmp_path / "state_words")
    bands_df.write.parquet(bpath)
    shingles_df.write.parquet(spath)

    kept = D.dedup_new_against_corpus(
        new, None, "doc_id", threshold=0.7,
        corpus_bands=spark.read.parquet(bpath),
        corpus_shingles=spark.read.parquet(spath),
    )
    assert {r["doc_id"] for r in kept.collect()} == {12}
    baseline = D.dedup_new_against_corpus(new, corpus, "doc_id", threshold=0.7)
    assert {r["doc_id"] for r in baseline.collect()} == {12}

    # plan-shape: the corpus side comes from the state tables — the
    # plan's ONLY file scans are the two state parquet roots (the batch
    # is an in-memory LocalTableScan), so no corpus re-scan/re-tokenize
    # can hide anywhere in the lineage.
    scanned = set(kept.inputFiles())
    assert any("state_bands" in f for f in scanned)
    assert any("state_words" in f for f in scanned)
    assert all("state_bands" in f or "state_words" in f for f in scanned)


def test_streaming_state_feeds_batch_incremental_dedup(spark, tmp_path):
    """Tier tie-in: the streaming verified tier's signature and word-set
    state tables ARE valid corpus_bands/corpus_shingles for the batch
    incremental operator — maintain state with minhash_foreach_batch,
    then dedup a new batch against it without ever re-reading the
    corpus documents."""
    from pyspark.sql import types as T

    from nt_data_pipelines_spark.catalog import Catalog
    from nt_data_pipelines_spark.streaming import minhash_foreach_batch
    from nt_data_pipelines_spark.streaming.incremental import (
        DUP_PAIR_SCHEMA,
        MINHASH_STATE_SCHEMA,
        WORD_STATE_SCHEMA,
    )

    doc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different corpus content right here"),
    ]
    cat = Catalog(spark, str(tmp_path / "inc_lake"))
    cat.create("sigs", MINHASH_STATE_SCHEMA, None, ["doc_id", "band"])
    cat.create("pairs", DUP_PAIR_SCHEMA, None, ["id_a", "id_b"])
    cat.create("words", WORD_STATE_SCHEMA, None, ["doc_id", "word"])
    sink = minhash_foreach_batch(
        cat, "sigs", "pairs", words_table="words", verify_threshold=0.7
    )
    sink(spark.createDataFrame(corpus_rows, doc_schema), epoch_id=0)

    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (12, "fresh unseen material with novel vocabulary"),
        ],
        doc_schema,
    )
    kept = D.dedup_new_against_corpus(
        new, None, "doc_id", threshold=0.7,
        corpus_bands=cat.table("sigs"),
        corpus_shingles=cat.table("words"),
    )
    assert {r["doc_id"] for r in kept.collect()} == {12}


def test_default_bucket_cap_warns_once_explicit_is_quiet(spark, docs):
    """The bounded-recall hot-bucket cap must not apply silently: the
    module default warns; an explicit cap (int or None) is quiet."""
    import warnings as W

    import nt_data_pipelines_spark.operators.dedup as D

    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        D.minhash_jaccard_estimate(docs, "doc_id")
        assert any("bucket_cap defaults" in str(w.message) for w in rec)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        D.minhash_jaccard_estimate(
            docs, "doc_id", bucket_cap=D.DEFAULT_BUCKET_CAP
        )
        D.containment_pairs(docs, "doc_id", bucket_cap=None)
        assert not [w for w in rec if "bucket_cap" in str(w.message)]


def test_bucket_cap_none_is_uncapped_all_pairs(spark, docs):
    """bucket_cap=None must reproduce the plain all-pairs bucket
    self-join (the pre-cap semantics, as an explicit opt-out)."""
    import nt_data_pipelines_spark.operators.dedup as D

    unc = D.minhash_jaccard_estimate(docs, "doc_id", bucket_cap=None)
    big = D.minhash_jaccard_estimate(docs, "doc_id", bucket_cap=10**9)
    assert sorted(map(tuple, unc.collect())) == sorted(map(tuple, big.collect()))


def test_bloom_contamination_equals_exact(spark, docs):
    """The Bloom-prefiltered check must be gram-exact: Bloom has no
    false negatives and the verify join discards false positives, so
    the result equals benchmark_contamination row for row."""
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    exact = sorted(
        map(tuple, TX.benchmark_contamination(corpus, bench, "doc_id", n=2).collect())
    )
    bloom = sorted(
        map(tuple, TX.bloom_contamination(corpus, bench, "doc_id", n=2).collect())
    )
    assert bloom == exact
    # a deliberately tiny, saturated filter still verifies exactly —
    # false positives only cost work, never correctness — and the
    # saturation is LOUD (sub-4-bits/gram warning)
    import warnings as W

    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        tiny = sorted(
            map(
                tuple,
                TX.bloom_contamination(
                    corpus, bench, "doc_id", n=2, num_bits=8, num_hashes=2
                ).collect(),
            )
        )
    assert tiny == exact
    assert any("saturates" in str(w.message) for w in rec)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        TX.bloom_contamination(corpus, bench, "doc_id", n=2).collect()
    assert not [w for w in rec if "saturates" in str(w.message)]


def test_bloom_bitset_prefilter_rates(spark):
    """Membership: every inserted gram probes true (no false
    negatives, the property exactness rests on); novel grams probe
    true at a bounded false-positive rate given 16 bits/gram."""
    inserted = [(f"gram number {i}",) for i in range(500)]
    novel = [(f"unseen token {i}",) for i in range(2000)]
    ins = spark.createDataFrame(inserted, "gram string")
    nov = spark.createDataFrame(novel, "gram string")
    num_bits, num_hashes = 16 * 500, 4
    bits = TX.bloom_bitset(ins, "gram", num_bits, num_hashes)
    probe = TX.bloom_might_contain(bits, F.col("gram"), num_bits, num_hashes)
    assert ins.filter(probe).count() == 500  # zero false negatives
    fp = nov.filter(probe).count()
    assert fp / 2000 < 0.02, f"false-positive rate {fp / 2000} (expected ~0.002)"


def test_bloom_contamination_empty_benchmark(spark, docs):
    out = TX.bloom_contamination(docs, docs.limit(0), "doc_id", n=2)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r["n_contaminated"] == 0 for r in rows)


def test_zipf_slope_shapes(spark):
    """A geometric (Zipfian s=1) frequency profile fits slope ~-1; a
    uniform profile fits slope 0. Golden slope via numpy lstsq."""
    import numpy as np

    # source zipf: word w_r appears floor(120/r) times, r = 1..8
    zipf_words = []
    counts = [120 // r for r in range(1, 9)]
    for r, c in enumerate(counts, start=1):
        zipf_words += [f"w{r:02d}"] * c
    # source flat: 8 words, 15 occurrences each
    flat_words = [f"u{r}" for r in range(8) for _ in range(15)]
    df = spark.createDataFrame(
        [(1, " ".join(zipf_words), "zipf"), (2, " ".join(flat_words), "flat")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in TX.zipf_slope(df, k=8).collect()}
    assert got["zipf"]["n_terms"] == 8 and got["flat"]["n_terms"] == 8
    assert got["flat"]["zipf_slope"] == pytest.approx(0.0, abs=1e-9)
    x = np.log(np.arange(1, 9, dtype=float))
    y = np.log(np.array(sorted(counts, reverse=True), dtype=float))
    a = np.vstack([x, np.ones_like(x)]).T
    want = float(np.linalg.lstsq(a, y, rcond=None)[0][0])
    assert got["zipf"]["zipf_slope"] == pytest.approx(round(want, 6), abs=2e-6)
    assert got["zipf"]["zipf_slope"] < -0.8


def test_fuzzy_string_pairs_crafted(spark):
    """Trigram-Jaccard linkage on crafted strings: near-identical
    names match, unrelated ones never meet (no shared gram), and the
    Jaccard value is the exact set ratio."""
    from nt_data_pipelines_spark.operators.linkage import fuzzy_string_pairs

    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgets"),   # superstring: grams(1) subset of grams(2)
            (3, "blue bolt"),
            (4, "xy"),            # shorter than a trigram: whole-string gram
            (5, "xy"),            # exact short dup -> jaccard 1.0
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["name_jaccard"]
        for r in fuzzy_string_pairs(df, "id", "name", threshold=0.4).collect()
    }
    # "red widget" has 8 grams, all shared with "red widgets" (9 grams)
    assert got[(1, 2)] == pytest.approx(round(8 / 9, 6))
    assert got[(4, 5)] == 1.0
    assert not any(3 in k for k in got), "blue bolt shares no trigram"
    # threshold gates: at 0.95 only the exact short dup survives
    high = fuzzy_string_pairs(df, "id", "name", threshold=0.95)
    assert {(r["id_a"], r["id_b"]) for r in high.collect()} == {(4, 5)}


def test_fuzzy_string_pairs_stop_gram_cap(spark):
    """max_gram_df bounds candidate generation without changing any
    reported Jaccard: when no gram exceeds the cap the result equals
    the exact form; a pair sharing ONLY hot grams is knowingly missed
    (the documented recall trade)."""
    from nt_data_pipelines_spark.operators.linkage import fuzzy_string_pairs

    df = spark.createDataFrame(
        [(i, f"shared prefix item {i:03d}") for i in range(6)]
        + [(10, "zq variant one"), (11, "zq variant two")],
        "id long, name string",
    )
    exact = sorted(map(tuple, fuzzy_string_pairs(df, "id", "name", 0.4).collect()))
    capped_loose = sorted(
        map(tuple, fuzzy_string_pairs(df, "id", "name", 0.4, max_gram_df=100).collect())
    )
    assert capped_loose == exact  # cap above every df: identical
    # cap=1 stop-lists every shared gram -> zero candidates, but any
    # pair that DOES surface would carry its exact Jaccard
    none_left = fuzzy_string_pairs(df, "id", "name", 0.4, max_gram_df=1).collect()
    assert none_left == []
    # intermediate cap: the 6-way "shared prefix item 0" grams (df=6)
    # are stop-listed; the 2-way "zq variant" grams (df=2) survive, so
    # the variant pair keeps its EXACT value from the uncapped run
    capped = {
        (r["id_a"], r["id_b"]): r["name_jaccard"]
        for r in fuzzy_string_pairs(df, "id", "name", 0.4, max_gram_df=2).collect()
    }
    exact_map = {(a, b): j for a, b, j in exact}
    assert (10, 11) in capped and capped[(10, 11)] == exact_map[(10, 11)]
    assert all(k[0] >= 10 for k in capped), "hot-prefix pairs are knowingly missed"


def test_fuzzy_string_pairs_default_cap_warns(spark):
    """The hot-gram cap is DEFAULT-ON with a one-time warning (the
    dedup tier's _resolve_bucket_cap convention, judged weak in r9 as
    opt-in); explicit int or None opts in quietly."""
    import warnings

    from nt_data_pipelines_spark.operators import linkage

    df = spark.createDataFrame([(1, "abcdef"), (2, "abcdeg")], "id long, name string")
    with warnings.catch_warnings(record=True) as got:
        warnings.simplefilter("always")
        linkage.fuzzy_string_pairs(df, "id", "name", 0.4)
    assert any("max_gram_df defaults to" in str(w.message) for w in got)
    with warnings.catch_warnings(record=True) as got:
        warnings.simplefilter("always")
        linkage.fuzzy_string_pairs(df, "id", "name", 0.4, max_gram_df=None)
        linkage.fuzzy_string_pairs(
            df, "id", "name", 0.4, max_gram_df=linkage.DEFAULT_GRAM_DF
        )
    assert not got, "explicit cap (int or None) must stay quiet"


def test_fuzzy_string_pairs_cap_bounds_candidate_count(spark):
    """A hot gram's O(df^2) candidate blow-up is bounded by the cap:
    with threshold 0 every candidate surfaces as an output pair, so
    the row count IS the candidate count — pinned capped vs uncapped."""
    from nt_data_pipelines_spark.operators.linkage import fuzzy_string_pairs

    # 8 strings share exactly one hot trigram 'AAA' (df=8, suffixes
    # pairwise gram-disjoint); one pair shares three rare grams (df=2)
    hot = [(i, "AAA" + s) for i, s in enumerate(
        ["bcd", "efg", "hij", "klm", "nop", "qrs", "tuv", "wxy"]
    )]
    df = spark.createDataFrame(
        hot + [(10, "zzqrt"), (11, "zzqru")], "id long, name string"
    )
    uncapped = fuzzy_string_pairs(df, "id", "name", 0.0, max_gram_df=None).collect()
    assert len(uncapped) == 8 * 7 // 2 + 1  # hot-gram quadratic + the rare pair
    capped = fuzzy_string_pairs(df, "id", "name", 0.0, max_gram_df=2).collect()
    assert len(capped) == 1  # the hot gram's 28 candidates are gone
    (pair,) = capped
    # zzqrt/zzqru: grams {zzq,zqr,qrt|qru,rt?|ru?} -> 3 shared of 3+3
    # per-string minus... exact set Jaccard preserved under the cap
    want = [r for r in uncapped if r["id_a"] == 10 and r["id_b"] == 11]
    assert (pair["id_a"], pair["id_b"], pair["name_jaccard"]) == (
        10, 11, want[0]["name_jaccard"],
    )
