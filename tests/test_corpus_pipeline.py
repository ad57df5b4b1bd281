"""Composed curation pipeline: stage accounting and end state."""

from __future__ import annotations

from nt_data_pipelines_spark.pipelines.corpus import CurationConfig, curate_corpus
from nt_data_pipelines_spark.sources.testdata import load_table


def test_curate_corpus_end_to_end(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    packed, accounting = curate_corpus(
        docs,
        config=CurationConfig(min_words=5, max_dup_ngram_frac=0.95),
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    # monotone survivor counts through the dedup/filter chain
    assert acct["input"] >= acct["exact_dedup"] >= acct["near_dedup"]
    assert acct["near_dedup"] >= acct["span_dedup"] >= acct["quality_lang_gate"]
    assert acct["quality_lang_gate"] > 0  # the pipeline keeps real data
    # this corpus plants NEAR-dups (all content hashes are distinct),
    # so the reduction happens at the LSH tier
    assert acct["near_dedup"] < acct["exact_dedup"]

    rows = packed.collect()
    assert rows and all(r["bin_id"] >= 0 for r in rows)
    # packing is deterministic: a second run bins identically
    packed2, _ = curate_corpus(
        docs, config=CurationConfig(min_words=5, max_dup_ngram_frac=0.95)
    )
    a = {(r["chunk_uid"], r["bin_id"]) for r in rows}
    b = {(r["chunk_uid"], r["bin_id"]) for r in packed2.collect()}
    assert a == b


def test_curate_corpus_with_source_mixing(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # survivors here are single docs per source (~30-80 tokens each),
    # so a 10-token budget forces sub-1.0 keep rates everywhere while
    # still keeping some docs (measured 3/7 under the 32-bit buckets)
    _, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=0.95, token_budget_per_source=10
        ),
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert "source_mix" in acct
    assert 0 < acct["source_mix"] < acct["quality_lang_gate"]  # budget bites


def test_curate_corpus_materializes_shards(spark, tmp_path):
    """output_path materializes the packed corpus: one parquet file per
    shard, bins contiguous and ordered inside each file."""
    import glob
    import os

    import pyarrow.parquet as pq

    from nt_data_pipelines_spark.pipelines.corpus import CurationConfig, curate_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out_dir = str(tmp_path / "corpus_out")
    cfg = CurationConfig(
        min_words=5, max_dup_ngram_frac=0.95, output_path=out_dir
    )
    packed, acct = curate_corpus(docs, config=cfg)
    assert packed.count() > 0  # the gate keeps real data

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    dirs = {os.path.dirname(f) for f in files}
    assert files and len(files) == len(dirs)  # one file per shard
    back = spark.read.parquet(out_dir)
    assert back.count() == packed.count()
    assert {"chunk_uid", "n_tokens", "bin_id", "chunk_text"} <= set(back.columns)
    for f in files[:3]:
        bins = pq.read_table(f, columns=["bin_id"])["bin_id"].to_pylist()
        assert bins == sorted(bins)  # bins contiguous within the file


def test_curate_corpus_with_perplexity_band(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    _, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=0.95, perplexity_band=(0.1, 0.9)
        ),
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert "perplexity_band" in acct
    # the band drops both tails of the surprisal distribution
    assert 0 < acct["perplexity_band"] < acct["quality_lang_gate"]


def test_curate_corpus_semantic_dedup_stage(spark):
    """Paraphrase tier: docs with near-identical embeddings collapse to
    the min-id canonical even when their TEXT shares nothing."""
    import pytest
    from pyspark.sql import types as T

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta " * 3, "en", "web", 10),
            (1, "one two three four five six seven eight nine ten " * 3, "en", "web", 10),
            (2, "uno dos tres cuatro cinco seis siete ocho nueve " * 3, "en", "web", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base = [float(i % 7 - 3) for i in range(64)]
    other = [float((i * 3) % 11 - 5) for i in range(64)]
    emb = spark.createDataFrame(
        [(0, base), (1, base), (2, other)],  # 0 and 1 are paraphrases
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    _, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=3, max_dup_ngram_frac=1.0, keep_langs=("en", "und"),
            semantic_threshold=0.95,
        ),
        embeddings=emb,
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert acct["near_dedup"] == 3
    assert acct["semantic_dedup"] == 2  # doc 1 collapsed into doc 0
    with pytest.raises(ValueError, match="no embeddings"):
        curate_corpus(docs, config=CurationConfig(semantic_threshold=0.9))


def test_curate_corpus_with_source_cap(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    _, accounting = curate_corpus(
        docs,
        config=CurationConfig(min_words=5, max_dup_ngram_frac=0.95,
                              max_docs_per_source=1),
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert "source_cap" in acct
    assert 0 < acct["source_cap"] <= acct["quality_lang_gate"]


def test_containment_stage_drops_contained_doc(spark):
    from nt_data_pipelines_spark.pipelines.corpus import (
        CurationConfig,
        curate_corpus,
    )

    inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    outer = inner + " plus surrounding commentary wrapping the quoted paragraph body text"
    rows = [
        (1, outer),
        (2, inner),                                           # contained in 1
        (3, "the completely different document with its own fresh words here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed, acct = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=1.0, containment_threshold=0.9
        ),
    )
    counts = {r["stage"]: r["docs"] for r in acct.collect()}
    assert counts["near_dedup"] == 3          # J(1,2) ~ 0.6: not a near-dup
    assert counts["containment_dedup"] == 2   # doc 2 dropped, superset kept
    # survivor IDENTITY, end to end: chunk_uid = "{doc_id}#{start}", so
    # the packed corpus names its source docs — the SUPERSET (1) made
    # it through, the quote-page (2) did not
    packed_docs = {int(r["chunk_uid"].split("#")[0]) for r in packed.collect()}
    assert 1 in packed_docs and 2 not in packed_docs


def test_curate_corpus_quality_model_gate(spark):
    from nt_data_pipelines_spark.pipelines.corpus import (
        CurationConfig,
        curate_corpus,
    )

    rows = [
        (1, "the quick brown fox jumps over a lazy dog and it runs to town"),
        # passes language-ID (the/a are English) but drowns in digits
        (2, "the 0 1 2 3 4 5 6 7 8 9 10 11 12 13 a 15 16 17 18"),
        (3, "a calm story of the sea and it told of ships in the bay"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed, acct = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5,
            min_alpha_ratio=0.0,          # let the MODEL gate decide
            max_dup_ngram_frac=1.0,
            quality_model_threshold=0.5,
        ),
    )
    counts = {r["stage"]: r["docs"] for r in acct.collect()}
    assert counts["quality_lang_gate"] == 3   # rule gate passes all three
    assert counts["quality_model_gate"] == 2  # the classifier drops the digits
    packed_docs = {int(r["chunk_uid"].split("#")[0]) for r in packed.collect()}
    assert packed_docs == {1, 3}


def test_curate_corpus_span_rewrite_stage(spark):
    from nt_data_pipelines_spark.pipelines.corpus import (
        CurationConfig,
        curate_corpus,
    )

    boiler = "all the rights of this page are reserved to the site"
    rows = [
        (1, f"a fresh story about the sea and it sailed far {boiler}"),
        (2, f"{boiler} a different tale of the hills and it climbed high"),
        (3, "an unrelated piece of writing that is all its own here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed, acct = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=1.0, remove_dup_spans_n=8
        ),
    )
    counts = {r["stage"]: r["docs"] for r in acct.collect()}
    assert counts["span_rewrite"] == 3      # rewrite keeps rows
    assert counts["quality_lang_gate"] == 3
    # the boilerplate sentence is gone from the packed text: rebuild
    # chunk text through the same normalize+chunk path and check words
    from pyspark.sql import functions as F

    packed_docs = {int(r["chunk_uid"].split("#")[0]) for r in packed.collect()}
    assert packed_docs == {1, 2, 3}
    # the rewrite reached the pipeline: without it, the same config
    # packs MORE chunk tokens (the boilerplate words survive)
    packed_off, _ = curate_corpus(
        docs, config=CurationConfig(min_words=5, max_dup_ngram_frac=1.0)
    )
    tokens_on = packed.agg(F.sum("n_tokens")).first()[0]
    tokens_off = packed_off.agg(F.sum("n_tokens")).first()[0]
    assert tokens_on < tokens_off


def test_curate_corpus_centroid_outlier_stage(spark):
    """centroid_floor drops embedding outliers: the synthetic corpus's
    centroid cosines span roughly [-0.22, 0.53] (median ~0.19), so a
    0.1 floor bites without emptying the stage; the row lands in the
    accounting and the count is monotone."""
    import pytest
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    _, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=0.95, centroid_floor=0.1
        ),
        embeddings=emb,
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert "centroid_outlier" in acct
    assert 0 < acct["centroid_outlier"] <= acct["near_dedup"]
    # floor=-1 keeps everything that has an embedding (cosine >= -1)
    _, acct_all = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=0.95, centroid_floor=-1.0
        ),
        embeddings=emb,
    )
    acct2 = {r["stage"]: r["docs"] for r in acct_all.collect()}
    assert acct2["centroid_outlier"] >= acct["centroid_outlier"]
    with pytest.raises(ValueError, match="embeddings"):
        curate_corpus(
            docs, config=CurationConfig(centroid_floor=0.5), embeddings=None
        )


def test_curate_corpus_chunk_rewrite_stage(spark):
    """cdc_dedup_mod rewrites repeated chunks out of later docs: the
    stage row lands in the accounting, survivors' total words shrink,
    and the row count is unchanged (a rewrite, not a filter)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    _, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=5, max_dup_ngram_frac=0.95, cdc_dedup_mod=8
        ),
    )
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert "chunk_rewrite" in acct
    assert acct["chunk_rewrite"] == acct["near_dedup"]  # rewrite keeps rows
    assert acct["span_dedup"] > 0


def test_centroid_stage_keeps_docs_without_embeddings(spark):
    """Regression (review, r9): the centroid_outlier stage must drop
    only docs whose score EXISTS and falls below the floor — a doc
    with no embedding row has no evidence of being off-topic and must
    survive (the semantic_dedup stage tolerates missing embeddings the
    same way; the old left_semi on keepers silently dropped it)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy with the warm day", "web"),
            (2, "a dog ran in the park and then it went back to the house", "web"),
            (3, "this bird flew over the lake and it saw all the little fish", "web"),
            (4, "we walked to the store and bought some bread for the morning", "web"),
        ],
        doc_schema,
    )  # doc 4 has no embedding row
    emb_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [-1.0, 0.0]),  # outlier: negative cosine to centroid
        ],
        emb_schema,
    )
    packed, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=1, max_dup_ngram_frac=1.0, near_dup_jaccard=None,
            centroid_floor=0.0,
        ),
        embeddings=emb,
    )
    # the packed corpus is chunk-level; chunk_uid is "doc_id#chunk_start"
    kept = {
        r["d"]
        for r in packed.select(
            F.split("chunk_uid", "#")[0].cast("long").alias("d")
        ).collect()
    }
    assert 3 not in kept, "scored outlier must be dropped"
    assert 4 in kept, "doc with no embedding row must survive the stage"
    assert {1, 2} <= kept
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert acct["centroid_outlier"] == 3


def test_curate_corpus_decontaminate_stage(spark):
    """The decontamination stage drops docs whose n-gram overlap with
    the benchmark exceeds the threshold; clean docs and gram-less docs
    survive; the stage requires a benchmark frame."""
    import pytest
    from pyspark.sql import functions as F

    leak = "the model answers the held out question about the blue whale"
    docs = spark.createDataFrame(
        [
            (1, leak + " plus some training context around it", "web"),
            (2, "a perfectly ordinary document about the weather today", "web"),
            (3, "another clean document that talks about cooking dinner", "web"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    packed, accounting = curate_corpus(
        docs,
        config=CurationConfig(
            min_words=1, max_dup_ngram_frac=1.0, near_dup_jaccard=None,
            decontaminate_overlap=0.3,
        ),
        benchmark=bench,
    )
    kept = {
        r["d"]
        for r in packed.select(
            F.split("chunk_uid", "#")[0].cast("long").alias("d")
        ).collect()
    }
    assert 1 not in kept, "leaked doc must be dropped"
    assert {2, 3} <= kept
    acct = {r["stage"]: r["docs"] for r in accounting.collect()}
    assert acct["decontaminate"] == 2
    with pytest.raises(ValueError, match="benchmark"):
        curate_corpus(docs, config=CurationConfig(decontaminate_overlap=0.5))
