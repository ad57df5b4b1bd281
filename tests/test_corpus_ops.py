"""Unit tests for batch-5 training-pipeline operators: boilerplate
line removal, temperature mixing, split assignment, corpus stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.text import (
    assign_splits,
    corpus_stats,
    remove_boilerplate_lines,
    temperature_mix_weights,
)


def test_remove_boilerplate_lines(spark):
    footer = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha content\n{footer}\nmore alpha"),
            (2, f"unique beta content\n{footer}"),
            (3, f"unique gamma content\n{footer}"),
            (4, "plain doc with no footer"),
            (5, footer),  # pure boilerplate -> drops out entirely
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(docs, "doc_id", max_doc_frac=0.5).collect()
    }
    assert out[1] == "unique alpha content\nmore alpha"  # order preserved
    assert out[2] == "unique beta content"
    assert out[4] == "plain doc with no footer"
    assert 5 not in out  # nothing left
    # below the df threshold nothing is removed
    keep_all = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(docs, "doc_id", max_doc_frac=0.95).collect()
    }
    assert keep_all[2] == f"unique beta content\n{footer}"


def test_remove_boilerplate_min_docs_guard(spark):
    # two docs sharing a line: df=0.5 of a 4-doc corpus but min_docs=3
    # spares it
    docs = spark.createDataFrame(
        [(1, "shared line\na"), (2, "shared line\nb"), (3, "c"), (4, "d")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            docs, "doc_id", max_doc_frac=0.25, min_docs=3
        ).collect()
    }
    assert out[1] == "shared line\na"


def test_temperature_mix_weights(spark):
    docs = spark.createDataFrame(
        [("a", "w " * 900), ("b", "w " * 100)], ["source", "text"]
    ).select("source", F.trim("text").alias("text"))
    w = {r["source"]: r["weight"] for r in
         temperature_mix_weights(docs, alpha=0.5).collect()}
    # sqrt(900):sqrt(100) = 3:1
    assert w["a"] == pytest.approx(0.75, abs=1e-6)
    assert w["b"] == pytest.approx(0.25, abs=1e-6)
    # alpha=1 reproduces natural token shares
    w1 = {r["source"]: r["weight"] for r in
          temperature_mix_weights(docs, alpha=1.0).collect()}
    assert w1["a"] == pytest.approx(0.9, abs=1e-6)
    # alpha=0 is uniform
    w0 = {r["source"]: r["weight"] for r in
          temperature_mix_weights(docs, alpha=0.0).collect()}
    assert w0["a"] == pytest.approx(0.5, abs=1e-6)


def test_assign_splits_deterministic_and_complete(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id int")
    out = assign_splits(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1600  # ~90%
    # same ids -> same split on a re-run over a different partitioning
    again = assign_splits(
        docs.repartition(7), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, "doc_id", {"train": 0.5})


def test_corpus_stats(spark):
    docs = spark.createDataFrame(
        [
            ("web", "en", "one two three"),
            ("web", "en", "word " * 60),
            ("book", "fr", "court"),
        ],
        ["source", "lang", "text"],
    ).select("source", "lang", F.trim("text").alias("text"))
    out = {(r["source"], r["lang"]): r.asDict() for r in
           corpus_stats(docs, ["source", "lang"]).collect()}
    web = out[("web", "en")]
    assert web["n_docs"] == 2 and web["n_tokens"] == 63
    assert web["mean_tokens"] == pytest.approx(31.5)
    assert web["short_doc_frac"] == pytest.approx(0.5)  # one of two is short
    assert out[("book", "fr")]["short_doc_frac"] == 1.0


def test_dedup_paragraphs_keep_first(spark):
    from nt_data_pipelines_spark.operators.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "shared quote\nalpha body"),
            (2, "beta body\nshared quote"),     # later repeat removed
            (3, "shared quote"),                 # fully duplicate -> drops out
            (4, "gamma\ngamma"),                 # in-doc repeat keeps first only
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["clean_text"] for r in dedup_paragraphs(docs, "doc_id").collect()}
    assert out[1] == "shared quote\nalpha body"  # first occurrence kept in place
    assert out[2] == "beta body"
    assert 3 not in out
    assert out[4] == "gamma"


def test_boilerplate_and_paragraph_dedup_idempotent(spark):
    """Applying either cleaner to its own output changes nothing —
    the fixpoint property a re-run pipeline relies on."""
    from nt_data_pipelines_spark.operators.text import (
        dedup_paragraphs,
        remove_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [
            (1, "footer\nalpha one"),
            (2, "footer\nbeta two"),
            (3, "footer\ngamma three"),
            (4, "delta\nfooter"),
            (5, "epsilon only"),
        ],
        "doc_id int, text string",
    )
    once = remove_boilerplate_lines(docs, "doc_id", max_doc_frac=0.5)
    twice = remove_boilerplate_lines(
        once.select("doc_id", F.col("clean_text").alias("text")), "doc_id",
        max_doc_frac=0.5,
    )
    a = {(r["doc_id"], r["clean_text"]) for r in once.collect()}
    b = {(r["doc_id"], r["clean_text"]) for r in twice.collect()}
    assert a == b

    once_p = dedup_paragraphs(docs, "doc_id")
    twice_p = dedup_paragraphs(
        once_p.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )
    assert {tuple(r) for r in once_p.collect()} == {tuple(r) for r in twice_p.collect()}


def test_pseudonymize_consistent_and_null_safe(spark):
    import pytest
    from nt_data_pipelines_spark.operators.text import pseudonymize

    df = spark.createDataFrame(
        [(1, "u1"), (2, "u2"), (3, "u1"), (4, None)], "event_id long, user string"
    )
    got = pseudonymize(df, "user", salt="s3cret").collect()
    toks = {r["event_id"]: r["user"] for r in got}
    assert toks[1] == toks[3] and toks[1] != toks[2]  # consistent, distinct
    assert toks[4] is None
    assert len(toks[1]) == 16 and toks[1] != "u1"
    # same salt elsewhere -> same token (cross-table joinability)
    other = spark.createDataFrame([("u1",)], "user string")
    tok2 = pseudonymize(other, "user", salt="s3cret").first()["user"]
    assert tok2 == toks[1]
    # different salt -> different universe
    tok3 = pseudonymize(other, "user", salt="other").first()["user"]
    assert tok3 != toks[1]
    with pytest.raises(ValueError, match="salt"):
        pseudonymize(df, "user", salt="")
    with pytest.raises(ValueError, match="length"):
        pseudonymize(df, "user", salt="x", length=4)


def test_cap_per_group_deterministic_and_bounded(spark):
    import pytest
    from nt_data_pipelines_spark.operators.text import cap_per_group

    rows = [(i, "big" if i < 95 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    capped = cap_per_group(df, "source", "doc_id", max_rows=10)
    counts = {r["source"]: r["n"] for r in
              capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 10, "small": 5}  # under-cap groups pass whole
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in
               cap_per_group(df.repartition(7), "source", "doc_id", 10).collect())
    assert a == b
    with pytest.raises(ValueError):
        cap_per_group(df, "source", "doc_id", 0)


def test_gopher_rules_signals_and_keep(spark):
    from nt_data_pipelines_spark.operators.text import gopher_rules

    good = "the quick brown fox jumps over a lazy dog and it runs to town"
    rows = [
        (1, good),                                   # passes every rule
        (2, "short of the a"),                       # too few words
        (3, "- the bullet\n- a bullet\n- of course"),  # all bullet lines
        (4, "the story trails of...\nand a second...\nthird line too..."),
        (5, "### the ### a ### of ### markup ### heavy ### doc ### here "
            "### pads ### words ### to ### length ### with ### symbols"),
        (6, "120 123 456 789 000 111 222 333 444 555 666 777 888 999 "
            "101 202 303 404 505 606"),               # digits: no stopwords/alpha
    ]
    got = {
        r["doc_id"]: r
        for r in gopher_rules(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            min_words=10, max_words=100,
        ).collect()
    }
    assert got[1]["keep"] == 1
    assert got[2]["keep"] == 0 and got[2]["n_words"] == 4
    assert got[3]["keep"] == 0 and got[3]["bullet_line_frac"] == 1.0
    assert got[4]["keep"] == 0 and got[4]["ellipsis_line_frac"] == 1.0
    assert got[5]["keep"] == 0 and got[5]["symbol_word_ratio"] > 0.1
    assert got[6]["keep"] == 0
    assert got[6]["alpha_word_frac"] == 0.0 and got[6]["stop_hits"] == 0
    # signal sanity on the good doc
    assert got[1]["stop_hits"] >= 4
    assert 3.0 <= got[1]["mean_word_len"] <= 10.0


def test_reciprocal_rank_fusion_math(spark):
    from nt_data_pipelines_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    lexical = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"])
    semantic = spark.createDataFrame([(11, 1), (10, 2), (99, 3)], ["doc_id", "rank"])
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in reciprocal_rank_fusion([lexical, semantic], k=60).collect()
    }
    assert got[10] == pytest.approx(round(1 / 61 + 1 / 62, 6))
    assert got[11] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert got[12] == pytest.approx(round(1 / 63, 6))   # single-list docs still score
    assert got[99] == pytest.approx(round(1 / 63, 6))
    # symmetric ranks fuse to the same score; ordering falls to doc_id
    order = [
        r["doc_id"]
        for r in reciprocal_rank_fusion([lexical, semantic], k=60).collect()
    ]
    assert order == [10, 11, 12, 99]


def test_reciprocal_rank_fusion_dedupes_within_a_list(spark):
    """A doc appearing twice in ONE ranking frame (un-deduped candidate
    list) must contribute its best rank once — not sum both rows."""
    from nt_data_pipelines_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    dup_list = spark.createDataFrame(
        [(10, 1), (10, 3), (11, 2)], ["doc_id", "rank"]
    )
    other = spark.createDataFrame([(10, 2)], ["doc_id", "rank"])
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in reciprocal_rank_fusion([dup_list, other], k=60).collect()
    }
    assert got[10] == pytest.approx(round(1 / 61 + 1 / 62, 6))  # not + 1/63
    assert got[11] == pytest.approx(round(1 / 62, 6))


def test_quality_logit_score_orders_quality(spark):
    from nt_data_pipelines_spark.operators.text import quality_logit_score

    rows = [
        (1, "the quick brown fox jumps over a lazy dog and it runs to town"),
        (2, "0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"),   # all digits
    ]
    got = {
        r["doc_id"]: r
        for r in quality_logit_score(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert 0.0 < got[2]["quality_score"] < got[1]["quality_score"] < 1.0
    assert got[1]["keep"] == 1 and got[2]["keep"] == 0
    # deterministic: same input, same score
    again = quality_logit_score(
        spark.createDataFrame(rows, ["doc_id", "text"])
    ).collect()
    assert {r["doc_id"]: r["quality_score"] for r in again} == {
        k: v["quality_score"] for k, v in got.items()
    }


def test_remove_duplicate_spans(spark):
    from nt_data_pipelines_spark.operators.text import remove_duplicate_spans

    span = "one two three four"  # repeated 4-gram across docs 1 and 2
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"{span} epsilon zeta eta theta"),
        (3, "totally unrelated words live here quietly"),
        (4, span),                                  # nothing survives
        (5, "tiny doc"),                            # shorter than n
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed_words"])
        for r in remove_duplicate_spans(docs, n=4).collect()
    }
    # BOTH occurrences lose the span (Lee et al. semantics); order kept
    assert out[1] == ("alpha beta gamma delta", 4)
    assert out[2] == ("epsilon zeta eta theta", 4)
    assert out[3] == ("totally unrelated words live here quietly", 0)
    assert out[4] == ("", 4)      # row kept, text emptied
    assert out[5] == ("tiny doc", 0)

    # spans LONGER than n are fully covered by their repeated n-grams
    long_span = "a1 a2 a3 a4 a5 a6"
    rows2 = [
        (1, f"x {long_span} y"),
        (2, f"p q {long_span} r"),
    ]
    out2 = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows2, ["doc_id", "text"]), n=4
        ).collect()
    }
    assert out2[1] == "x y" and out2[2] == "p q r"

    # intra-document repetition also counts toward min_count
    rep = "m1 m2 m3 m4"
    out3 = remove_duplicate_spans(
        spark.createDataFrame([(1, f"{rep} mid {rep}")], ["doc_id", "text"]),
        n=4,
    ).first()
    assert out3["clean_text"] == "mid" and out3["n_removed_words"] == 8

    import pytest
    with pytest.raises(ValueError, match="n must be"):
        remove_duplicate_spans(docs, n=1)


def test_cdc_chunks_edit_locality(spark):
    """The CDC property: an insertion near the front changes only the
    chunk containing the edit — chunk hashes AFTER the next boundary
    are identical, unlike fixed-width windows where every downstream
    chunk shifts."""
    from nt_data_pipelines_spark.operators.text import cdc_chunks

    base = ("w%02d " % 0) + " ".join(f"w{i:02d}" for i in range(1, 60))
    edited = "INSERTED " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    )
    out = cdc_chunks(docs, "doc_id", "text", boundary_mod=4).collect()
    h1 = {r["chunk_hash"] for r in out if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in out if r["doc_id"] == 2}
    shared = h1 & h2
    # all chunks after the first boundary are untouched by the edit
    assert len(shared) >= len(h1) - 2, (len(shared), len(h1))
    # and the shared chunks are counted as corpus-wide duplicates
    dup_hashes = {r["chunk_hash"] for r in out if r["n_occurrences"] >= 2}
    assert shared <= dup_hashes


def test_cdc_chunks_cover_and_sizes(spark):
    """Chunks partition the word sequence: sizes sum to the word count
    and mean size tracks boundary_mod."""
    from nt_data_pipelines_spark.operators.text import cdc_chunks

    text = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = cdc_chunks(docs, "doc_id", "text", boundary_mod=8).collect()
    assert sum(r["n_words"] for r in rows) == 200
    rebuilt = " ".join(
        r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"])
    )
    assert rebuilt == text
    assert 2 <= (200 / len(rows)) <= 40  # mean near boundary_mod=8


def test_source_divergence_zero_for_identical_distribution(spark):
    """A source whose token distribution equals the pool's has KL == 0;
    a skewed source scores strictly positive."""
    from nt_data_pipelines_spark.operators.text import source_unigram_divergence

    rows = [
        (1, "a b c d", "s1"),
        (2, "a b c d", "s2"),          # s1 == s2 == pool halves
        (3, "a b c d", "s1"),
        (4, "a b c d", "s2"),
    ]
    out = {
        r["source"]: r["kl_bits"]
        for r in source_unigram_divergence(
            spark.createDataFrame(rows, ["doc_id", "text", "source"])
        ).collect()
    }
    assert out["s1"] == 0.0 and out["s2"] == 0.0
    rows2 = rows + [(5, "zz zz zz zz zz zz zz zz", "s3")]
    out2 = {
        r["source"]: r["kl_bits"]
        for r in source_unigram_divergence(
            spark.createDataFrame(rows2, ["doc_id", "text", "source"])
        ).collect()
    }
    assert out2["s3"] > 0.5          # exclusive vocabulary diverges hard
    assert out2["s1"] > 0.0          # pool moved, so s1 now diverges a bit


def test_cdc_dedup_keeps_first_occurrence_only(spark):
    """A block repeated across docs survives once, in the earliest
    (min doc, min position) occurrence; unique content is untouched;
    sub-min_chunk_words chunks are never removed."""
    from nt_data_pipelines_spark.operators.text import cdc_dedup_documents

    block = " ".join(f"w{i:02d}" for i in range(24))
    docs = spark.createDataFrame(
        [
            (1, block + " unique alpha tail content here"),
            (2, "unique beta head content " + block),
            (3, block),                                  # pure duplicate
            (4, "completely separate document body"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cdc_dedup_documents(docs, "doc_id").collect()}
    # doc 1 keeps everything (it owns the first occurrence)
    assert out[1]["n_removed_words"] == 0
    assert out[1]["clean_text"] == docs.collect()[0]["text"]
    # docs 2 and 3 lose the repeated block's full chunks
    assert out[2]["n_removed_words"] > 0
    assert out[3]["n_removed_words"] > 0
    # CDC semantics: chunks fully inside the shared block dedup; the
    # block's trailing PARTIAL chunk differs between docs (in doc 1 it
    # merges with the following words), so a boundary-straddling tail
    # may survive — most of the block must be gone, not every word
    assert out[3]["n_removed_words"] >= 16
    survivors = set(out[3]["clean_text"].split()) & set(block.split())
    assert len(survivors) <= 8
    # doc 4 untouched
    assert out[4]["clean_text"] == "completely separate document body"
    assert out[4]["n_removed_words"] == 0
    # idempotence: dedup of the output changes nothing
    again = cdc_dedup_documents(
        spark.createDataFrame(
            [(k, v["clean_text"]) for k, v in out.items()], ["doc_id", "text"]
        ),
        "doc_id",
    )
    assert all(r["n_removed_words"] == 0 for r in again.collect())


def test_source_centroid_outliers_orders_by_typicality(spark):
    """A vector equal to its source's centroid scores 1.0; an
    orthogonal outlier scores lower."""
    from nt_data_pipelines_spark.operators.similarity import (
        source_centroid_outliers,
    )

    docs = spark.createDataFrame(
        [(1, "s1"), (2, "s1"), (3, "s1")], ["doc_id", "source"]
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 1.0]),   # the outlier
        ],
        ["vec_id", "embedding"],
    )
    out = {
        r["doc_id"]: r["centroid_cosine"]
        for r in source_centroid_outliers(docs, emb).collect()
    }
    # centroid of {e1, e1, e4} is (2/3, 0, 0, 1/3): cos(e1) = 2/sqrt(5)
    assert out[1] == out[2] == pytest.approx(0.894427, abs=1e-6)
    assert out[3] == pytest.approx(0.447214, abs=1e-6)  # the outlier
