"""Crafted-input tests for the round-10 operators: interval
coalescing, cross-source overlap, char entropy, token concentration."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.dedup import cross_source_overlap
from nt_data_pipelines_spark.operators.interval import merge_intervals
from nt_data_pipelines_spark.operators.text import (
    char_entropy,
    source_token_concentration,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_merge_intervals_crafted(spark):
    rows = [
        # key "a": [1,3] + [2,5] overlap; [5,6] TOUCHES (merges); [8,9] apart
        ("a", _ts(1), _ts(3)),
        ("a", _ts(2), _ts(5)),
        ("a", _ts(5), _ts(6)),
        ("a", _ts(8), _ts(9)),
        # key "b": zero-length interval alone, then a contained pair
        ("b", _ts(1), _ts(1)),
        ("b", _ts(3), _ts(10)),
        ("b", _ts(4), _ts(5)),  # fully contained
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = {
        (r["k"], r["island_id"]): r
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert len(got) == 4
    a0, a1 = got[("a", 0)], got[("a", 1)]
    assert (a0["island_start"], a0["island_end"], a0["n_intervals"]) == (
        _ts(1), _ts(6), 3,
    )
    assert (a1["island_start"], a1["island_end"], a1["n_intervals"]) == (
        _ts(8), _ts(9), 1,
    )
    assert got[("b", 0)]["island_end"] == _ts(1)  # zero-length survives
    assert got[("b", 1)]["n_intervals"] == 2  # containment merges


def test_merge_intervals_duplicate_openers(spark):
    """Duplicate (start, end) rows — including duplicates of an
    island-OPENING interval — must aggregate into the right island.
    Caught live at sf0.1: with duplicate sort keys, the opener-flag
    window and the cumsum window can order ties differently and strand
    a duplicate in the previous island, inflating its span; the
    weighted pre-aggregation makes the order total."""
    rows = [
        ("k", _ts(1), _ts(2)),
        ("k", _ts(5), _ts(7)),  # opener of island 1...
        ("k", _ts(5), _ts(7)),  # ...duplicated, twice
        ("k", _ts(5), _ts(7)),
        ("k", _ts(6), _ts(8)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp").repartition(4)
    got = sorted(
        (r["island_id"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [
        (0, _ts(1), _ts(2), 1),
        (1, _ts(5), _ts(8), 4),  # all three duplicates + the overlapper
    ]


def test_merge_intervals_out_of_order_input(spark):
    # island detection must not depend on input row order
    rows = [("k", _ts(5), _ts(7)), ("k", _ts(1), _ts(3)), ("k", _ts(2), _ts(6))]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp").repartition(3)
    got = merge_intervals(df, "k", "s", "e").collect()
    assert len(got) == 1 and got[0]["n_intervals"] == 3
    assert (got[0]["island_start"], got[0]["island_end"]) == (_ts(1), _ts(7))


def test_merge_intervals_randomized_vs_python_sweep(spark):
    """200 random interval sets (duplicates, containment, touching,
    zero-length all arise naturally) under one key each, ONE Spark job,
    each compared against a plain Python sweep-line reference."""
    import random

    rng = random.Random(1234)
    rows, want = [], {}
    for case in range(200):
        k = f"c{case}"
        ivs = []
        for _ in range(rng.randint(1, 25)):
            s = rng.randint(1, 25)
            e = s + rng.randint(0, 4)
            ivs.append((s, e))
            if rng.random() < 0.3:
                ivs.append((s, e))  # force duplicates
        rows += [(k, _ts(s), _ts(e)) for s, e in ivs]
        islands = []
        for s, e in sorted(ivs):
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        want[k] = [(_ts(a), _ts(b), n) for a, b, n in islands]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp").repartition(8)
    got: dict[str, list] = {}
    for r in merge_intervals(df, "k", "s", "e").collect():
        got.setdefault(r["k"], []).append(
            (r["island_id"], r["island_start"], r["island_end"], r["n_intervals"])
        )
    assert set(got) == set(want)
    for k, islands in want.items():
        assert sorted(got[k]) == [
            (i, a, b, n) for i, (a, b, n) in enumerate(islands)
        ], k


def test_cross_source_overlap_exact_and_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", "shared page text"),
            (2, "s2", "shared page text"),   # exact dup across s1/s2
            (3, "s2", "shared page text"),   # same text again: still ONE key
            (4, "s3", "unique text"),
            (5, "s1", None),                  # null text excluded
            (6, "s3", None),
        ],
        "doc_id long, source string, text string",
    )
    got = cross_source_overlap(df, "source", "text").collect()
    assert [(r["source_a"], r["source_b"], r["n_shared_texts"]) for r in got] == [
        ("s1", "s2", 1)
    ]
    # a custom fingerprint widens matching: first word only
    fp = F.split(F.col("text"), " ").getItem(0)
    got2 = {
        (r["source_a"], r["source_b"]): r["n_shared_texts"]
        for r in cross_source_overlap(df, "source", "text", fingerprint=fp).collect()
    }
    assert got2[("s1", "s2")] == 1  # "shared"
    assert ("s1", "s3") not in got2


def test_minhash_estimate_calibration_crafted(spark):
    """Identical docs are LSH candidates with a perfect estimate
    (all 16 components match, exact Jaccard 1) -> error bucket 0 with
    share 1.0 when they are the only candidate pair."""
    from nt_data_pipelines_spark.operators.dedup import (
        DEFAULT_BUCKET_CAP,
        minhash_estimate_calibration,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact dup of 1
            (3, "zq xw vv uu tt"),          # shares nothing
        ],
        "doc_id long, text string",
    )
    rows = minhash_estimate_calibration(
        df, "doc_id", "text", bucket_cap=DEFAULT_BUCKET_CAP
    ).collect()
    assert [(r["err_bucket_16ths"], r["n_pairs"], r["pair_share"]) for r in rows] == [
        (0, 1, 1.0)
    ]


def test_char_entropy_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "abab"),        # uniform over 2 chars -> exactly 1 bit
            (2, "aaaa"),        # single char -> 0 bits
            (3, "a b a b"),     # spaces ignored -> same as doc 1
            (4, ""),            # empty -> row kept, NULL entropy
            (5, "abcd"),        # uniform over 4 -> exactly 2 bits
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert got[1]["char_entropy_bits"] == pytest.approx(1.0)
    assert got[2]["char_entropy_bits"] == 0.0
    assert got[3]["char_entropy_bits"] == pytest.approx(1.0)
    assert got[3]["n_chars_nospace"] == 4
    assert got[4]["n_chars_nospace"] == 0 and got[4]["char_entropy_bits"] is None
    assert got[5]["char_entropy_bits"] == pytest.approx(2.0)
    # a non-dyadic distribution rounds to 6 of the true entropy
    df2 = spark.createDataFrame([(9, "aab")], "doc_id long, text string")
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    (row,) = char_entropy(df2, "doc_id", "text").collect()
    assert row["char_entropy_bits"] == pytest.approx(want, abs=2e-6)


def test_source_token_concentration_crafted(spark):
    # one source, docs with token counts [10, 5, 3, 1, 1] (words)
    def doc(i, n):
        return (i, "src", " ".join(["w"] * n))

    df = spark.createDataFrame(
        [doc(1, 10), doc(2, 5), doc(3, 3), doc(4, 1), doc(5, 1)],
        "doc_id long, source string, text string",
    )
    (row,) = source_token_concentration(df, "source", "text").collect()
    assert (row["n_docs"], row["total_tokens"]) == (5, 20)
    # half the mass = 10 tokens -> the single 10-token doc suffices
    assert row["n_docs_half_tokens"] == 1
    assert row["half_docs_frac"] == pytest.approx(0.2)
    # top decile: ceil(5/10) = 1 doc -> 10/20 of the tokens
    assert row["top_decile_token_share"] == pytest.approx(0.5)
    # boundary-group split: two sources where the half threshold lands
    # INSIDE a value group (4 docs of 5 tokens: need 10 -> 2 docs)
    df2 = spark.createDataFrame(
        [doc(i, 5) for i in range(4)], "doc_id long, source string, text string"
    )
    (r2,) = source_token_concentration(df2, "source", "text").collect()
    assert r2["n_docs_half_tokens"] == 2
    assert r2["top_decile_token_share"] == pytest.approx(0.25)


def test_token_fertility_crafted(spark):
    """One merge (a,b): 'ab' encodes to ['ab','</w>'] (2 tokens), 'x'
    to ['x','</w>'] (2 tokens) — fertility and compression are exact
    integer half-up rationals."""
    from nt_data_pipelines_spark.operators.bpe import token_fertility

    df = spark.createDataFrame(
        [("s1", "ab ab x"), ("s2", "x")],
        "source string, text string",
    )
    got = {
        r["source"]: r
        for r in token_fertility(df, [("a", "b")], "source", "text").collect()
    }
    assert got["s1"]["n_words"] == 3
    assert got["s1"]["n_bpe_tokens"] == 6
    assert got["s1"]["tokens_per_word"] == 2.0
    # chars 2+2+1=5 over 6 tokens -> half-up(5/6) at 6dp = 0.833333
    assert got["s1"]["chars_per_token"] == 0.833333
    assert got["s2"]["n_words"] == 1 and got["s2"]["n_bpe_tokens"] == 2


def test_novelty_fraction_crafted(spark):
    """First doc owns both its bigrams; the second shares one with the
    first (novelty 0.5); a short doc has no grams and scores 0."""
    from nt_data_pipelines_spark.operators.text import novelty_fraction

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel_grams"], r["novel_frac"])
        for r in novelty_fraction(df, "doc_id", "text", n=2).collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (0, 0, 0.0)


def test_source_lang_mi_crafted(spark):
    """Perfectly language-separated sources with a 50/50 split carry
    exactly 1 bit of mutual information."""
    from nt_data_pipelines_spark.operators.text import source_lang_mi

    df = spark.createDataFrame(
        [
            (1, "s1", "the of it"),
            (2, "s1", "the of it"),
            (3, "s2", "der ist ich"),
            (4, "s2", "der ist ich"),
        ],
        "doc_id long, source string, text string",
    )
    [row] = source_lang_mi(df, "source", "doc_id", "text").collect()
    assert (row["n_docs"], row["n_cells"], row["mi_bits"]) == (4, 2, 1.0)
