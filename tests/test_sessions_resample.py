"""Sessionization, OHLC resampling, TF-IDF and inverted-index
semantics on tiny hand-checked frames."""

from __future__ import annotations

from datetime import datetime

import pytest

from nt_data_pipelines_spark.operators.sessions import (
    resample_ohlc,
    session_stats,
    sessionize,
)
from nt_data_pipelines_spark.operators.text import inverted_index, tfidf_top_terms


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 9, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 40-min gap
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(5), 20.0),
        (3, 1, _ts(50), 30.0),
        # user 2: single event
        (4, 2, _ts(0), 5.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])


def test_sessionize_splits_on_gap(events):
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(events, "user_id", "ts", "event_id", gap_seconds=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_gap_boundary_is_exclusive(spark):
    # exactly gap_seconds apart stays in the same session (> not >=)
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 0.0), (2, 1, _ts(30), 0.0)],
        ["event_id", "user_id", "ts", "value"],
    )
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(df, "user_id", "ts", "event_id", 1800).collect()}
    assert got == {1: 1, 2: 1}


def test_session_stats(events):
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(events, "user_id", "ts", "event_id", "value", 1800).collect()
    }
    s1 = got[(1, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_us"] == 300 * 1_000_000
    assert s1["total_value"] == pytest.approx(30.0)
    assert got[(1, 2)]["n_events"] == 1
    assert got[(1, 2)]["duration_us"] == 0
    assert got[(2, 1)]["total_value"] == pytest.approx(5.0)


def test_resample_ohlc_tie_broken_open_close(spark):
    # two points share the earliest ts: the lower event_id wins "open";
    # two share the latest: the higher event_id wins "close"
    rows = [
        ("x", 1, _ts(0), 3.0),
        ("x", 2, _ts(0), 4.0),
        ("x", 3, _ts(10), 9.0),
        ("x", 4, _ts(59), 1.0),
        ("x", 5, _ts(59), 2.0),
    ]
    df = spark.createDataFrame(rows, ["k", "event_id", "ts", "value"])
    bars = resample_ohlc(df, ["k"], "ts", "value", "event_id", freq="day").collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b["open"], b["high"], b["low"], b["close"]) == (3.0, 9.0, 1.0, 2.0)
    assert b["n_points"] == 5
    assert b["volume"] == pytest.approx(19.0)


def test_resample_ohlc_rejects_bad_freq(spark):
    df = spark.createDataFrame([("x", 1, _ts(0), 1.0)], ["k", "event_id", "ts", "value"])
    with pytest.raises(ValueError, match="unsupported resample freq"):
        resample_ohlc(df, ["k"], "ts", "value", "event_id", freq="minute")


def test_tfidf_ranks_match_manual_math(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry date")],
        ["doc_id", "text"],
    )
    got = tfidf_top_terms(docs, "doc_id", k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple c=2 df=1 ranks first; banana c=1 df=2 second
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["word"] for r in d1] == ["apple", "banana"]
    import math

    assert d1[0]["tfidf"] == pytest.approx(round(2 / 3 * math.log(3 / 1), 6))
    # doc 2: tie on c=1 -> lower df (cherry df=2 == banana df=2) -> word asc
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["word"] for r in d2] == ["banana", "cherry"]
    # every doc capped at k
    assert all(len(v) <= 2 for v in by_doc.values())


def test_inverted_index_sorted_capped(spark):
    docs = spark.createDataFrame(
        [(10, "a b"), (7, "b c b"), (3, "b")], ["doc_id", "text"]
    )
    got = {r["word"]: r for r in inverted_index(docs, "doc_id", posting_cap=2).collect()}
    assert got["b"]["df"] == 3
    assert got["b"]["postings"] == [3, 7]  # sorted, capped at 2
    assert got["a"]["postings"] == [10]
    assert got["c"]["df"] == 1


def test_chunk_documents_sliding_window(spark):
    from nt_data_pipelines_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(1, 11))  # 10 words
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted(
        chunk_documents(df, "doc_id", chunk_size=4, overlap=1).collect(),
        key=lambda r: r["chunk_start"],
    )
    # step = 3 -> starts 0,3,6; the start at 9 is excluded (review
    # fix): its chunk "w10" is fully CONTAINED in the chunk at 6,
    # which already reached the end of the doc
    assert [(r["chunk_start"], r["n_chunk_words"], r["chunk_text"]) for r in got] == [
        (0, 4, "w1 w2 w3 w4"),
        (3, 4, "w4 w5 w6 w7"),
        (6, 4, "w7 w8 w9 w10"),
    ]


def test_chunk_documents_rejects_bad_overlap(spark):
    from nt_data_pipelines_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", chunk_size=4, overlap=4)


def test_mix_sources_budget_branches(spark):
    from nt_data_pipelines_spark.operators.text import mix_sources_to_budget

    rows = [(i, "small", "three tokens here") for i in range(3)] + [
        (100 + i, "big", "lots and lots of tokens in this document right here") for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    # budget 60: "small" (9 tokens) passes whole; "big" (500) is sampled
    # (measured 5/50 kept under the 32-bit buckets)
    got = mix_sources_to_budget(df, "source", "doc_id", 60).collect()
    small = [r for r in got if r["source"] == "small"]
    big = [r for r in got if r["source"] == "big"]
    assert len(small) == 3  # under budget: everything kept
    assert 0 < len(big) < 50  # over budget: strict deterministic subset
    # deterministic: second run returns the identical id set
    again = mix_sources_to_budget(df, "source", "doc_id", 60).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}


def test_bm25_single_doc_single_term_closed_form(spark):
    import math

    from nt_data_pipelines_spark.operators.text import bm25_scores

    # two docs; query term "x" appears twice in doc 1 (dl=4), none in doc 2 (dl=2)
    df = spark.createDataFrame([(1, "x y x z"), (2, "a b")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bm25_scores(df, "doc_id", ["x"]).collect()}
    assert set(got) == {1}  # unmatched docs don't appear
    n, dft, tf, dl, avgdl, k1, b = 2, 1, 2, 4, 3.0, 1.2, 0.75
    idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1)
    expect = round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)
    assert got[1]["bm25"] == pytest.approx(expect)
    assert got[1]["n_matched_terms"] == 1


def test_bm25_rejects_empty_query(spark):
    from nt_data_pipelines_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="query_terms"):
        bm25_scores(df, "doc_id", [])
