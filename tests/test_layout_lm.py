"""Z-order layout (file-skipping property) and corpus-LM band filter."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.layout import (
    ZKEY,
    add_zorder_key,
    interleave_bits,
    write_zordered,
)
from nt_data_pipelines_spark.operators.lm import (
    perplexity_band_filter,
    unigram_logprob,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_interleave_matches_reference_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], 3).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton2(r.x, r.y, 3), (r.x, r.y)


def test_zorder_key_bounds_and_guards(spark):
    df = spark.createDataFrame([(i, float(i % 7), i * 3 % 11) for i in range(100)],
                               "id long, a double, b long")
    keyed = add_zorder_key(df, ["a", "b"], bits=4)
    stats = keyed.agg(F.min(ZKEY), F.max(ZKEY)).first()
    assert 0 <= stats[0] <= stats[1] < (1 << 8)
    # degenerate dimension collapses to 0, does not divide by zero
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, a double")
    vals = add_zorder_key(const, ["a"], bits=4).select(ZKEY).distinct().collect()
    assert [v[0] for v in vals] == [0]
    with pytest.raises(ValueError):
        add_zorder_key(df, [], bits=4)
    with pytest.raises(ValueError):
        add_zorder_key(df, ["a", "b"], bits=40)


def test_write_zordered_files_have_disjoint_key_ranges(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float((i * 37) % 101), (i * 53) % 89) for i in range(2000)],
        "id long, v double, u long",
    )
    path = str(tmp_path / "zo")
    write_zordered(df, path, ["v", "u"], num_files=8, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    # Recompute the key (bounds are identical: same rows) and check
    # every file covers a key interval disjoint from every other --
    # the property file skipping relies on.
    # tag the file BEFORE the bounds crossJoin: input_file_name() only
    # resolves on a single-source plan
    keyed = add_zorder_key(back.withColumn("f", F.input_file_name()), ["v", "u"], bits=8)
    ivals = [
        (r.lo, r.hi)
        for r in keyed.groupBy("f").agg(F.min(ZKEY).alias("lo"), F.max(ZKEY).alias("hi")).collect()
    ]
    ivals.sort()
    assert len(ivals) > 1
    for (lo1, hi1), (lo2, _hi2) in zip(ivals, ivals[1:]):
        assert hi1 <= lo2, ivals


def test_unigram_logprob_hand_checked(spark):
    # corpus: "a a b" / "a"; T=4, c(a)=3, c(b)=1
    df = spark.createDataFrame([(1, "a a b"), (2, "a"), (3, "")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    s_a = round(-math.log2(3 / 4), 6)
    s_b = round(-math.log2(1 / 4), 6)
    assert got[1].n_tokens == 3
    assert got[1].bits_per_token == pytest.approx((2 * s_a + s_b) / 3, abs=1e-6)
    assert got[2].bits_per_token == pytest.approx(s_a, abs=1e-6)
    assert got[3].n_tokens == 0 and got[3].bits_per_token is None


def test_perplexity_band_filter_keeps_middle(spark):
    rows = [(i, "the common words " * 5) for i in range(10)]
    rows.append((100, "zq xv qj kk zz ww yy uu"))  # rare-token tail doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = perplexity_band_filter(df, lo_quantile=0.0, hi_quantile=0.5)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 100 not in ids and len(ids) > 0
    assert "bits_per_token" in kept.columns
    with pytest.raises(ValueError):
        perplexity_band_filter(df, lo_quantile=0.9, hi_quantile=0.1)


def test_logprob_mean_is_integer_half_up(spark):
    """Regression (parity, sf0.1): the per-doc mean's rounding must run
    in integer space — rounding the DOUBLE mean lands on engine-
    divergent midpoints whenever micro_sum == n/2 (mod n) (two real
    docs at sf0.1 flipped between 4.904413 and 4.904414). Pin the
    Spark result against a Python reference doing the identical
    half-up-on-binary term round and integer half-up mean."""
    from decimal import ROUND_HALF_UP, Decimal

    from nt_data_pipelines_spark.operators.lm import unigram_logprob

    rows = [
        (1, "a a b c"),
        (2, "a b b d d d"),
        (3, "c c a"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    toks = {d: [w for w in t.split(" ") if w] for d, t in rows}
    counts: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    q = Decimal("0.000001")
    want = {}
    for d, ws in toks.items():
        if not ws:
            want[d] = (0, None)
            continue
        micro = sum(
            int(
                Decimal(-math.log2(counts[w] / total)).quantize(q, ROUND_HALF_UP)
                * 1_000_000
            )
            for w in ws
        )
        n = len(ws)
        want[d] = (n, ((2 * micro + n) // (2 * n)) / 1_000_000)
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in unigram_logprob(df, "doc_id", "text").collect()
    }
    assert got == want
