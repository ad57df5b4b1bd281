"""Crafted-input tests for the round-10 second-batch operators:
deterministic HLL, PMI collocations, source-vocab Jaccard, KS drift."""

from __future__ import annotations

import hashlib
import math

import pytest

from nt_data_pipelines_spark.operators.drift import ks_drift_by_group
from nt_data_pipelines_spark.operators.lm import pmi_collocations
from nt_data_pipelines_spark.operators.sketches import deterministic_hll_distinct
from nt_data_pipelines_spark.operators.text import source_vocab_jaccard


def _hll_reference(values, p=8):
    """Straight-line Python HLL over md5, mirroring the SQL layout."""
    m = 1 << p
    hex_chars = p // 4
    regs = {}
    for v in set(values):
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[:hex_chars], 16)
        x = int(h[hex_chars : hex_chars + 14], 16)
        rank = 57 if x == 0 else 57 - x.bit_length()
        regs[reg] = max(regs.get(reg, 0), rank)
    s = sum(1 << (57 - r) for r in regs.values()) + (m - len(regs)) * (1 << 57)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = (alpha * m * m * float(1 << 57)) / float(s)
    v_empty = m - len(regs)
    if raw <= 2.5 * m and v_empty > 0:
        return round(m * math.log(m / v_empty), 6), v_empty, raw
    return raw, v_empty, raw


def test_deterministic_hll_matches_python_reference(spark):
    values = [f"word{i}" for i in range(500)]
    df = spark.createDataFrame(
        [("g", v) for v in values] + [("g", v) for v in values[:100]],  # dups
        "grp string, w string",
    )
    row = deterministic_hll_distinct(df, "grp", "w", p=8, include_exact=True).first()
    expect_est, expect_empty, expect_raw = _hll_reference(values)
    assert row["exact_distinct"] == 500
    assert row["empty_registers"] == expect_empty
    assert row["hll_raw"] == pytest.approx(expect_raw, abs=0.0)  # bit-identical
    assert row["hll_estimate"] == pytest.approx(expect_est, abs=0.0)
    # an HLL with p=8 has ~6.5% rsd; 500 distinct must land well inside 4 sigma
    assert abs(row["hll_estimate"] - 500) / 500 < 0.26


def test_deterministic_hll_accuracy_across_cardinalities(spark):
    """Estimate quality holds through the correction crossover."""
    for n in (50, 1000, 20000):
        df = spark.createDataFrame([("g", f"v{i}") for i in range(n)], "grp string, w string")
        row = deterministic_hll_distinct(df, "grp", "w").first()
        assert abs(row["hll_estimate"] - n) / n < 0.26, (n, row["hll_estimate"])


def test_deterministic_hll_rejects_bad_p(spark):
    df = spark.createDataFrame([("g", "x")], "grp string, w string")
    with pytest.raises(ValueError):
        deterministic_hll_distinct(df, "grp", "w", p=7)


def test_pmi_collocations_crafted(spark):
    # "strong tie": always adjacent; "weak": words frequent but pair rare
    docs = ["strong tie filler one", "strong tie filler two"] * 5 + [
        "filler strong filler tie filler three"
    ] * 5
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    rows = pmi_collocations(df, "text", min_count=5, k=10).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    assert ("strong", "tie") in by_pair
    st = by_pair[("strong", "tie")]
    assert st["pair_count"] == 10
    # hand-check PMI: N pairs total, c(strong,.)=15, c(.,tie)=15
    n = sum(len(t.split()) - 1 for t in docs)
    expect = round(math.log2(10 * n / (15 * 15)), 6)
    assert st["pmi"] == pytest.approx(expect, abs=1e-9)
    # the always-adjacent pair must outrank every filler pair
    assert rows[0]["w1"] == "strong" or rows[0]["pmi"] >= st["pmi"]


def test_pmi_collocations_min_count_filters(spark):
    df = spark.createDataFrame([("rare pair here",)] * 2, "text string")
    assert pmi_collocations(df, "text", min_count=5, k=10).count() == 0
    assert pmi_collocations(df, "text", min_count=2, k=10).count() > 0
    with pytest.raises(ValueError):
        pmi_collocations(df, "text", min_count=0)


def test_source_vocab_jaccard_crafted(spark):
    df = spark.createDataFrame(
        [
            ("a", "x y z"),
            ("a", "x w"),  # V_a = {x, y, z, w}
            ("b", "x y q"),  # V_b = {x, y, q}
            ("c", "p p p"),  # V_c = {p} — disjoint from both
        ],
        "source string, text string",
    )
    rows = source_vocab_jaccard(df, "source", "text").collect()
    got = {(r["source_a"], r["source_b"]): r for r in rows}
    ab = got[("a", "b")]
    assert ab["intersection_size"] == 2 and ab["union_size"] == 5
    assert ab["jaccard"] == pytest.approx(0.4, abs=1e-9)
    # disjoint pairs are omitted (inner join on shared words)
    assert ("a", "c") not in got and ("b", "c") not in got
    assert len(rows) == 1


def test_ks_drift_crafted(spark):
    # group "lo": values 1..10; group "hi": values 11..20 — disjoint
    # supports, so KS(lo vs hi) = 1 exactly; "mid" mirrors the pool.
    rows = [("lo", v) for v in range(1, 11)] + [("hi", v) for v in range(11, 21)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = {r["g"]: r for r in ks_drift_by_group(df, "g", "v").collect()}
    assert out["lo"]["n_rows"] == 10
    assert out["lo"]["ks_stat"] == pytest.approx(1.0, abs=1e-12)
    assert out["hi"]["ks_stat"] == pytest.approx(1.0, abs=1e-12)


def test_ks_drift_matches_scipy_style_reference(spark):
    """Randomized check against a direct two-sample ECDF sweep."""
    import random

    rng = random.Random(7)
    rows = []
    data = {}
    for g, lam in (("a", 10), ("b", 14), ("c", 10)):
        vals = [rng.randint(0, lam) for _ in range(80)]
        data[g] = vals
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r["g"]: r["ks_stat"] for r in ks_drift_by_group(df, "g", "v").collect()}

    def ks(a, b):
        grid = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        return max(
            abs(sum(x <= v for x in a) * nb - sum(x <= v for x in b) * na)
            for v in grid
        ) / (na * nb)

    for g in data:
        rest = [v for h, vals in data.items() if h != g for v in vals]
        assert got[g] == pytest.approx(ks(data[g], rest), abs=1e-12), g


def test_ks_drift_identical_distributions_near_zero(spark):
    rows = [(g, v) for g in ("a", "b") for v in range(50) for _ in (0, 1)]
    df = spark.createDataFrame(rows, "g string, v int")
    for r in ks_drift_by_group(df, "g", "v").collect():
        assert r["ks_stat"] == pytest.approx(0.0, abs=1e-12)
