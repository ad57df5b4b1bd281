"""Upsert empty-base fast path (optimization round r13).

``Catalog.upsert`` into a provably-empty table PK-dedupes the batch in
flight and skips the table-sized dup-probe scan. These tests pin:

- result equivalence with the slow path (insert + optimize), including
  batches with internal duplicate PKs — the survivor must be the one
  the LWW window (content-hash tiebreak within one ingest seq) picks;
- the fast path actually skipping optimize on an empty base and NOT
  skipping it on a non-empty one;
- the race fallback: any commit that lands between the emptiness check
  and the post-insert confirmation forces the full optimize, so a
  rival writer's rows are still deduped against ours.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("close", T.DoubleType()),
    ]
)
D1 = dt.date(2024, 1, 2)
D2 = dt.date(2025, 1, 3)

MODES = ("rename", "manifest", "filelist")


def _rows(spark, data):
    return spark.createDataFrame([(t, d, d.year, c) for t, d, c in data], SCHEMA)


def _content(cat, name):
    return sorted(
        (r["ticker"], str(r["date"]), r["year"], r["close"])
        for r in cat.table(name).collect()
    )


def _expected_lww_survivor(spark, data):
    """The close value optimize's window keeps for a same-seq dup set."""
    return (
        _rows(spark, data)
        .withColumn("h", F.xxhash64("ticker", "date", "year", "close"))
        .orderBy(F.desc("h"))
        .collect()[0]["close"]
    )


@pytest.mark.parametrize("mode", MODES)
def test_fastpath_skips_probe_and_matches_slow_path(spark, tmp_path, mode):
    cat = Catalog(spark, str(tmp_path / f"lk_{mode}"), commit_mode=mode)
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"])
    calls: list[str] = []
    orig = Catalog._optimize_once
    Catalog._optimize_once = lambda self, name: (calls.append(name), orig(self, name))[1]
    try:
        dup_batch = [("A", D1, 1.0), ("A", D1, 9.0), ("B", D2, 2.0)]
        cat.upsert("px", _rows(spark, dup_batch))
        assert calls == [], "empty-base upsert must skip the dup probe"
        exp_a = _expected_lww_survivor(spark, [("A", D1, 1.0), ("A", D1, 9.0)])
        assert _content(cat, "px") == sorted(
            [("A", str(D1), D1.year, exp_a), ("B", str(D2), D2.year, 2.0)]
        )
        # non-empty base: normal path, optimize runs, LWW across seqs
        cat.upsert("px", _rows(spark, [("A", D1, 5.0)]))
        assert calls == ["px"], "non-empty upsert must run optimize"
        assert [c for *_, c in _content(cat, "px")] == [5.0, 2.0]
    finally:
        Catalog._optimize_once = orig


@pytest.mark.parametrize("mode", MODES)
def test_fastpath_equals_slow_path_content(spark, tmp_path, mode):
    """Same batch through upsert (fast) vs insert+optimize (slow):
    byte-identical survivors."""
    batch = [("A", D1, 1.0), ("A", D1, 9.0), ("A", D1, 4.5), ("B", D2, 2.0)]
    fast = Catalog(spark, str(tmp_path / f"f_{mode}"), commit_mode=mode)
    fast.create("t", SCHEMA, ["year"], ["ticker", "date"])
    fast.upsert("t", _rows(spark, batch))
    slow = Catalog(spark, str(tmp_path / f"s_{mode}"), commit_mode=mode)
    slow.create("t", SCHEMA, ["year"], ["ticker", "date"])
    slow.insert("t", _rows(spark, batch))
    slow.optimize("t")
    assert _content(fast, "t") == _content(slow, "t")


@pytest.mark.parametrize("mode", MODES)
def test_fastpath_rival_append_falls_back(spark, tmp_path, mode):
    """A rival batch committed between the emptiness check and the
    post-insert confirmation must force the full optimize — its rows
    are LWW-deduped against ours, never left as silent duplicates."""
    root = str(tmp_path / f"race_{mode}")
    a = Catalog(spark, root, commit_mode=mode)
    a.create("m", SCHEMA, None, ["ticker", "date"])
    b = Catalog(spark, root, commit_mode=mode)

    real_write = Catalog._write
    real_opt = Catalog._optimize_once
    fired = {"done": False}
    opt_calls: list[str] = []
    Catalog._optimize_once = lambda self, name: (
        opt_calls.append(name),
        real_opt(self, name),
    )[1]

    def racing_write(self, name, df, wmode):
        real_write(self, name, df, wmode)
        # rival lands immediately after OUR write, before upsert's
        # base-undisturbed check (self is a; b is untouched)
        if self is a and not fired["done"]:
            fired["done"] = True
            b.insert("m", _rows(spark, [("A", D1, 77.0)]))

    Catalog._write = racing_write
    try:
        a.upsert("m", _rows(spark, [("A", D1, 1.0), ("B", D2, 2.0)]))
    finally:
        Catalog._write = real_write
        Catalog._optimize_once = real_opt
    assert opt_calls == ["m"], "the race must force the full optimize"
    got = _content(a, "m")
    # exactly one row per PK. NOTE: a and b are separate Catalog
    # instances that each loaded next_seq before the race, so both
    # writes carry the SAME ingest seq (pre-existing multi-writer
    # property) and LWW falls to its content-hash tiebreak.
    assert [t for t, *_ in got] == ["A", "B"]
    exp_a = _expected_lww_survivor(spark, [("A", D1, 1.0), ("A", D1, 77.0)])
    assert got[0][3] == exp_a, "survivor must be the LWW content-hash pick"


def test_fastpath_filelist_gen_check_airtight(spark, tmp_path):
    """Filelist mode: the skip decision is generation-based — our
    append landing past base+1 (rival commit or burned gen) must fall
    back to optimize even when no data file betrays the rival."""
    root = str(tmp_path / "flgen")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("m", SCHEMA, None, ["ticker", "date"])
    token = cat._upsert_empty_base_token("m")
    assert token is not None and token[0] == "gen"
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]), _pk_dedupe=True)
    assert cat._upsert_base_undisturbed("m", token)
    # a second commit advances the gen: the same token must now refuse
    cat.insert("m", _rows(spark, [("B", D2, 2.0)]), _pk_dedupe=True)
    assert not cat._upsert_base_undisturbed("m", token)


def test_fastpath_keyless_table_not_engaged(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "nk"), commit_mode="rename")
    cat.create("nk", SCHEMA, None, None)
    assert cat._upsert_empty_base_token("nk") is None
    cat.upsert("nk", _rows(spark, [("A", D1, 1.0), ("A", D1, 1.0)]))
    assert cat.table("nk").count() == 2  # no PK: append keeps both
