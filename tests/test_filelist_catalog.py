"""commit_mode='filelist': Delta-log-style file-set manifests —
atomic appends, append-level time travel, shared-file retention, OCC."""

from __future__ import annotations

import datetime as dt
import glob as _glob
import os

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


def _rows(spark, data):
    return spark.createDataFrame([(t, d, d.year, c) for t, d, c in data], SCHEMA)


def _state(cat, name):
    return sorted((r["ticker"], r["close"]) for r in cat.table(name).collect())


def test_filelist_roundtrip_upsert_merge(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "fl"), commit_mode="filelist")
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"], mode="replace")
    cat.insert("px", _rows(spark, [("A", D1, 1.0), ("B", D2, 2.0)]))
    assert _state(cat, "px") == [("A", 1.0), ("B", 2.0)]
    # upsert (append + optimize dedup) converges
    cat.upsert("px", _rows(spark, [("A", D1, 5.0)]))
    assert _state(cat, "px") == [("A", 5.0), ("B", 2.0)]
    # merge with tombstone
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("deleted", T.BooleanType())])
    cat.merge(
        "px",
        spark.createDataFrame([("B", D2, 2025, 0.0, True), ("C", D1, 2024, 3.0, False)], wide),
        delete_col="deleted",
    )
    assert _state(cat, "px") == [("A", 5.0), ("C", 3.0)]
    # an independent reader resolves the same state
    fresh = Catalog(spark, str(tmp_path / "fl"), commit_mode="filelist")
    assert _state(fresh, "px") == [("A", 5.0), ("C", 3.0)]


def test_filelist_appends_are_snapshots(spark, tmp_path):
    """The headline filelist win: EVERY commit — appends included —
    is a time-travelable generation (manifest mode only snapshots
    rewrites)."""
    cat = Catalog(spark, str(tmp_path / "fl"), commit_mode="filelist", time_travel=3)
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]))
    cat.insert("m", _rows(spark, [("B", D2, 2.0)]))
    cat.insert("m", _rows(spark, [("C", D1, 3.0)]))
    hist = cat.history("m")
    gens = [h["generation"] for h in hist]
    assert len(gens) == 4  # create + three appends
    assert [h["n_files"] for h in hist] == sorted(h["n_files"] for h in hist)
    g_create, g1, g2, g3 = gens
    assert cat.table_at("m", g_create).count() == 0
    assert [r["ticker"] for r in cat.table_at("m", g1).collect()] == ["A"]
    assert sorted(r["ticker"] for r in cat.table_at("m", g2).collect()) == ["A", "B"]
    assert sorted(r["ticker"] for r in cat.table_at("m", g3).collect()) == ["A", "B", "C"]


def test_filelist_rewrite_gc_respects_retention(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "fl"), commit_mode="filelist", time_travel=1)
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]))
    for v in (2.0, 3.0, 4.0):
        cat.merge("m", _rows(spark, [("A", D1, v)]))  # rewrites
    hist = cat.history("m")
    gens = [h["generation"] for h in hist]
    assert [r["close"] for r in cat.table_at("m", gens[-1]).collect()] == [4.0]
    assert [r["close"] for r in cat.table_at("m", gens[-2]).collect()] == [3.0]
    # generations older than the retention window lost their files
    with pytest.raises(LookupError):
        cat.table_at("m", gens[-2] - 1).collect()
    assert _state(cat, "m") == [("A", 4.0)]


def test_filelist_shared_files_not_duplicated(spark, tmp_path):
    """Appended files are SHARED across generations (referenced, not
    copied) — retention of an append-mostly table is nearly free."""
    root = str(tmp_path / "fl")
    cat = Catalog(spark, root, commit_mode="filelist", time_travel=3)
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]))
    n_after_first = len(_glob.glob(os.path.join(root, "m.data", "**", "*.parquet"),
                                   recursive=True))
    cat.insert("m", _rows(spark, [("B", D2, 2.0)]))
    n_after_second = len(_glob.glob(os.path.join(root, "m.data", "**", "*.parquet"),
                                    recursive=True))
    # second snapshot adds only the new batch's files; gen-1 files reused
    assert n_after_second > n_after_first
    assert n_after_second <= 2 * n_after_first + 1


def test_filelist_manifest_level_file_skipping(spark, tmp_path):
    """Pruning metadata lives in the LOG (Delta's model): scan_pruned
    plans only the files whose recorded partition-column range can
    match — no footer reads, no listing."""
    cat = Catalog(spark, str(tmp_path / "fl"), commit_mode="filelist")
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"], mode="replace")
    # separate batches so each file covers one year
    cat.insert("px", _rows(spark, [("A", D1, 1.0)]))
    cat.insert("px", _rows(spark, [("B", D2, 2.0)]))
    total_files = len(cat.table("px").inputFiles())
    pruned = cat.scan_pruned("px", year=2024)
    assert [r["ticker"] for r in pruned.collect()] == ["A"]
    full = cat.table("px").filter(F.col("year") == 2024)
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
    # the pruned plan references fewer files than the table holds
    assert 0 < len(pruned.inputFiles()) < total_files
    with pytest.raises(ValueError, match="unknown"):
        cat.scan_pruned("px", nope=1)


def test_filelist_concurrent_append_and_rewrite(spark, tmp_path):
    """An append losing the commit race to a rewrite retries against
    the winner's file set — both writers' rows survive."""
    root = str(tmp_path / "occ_fl")
    a = Catalog(spark, root, commit_mode="filelist")
    a.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    a.insert("m", _rows(spark, [("A", D1, 1.0)]))
    b = Catalog(spark, root, commit_mode="filelist")

    real_commit = a._commit_manifest
    fired = {"done": False}

    def racing_commit(name, gen, **kw):
        if not fired["done"]:
            fired["done"] = True
            b.upsert("m", _rows(spark, [("C", D1, 9.0)]))  # b commits first
        return real_commit(name, gen, **kw)

    a._commit_manifest = racing_commit
    a.insert("m", _rows(spark, [("D", D2, 4.0)]))
    a._commit_manifest = real_commit
    assert _state(a, "m") == [("A", 1.0), ("C", 9.0), ("D", 4.0)]
    fresh = Catalog(spark, root, commit_mode="filelist")
    assert _state(fresh, "m") == [("A", 1.0), ("C", 9.0), ("D", 4.0)]


def test_filelist_torn_manifest_is_skipped(spark, tmp_path):
    root = str(tmp_path / "fl")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]))
    cur = cat._current_gen("m")
    with open(os.path.join(root, "m._manifest", f"{cur + 1}.json"), "w") as f:
        f.write('{"generation": ')  # crash mid-commit
    assert _state(cat, "m") == [("A", 1.0)]  # previous generation stays current
    cat.insert("m", _rows(spark, [("B", D2, 2.0)]))  # next commit skips past it
    assert _state(cat, "m") == [("A", 1.0), ("B", 2.0)]


def test_filelist_compact_and_layout(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "fl"), commit_mode="filelist")
    cat.create("px", SCHEMA, None, ["ticker", "date"], mode="replace")
    for i in range(5):
        cat.insert("px", _rows(spark, [(f"T{i}", D1, float(i))]))
    before = len(cat.data_files("px"))
    out = cat.compact("px", target_file_bytes=1 << 30)
    assert out["files_before"] == before and out["files_after"] == 1
    assert cat.table("px").count() == 5


def test_vacuum_collects_only_old_unreferenced_dirs(spark, tmp_path):
    root = str(tmp_path / "fl")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]))
    # plant an orphan batch dir (a crashed writer's staging area)
    orphan = os.path.join(root, "m.data", "bdeadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"junk")
    # fresh orphan: inside the age margin, must survive
    assert cat.vacuum("m", older_than_hours=1.0) == []
    assert os.path.isdir(orphan)
    # age it past the margin: collected; referenced dirs untouched
    old = 1  # epoch seconds, far in the past
    os.utime(os.path.join(orphan, "part-0.parquet"), (old, old))
    os.utime(orphan, (old, old))
    assert cat.vacuum("m", older_than_hours=1.0) == ["bdeadbeef0000"]
    assert not os.path.isdir(orphan)
    assert _state(cat, "m") == [("A", 1.0)]
    with pytest.raises(ValueError, match="requires commit_mode"):
        Catalog(spark, str(tmp_path / "r")).vacuum("m")


def test_changes_between_generations(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cdf"), commit_mode="filelist", time_travel=5)
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", _rows(spark, [("A", D1, 1.0), ("B", D2, 2.0)]))
    g1 = cat.history("m")[-1]["generation"]
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("deleted", T.BooleanType())])
    cat.merge(
        "m",
        spark.createDataFrame(
            [("A", D1, 2024, 10.0, False),   # update
             ("B", D2, 2025, 0.0, True),     # delete
             ("C", D1, 2024, 3.0, False)],   # insert
            wide,
        ),
        delete_col="deleted",
    )
    g2 = cat.history("m")[-1]["generation"]
    feed = {r["ticker"]: (r["_change_type"], r["close"])
            for r in cat.changes_between("m", g1, g2).collect()}
    assert feed == {"A": ("update", 10.0), "B": ("delete", 2.0), "C": ("insert", 3.0)}
    # self-diff is empty
    assert cat.changes_between("m", g2, g2).count() == 0


def test_append_race_preserves_rival_files(spark, tmp_path):
    """Regression (review finding): a rival append committing between
    our base read and our commit must either land in our base or force
    a retry — its files may never silently drop from later manifests."""
    root = str(tmp_path / "race2")
    a = Catalog(spark, root, commit_mode="filelist")
    a.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    b = Catalog(spark, root, commit_mode="filelist")

    real_next = a._next_gen
    fired = {"done": False}

    def racing_next(name):
        # rival commits AFTER our target is pinned: we must collide+retry
        target = real_next(name)
        if not fired["done"]:
            fired["done"] = True
            b.insert("m", _rows(spark, [("R", D1, 7.0)]))
        return target

    a._next_gen = racing_next
    a.insert("m", _rows(spark, [("A", D1, 1.0)]))
    a._next_gen = real_next
    assert _state(a, "m") == [("A", 1.0), ("R", 7.0)]  # both appends survive


def test_scan_pruned_numeric_stats_not_lexicographic(spark, tmp_path):
    """Regression (review finding): min/max must be computed on the
    native type — string-side extremes invert ranges like [10, 2] and
    silently prune matching files."""
    cat = Catalog(spark, str(tmp_path / "lex"), commit_mode="filelist")
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"], mode="replace")
    lo = dt.date(999, 1, 2)    # 3-digit year: '999' > '1000' as strings
    hi = dt.date(1000, 1, 2)
    cat.insert("px", _rows(spark, [("A", lo, 1.0), ("B", hi, 2.0)]))
    got = cat.scan_pruned("px", year=1000)
    assert [r["ticker"] for r in got.collect()] == ["B"]


def test_filelist_reopens_legacy_rename_table(spark, tmp_path):
    """Regression (review finding): a table written under rename mode
    must stay readable — and importable — when the catalog is reopened
    as filelist."""
    root = str(tmp_path / "mig")
    old = Catalog(spark, root)  # rename mode
    old.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    old.insert("m", _rows(spark, [("A", D1, 1.0)]))
    fl = Catalog(spark, root, commit_mode="filelist")
    assert _state(fl, "m") == [("A", 1.0)]  # plain-dir fallback read
    fl.insert("m", _rows(spark, [("B", D2, 2.0)]))  # imports legacy files
    assert _state(fl, "m") == [("A", 1.0), ("B", 2.0)]
    fresh = Catalog(spark, root, commit_mode="filelist")
    assert _state(fresh, "m") == [("A", 1.0), ("B", 2.0)]


def test_changes_between_null_key_rows(spark, tmp_path):
    """Regression (review finding): a legitimately-NULL key row present
    unchanged in both snapshots is NOT a change."""
    cat = Catalog(spark, str(tmp_path / "nullk"), commit_mode="filelist", time_travel=3)
    cat.create("m", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("m", spark.createDataFrame([(None, D1, 2024, 1.0)], SCHEMA))
    cat.merge("m", _rows(spark, [("B", D2, 2.0)]))
    hist = [h["generation"] for h in cat.history("m")]
    feed = cat.changes_between("m", hist[-2], hist[-1]).collect()
    assert [(r["ticker"], r["_change_type"]) for r in feed] == [("B", "insert")]
