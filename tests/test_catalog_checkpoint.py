"""Filelist manifest-log checkpointing (VERDICT r6 #6).

Delta-log shape: commits between checkpoints write add/remove DELTAS
(O(changed files) payload); every FL_CHECKPOINT_INTERVAL-th generation
writes a full-file-set CHECKPOINT, and snapshot resolution replays from
the newest checkpoint — so a 10^5-commit log costs O(interval) manifest
reads per resolution instead of an unbounded walk, and a CDC commit's
manifest no longer embeds the whole table's file list.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from nt_data_pipelines_spark.catalog import (
    FL_CHECKPOINT_INTERVAL,
    KEEP_MANIFESTS,
    Catalog,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
)


def _rows(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 1.0).alias("v"))


def _manifest_docs(root: str, name: str) -> dict[int, dict]:
    mdir = os.path.join(root, f"{name}._manifest")
    out = {}
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out[int(f[: -len(".json")])] = json.load(fh)
    return out


@pytest.mark.slow
def test_thousand_commit_log_stays_bounded(spark, tmp_path):
    """1,000 commits: the log never exceeds KEEP_MANIFESTS + one
    checkpoint interval of entries, resolution of the current snapshot
    touches O(N % interval) manifests, and no committed file is lost."""
    root = str(tmp_path / "lake")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("t", SCHEMA, None, ["id"])
    # protocol-level appends: unique fake file names keep each commit a
    # pure manifest operation (no Spark write), exactly what the log
    # bookkeeping sees from a real append
    for i in range(1000):
        cat._fl_commit_append("t", [f"t.data/fake{i:04d}/part-0.parquet"], {})

    docs = _manifest_docs(root, "t")
    assert len(docs) <= KEEP_MANIFESTS + FL_CHECKPOINT_INTERVAL + 1, sorted(docs)
    # checkpoint cadence: full file set exactly on interval multiples
    for g, doc in docs.items():
        if g % FL_CHECKPOINT_INTERVAL == 0:
            assert isinstance(doc.get("files"), list), g
        else:
            assert "files" not in doc and isinstance(doc.get("add"), list), g

    # resolution reads only [newest checkpoint .. gen]
    cat._fl_cache.clear()
    reads: list[int] = []
    orig = cat._read_manifest

    def counting(name, gen):
        reads.append(gen)
        return orig(name, gen)

    cat._read_manifest = counting  # type: ignore[method-assign]
    try:
        cur = cat._current_gen("t")
        reads.clear()
        files = cat._fl_manifest_files("t", cur)
    finally:
        cat._read_manifest = orig  # type: ignore[method-assign]
    assert len(reads) <= (cur % FL_CHECKPOINT_INTERVAL) + 2, reads
    # every committed file is still in the snapshot
    assert sum(1 for f in files if "/fake" in "/" + f.split("t.data/")[-1] or "fake" in f) == 1000


def test_delta_commit_payload_is_o_changed_files(spark, tmp_path):
    """The 100-TB economics: an append's manifest between checkpoints
    names ONLY its own files — never the table's full file list."""
    root = str(tmp_path / "lake")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("t", SCHEMA, None, ["id"])
    for i in range(FL_CHECKPOINT_INTERVAL - 3):
        cat.insert("t", _rows(spark, i * 10, i * 10 + 10))
    docs = _manifest_docs(root, "t")
    cur = cat._current_gen("t")
    assert cur % FL_CHECKPOINT_INTERVAL != 0
    last = docs[cur]
    assert "files" not in last
    resolved = cat._fl_manifest_files("t", cur)
    assert len(last["add"]) < len(resolved)
    # delta stats ride along for file skipping
    assert set(last.get("add_stats", {})) == set(last["add"])


def test_snapshots_and_mutations_across_checkpoints(spark, tmp_path):
    """Real data through >2 checkpoint boundaries, mixing appends with
    file-surgical DELETE/MERGE/OPTIMIZE, read back by a FRESH catalog
    (no warm resolution cache): rows, time travel, and pruning all
    resolve through the delta log."""
    root = str(tmp_path / "lake")
    cat = Catalog(spark, root, commit_mode="filelist", time_travel=3)
    cat.create("t", SCHEMA, None, ["id"])
    for i in range(12):
        cat.insert("t", _rows(spark, i * 10, i * 10 + 10))
    cat.delete_matching("t", spark.range(5).select("id"), on="id")   # drop 0-4
    cat.merge(
        "t",
        spark.range(200, 203).select(F.col("id"), F.lit(7.7).alias("v")),
        on=["id"],
    )
    cat.insert("t", _rows(spark, 300, 310))
    cat.optimize("t")  # PK-less tables: full pass is a no-op or rewrite

    reader = Catalog(spark, root, commit_mode="filelist", time_travel=3)
    got = reader.table("t")
    assert got.count() == 120 - 5 + 3 + 10
    assert got.filter("id < 5").count() == 0
    assert got.filter("id >= 200 AND id < 203").count() == 3
    # historical snapshots resolve through deltas
    hist = reader.history("t")
    assert len(hist) >= 3
    for h in hist[-3:]:
        assert reader.table_at("t", h["generation"]).count() > 0
    # data skipping works from delta-carried stats
    pruned = reader.scan_pruned("t", id=(">=", 300))
    assert pruned.count() == 10


def test_legacy_all_checkpoint_log_still_reads(spark, tmp_path):
    """Pre-delta-log tables (every manifest a full file set) resolve
    unchanged — no migration step."""
    root = str(tmp_path / "lake")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("t", SCHEMA, None, ["id"])
    cat.insert("t", _rows(spark, 0, 10))
    # hand-write a legacy-style full manifest as the next generation
    gen = cat._current_gen("t")
    files = cat._fl_manifest_files("t", gen)
    cat._commit_manifest("t", gen + 1, files=files, file_stats={})
    cat._fl_cache.clear()
    assert cat._fl_manifest_files("t", gen + 1) == sorted(files)
    assert cat.table("t").count() == 10


def test_gc_retains_replay_base(spark, tmp_path):
    """Manifest GC never drops the checkpoint (or the deltas above it)
    that the oldest retained generation replays from."""
    root = str(tmp_path / "lake")
    cat = Catalog(spark, root, commit_mode="filelist", time_travel=3)
    cat.create("t", SCHEMA, None, ["id"])
    for i in range(25):
        cat._fl_commit_append("t", [f"t.data/fk{i:02d}/part-0.parquet"], {})
    cat._fl_cache.clear()
    cur = cat._current_gen("t")
    for g in range(cur - KEEP_MANIFESTS + 1, cur + 1):
        assert cat._fl_manifest_files("t", g) is not None, g
