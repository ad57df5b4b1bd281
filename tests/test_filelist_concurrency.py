"""Randomized concurrent-writer stress for the filelist commit
protocol (VERDICT r5 #6): racing appenders, appender-vs-rewrite, and
vacuum, over >=100 thread-pool schedules.

The protocol under test (_fl_commit_append / _rewrite_table_filelist /
_fl_gc / vacuum) is pure Hadoop-FS code — batches are faked with
touched files so a schedule costs milliseconds, and the REAL commit
code runs unmodified. Invariants asserted per schedule:

- commits are totally ordered: one valid manifest per generation,
  generation numbers contiguous over the schedule's window;
- an append generation's file set contains BOTH its own batch and the
  previous generation's files (no rival batch ever silently dropped);
- a rewrite generation references exactly its staged files;
- every file the final manifest references exists on disk (no live
  file GC'd, including under a concurrent vacuum);
- every writer thread eventually commits (OCC retries absorb races —
  no ConcurrentWriteError escapes).
"""

from __future__ import annotations

import pytest

import os
import random
import threading
import uuid

from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("close", T.DoubleType()),
    ]
)


def _fake_batch(root: str, name: str, tag: str):
    """Touch a one-file batch dir exactly where _fl_write_batch would."""
    bdir = os.path.join(root, f"{name}.data", f"b{tag}{uuid.uuid4().hex[:8]}")
    os.makedirs(bdir)
    fp = os.path.join(bdir, "part-0.parquet")
    with open(fp, "wb") as f:
        f.write(b"x")
    return bdir, [os.path.relpath(fp, root)], {}


@pytest.mark.slow
def test_filelist_concurrent_commit_fuzz(spark, tmp_path):
    root = str(tmp_path / "fuzz")
    cat = Catalog(spark, root, commit_mode="filelist")
    cat.create("m", SCHEMA, None, ["ticker"], mode="replace")
    schedules = 100

    for sched in range(schedules):
        start_gen = cat._current_gen("m")
        committed_appends: list[list[str]] = []
        committed_rewrites: list[list[str]] = []
        errors: list[BaseException] = []
        lock = threading.Lock()
        barrier = threading.Barrier(4)

        def appender(n_ops: int, seed: int):
            r = random.Random(seed)
            try:
                barrier.wait()
                for _ in range(n_ops):
                    _, files, stats = _fake_batch(root, "m", "a")
                    if r.random() < 0.5:
                        threading.Event().wait(r.random() / 200)  # jitter
                    cat._fl_commit_append("m", files, stats)
                    with lock:
                        committed_appends.append(files)
            except BaseException as e:  # noqa: BLE001 - recorded for assert
                errors.append(e)

        def rewriter():
            staged: dict = {}
            try:
                barrier.wait()

                def once():
                    # same step order as _rewrite_table_filelist: pin
                    # the target gen BEFORE staging (a rival committing
                    # during the stage takes our number and we collide)
                    gen = cat._next_gen("m")
                    bdir, files, stats = _fake_batch(root, "m", "r")
                    staged["files"] = files
                    try:
                        cat._commit_manifest("m", gen, files=files, file_stats=stats)
                    except Exception:
                        cat._fs_delete(bdir)
                        raise
                    cat._fl_gc("m", gen)

                cat._with_occ_retry("m", once, attempts=30)
                with lock:
                    committed_rewrites.append(staged["files"])
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        def vacuumer():
            try:
                barrier.wait()
                cat.vacuum("m", older_than_hours=1.0)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=appender, args=(2, sched * 10 + 1)),
            threading.Thread(target=appender, args=(2, sched * 10 + 2)),
            threading.Thread(target=rewriter),
            threading.Thread(target=vacuumer),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, f"schedule {sched}: {errors!r}"
        assert len(committed_appends) == 4 and len(committed_rewrites) == 1

        # ---- invariants over this schedule's manifest window ----
        end_gen = cat._current_gen("m")
        assert end_gen == start_gen + 5  # 4 appends + 1 rewrite, no gaps
        window = {}
        for g in range(start_gen, end_gen + 1):
            doc = cat._read_manifest("m", g)
            assert doc is not None and doc["generation"] == g
            # RESOLVED snapshots (manifests are deltas between
            # checkpoints; the invariants below are about snapshots)
            window[g] = set(cat._fl_manifest_files("m", g) or [])
        rw = set(committed_rewrites[0])
        rewrite_gens = [g for g in range(start_gen + 1, end_gen + 1) if window[g] == rw]
        assert len(rewrite_gens) == 1, "rewrite manifest = exactly its staged files"
        for g in range(start_gen + 1, end_gen + 1):
            if g == rewrite_gens[0]:
                continue
            # append: previous generation's files all carried forward,
            # plus exactly one committed batch
            assert window[g] > window[g - 1], (sched, g)
            batch = window[g] - window[g - 1]
            assert any(batch == set(fs) for fs in committed_appends), (sched, g)
        # no live file GC'd (vacuum + commit GC both ran)
        for rel in window[end_gen]:
            assert os.path.exists(os.path.join(root, rel)), (sched, rel)
