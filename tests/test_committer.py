"""Object-store commit atomicity (VERDICT r6 #1).

Three claims, each demonstrated rather than asserted:

1. The plain-S3A protocol (exists-then-PUT, no conditional write) is
   REALLY unsafe: two racing writers both "win" the same generation —
   the double-win that silently drops an acknowledged commit.
2. The same race through the conditional-PUT committer never
   double-wins, and the full filelist concurrency fuzz (appenders vs
   rewriter vs vacuum) stays invariant-clean when every commit is
   arbitrated by the hook instead of the built-in hardlink path.
3. A manifest/filelist catalog on an object-store scheme with no
   committer refuses loudly at construction.
"""

from __future__ import annotations

import os
import random
import threading
import uuid

import pytest
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog, ConcurrentWriteError
from nt_data_pipelines_spark.committers import (
    ExclusiveCommitter,
    FakeObjectStore,
    NonAtomicObjectStoreCommitter,
    ObjectStoreConditionalCommitter,
    S3ConditionalPutCommitter,
)

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


# ---- 3: loud refusal ----------------------------------------------------


@pytest.mark.parametrize("scheme", ["s3a", "s3", "gs", "abfss"])
@pytest.mark.parametrize("mode", ["manifest", "filelist"])
def test_object_store_root_without_committer_refuses(spark, scheme, mode):
    with pytest.raises(ValueError, match="exclusive committer"):
        Catalog(spark, f"{scheme}://bucket/lake", commit_mode=mode)


def test_rename_mode_not_gated_on_scheme_check(spark, tmp_path):
    # rename mode never writes manifests; the committer gate must not
    # block it (its own rename-atomicity caveats are documented where
    # the rename happens). Local construction as a control:
    cat = Catalog(spark, str(tmp_path / "r"), commit_mode="rename")
    assert cat._committer is None


def test_committer_protocol_runtime_checkable():
    assert isinstance(ObjectStoreConditionalCommitter(FakeObjectStore()), ExclusiveCommitter)
    assert isinstance(S3ConditionalPutCommitter("b"), ExclusiveCommitter)


# ---- 1: the double-win is real ------------------------------------------


def _race_commit(cat: Catalog, name: str, gen: int, n: int = 2):
    """n threads race _commit_manifest for the SAME generation; return
    the per-thread outcome list ("won" / "lost")."""
    barrier = threading.Barrier(n)
    outcomes: list[str] = []
    lock = threading.Lock()

    def runner(tag: str):
        barrier.wait()
        try:
            cat._commit_manifest(name, gen, files=[f"{name}.data/{tag}.parquet"])
            res = "won"
        except ConcurrentWriteError:
            res = "lost"
        with lock:
            outcomes.append(res)

    threads = [threading.Thread(target=runner, args=(f"t{i}",)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    return outcomes


def test_plain_s3a_protocol_double_wins(spark, tmp_path):
    """The protocol plain S3A reduces to (exists check, copy window,
    unconditional PUT) lets BOTH racers win — proof the refusal in
    Catalog.__init__ guards a real data-loss bug, not a theoretical
    one."""
    store = FakeObjectStore()
    cat = Catalog(
        spark,
        str(tmp_path / "unsafe"),
        commit_mode="filelist",
        committer=NonAtomicObjectStoreCommitter(store, race_window=0.05),
    )
    cat.create("m", SCHEMA, None, ["ticker"], mode="replace")
    double_wins = 0
    for attempt in range(10):
        gen = cat._next_gen("m")
        outcomes = _race_commit(cat, "m", gen)
        if outcomes.count("won") > 1:
            double_wins += 1
    # With a 50 ms copy window and a barrier start, both racers pass
    # the exists check in essentially every attempt.
    assert double_wins >= 1, "expected the unsafe protocol to double-win"


# ---- 2: the conditional-PUT hook closes it -------------------------------


def test_conditional_put_never_double_wins(spark, tmp_path):
    store = FakeObjectStore()
    cat = Catalog(
        spark,
        str(tmp_path / "safe"),
        commit_mode="filelist",
        committer=ObjectStoreConditionalCommitter(store),
    )
    cat.create("m", SCHEMA, None, ["ticker"], mode="replace")
    for attempt in range(50):
        gen = cat._next_gen("m")
        outcomes = _race_commit(cat, "m", gen, n=3)
        assert outcomes.count("won") == 1, (attempt, outcomes)
        assert outcomes.count("lost") == 2, (attempt, outcomes)
        # losers must surface as OCC signals, and the winner's payload
        # must be the committed one (readable by the catalog's readers)
        doc = cat._read_manifest("m", gen)
        assert doc is not None and doc["generation"] == gen


@pytest.mark.slow
def test_filelist_fuzz_through_committer(spark, tmp_path):
    """The full concurrency fuzz (racing appenders + rewriter +
    vacuum) with EVERY commit arbitrated by the conditional-PUT hook:
    same invariants as tests/test_filelist_concurrency.py, proving the
    hook composes with OCC retries, GC, and vacuum — the 'correct OCC
    via the hook' half of the done-criterion."""
    root = str(tmp_path / "fuzz")
    store = FakeObjectStore()
    cat = Catalog(
        spark,
        root,
        commit_mode="filelist",
        committer=ObjectStoreConditionalCommitter(store),
    )
    cat.create("m", SCHEMA, None, ["ticker"], mode="replace")

    for sched in range(30):
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
                        threading.Event().wait(r.random() / 200)
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

        end_gen = cat._current_gen("m")
        assert end_gen == start_gen + 5
        window = {}
        for g in range(start_gen, end_gen + 1):
            doc = cat._read_manifest("m", g)
            assert doc is not None and doc["generation"] == g
            # RESOLVED snapshots (manifests are deltas between
            # checkpoints; the invariants below are about snapshots)
            window[g] = set(cat._fl_manifest_files("m", g) or [])
        rw = set(committed_rewrites[0])
        rewrite_gens = [g for g in range(start_gen + 1, end_gen + 1) if window[g] == rw]
        assert len(rewrite_gens) == 1
        for g in range(start_gen + 1, end_gen + 1):
            if g == rewrite_gens[0]:
                continue
            assert window[g] > window[g - 1], (sched, g)
            batch = window[g] - window[g - 1]
            assert any(batch == set(fs) for fs in committed_appends), (sched, g)
        for rel in window[end_gen]:
            assert os.path.exists(os.path.join(root, rel)), (sched, rel)


def test_committer_catalog_end_to_end(spark, tmp_path):
    """Real data path (not faked batches): create/insert/optimize/read
    with every manifest commit going through the hook."""
    store = FakeObjectStore()
    cat = Catalog(
        spark,
        str(tmp_path / "lake"),
        commit_mode="filelist",
        committer=ObjectStoreConditionalCommitter(store),
    )
    cat.create("px", SCHEMA, None, ["ticker"], mode="replace")
    cat.insert("px", spark.createDataFrame([("A", 1.0), ("B", 2.0)], SCHEMA))
    cat.insert("px", spark.createDataFrame([("A", 3.0)], SCHEMA))
    cat.optimize("px")
    rows = {r.ticker: r.close for r in cat.table("px").collect()}
    assert rows == {"A": 3.0, "B": 2.0}
    # every committed generation's manifest was arbitrated in the store
    gens = cat._manifest_gens("px")
    assert gens, "expected manifests"
    mdir = cat._manifest_dir("px")
    for g in gens:
        assert store.exists(os.path.join(mdir, f"{g}.json"))


# ---- S3ConditionalPutCommitter protocol (injected fake client) ----------


class _FakeS3Client:
    def __init__(self):
        self.store = FakeObjectStore()
        self.calls: list[dict] = []

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        self.calls.append({"Bucket": Bucket, "Key": Key, "IfNoneMatch": IfNoneMatch})
        assert IfNoneMatch == "*", "conditional header must be sent on every commit"
        if not self.store.put_if_none_match(f"{Bucket}/{Key}", bytes(Body)):
            e = Exception("precondition failed")
            e.response = {
                "Error": {"Code": "PreconditionFailed"},
                "ResponseMetadata": {"HTTPStatusCode": 412},
            }
            raise e


class _Failing500Client:
    def put_object(self, **kw):
        e = Exception("internal error")
        e.response = {
            "Error": {"Code": "InternalError"},
            "ResponseMetadata": {"HTTPStatusCode": 500},
        }
        raise e


def test_s3_conditional_put_committer_semantics():
    client = _FakeS3Client()
    c = S3ConditionalPutCommitter("bkt", client=client)
    p = "s3a://bkt/lake/t._manifest/0.json"
    assert c.put_if_absent(p, b"{}") is True
    assert c.put_if_absent(p, b"{}") is False  # 412 -> lost the race
    assert client.calls[0]["Key"] == "lake/t._manifest/0.json"
    # non-412 failures must propagate, not masquerade as a lost race
    with pytest.raises(Exception, match="internal error"):
        S3ConditionalPutCommitter("bkt", client=_Failing500Client()).put_if_absent(p, b"{}")


def test_s3_key_translation():
    k = S3ConditionalPutCommitter._key_for
    assert k("s3a://bkt/a/b/0.json") == "a/b/0.json"
    assert k("/a/b/0.json") == "a/b/0.json"
    assert k("a/b/0.json") == "a/b/0.json"


def test_mirror_to_local_normalizes_file_uri_forms(tmp_path):
    """Hadoop emits BOTH 'file:///p' and 'file:/p' (single slash) for
    local paths — the mirror must strip either instead of creating a
    literal 'file:' directory, and must refuse non-local schemes."""
    from nt_data_pipelines_spark.committers import _mirror_to_local

    p1 = tmp_path / "a" / "m1.json"
    _mirror_to_local(f"file://{p1}", b"one")      # file:///abs form
    assert p1.read_bytes() == b"one"

    p2 = tmp_path / "b" / "m2.json"
    _mirror_to_local(f"file:{p2}", b"two")        # file:/abs form
    assert p2.read_bytes() == b"two"

    p3 = tmp_path / "c" / "m3.json"
    _mirror_to_local(str(p3), b"three")           # plain path
    assert p3.read_bytes() == b"three"

    with pytest.raises(ValueError):
        _mirror_to_local("s3a://bucket/key.json", b"x")
    with pytest.raises(ValueError):
        _mirror_to_local("file:relative/m.json", b"x")
    # nothing leaked into the CWD as a literal 'file:'/'s3a:' dir
    assert not os.path.exists("file:") and not os.path.exists("s3a:")
