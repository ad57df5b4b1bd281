"""Upsert batch-scoped dup probe (optimization round r13).

``Catalog.upsert`` pays optimize's table-sized dup probe per call.
When the pre-insert committed state is known PK-unique (a recorded
pk-clean marker, or a provably EMPTY base), the probe narrows to the
batch's own just-written files; a clean probe skips optimize outright.
These tests pin:

- the skip actually happening for clean batches (empty base and
  marker-clean base) and NOT happening when the batch carries internal
  duplicate PKs or collides with existing keys;
- byte-equivalence with the slow path (insert + optimize) — the insert
  is an untouched raw append, so all committed bytes are identical;
- marker lifecycle: recorded by optimize/upsert, invalidated by any
  out-of-band commit (raw insert), never trusted stale;
- the race fallbacks: any commit that lands between the pre-insert
  check and the post-insert confirmation forces the full optimize, so
  a rival writer's duplicates still resolve.
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


def _counting(monkey_target_list):
    orig = Catalog._optimize_once

    def wrapped(self, name, **kw):
        monkey_target_list.append(name)
        return orig(self, name, **kw)

    return orig, wrapped


@pytest.fixture()
def probe_always(monkeypatch):
    """Disable the size gate: small test tables take the batch probe
    exactly like production-sized ones."""
    monkeypatch.setenv("NT_UPSERT_PROBE_TABLE_BYTES", "0")


@pytest.mark.parametrize("mode", MODES)
def test_clean_batches_skip_optimize(spark, tmp_path, mode, probe_always):
    """Empty base + PK-unique batch, then marker-clean base +
    non-colliding batch: neither upsert may run the table probe."""
    cat = Catalog(spark, str(tmp_path / f"lk_{mode}"), commit_mode=mode)
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"])
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped
    try:
        cat.upsert("px", _rows(spark, [("A", D1, 1.0), ("B", D2, 2.0)]))
        assert calls == [], "empty-base clean upsert must skip optimize"
        cat.upsert("px", _rows(spark, [("C", D1, 3.0)]))  # no collision
        if mode == "manifest":
            # manifest mode records no pk-clean markers (its appends
            # mutate the generation dir in place, so a stale listing
            # cannot be told from a clean one): full optimize runs
            assert cat._valid_pk_clean_token("px") is None
            assert calls == ["px"]
        else:
            assert cat._valid_pk_clean_token("px") is not None
            assert calls == [], "marker-clean non-colliding upsert must skip"
        assert _content(cat, "px") == sorted(
            [
                ("A", str(D1), D1.year, 1.0),
                ("B", str(D2), D2.year, 2.0),
                ("C", str(D1), D1.year, 3.0),
            ]
        )
    finally:
        Catalog._optimize_once = orig


def test_size_gate_routes_small_tables_to_full_optimize(spark, tmp_path):
    """With the default threshold (256 MB), a small marker-clean table
    still runs the classic full optimize — the batch probe's extra
    scheduling would cost more than the table-wide shuffle locally."""
    cat = Catalog(spark, str(tmp_path / "gate"), commit_mode="rename")
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"])
    cat.upsert("px", _rows(spark, [("A", D1, 1.0)]))
    assert cat._valid_pk_clean_token("px") is not None
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped
    try:
        cat.upsert("px", _rows(spark, [("B", D2, 2.0)]))
    finally:
        Catalog._optimize_once = orig
    assert calls == ["px"]
    assert _content(cat, "px") == sorted(
        [("A", str(D1), D1.year, 1.0), ("B", str(D2), D2.year, 2.0)]
    )


@pytest.mark.parametrize("mode", MODES)
def test_dirty_batches_run_full_optimize(spark, tmp_path, mode, probe_always):
    """Internal batch dups and batch-vs-existing collisions must both
    fall back to the full optimize, with the same LWW survivors the
    slow path picks."""
    cat = Catalog(spark, str(tmp_path / f"d_{mode}"), commit_mode=mode)
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"])
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped
    try:
        # internal dup into the EMPTY table -> probe dirty -> optimize
        dup_batch = [("A", D1, 1.0), ("A", D1, 9.0), ("B", D2, 2.0)]
        cat.upsert("px", _rows(spark, dup_batch))
        assert calls == ["px"], "internal batch dup must run optimize"
        exp_a = _expected_lww_survivor(spark, [("A", D1, 1.0), ("A", D1, 9.0)])
        assert [c for *_, c in _content(cat, "px")] == [exp_a, 2.0]
        # collision with an existing key -> probe dirty -> optimize,
        # later ingest seq wins
        cat.upsert("px", _rows(spark, [("A", D1, 5.0)]))
        assert calls == ["px", "px"]
        assert [c for *_, c in _content(cat, "px")] == [5.0, 2.0]
    finally:
        Catalog._optimize_once = orig


@pytest.mark.parametrize("mode", MODES)
def test_fastpath_equals_slow_path_content(spark, tmp_path, mode, probe_always):
    """Same batches through upsert (probe path) vs insert+optimize:
    identical survivors."""
    b1 = [("A", D1, 1.0), ("A", D1, 9.0), ("A", D1, 4.5), ("B", D2, 2.0)]
    b2 = [("A", D1, 7.0), ("C", D2, 3.0)]
    fast = Catalog(spark, str(tmp_path / f"f_{mode}"), commit_mode=mode)
    fast.create("t", SCHEMA, ["year"], ["ticker", "date"])
    fast.upsert("t", _rows(spark, b1))
    fast.upsert("t", _rows(spark, b2))
    slow = Catalog(spark, str(tmp_path / f"s_{mode}"), commit_mode=mode)
    slow.create("t", SCHEMA, ["year"], ["ticker", "date"])
    for b in (b1, b2):
        slow.insert("t", _rows(spark, b))
        slow.optimize("t")
    assert _content(fast, "t") == _content(slow, "t")


@pytest.mark.parametrize("mode", ("rename", "filelist"))
def test_marker_invalidated_by_raw_insert(spark, tmp_path, mode, probe_always):
    """A raw insert (no optimize) changes the committed state, so the
    marker must stop validating and the next upsert must run the FULL
    probe — otherwise the raw insert's internal dups would survive."""
    cat = Catalog(spark, str(tmp_path / f"inv_{mode}"), commit_mode=mode)
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"])
    cat.upsert("px", _rows(spark, [("A", D1, 1.0)]))
    assert cat._valid_pk_clean_token("px") is not None
    cat.insert("px", _rows(spark, [("D", D2, 4.0), ("D", D2, 4.5)]))  # raw dups
    assert cat._valid_pk_clean_token("px") is None

    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped
    try:
        cat.upsert("px", _rows(spark, [("E", D1, 9.0)]))
    finally:
        Catalog._optimize_once = orig
    assert calls == ["px"], "stale marker must force the full probe"
    got = _content(cat, "px")
    assert [t for t, *_ in got] == ["A", "D", "E"], got  # D deduped


@pytest.mark.parametrize("mode", MODES)
def test_rival_append_mid_upsert_falls_back(spark, tmp_path, mode, probe_always):
    """A rival batch committed between the pre-insert check and the
    post-insert confirmation must force the full optimize — its rows
    are LWW-deduped against ours, never left as silent duplicates."""
    root = str(tmp_path / f"race_{mode}")
    a = Catalog(spark, root, commit_mode=mode)
    a.create("m", SCHEMA, None, ["ticker", "date"])
    b = Catalog(spark, root, commit_mode=mode)

    real_write = Catalog._write
    fired = {"done": False}
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped

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
        Catalog._optimize_once = orig
    assert calls == ["m"], "the race must force the full optimize"
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
    cat.insert("m", _rows(spark, [("A", D1, 1.0)]))
    assert cat._upsert_base_undisturbed("m", token)
    # a second commit advances the gen: the same token must now refuse
    cat.insert("m", _rows(spark, [("B", D2, 2.0)]))
    assert not cat._upsert_base_undisturbed("m", token)


def test_narrowed_filelist_rival_mid_probe_falls_back(spark, tmp_path, probe_always):
    """Filelist: a rival commit between the undisturbed check and the
    skip decision breaks the expected-generation re-check; the upsert
    must rerun the FULL optimize so the rival's duplicates resolve."""
    root = str(tmp_path / "nr_race")
    a = Catalog(spark, root, commit_mode="filelist")
    a.create("m", SCHEMA, None, ["ticker", "date"])
    a.upsert("m", _rows(spark, [("A", D1, 1.0)]))
    assert a._valid_pk_clean_token("m") is not None
    b = Catalog(spark, root, commit_mode="filelist")

    real_undisturbed = Catalog._upsert_base_undisturbed
    fired = {"done": False}

    def racing_check(self, name, token):
        ok = real_undisturbed(self, name, token)
        # rival lands AFTER the check passes, BEFORE the skip decision
        if self is a and ok and not fired["done"]:
            fired["done"] = True
            b.insert("m", _rows(spark, [("X", D2, 8.0), ("X", D2, 8.5)]))
        return ok

    Catalog._upsert_base_undisturbed = racing_check
    try:
        a.upsert("m", _rows(spark, [("B", D2, 2.0)]))
    finally:
        Catalog._upsert_base_undisturbed = real_undisturbed
    got = _content(a, "m")
    assert [t for t, *_ in got] == ["A", "B", "X"], got  # X deduped


def test_manifest_empty_base_rival_mid_probe_falls_back(spark, tmp_path, probe_always):
    """Manifest mode, empty-base fast path: a rival append landing
    BETWEEN the undisturbed check and the probe's snapshot read used
    to be classified as already-proven-clean 'older rows' and never
    examined (older_known_empty skips the cross-collision probe) — its
    internal duplicates survived while optimize was skipped. The
    post-probe re-check (listing + write-UUID) must now catch it."""
    root = str(tmp_path / "mftoctou")
    a = Catalog(spark, root, commit_mode="manifest")
    a.create("m", SCHEMA, None, ["ticker", "date"])

    real_probe = Catalog._batch_dup_probe
    fired = {"done": False}
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped

    def racing_probe(self, name, base, seq, older_known_empty=False):
        if self is a and not fired["done"]:
            fired["done"] = True
            # constructed NOW so the rival loads the post-insert
            # next_seq and stamps a DIFFERENT ingest seq — its rows
            # read as 'older rows', the exact blind spot
            b = Catalog(spark, root, commit_mode="manifest")
            b.insert("m", _rows(spark, [("X", D2, 8.0), ("X", D2, 8.5)]))
        return real_probe(self, name, base, seq, older_known_empty)

    Catalog._batch_dup_probe = racing_probe
    try:
        a.upsert("m", _rows(spark, [("A", D1, 1.0)]))
    finally:
        Catalog._batch_dup_probe = real_probe
        Catalog._optimize_once = orig
    assert calls == ["m"], "rival mid-probe must force the full optimize"
    got = _content(a, "m")
    assert [t for t, *_ in got] == ["A", "X"], got  # X deduped


BIN_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _bin_rows(spark, data):
    return spark.createDataFrame([(bytearray(k), v) for k, v in data], BIN_SCHEMA)


def test_binary_pk_collect_branch_falls_back(spark, tmp_path, probe_always):
    """Binary PKs collect as bytearray (unhashable — set() throws
    TypeError): the collect branch must fall back to the distributed
    probe instead of erroring out of upsert AFTER the insert committed.
    Clean batches still skip optimize; dup batches still resolve."""
    cat = Catalog(spark, str(tmp_path / "binpk"), commit_mode="rename")
    cat.create("b", BIN_SCHEMA, None, ["key"])
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped
    try:
        cat.upsert("b", _bin_rows(spark, [(b"k1", 1.0), (b"k2", 2.0)]))
        assert calls == [], "clean empty-base binary batch must still skip"
        cat.upsert("b", _bin_rows(spark, [(b"k3", 3.0)]))
        assert calls == [], "clean marker-base binary batch must still skip"
        cat.upsert("b", _bin_rows(spark, [(b"k1", 9.0)]))  # collision
        assert calls == ["b"], "binary collision must run the full optimize"
    finally:
        Catalog._optimize_once = orig
    got = sorted((bytes(r["key"]), r["val"]) for r in cat.table("b").collect())
    assert got == [(b"k1", 9.0), (b"k2", 2.0), (b"k3", 3.0)]


def test_probe_shuffled_join_above_broadcast_cap(spark, tmp_path, probe_always, monkeypatch):
    """With both the collect cap and the broadcast cap forced to 0 the
    probe must take the plain shuffled semi-join and still decide
    correctly — the stability path for backfill-sized batches."""
    monkeypatch.setattr(Catalog, "_PROBE_COLLECT_MAX_BYTES", 0)
    monkeypatch.setattr(Catalog, "_PROBE_BROADCAST_MAX_BYTES", 0)
    cat = Catalog(spark, str(tmp_path / "nobc"), commit_mode="rename")
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"])
    calls: list[str] = []
    orig, wrapped = _counting(calls)
    Catalog._optimize_once = wrapped
    try:
        cat.upsert("px", _rows(spark, [("A", D1, 1.0), ("B", D2, 2.0)]))
        assert calls == [], "clean shuffled-probe upsert must skip optimize"
        cat.upsert("px", _rows(spark, [("C", D1, 3.0)]))
        assert calls == [], "marker-clean shuffled probe must skip"
        cat.upsert("px", _rows(spark, [("A", D1, 7.0)]))  # collision
        assert calls == ["px"]
    finally:
        Catalog._optimize_once = orig
    assert [c for *_, c in _content(cat, "px")] == [7.0, 2.0, 3.0]


@pytest.mark.parametrize("mode", ("rename", "filelist"))
def test_clean_upserts_keep_file_count_bounded(spark, tmp_path, mode, probe_always, monkeypatch):
    """The skip path never rewrites, so N clean upserts used to grow N
    batches of small files without bound. With the compaction routing
    the live file count stays bounded by the threshold (+ one batch)
    and the content is untouched."""
    monkeypatch.setenv("NT_UPSERT_COMPACT_FILES", "6")
    cat = Catalog(spark, str(tmp_path / f"cmp_{mode}"), commit_mode=mode)
    cat.create("px", SCHEMA, None, ["ticker", "date"])
    expected = []
    for i in range(12):
        d = dt.date(2024, 1, 2) + dt.timedelta(days=i)
        cat.upsert("px", _rows(spark, [(f"T{i}", d, float(i))]))
        expected.append((f"T{i}", str(d), d.year, float(i)))
    nf = cat._live_file_count("px")
    assert nf <= 6 + 2, f"file count must stay bounded, got {nf}"
    assert _content(cat, "px") == sorted(expected)


def test_fastpath_keyless_table_not_engaged(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "nk"), commit_mode="rename")
    cat.create("nk", SCHEMA, None, None)
    assert cat._upsert_empty_base_token("nk") is None
    cat.upsert("nk", _rows(spark, [("A", D1, 1.0), ("A", D1, 1.0)]))
    assert cat.table("nk").count() == 2  # no PK: append keeps both
