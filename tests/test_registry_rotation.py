"""Driver-slot rotation coverage (ADVICE r4).

The external verification driver records correctness rows for only the
first 50 entries of ``queries()``. Rotating DRIVER_PRIORITY is how
every query eventually gets a driver-recorded green — these tests make
rotation gaps loud instead of assumed: every registered query must
either already have a row in some CORRECTNESS_r0*.json artifact or sit
in the upcoming round's 50 driver-checked slots.
"""

from __future__ import annotations

import glob
import json
import os

from nt_data_pipelines_spark.plans.rotation import DRIVER_SLOTS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_names() -> list[str]:
    import __spark_entry__ as E

    return list(E.queries())


def _verified_names() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


def test_every_query_driver_verified_or_fronted():
    names = _registry_names()
    verified = _verified_names()
    fronted = set(names[:DRIVER_SLOTS])
    uncovered = [n for n in names if n not in verified and n not in fronted]
    assert not uncovered, (
        f"rotation gap: {uncovered} have no driver correctness row and are "
        f"not in the next round's {DRIVER_SLOTS} driver-checked slots — "
        "front them in plans/registry.DRIVER_PRIORITY"
    )


def test_never_verified_queries_are_fronted_first():
    """Queries with no driver row yet must occupy the earliest slots —
    a regression canary must never displace a never-verified query."""
    names = _registry_names()
    verified = _verified_names()
    never = [n for n in names if n not in verified]
    head = names[: len(never)] if never else []
    assert set(never) <= set(names[:DRIVER_SLOTS]), never
    # and they come before any already-verified canary in the ordering
    if never:
        last_never = max(names.index(n) for n in never)
        assert last_never < DRIVER_SLOTS


def test_driver_priority_matches_computed_order():
    """The snapshot in plans/_driver_priority.py must equal the order
    computed from its RECORDED artifact set (plans/rotation.py) —
    registering a query or touching rotation.CODE_CHANGED without
    re-running scripts/gen_driver_priority.py fails here instead of
    silently aging the rotation (VERDICT r10 #1). Recomputing against
    the recorded set, not the disk glob, means the driver landing a
    new CORRECTNESS artifact after the commit cannot redden the suite
    (VERDICT r11 #1) — that case only warns (see the next test)."""
    import __spark_entry__  # noqa: F401  (populates REGISTRY)

    from nt_data_pipelines_spark.plans import REGISTRY
    from nt_data_pipelines_spark.plans._driver_priority import ARTIFACT_SET
    from nt_data_pipelines_spark.plans.registry import DRIVER_PRIORITY
    from nt_data_pipelines_spark.plans.rotation import compute_driver_priority

    computed = compute_driver_priority(
        list(REGISTRY),
        {n: s.oracle is not None for n, s in REGISTRY.items()},
        repo_root=REPO,
        files=sorted(ARTIFACT_SET),
    )
    assert DRIVER_PRIORITY == computed, (
        "snapshot is stale — run scripts/gen_driver_priority.py"
    )


def test_recorded_artifacts_unmodified():
    """A recorded artifact whose on-disk sha256 changed means someone
    edited driver output — fatal (the snapshot's inputs are no longer
    what it claims). A missing recorded artifact is equally fatal."""
    from nt_data_pipelines_spark.plans._driver_priority import ARTIFACT_SET
    from nt_data_pipelines_spark.plans.rotation import artifact_fingerprint

    on_disk = artifact_fingerprint(REPO, files=sorted(ARTIFACT_SET))
    diverged = {n for n in ARTIFACT_SET if on_disk.get(n) != ARTIFACT_SET[n]}
    assert not diverged, (
        f"recorded CORRECTNESS artifacts changed on disk: {sorted(diverged)} — "
        "driver artifacts are append-only; if intentional, re-run "
        "scripts/gen_driver_priority.py"
    )


# Artifacts on disk that postdate the snapshot's recorded set are the
# EXPECTED state mid-round (the driver writes after the commit) — the
# regenerate notice is emitted by conftest.pytest_terminal_summary,
# not a test: a warning-based test would turn fatal under a future
# `filterwarnings = error` hardening, recreating the red-suite-every-
# round coupling the recorded-set design eliminates (review r12).


def test_stale_cohort_fully_fronted():
    """Rolling acceptance bar (VERDICT r10 #1 / r11): relative to the
    snapshot's recorded artifact set, every query whose freshest green
    row is >= 3 rounds older than the newest recorded round must sit
    inside the driver's slots — staleness stays structurally bounded
    as rounds advance."""
    import re as _re

    from nt_data_pipelines_spark.plans._driver_priority import ARTIFACT_SET
    from nt_data_pipelines_spark.plans.rotation import freshest_green_rounds

    rounds = [
        int(m.group(1))
        for m in (_re.search(r"r(\d+)", n) for n in ARTIFACT_SET)
        if m
    ]
    bar = max(rounds) - 2  # freshest < bar means >= 3 rounds stale
    names = _registry_names()
    fronted = set(names[:DRIVER_SLOTS])
    freshest = freshest_green_rounds(REPO, files=sorted(ARTIFACT_SET))
    overdue = [n for n, r in freshest.items() if r < bar and n not in fronted]
    assert not overdue, (
        f"pre-r{bar}-stale queries outside the driver window: {overdue}"
    )


def test_driver_priority_names_exist():
    from nt_data_pipelines_spark.plans.registry import DRIVER_PRIORITY, REGISTRY

    import __spark_entry__  # noqa: F401  (populates REGISTRY)

    unknown = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not unknown, f"DRIVER_PRIORITY names not in registry: {unknown}"
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY)), "duplicates"
    # entries past the driver's 50-slot window silently never get a
    # row — a 51-entry list once shipped believing it "filled to 50"
    assert len(DRIVER_PRIORITY) <= DRIVER_SLOTS, (
        f"{len(DRIVER_PRIORITY)} entries for {DRIVER_SLOTS} driver slots: "
        f"overflow {DRIVER_PRIORITY[DRIVER_SLOTS:]}"
    )


def test_no_oracle_less_query_occupies_a_driver_slot():
    """An oracle-less registration in the window records err:no_oracle
    — a wasted slot (observed round 9). rotation sorts them last; pin
    it on the actual queries() ordering the driver consumes."""
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    wasted = [n for n in _registry_names()[:DRIVER_SLOTS] if n not in oracles]
    assert not wasted, f"oracle-less queries inside the driver window: {wasted}"


def test_new_artifact_after_snapshot_does_not_change_recorded_order(tmp_path):
    """The r11 failure mode, simulated end-to-end: a snapshot computed
    from artifact set A must recompute IDENTICALLY after the driver
    drops a new artifact on disk (recorded-set restriction), while the
    all-artifacts computation legitimately differs — that difference
    is what the non-fatal warning flags, never the equality guard."""
    import json as _json

    from nt_data_pipelines_spark.plans.rotation import (
        artifact_files,
        artifact_fingerprint,
        compute_driver_priority,
    )

    names = [f"q{i:02d}" for i in range(8)]
    has_oracle = {n: True for n in names}

    def write_artifact(rnd: int, green: list[str]) -> None:
        rows = {
            n: {"rows_match": True, "schema_match": True, "hash_match": True}
            for n in green
        }
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(_json.dumps(rows))

    write_artifact(1, names[:4])
    write_artifact(2, names[4:])
    recorded = artifact_files(str(tmp_path))
    fp_before = artifact_fingerprint(str(tmp_path), files=recorded)
    order_before = compute_driver_priority(
        names, has_oracle, repo_root=str(tmp_path), code_changed={}, files=recorded
    )

    # driver lands round 3 AFTER the snapshot commit
    write_artifact(3, names[:4])

    order_recorded = compute_driver_priority(
        names, has_oracle, repo_root=str(tmp_path), code_changed={}, files=recorded
    )
    assert order_recorded == order_before  # the equality guard stays green
    assert artifact_fingerprint(str(tmp_path), files=recorded) == fp_before
    newer = set(artifact_files(str(tmp_path))) - set(recorded)
    assert newer == {"CORRECTNESS_r03.json"}  # what the warning reports
    order_all = compute_driver_priority(
        names, has_oracle, repo_root=str(tmp_path), code_changed={}, files=None
    )
    assert order_all != order_before  # regeneration genuinely reorders

    # a recorded artifact EDITED on disk is the fatal case
    (tmp_path / "CORRECTNESS_r01.json").write_text(_json.dumps({}))
    fp_after = artifact_fingerprint(str(tmp_path), files=recorded)
    assert fp_after["CORRECTNESS_r01.json"] != fp_before["CORRECTNESS_r01.json"]


def test_compute_priority_ordering_properties_random():
    """Property check on the pure ordering function: for arbitrary
    artifact states, never-verified precede code-changed precede
    stale-green, staleness is non-increasing within the green tier,
    and oracle-less names never enter the window."""
    import random

    from nt_data_pipelines_spark.plans.rotation import compute_driver_priority

    rng = random.Random(7)
    for _ in range(25):
        names = [f"q{i:03d}" for i in range(rng.randint(5, 120))]
        has_oracle = {n: rng.random() > 0.05 for n in names}
        freshest = {n: rng.randint(1, 10) for n in names if rng.random() > 0.2}
        changed = {
            n: freshest[n] + 1
            for n in rng.sample(sorted(freshest), k=min(4, len(freshest)))
        }
        slots = rng.choice([5, 20, 50])

        import nt_data_pipelines_spark.plans.rotation as R

        orig = R.freshest_green_rounds
        R.freshest_green_rounds = lambda _=None, files=None: dict(freshest)
        try:
            out = compute_driver_priority(
                names, has_oracle, code_changed=changed, slots=slots
            )
        finally:
            R.freshest_green_rounds = orig

        assert len(out) == min(slots, len(names))
        assert len(set(out)) == len(out)

        def tier(n):
            if not has_oracle[n]:
                return 3
            if n not in freshest:
                return 0
            if freshest[n] < changed.get(n, -1):
                return 1
            return 2

        tiers = [tier(n) for n in out]
        assert tiers == sorted(tiers), "tier ordering violated"
        greens = [freshest[n] for n in out if tier(n) == 2]
        assert greens == sorted(greens), "staleness ordering violated"
        # an oracle-less name may appear only if every eligible name fit
        eligible = sum(1 for n in names if tier(n) < 3)
        if eligible >= slots:
            assert all(tier(n) < 3 for n in out)
