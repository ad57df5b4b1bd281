"""Programmatic driver-slot rotation (VERDICT r10, Next round #1).

The external verification driver records correctness rows for only the
first ``DRIVER_SLOTS`` entries of ``queries()``.  Through round 10 the
fronting order (``DRIVER_PRIORITY``) was a hand-maintained ledger whose
comment block grew to 75 lines and which round 10 itself overran: 18
queries' freshest driver row fell three rounds stale because late
registrations displaced them from the window.

This module retires the ledger.  The order is *computed* from the
``CORRECTNESS_r*.json`` artifacts the driver itself writes:

1. **never-verified** queries (no green driver row in any artifact),
   in registration order — a new query must earn its first row before
   any regression canary re-runs;
2. **code-changed** queries (``CODE_CHANGED`` — an explicit map of
   query name to the round its semantics changed; fronted only until a
   green row at or after that round lands, then self-cleaning), stalest
   first;
3. everything else by **ascending freshest-green round** (stalest
   first), ties broken by registration order.

Oracle-less registrations (``QuerySpec.oracle is None``) sort last:
the driver records ``err: no_oracle`` for them, so fronting one wastes
a slot (observed: ``t_bpe_tokenize`` round 9).

A *green* row is ``rows_match and schema_match and hash_match is not
False and not err`` — ``hash_match`` may be null for the driver's
weaker rows-only checks.

``scripts/gen_driver_priority.py`` materializes the computed order
into ``plans/_driver_priority.py`` so the fronting list is reviewable
in a diff, together with the **fingerprint of the artifact set it was
computed from** (filename -> sha256). ``tests/test_registry_rotation.py``
recomputes against that RECORDED set — not whatever is on disk — so
registering a query or hand-editing an artifact without regenerating
fails CI, while the driver landing a NEW ``CORRECTNESS_r*.json``
after the commit does not (VERDICT r11 #1: the old
snapshot-equals-disk guard guaranteed a red suite at the start of
every round). A separate non-fatal check warns when newer artifacts
exist so the regeneration still happens early each round.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re

DRIVER_SLOTS = 50

#: Queries whose Spark-side code (or oracle) changed, mapped to the
#: round the change landed.  A name is fronted for re-verification
#: only while its freshest green row PREDATES that round — once the
#: driver writes a row at or after it, the entry self-cleans (so a
#: forgotten removal cannot crowd later rotations).  Add names as
#: operators are touched, then re-run scripts/gen_driver_priority.py.
CODE_CHANGED: dict[str, int] = {
    # round 11: EWMA bucket sizing decoupled from shuffle.partitions
    "w4_ewma_halflife": 11,
    # round 11: HLL skips the corpus-wide distinct when include_exact=False
    "a_hll_distinct": 11,
    # round 11: ks_drift_by_group null-guard for single-group inputs
    "a_ks_drift": 11,
    # round 12: oracle UNNEST widened to +-2 to mirror slack=2 (ADVICE r11)
    "j_band_join": 12,
    # round 12: oracle QUALIFY now partitions by (key, val) (ADVICE r11)
    "j_nearest_balance": 12,
    # round 11: pairwise_corr positional internal aliases
    "a_corr_matrix": 11,
    # round 13: PageRank converted to integer micro-rank arithmetic
    # (closes the registry rule-3 midpoint exposure)
    "g_pagerank_knn": 13,
    # round 13: distributed CC gained edge-list + per-round lineage
    # checkpoints (perf-only; results locally parity-verified)
    "s_lsh_dedup_groups": 13,
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def artifact_files(repo_root: str | None = None) -> list[str]:
    """Sorted basenames of the CORRECTNESS artifacts on disk."""
    root = repo_root or _repo_root()
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )


def artifact_fingerprint(
    repo_root: str | None = None, files: list[str] | None = None
) -> dict[str, str]:
    """filename -> sha256 of contents, for the snapshot's recorded set."""
    root = repo_root or _repo_root()
    out: dict[str, str] = {}
    for name in files if files is not None else artifact_files(root):
        try:
            with open(os.path.join(root, name), "rb") as f:
                out[name] = hashlib.sha256(f.read()).hexdigest()
        except OSError:
            out[name] = "MISSING"
    return out


def freshest_green_rounds(
    repo_root: str | None = None, files: list[str] | None = None
) -> dict[str, int]:
    """Map query name -> latest round with a green driver row.

    ``files`` restricts the scan to a recorded artifact set (snapshot
    reproducibility); default is every artifact on disk.
    """
    root = repo_root or _repo_root()
    out: dict[str, int] = {}
    names = files if files is not None else artifact_files(root)
    for path in (os.path.join(root, n) for n in names):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if green and rnd >= out.get(name, -1):
                out[name] = rnd
    return out


def compute_driver_priority(
    registration_order: list[str],
    has_oracle: dict[str, bool],
    repo_root: str | None = None,
    code_changed: dict[str, int] | None = None,
    slots: int = DRIVER_SLOTS,
    files: list[str] | None = None,
) -> list[str]:
    """Staleness-first fronting order, truncated to the driver window."""
    freshest = freshest_green_rounds(repo_root, files=files)
    changed = CODE_CHANGED if code_changed is None else code_changed

    def key(item: tuple[int, str]) -> tuple[int, int, int]:
        idx, name = item
        if not has_oracle.get(name, True):
            return (3, 0, idx)  # no_oracle: a wasted slot — never front
        if name not in freshest:
            return (0, 0, idx)  # never verified: earn the first row
        if freshest[name] < changed.get(name, -1):
            return (1, freshest[name], idx)  # semantics changed: re-verify
        return (2, freshest[name], idx)  # stalest green first

    ordered = [n for _, n in sorted(enumerate(registration_order), key=key)]
    return ordered[:slots]
