"""Cross-table as-of join (an operator Spark lacks natively).

``asof_join(left, right)``: for every left row, attach the columns of
the latest right row whose event time is <= the left row's (backward
direction, the default) or the earliest right row whose event time is
>= the left row's (``direction="forward"``), optionally within a
tolerance, matched per ``by`` key(s).

Spark-first shape — NOT a per-key ``merge_asof`` Pandas UDF: tag and
union the two inputs, sort once per key, and carry a single STRUCT of
all right-side columns across the ordered window with
``last(struct, ignorenulls)`` (or ``first`` for forward). One shuffle
on the key, no Python on the data path, and ties resolve exactly like
``pd.merge_asof`` (a right row at the same timestamp matches in both
directions).

Carrying one struct — not each value column independently — matters
for correctness: all right columns always come from the SAME matched
right row, so a legitimate NULL in a value column of the matched row
stays NULL instead of being resurrected from an older right row
(``pd.merge_asof`` semantics). The struct itself is non-null on every
right row, so ``ignorenulls`` skips only left rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__is_left"
_CARRY = "__asof_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    right_prefix: str = "right_",
    direction: str = "backward",
    allow_single_partition: bool = False,
) -> DataFrame:
    """As-of join; right columns come back ``right_``-prefixed.

    ``tolerance_seconds`` nulls the match when the matched right row is
    further away than the allowance (requires ``on`` to be a timestamp
    column). The tolerance is evaluated on the matched row's own
    timestamp, and nulls ALL carried right columns together.

    ``by=None`` is a *global* ordered merge: the window has no
    partition key, so the whole ordered stream passes through a single
    task — the same trap ``zscore`` documents (windows.py:170-174),
    but here the data path (not two scalars) is single-threaded. That
    is fine for driver-sized frames only, so it must be acknowledged
    explicitly with ``allow_single_partition=True``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    if not keys and not allow_single_partition:
        raise ValueError(
            "asof_join with by=None runs the entire ordered merge in ONE task "
            "(empty Window.partitionBy) — a scale-killer on large inputs. Pass "
            "a by key, or allow_single_partition=True for driver-sized frames."
        )
    value_cols = [c for c in right.columns if c != on and c not in keys]
    rtypes = dict(right.dtypes)
    # A right row with a NULL event time cannot be "before" anything —
    # ASC ordering would put it at the partition HEAD, where the
    # carry-forward fabricates it as the match for every left row with
    # no genuine predecessor (pd.merge_asof rejects null keys outright)
    right = right.filter(F.col(on).isNotNull())

    # Right rows carry a struct of (event time + value columns); left
    # rows carry NULL so ignorenulls skips them.
    carry_fields = [F.col(on).alias(on), *[F.col(c).alias(c) for c in value_cols]]
    r_tag = right.select(
        *keys,
        F.col(on),
        F.lit(0).alias(_SIDE),
        F.struct(*carry_fields).alias(_CARRY),
    )
    carry_type = r_tag.schema[_CARRY].dataType.simpleString()
    l_tag = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _CARRY, F.lit(None).cast(carry_type)
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows (side=0) order before left rows on equal
        # timestamps, so an exactly-simultaneous right row is visible
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = unioned.withColumn(_CARRY, F.last(_CARRY, ignorenulls=True).over(w))
    else:
        # forward: left rows (side=1) order before right rows on equal
        # timestamps, so a simultaneous right row is still ahead
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on), F.col(_SIDE).desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried = unioned.withColumn(_CARRY, F.first(_CARRY, ignorenulls=True).over(w))

    out = carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance_seconds is not None:
        l_ts = F.col(on).cast("timestamp_ltz").cast("double")
        r_ts = F.col(_CARRY)[on].cast("timestamp_ltz").cast("double")
        age = (l_ts - r_ts) if direction == "backward" else (r_ts - l_ts)
        out = out.withColumn(
            _CARRY, F.when(age <= float(tolerance_seconds), F.col(_CARRY))
        )
    # Unpack the matched row — every right column from the same row.
    out = out.withColumn(f"{right_prefix}{on}", F.col(_CARRY)[on].cast(rtypes[on]))
    for c in value_cols:
        out = out.withColumn(f"{right_prefix}{c}", F.col(_CARRY)[c])
    return out.drop(_CARRY)
