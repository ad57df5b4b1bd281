"""Cross-table as-of join (an operator Spark lacks natively).

``asof_join(left, right)``: for every left row, attach the columns of
the latest right row whose event time is <= the left row's (backward
direction), optionally within a tolerance, matched per ``by`` key.

Spark-first shape — NOT a per-key ``merge_asof`` Pandas UDF: tag and
union the two inputs, sort once per key, and carry the right-side
values forward with ``last(..., ignorenulls)`` over an ordered
window. One shuffle on the key, no Python on the data path, and ties
resolve exactly like ``pd.merge_asof`` (a right row at the same
timestamp matches, because right rows order before left rows on
equal timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    tolerance_seconds: float | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Backward as-of join; right columns come back ``right_``-prefixed.

    ``tolerance_seconds`` nulls the match when the right row is older
    than the allowance (requires ``on`` to be a timestamp column).
    """
    value_cols = [c for c in right.columns if c != on and c != by]
    keys = [by] if by else []

    l_tag = left.withColumn(_SIDE, F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"{right_prefix}{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn(f"{right_prefix}{on}", F.lit(None).cast(dict(right.dtypes)[on]))

    r_tag = right.select(
        *keys,
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in value_cols],
        F.col(on).alias(f"{right_prefix}{on}"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    # right rows (side=0) order before left rows on equal timestamps,
    # so an exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in [*[f"{right_prefix}{c}" for c in value_cols], f"{right_prefix}{on}"]:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance_seconds is not None:
        age = F.col(on).cast("timestamp_ltz").cast("double") - F.col(
            f"{right_prefix}{on}"
        ).cast("timestamp_ltz").cast("double")
        within = age <= float(tolerance_seconds)
        for c in [*[f"{right_prefix}{c}" for c in value_cols], f"{right_prefix}{on}"]:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out
