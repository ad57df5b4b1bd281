"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on by default in this engine's sessions)
handles most cases at runtime; salting is the explicit, planner-
independent fallback when one join key holds a disproportionate share
of a 100 TB fact table — e.g. a null-ish sentinel key or a single
viral entity.

Mechanics: the skewed (large) side gets a deterministic salt in
[0, factor) derived from hashing its whole row id-set; the small side
is replicated ``factor`` times with every salt value. The join key
becomes (key, salt), so the hot key's rows spread over ``factor``
shuffle partitions instead of one. Deterministic: the salt is
``pmod(hash(cols...), factor)`` — no RNG, stable across retries
(important for speculative execution / task re-runs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _cols(names: Sequence[str] | str) -> list[str]:
    return [names] if isinstance(names, str) else list(names)


def with_salt(df: DataFrame, salt_from: Sequence[str] | str, factor: int) -> DataFrame:
    """Deterministic salt column in [0, factor) from the given columns."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*_cols(salt_from)), F.lit(factor)).cast("int")
    )


def replicate_with_salt(df: DataFrame, factor: int) -> DataFrame:
    """Cross the (small) side with every salt value — factor x rows."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias(SALT_COL)
    return df.select("*", salts)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    factor: int = 8,
    salt_from: Sequence[str] | str | None = None,
) -> DataFrame:
    """Equi-join where the large side's hot keys are spread over
    ``factor`` shuffle partitions.

    ``salt_from`` defaults to every large-side column (maximally
    uniform); pass a high-cardinality id column to avoid hashing wide
    rows. Caveat: byte-identical rows hash to the same salt, so a hot
    key made of *duplicate* rows does not spread — give ``salt_from``
    a unique row id in that case (determinism over spread is the
    deliberate default; RNG salts break task-retry consistency).
    Result equals ``large.join(small, on, how)`` for inner and
    left joins (small-side rows are replicated, so right/full
    semantics would double-count unmatched small rows — rejected).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = _cols(on)
    salted_large = with_salt(large, salt_from or large.columns, factor)
    salted_small = replicate_with_salt(small, factor)
    return salted_large.join(salted_small, keys + [SALT_COL], how).drop(SALT_COL)


def salted_count(
    df: DataFrame, keys: Sequence[str] | str, factor: int = 8, count_col: str = "n"
) -> DataFrame:
    """Two-phase count for a skewed groupBy key: partial counts per
    (key, salt), then final sum per key. (Spark's hash aggregate
    already partial-aggregates map-side; this form exists for
    aggregations where the partial state itself would skew, e.g.
    collect-heavy aggs.)"""
    ks = _cols(keys)
    # Salt from row content, NOT monotonically_increasing_id: the
    # latter changes across task retries, which can double- or
    # drop-count rows mid-shuffle. Byte-identical rows share a salt
    # (no spread), which is harmless for counting — partial
    # aggregation already collapses them map-side.
    partial = df.withColumn(SALT_COL, F.pmod(F.hash(*df.columns), F.lit(factor)))
    return (
        partial.groupBy(*ks, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__pc"))
        .groupBy(*ks)
        .agg(F.sum("__pc").alias(count_col))
    )


__all__ = ["with_salt", "replicate_with_salt", "salted_join", "salted_count", "SALT_COL"]
