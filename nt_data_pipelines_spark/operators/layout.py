"""Multi-dimensional data layout for file skipping (z-order).

Parquet data skipping is only as good as the correlation between file
boundaries and predicate columns. A single-column sort clusters one
dimension perfectly and the others not at all; the z-order (Morton)
curve interleaves the bits of several quantized dimensions so files
cover small HYPER-rectangles — a range predicate on ANY of the
z-ordered columns then prunes most files at listing time (the same
idea as Delta's OPTIMIZE ZORDER BY).

Scale shape (100 TB): the per-column min/max quantization bounds are
one tiny aggregate broadcast back onto the scan; the key itself is
pure integer bit math in codegen; the layout write is one
repartitionByRange shuffle (range boundaries sampled by Spark) whose
cost is amortized over every future pruned scan — identical to the
cost profile of a plain sorted write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY = "_zkey"


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits - 1].

    Spelled exactly like the histogram operator (explicit FLOOR +
    upper-edge clamp) so any engine reproduces the cell ids
    bit-for-bit; a degenerate dimension (lo == hi) collapses to 0.
    """
    cells = (1 << bits) - 1
    step = (hi - lo) / F.lit(float(1 << bits))
    q = F.least(
        F.floor((col.cast("double") - lo) / step).cast("long"), F.lit(cells).cast("long")
    )
    return F.when(hi == lo, F.lit(0).cast("long")).otherwise(q)


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position
    ``b * len(cols) + i`` of the key. Pure long shifts/masks — codegen
    on the JVM, plain operators in ANSI SQL."""
    n = len(cols)
    parts = []
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def interleave_bits_sql(cols: list[str], bits: int) -> str:
    """The identical interleave as ANSI/DuckDB SQL (oracle side)."""
    n = len(cols)
    parts = []
    for i, c in enumerate(cols):
        for b in range(bits):
            parts.append(f"((({c} >> {b}) & 1) << {b * n + i})")
    return " | ".join(parts)


def add_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_col: str = ZKEY
) -> DataFrame:
    """Append the z-order key for ``cols`` (quantized to ``bits`` bits
    each from their global min/max).

    One tiny bounds aggregate is broadcast back; everything else is
    per-row integer math. ``bits * len(cols)`` must fit a long's 63
    usable bits.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds a 63-bit key")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    quantized = [
        quantize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits) for c in cols
    ]
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(key_col, interleave_bits(quantized, bits))
        .drop(*drop)
    )


def zorder_clustered(
    df: DataFrame, cols: list[str], num_files: int = 16, bits: int = 8
) -> DataFrame:
    """``df`` re-clustered along the z-order curve: range-partitioned
    into ``num_files`` tasks with a within-partition sort on the key
    (then dropped — derivable, and storing it would only widen scans).
    The single clustering recipe behind :func:`write_zordered` and
    ``Catalog.optimize_layout``."""
    keyed = add_zorder_key(df, cols, bits=bits)
    return (
        keyed.repartitionByRange(num_files, ZKEY)
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered along the z-order curve.

    repartitionByRange on the key gives every output file a DISJOINT
    key interval (range boundaries are exact partition bounds), and
    the within-partition sort keeps parquet row-group min/max stats
    tight — a reader filtering on any z-ordered column prunes files
    whose hyper-rectangle misses the predicate.
    """
    zorder_clustered(df, cols, num_files, bits).write.mode("overwrite").parquet(path)
