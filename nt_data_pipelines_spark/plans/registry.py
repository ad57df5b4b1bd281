"""Registry pairing each PySpark query with its DuckDB oracle SQL.

Differential-testing contract (see /root/repo/__spark_entry__.py):
the driver runs the Spark callable and the oracle SQL on the same
parquet tables and compares row count + schema + an order-insensitive
value hash. Two engine-parity rules keep float results bit-stable:

1. **Sums are decimal.** Floating addition is non-associative, and
   Spark/DuckDB sum in different orders, so any `SUM(double)` over
   many rows drifts in the last ulps. Both sides therefore cast to
   `DECIMAL(38, s)` before summing (exact, order-independent) and
   cast the total back to double — bit-identical across engines.
   Helpers: :func:`dsum` (Spark) and :func:`sql_dsum` (SQL).

2. **Algorithmic stats are rounded.** stddev/covar/regr/avg-over-
   window use different internal algorithms per engine (Welford vs
   textbook, different segment-tree orders); both sides round those
   outputs to 6 decimals, far above the ~1e-12 relative noise but far
   below data resolution.

Row-level arithmetic (a/b, a*b, lag ratios) is IEEE-deterministic and
needs no rounding.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


# ---- engine-parity helpers (rule 1 & 2 above) ----

def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent sum: cast to decimal, sum exactly, back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: decimal sum divided by count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"


def r6(col: Column) -> Column:
    return F.round(col, 6)
