"""Approximate sketches: the sub-linear tier for 100 TB profiling.

Exact distinct counts and exact quantiles are full-shuffle operations
(`a4_distinct`, `a_exact_quantiles` are the oracle-paired exact
tiers). At corpus scale the first question — how many distinct users/
documents/keys, what does the value distribution look like — must be
answerable WITHOUT shuffling the corpus: HyperLogLog++ and the
Greenwald-Khanna quantile sketch aggregate in one map-side pass with
bounded per-partition state that merges associatively.

Sketch outputs are engine- and partitioning-dependent, so these are
deliberately NOT oracle-paired registry queries; tests bound their
error against the exact tier (HLL++ rsd default 5%, GK within the
requested relative rank error).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    group_by: Sequence[str] | str | None,
    cols: Sequence[str] | str,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct cardinality, optionally per group.

    One aggregation, map-side partial: every partition folds its rows
    into a fixed-size HLL register set and only the registers shuffle
    — cost is O(groups x register_bytes), independent of row count.
    ``rsd`` is the target relative standard deviation (Spark default
    0.05 ≈ 1.6 KB of registers per group).
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"approx_distinct_{c}") for c in cols
    ]
    if group_by is None:
        return df.agg(*aggs)
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    return df.groupBy(*keys).agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    group_by: Sequence[str] | str | None,
    value_col: str | Column,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
    out_col: str = "quantiles",
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles, optionally per group.

    ``accuracy`` bounds the relative rank error at 1/accuracy; the
    per-partition summary is O(accuracy) regardless of row count, so
    the shuffle moves summaries, never values. The exact path
    (`F.percentile`) is the verify tier at test scale.
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    agg = F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    ).alias(out_col)
    if group_by is None:
        return df.agg(agg)
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    return df.groupBy(*keys).agg(agg)


def distinct_sketch_error(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """Side-by-side exact vs HLL++ count with the realized error —
    the profiling query a user runs once to pick an rsd."""
    return df.agg(
        F.countDistinct(col).alias("exact"),
        F.approx_count_distinct(col, rsd=rsd).alias("approx"),
    ).select(
        "exact",
        "approx",
        (F.abs(F.col("approx") - F.col("exact")) / F.col("exact")).alias("rel_error"),
    )


def cms_counts(
    df: DataFrame,
    col: str,
    values: list,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
):
    """Count-min-sketch frequency estimates for specific values.

    The point-query sibling of :func:`heavy_hitters`: Misra-Gries
    finds WHICH values are frequent; CMS answers "how often does THIS
    value occur" from a fixed-size summary. Spark's built-in sketch
    aggregates map-side and merges — rows never shuffle, the summary
    is width x depth counters regardless of cardinality, and estimates
    obey ``true <= est <= true + eps * n`` with probability
    ``confidence`` (one-sided overestimation only: hash collisions
    add, never subtract). Returns ``[(value, estimate)]`` plus the
    sketch for reuse.
    """
    if not values:
        raise ValueError("values must be non-empty")
    blob = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("__s")
    ).first()["__s"]
    jvm = df.sparkSession._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(blob))
    )
    return [(v, sketch.estimateCount(v)) for v in values], sketch


def kll_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = 200,
) -> DataFrame:
    """Mergeable quantile estimates via the KLL sketch.

    The STREAMING-grade sibling of the GK tier (:func:`approx_quantiles`):
    KLL summaries merge associatively, so per-partition/per-batch
    sketches combine without revisiting rows — the property an
    incremental percentile dashboard needs. One row per probability:
    (p, estimate). Accuracy is rank-error ~O(1/k) with k=200 giving
    ~1% rank error (Datasketches defaults).
    """
    if not probabilities:
        raise ValueError("probabilities must be non-empty")
    agg = df.agg(F.kll_sketch_agg_double(F.col(col), F.lit(k)).alias("__s"))
    rows = [
        F.struct(
            F.lit(float(p)).alias("p"),
            F.kll_sketch_get_quantile_double(F.col("__s"), F.lit(float(p))).alias("q"),
        )
        for p in probabilities
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.p", "r.q")


def segment_overlap(
    df: DataFrame,
    segment_col: str,
    id_col: str,
    seg_a,
    seg_b,
) -> dict:
    """Approximate audience overlap via theta sketches.

    Distinct-id cardinalities for two segments AND their union /
    intersection — the question plain HLL cannot answer (HLL unions
    but never intersects). Each segment aggregates into one mergeable
    theta sketch map-side; the driver holds only the two summaries.
    Returns {a, b, union, intersection} estimates (doubles).
    """
    sk = (
        df.filter(F.col(segment_col).isin([seg_a, seg_b]))
        .groupBy(segment_col)
        .agg(F.theta_sketch_agg(F.col(id_col)).alias("__s"))
    )
    per = {r[segment_col]: r["__s"] for r in sk.collect()}
    if seg_a not in per or seg_b not in per:
        missing = [s for s in (seg_a, seg_b) if s not in per]
        raise ValueError(f"segment(s) {missing} have no rows")
    spark = df.sparkSession
    est = spark.createDataFrame(
        [(per[seg_a], per[seg_b])], "sa binary, sb binary"
    ).select(
        F.theta_sketch_estimate("sa").alias("a"),
        F.theta_sketch_estimate("sb").alias("b"),
        F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("u"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias("i"),
    ).first()
    return {
        "a": float(est["a"]),
        "b": float(est["b"]),
        "union": float(est["u"]),
        "intersection": float(est["i"]),
    }


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    candidate_capacity: int | None = None,
) -> DataFrame:
    """Top-k frequent values via Misra-Gries candidates + exact recount.

    Two linear passes, no full shuffle of the value column:

    1. **Candidate pass** — every partition runs a Misra-Gries summary
       with ``candidate_capacity`` counters (default ``8*k``) over its
       rows inside ``mapInPandas`` (the generator holds one dict per
       partition across Arrow batches). MG guarantees any value with
       global frequency > n/capacity survives in at least one
       partition's summary, so the union of per-partition candidates
       is a superset of the true top-(capacity) — only
       O(partitions x capacity) candidate rows ever shuffle.
    2. **Verify pass** — exact counts for the (tiny, broadcast)
       candidate set via a filtered groupBy, then top-k with a
       deterministic count-desc, value-asc order.

    The result is EXACT top-k whenever the k-th item's frequency
    exceeds n/capacity (the MG guarantee); raise
    ``candidate_capacity`` for flatter distributions. This is the
    vocabulary/domain-frequency profiler at 100 TB: pass 1 moves
    summaries, pass 2 scans once more but aggregates only candidate
    matches map-side.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cap = candidate_capacity or 8 * k
    if cap < k:
        raise ValueError(f"candidate_capacity must be >= k, got {cap} < {k}")

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col].dropna():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    # decrement-all step (dict rebuild, amortized O(1)/row)
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({col: list(counters.keys())})

    field = df.schema[col]
    cand_df = df.select(col).mapInPandas(
        mg_partition, schema=f"{col} {field.dataType.simpleString()}"
    )
    candidates = cand_df.distinct()
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
        .limit(k)
    )


# ---- deterministic (oracle-pairable) HyperLogLog ----

# alpha_m bias constants from Flajolet et al. 2007; for m >= 128 the
# closed form 0.7213 / (1 + 1.079 / m) applies.
_HLL_ALPHA_SMALL = {16: 0.673, 32: 0.697, 64: 0.709}
# Hash layout: md5(value) hex; the first p/4 hex chars pick the
# register, the NEXT 14 hex chars (56 bits) feed the leading-zero
# rank, so ranks live in 1..57 and 2^(57 - rank) is always an int64.
_HLL_RANK_BITS = 56


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA_SMALL.get(m, 0.7213 / (1 + 1.079 / m))


def deterministic_hll_distinct(
    df: DataFrame,
    group_by: Sequence[str] | str | None,
    col: str,
    p: int = 8,
    include_exact: bool = False,
) -> DataFrame:
    """HyperLogLog distinct estimate that is BIT-IDENTICAL across
    engines — the oracle-pairable sibling of :func:`approx_distinct`.

    Spark's builtin HLL++ (and DuckDB's approx_count_distinct) hash
    with engine-private functions, so their estimates can never be
    compared exactly. This variant derives registers from md5 — a
    function both engines (and any SQL engine) expose with identical
    output — and keeps every arithmetic step either integer-exact or
    a single IEEE op on identical operands:

    - register  = first p/4 hex chars of md5(value), 2^p registers;
    - rank      = leading zeros in the next 56 hash bits, + 1
                  (via ``57 - LENGTH(bin(x))`` — both engines print
                  bin() without leading zeros);
    - the harmonic sum rides as an exact integer: each register
      contributes ``2^(57 - max_rank)`` (int64), empty registers
      ``2^57``, summed as decimal(38,0) — no float-accumulation
      order dependence;
    - estimate  = (alpha_m * m^2 * 2^57) / S with the numerator
      pre-folded into ONE double literal, so the whole float path is
      a single division of identical operands — bit-identical;
    - the small-range linear-counting correction (est <= 2.5m with
      empty registers) is ``m * ln(m / V)`` rounded to 6 decimals
      (registry rule 2/3: ln of a rational > 1 is irrational, so the
      round-6 midpoint is unreachable).

    Scale shape: one (group, register) max shuffle whose cardinality
    is groups x 2^p regardless of row count, then a groups-sized
    roll-up — the sketch property, with none of the engine lock-in.
    ``include_exact`` adds the exact distinct count + realized
    relative error (the calibration tier; full-shuffle, test-scale
    only).
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in [4, 16], got {p}")
    m = 1 << p
    hex_chars = p // 4
    keys = (
        [] if group_by is None
        else [group_by] if isinstance(group_by, str) else list(group_by)
    )
    rank_max = _HLL_RANK_BITS + 1  # 57
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("int")
    x = F.conv(F.substring(h, hex_chars + 1, 14), 16, 10).cast("bigint")
    rank = F.when(x == 0, F.lit(rank_max)).otherwise(
        F.lit(rank_max) - F.length(F.bin(x))
    )
    vals = df.select(*keys, F.col(col)).where(F.col(col).isNotNull())
    # The register MAX is duplicate-insensitive, so raw rows feed the
    # aggregation directly — the only corpus-sized stage is one linear
    # (group, register) max shuffle with map-side partial aggregation,
    # which is what makes the "cardinality is groups x 2^p regardless
    # of row count" claim true (ADVICE r10: the previous .distinct()
    # here was an unnecessary corpus-sized shuffle). The exact-distinct
    # frame is computed only on the include_exact calibration path.
    regs = vals.select(*keys, reg.alias("__reg"), rank.alias("__rank")).groupBy(
        *keys, "__reg"
    ).agg(F.max("__rank").alias("__m"))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rank_max} - __m)")
    per_group = regs.groupBy(*keys).agg(
        F.sum(term.cast("decimal(38,0)")).alias("__s_obs"),
        F.count(F.lit(1)).alias("__n_obs"),
    )
    empty_term = F.lit(1 << rank_max).cast("decimal(38,0)")
    s_total = (
        F.col("__s_obs") + (F.lit(m) - F.col("__n_obs")).cast("decimal(38,0)") * empty_term
    )
    numerator = _hll_alpha(m) * m * m * float(1 << rank_max)
    raw = F.lit(numerator) / s_total.cast("double")
    v_empty = (F.lit(m) - F.col("__n_obs")).cast("int")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty), 6),
    ).otherwise(raw)
    out = per_group.select(
        *keys,
        v_empty.alias("empty_registers"),
        raw.alias("hll_raw"),
        corrected.alias("hll_estimate"),
    )
    if include_exact:
        exact = vals.distinct().groupBy(*keys).agg(
            F.count(F.lit(1)).alias("exact_distinct")
        )
        out = (
            out.join(exact, keys) if keys else out.crossJoin(exact)
        ).withColumn(
            "rel_error",
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
        )
    return out


def deterministic_cms_estimates(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
    k: int = 20,
) -> DataFrame:
    """Count-min-sketch frequency estimates that are BIT-IDENTICAL
    across engines — the oracle-pairable sibling of :func:`cms_counts`
    (whose Spark-builtin sketch hashes privately and can never be
    compared to another engine's).

    The sketch is ``depth`` rows of ``width`` counters; item ``v``
    maps in row ``r`` to cell ``md5('r:' || v)[:8 hex] mod width``
    (md5 keyed by the row index — independent-enough hash functions
    from one primitive every engine exposes). A cell holds the sum of
    counts of every item hashing into it; the estimate is the MIN over
    the item's ``depth`` cells — one-sided: collisions only ADD, so
    ``exact <= estimate <= exact + n/width`` in expectation per the
    Cormode-Muthukrishnan bound.

    Returned frame: the EXACT top-``k`` items (count desc, value asc —
    a total order) with ``exact_count``, the sketch's ``cms_count``,
    and the realized ``overestimate`` — the calibration pattern (the
    estimate itself is driver-verified, not just bounded by a test).

    Scale shape: one (value) count shuffle (map-side partial), then a
    ``depth x width``-row cell aggregate — fixed size regardless of
    cardinality — broadcast back to the top-k probes. The exact
    top-k is a distributed TakeOrdered; at 100 TB the count shuffle is
    the only corpus-sized stage, and it is linear.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        df.select(F.col(col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )

    def _cell(r: int) -> Column:
        h = F.md5(F.concat(F.lit(f"{r}:"), F.col("__v")))
        return F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
        )

    hashes = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cell(r).alias("cell"))
            for r in range(depth)
        ]
    )
    cells = (
        counts.select(F.explode(hashes).alias("__h"), "exact_count")
        .groupBy(F.col("__h.r").alias("r"), F.col("__h.cell").alias("cell"))
        .agg(F.sum("exact_count").cast("long").alias("cell_count"))
    )
    top = counts.orderBy(F.desc("exact_count"), F.asc("__v")).limit(k)
    probes = top.select("__v", "exact_count", F.explode(hashes).alias("__h")).select(
        "__v", "exact_count", F.col("__h.r").alias("r"), F.col("__h.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(cells), ["r", "cell"])
        .groupBy("__v", "exact_count")
        .agg(F.min("cell_count").alias("cms_count"))
        .select(
            F.col("__v").alias("value"),
            "exact_count",
            "cms_count",
            (F.col("cms_count") - F.col("exact_count")).cast("long").alias(
                "overestimate"
            ),
        )
    )
