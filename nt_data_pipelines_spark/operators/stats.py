"""Cross-column statistics: pairwise correlation, time-weighted means,
value-domain Gini, and quantile gating.

Quant-pipeline staples the reference computes with per-frame math —
pairwise factor covariances feed its risk model
(factor_covariances_flow.py:11-29, pivoted to a matrix in
utils/covariance_matrix.py:17-31), and vwap is a first-class market
bar column (etf_prices_flow.py:42) — here as single-pass distributed
aggregations.

Engine-parity notes (plans/registry.py rules): every SUM rides a
decimal cast (rule 1, order-independent), the correlation's final
value passes through sqrt (irrational — rule 2 round-6 is safe), and
the time-weighted mean is an exact rational so it uses the integer
half-up micro form (rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairwise_corr(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols``,
    computed in ONE aggregation pass.

    A naive per-pair ``df.corr(a, b)`` scans the table O(k^2) times;
    this computes all sufficient statistics — n, S_x, and the upper
    product-moment triangle S_xy — as map-side partial aggregates in a
    single scan, then assembles the k*(k-1)/2 coefficients on the
    one-row result:

        corr = (n*S_xy - S_x*S_y)
               / (sqrt(n*S_xx - S_x^2) * sqrt(n*S_yy - S_y^2))

    Sums are decimal (exact, order-independent — registry rule 1);
    the assembly arithmetic is a FIXED order of IEEE double ops so
    both engines produce bit-identical values, and the output rounds
    to 6 (rule 2; sqrt makes a reachable midpoint measure-zero).
    Constant columns yield NULL (0/0), same in both engines.

    Rows with a NULL in ANY of ``cols`` are dropped first (complete-
    case analysis): ``n`` counts rows, while SUM skips NULLs — mixing
    the two silently biases every pair that shares a row with a null
    in a third column.

    Returns (col_x, col_y, n, corr) with pairs in ``cols`` order.
    Scale: one whole-stage-codegen scan, no shuffle beyond the final
    single-row reduce — the 100-TB shape for moment matrices.
    """
    if len(cols) < 2:
        raise ValueError("pairwise_corr needs at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in {cols}")
    df = df.dropna(subset=list(cols))
    # Internal aliases use POSITIONAL indices, not column names: names
    # like ['a', 'b_c', 'a_b', 'c'] would string-join into colliding
    # aliases (__p_a_b_c is both (a, b_c) and (a_b, c)) and fail with
    # an ambiguous-reference AnalysisException (ADVICE r10).
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).cast("decimal(38,6)")).alias(f"__s_{i}"))
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i:], start=i):
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast("decimal(38,8)")).alias(f"__p_{i}_{j}")
            )
    one = df.agg(*aggs)

    def _corr(i: int, j: int):
        n = F.col("__n").cast("double")
        sa = F.col(f"__s_{i}").cast("double")
        sb = F.col(f"__s_{j}").cast("double")
        sab = F.col(f"__p_{i}_{j}").cast("double")
        saa = F.col(f"__p_{i}_{i}").cast("double")
        sbb = F.col(f"__p_{j}_{j}").cast("double")
        num = n * sab - sa * sb
        den = F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        return F.round(num / den, 6) + 0.0

    structs = [
        F.struct(
            F.lit(a).alias("col_x"), F.lit(b).alias("col_y"), _corr(i, j).alias("corr")
        )
        for i, a in enumerate(cols)
        for j, b in enumerate(cols[i + 1 :], start=i + 1)
    ]
    return one.select(
        F.col("__n").alias("n"), F.explode(F.array(*structs)).alias("__pair")
    ).select("__pair.col_x", "__pair.col_y", "n", "__pair.corr")


def time_weighted_mean(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-weighted mean of ``value_col`` over irregular
    observations: each value is weighted by how long it was CURRENT
    (microseconds until the key's next observation; the last
    observation carries no weight — a right-open step function).

    The marks-to-market mean for irregular ticks: an arithmetic mean
    over-weights bursts (ten quotes in one second count ten times),
    the time-weighted form is invariant to re-quoting. Keys with a
    single observation are dropped (no interval to weigh).

    Parity: interval lengths are exact integer microseconds
    (``unix_micros`` = DuckDB ``epoch_us``); value*dt products are
    IEEE-deterministic; their sum rides decimal; and the final
    weighted mean — an exact rational — uses integer half-up micro
    rounding (registry rule 3), never a ROUND that can land on a
    midpoint. The micro numerator rides decimal(38,0) / HUGEINT so a
    years-long key cannot wrap int64 (the corpus_stats ADVICE class).
    CONTRACT: values must be non-negative — the half-up identity uses
    integral division, and Spark's ``DIV`` truncates toward zero while
    DuckDB's ``//`` floors, so a negative weighted sum would disagree
    by one micro-unit between engines (same limitation as the tier's
    other micro means, e.g. logprob bits, which are positive by
    construction).

    Scale: one window sort per key partition (keys are users/symbols
    — many and small), then a same-key partial aggregate. No skew
    risk beyond a genuinely monster key.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt = (F.lead(us).over(w) - us).alias("__dt")
    stepped = df.select(F.col(key_col), F.col(value_col).alias("__v"), dt).filter(
        F.col("__dt").isNotNull()
    )
    return (
        stepped.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("__dt").cast("long").alias("total_us"),
            F.sum(
                (
                    (F.col("__v") * F.col("__dt")).cast("decimal(28,6)") * 1000000
                ).cast("decimal(38,0)")
            ).alias("__micro"),
        )
        .select(
            key_col,
            "n_intervals",
            "total_us",
            (
                F.expr("CAST((2 * __micro + total_us) DIV (2 * total_us) AS DOUBLE)")
                / 1000000.0
            ).alias("twa_value"),
        )
    )


def gini_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group Gini coefficient of a non-negative integer value —
    the inequality audit (0 = every doc the same length, -> 1 = one
    document holds all the mass) that complements the half-mass /
    top-decile cuts of ``source_token_concentration``.

    Exact, and WITHOUT a per-group row sort: the classic rank formula
    ``G = 2*sum(i * x_i) / (n * sum(x)) - (n + 1) / n`` needs ranks
    over rows, but equal values occupy a contiguous rank run, so the
    walk runs over the (group, value) VALUE DOMAIN: a value ``v`` with
    count ``c`` starting after cumulative count ``a`` contributes
    ``v * c * (2a + c + 1)`` to ``2*sum(i*x_i)`` (the arithmetic
    series, folded). The per-group window orders DISTINCT values —
    cardinality of the value domain, not the corpus — so no task ever
    sorts a group's rows; the group-by under it is map-side partial.

    Everything stays integer until one rule-3 half-up micro division:
    ``G = (T - (n+1)*S) / (n*S)`` with ``T = sum(v*c*(2a+c+1))``,
    ``S = sum(v*c)`` riding decimal(38,0) (a 100-TB group's
    rank-weighted mass wraps int64 — the corpus_stats ADVICE class).

    Returns (group, n_rows, total_value, gini).
    """
    c = (
        df.groupBy(F.col(group_col), F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    a = F.sum("__c").over(w) - F.col("__c")
    vd = F.col("__v").cast("decimal(38,0)")
    terms = c.select(
        F.col(group_col),
        F.col("__c"),
        (vd * F.col("__c")).alias("__s"),
        (vd * F.col("__c") * (2 * a + F.col("__c") + 1)).alias("__t"),
    )
    g = terms.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum("__s").alias("__S"),
        F.sum("__t").alias("__T"),
    )
    return g.select(
        group_col,
        "n_rows",
        F.col("__S").cast("long").alias("total_value"),
        (
            F.expr(
                "CAST((2 * (__T - (n_rows + 1) * __S) * 1000000 + n_rows * __S) "
                "DIV (2 * n_rows * __S) AS DOUBLE)"
            )
            / 1000000.0
        ).alias("gini"),
    )


def quantile_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q_num: int,
    q_den: int,
) -> DataFrame:
    """Drop each group's bottom ``q_num/q_den`` value-quantile: keep
    rows whose value is >= the group's discrete q-quantile (the value
    at ascending rank ``ceil(q * n)``; ties at the cutoff are KEPT).

    The per-source quality gate ("drop the shortest quartile of every
    source") — a GLOBAL length cutoff would gut terse-but-clean
    sources while boilerplate-heavy ones sail through; the per-group
    quantile adapts the bar to each group's own distribution.

    Exact and integer-only: the cutoff needs no row sort and no float
    quantile — ``cum >= ceil(q*n)`` for integer ``cum`` is exactly
    ``q_den * cum >= q_num * n``, evaluated on the (group, value)
    VALUE-domain cumulative counts (the gini_by_group / KS pattern),
    so both engines pick the identical cutoff. The filter itself is a
    broadcast join of the groups-sized cutoff table back onto the
    rows — one codegen compare per row at 100 TB.
    """
    if not (0 < q_num < q_den):
        raise ValueError(f"need 0 < q_num < q_den, got {q_num}/{q_den}")
    c = (
        df.groupBy(F.col(group_col), F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = c.groupBy(group_col).agg(F.sum("__c").cast("long").alias("__n"))
    cum = c.select(group_col, "__v", F.sum("__c").over(w).alias("__cum"))
    cuts = (
        cum.join(tot, group_col)
        .filter(F.col("__cum") * q_den >= F.col("__n") * q_num)
        .groupBy(group_col)
        .agg(F.min("__v").alias("__cutoff"))
    )
    return (
        df.join(F.broadcast(cuts), group_col)
        .filter(F.col(value_col) >= F.col("__cutoff"))
        .drop("__cutoff")
    )


def burstiness_by_group(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    bucket: str = "minute",
) -> DataFrame:
    """Per-group Fano factor (variance-to-mean ratio) of per-bucket
    event counts over the group's OBSERVED buckets — the temporal-QA
    signal: ~1 for a Poisson-like stream, >> 1 for bursty scraping /
    batchy upstreams, < 1 for rate-limited (sub-Poisson) feeds.

    Buckets with zero events are excluded (observed-bucket Fano);
    including calendar zeros would need the group's active span as a
    contract. Sample variance (n-1 denominator); groups with a single
    observed bucket are dropped.

    Exactness: counts are integers, so variance and mean are exact
    rationals — fano = (n*Sxx - Sx^2) / ((n-1) * Sx) computes in
    decimal(38,0)/HUGEINT integers and rounds via the rule-3 half-up
    micro division (Cauchy-Schwarz keeps the numerator non-negative).
    Scale: two linear map-side-partial aggregations, no windows.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    counts = df.groupBy(F.col(group_col), b.alias("__b")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    g = counts.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("__c").cast("long").alias("total_events"),
        F.sum(
            (F.col("__c").cast("decimal(38,0)") * F.col("__c")).alias("__sq")
        ).alias("__sxx"),
    )
    return (
        g.filter(F.col("n_buckets") >= 2)
        .select(
            group_col,
            "n_buckets",
            "total_events",
            (
                F.expr(
                    "CAST((2 * (n_buckets * __sxx"
                    "      - CAST(total_events AS DECIMAL(38,0)) * total_events)"
                    "      * 1000000"
                    "      + (n_buckets - 1) * CAST(total_events AS DECIMAL(38,0)))"
                    " DIV (2 * (n_buckets - 1)"
                    "      * CAST(total_events AS DECIMAL(38,0))) AS DOUBLE)"
                )
                / 1000000.0
            ).alias("fano"),
        )
    )
