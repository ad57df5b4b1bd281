"""DAG runner: the reference's nightly flow graph over the catalog.

Reproduces ``daily_flow`` / the backfill entry points
(__main__.py:22-49): twelve stages run in dependency order, each
reading its inputs from catalog tables and upserting its outputs —
the same read -> transform -> create/insert/optimize lifecycle as the
reference (SURVEY.md §3.1). Cron scheduling and failure webhooks are
deployment concerns; ``on_failure`` is a pluggable callback.

The backfill here is the full-history variant (T5). Daily increments
reuse the same stage functions with the T2 freshness gate and a T3
tail-window slice (callers filter ``date == end`` before upserting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog
from nt_data_pipelines_spark.config import FACTORS
from nt_data_pipelines_spark.pipelines import (
    calculate_alphas,
    calculate_benchmark_returns,
    calculate_benchmark_weights,
    calculate_scores,
    calculate_signals,
    compute_portfolio_weights,
    compute_returns,
    estimate_factor_model,
)
from nt_data_pipelines_spark.pipelines.betas import estimate_betas
from nt_data_pipelines_spark.pipelines.covariances import estimate_factor_covariances
from nt_data_pipelines_spark.pipelines.factor_model import clean_factor_loadings, clean_idio_vol

_D = T.DoubleType()
_S = T.StringType()
_DT = T.DateType()
_I = T.IntegerType()


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a relation consumed by more than one downstream
    upsert — localCheckpoint(eager=False): computed on first touch,
    persisted MEMORY_AND_DISK, logical plan truncated (no
    InMemoryRelation re-planning under AQE; same idiom and
    fault-tolerance trade as pipelines/corpus.CurationConfig.
    stage_boundary). Blocks are released with the session; the flow
    runs once per schedule tick, so no explicit unpersist. Mechanism
    switchable for cluster deployments via ``NT_PIN_MODE``
    (nt_data_pipelines_spark.pin)."""
    from nt_data_pipelines_spark.pin import pin

    return pin(df)


def _fire_failure_hook(on_failure, exc: BaseException) -> None:
    """Deliver the flow's exception to the on_failure hook.

    New-style hooks (e.g. summary.create_failure_handler) take the
    exception and can post type/message/traceback (reference
    slack_failure_handler.py:11-44 formats exactly that); legacy
    zero-argument callbacks still work. Hook signature is inspected,
    not probed by trial call — a TypeError raised INSIDE the hook must
    surface as a hook bug, not silently retry with no arguments."""
    if on_failure is None:
        return
    import inspect

    try:
        params = [
            pr
            for pr in inspect.signature(on_failure).parameters.values()
            if pr.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
                inspect.Parameter.VAR_POSITIONAL,
            )
            and pr.default is inspect.Parameter.empty
        ]
        takes_exc = len(params) >= 1
    except (TypeError, ValueError):  # builtins / C callables
        takes_exc = False
    if takes_exc:
        on_failure(exc)
    else:
        on_failure()


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


PRICE_SCHEMA = _st(
    ("ticker", _S), ("date", _DT), ("year", _I), ("open", _D), ("high", _D), ("low", _D),
    ("close", _D), ("volume", _D), ("trade_count", _D), ("vwap", _D),
)
RETURN_SCHEMA = _st(("ticker", _S), ("date", _DT), ("year", _I), ("return", _D))

# Table registry: schema / partition / PK per SURVEY.md §1.2.
TABLES: dict[str, dict] = {
    "calendar": {"schema": _st(("date", _DT)), "partition": None, "pk": ["date"]},
    "universe": {
        "schema": _st(("date", _DT), ("year", _I), ("ticker", _S)),
        "partition": ["year"], "pk": ["date", "ticker"],
    },
    # year-partitioned like the reference (stock_prices_flow.py:112-113,
    # etf_prices_flow.py:101): date-ranged scans prune whole years
    "stock_prices": {"schema": PRICE_SCHEMA, "partition": ["year"], "pk": ["date", "ticker"]},
    "etf_prices": {"schema": PRICE_SCHEMA, "partition": ["year"], "pk": ["date", "ticker"]},
    "stock_returns": {"schema": RETURN_SCHEMA, "partition": ["year"], "pk": ["ticker", "date"]},
    "etf_returns": {"schema": RETURN_SCHEMA, "partition": ["year"], "pk": ["ticker", "date"]},
    "factor_loadings": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("factor", _S), ("loading", _D)),
        "partition": ["year"], "pk": ["date", "ticker", "factor"],
    },
    "idio_vol": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("idio_vol", _D)),
        "partition": ["year"], "pk": ["date", "ticker"],
    },
    "factor_covariances": {
        "schema": _st(("date", _DT), ("year", _I), ("factor_1", _S), ("factor_2", _S), ("covariance", _D)),
        "partition": ["year"], "pk": ["date", "factor_1", "factor_2"],
    },
    "signals": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("signal", _S), ("value", _D)),
        "partition": ["year"], "pk": ["ticker", "date", "signal"],
    },
    "scores": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("signal", _S), ("score", _D)),
        "partition": ["year"], "pk": ["ticker", "date", "signal"],
    },
    "alphas": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("signal", _S), ("alpha", _D)),
        "partition": ["year"], "pk": ["ticker", "date", "signal"],
    },
    "benchmark_weights": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("weight", _D)),
        "partition": ["year"], "pk": ["date", "ticker"],
    },
    "benchmark_returns": {
        "schema": _st(("date", _DT), ("return", _D)), "partition": None, "pk": ["date"],
    },
    "betas": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("historical_beta", _D), ("predicted_beta", _D)),
        "partition": ["year"], "pk": ["ticker", "date"],
    },
    "portfolio_weights": {
        "schema": _st(("ticker", _S), ("date", _DT), ("year", _I), ("weight", _D)),
        "partition": ["year"], "pk": ["date", "ticker"],
    },
    "portfolio_metrics": {
        "schema": _st(("date", _DT), ("lambda", _D), ("active_risk", _D)),
        "partition": None, "pk": ["date"],
    },
    # per-minute equity curve from the broker (portfolio_history_flow.py:74-83)
    "portfolio_history": {
        "schema": _st(("timestamp", T.TimestampType()), ("equity", _D)),
        "partition": None, "pk": ["timestamp"],
    },
}


def ingest_portfolio_history(spark: SparkSession, cat: Catalog, broker) -> None:
    """S11 ingestion: broker equity curve -> PK-upserted table
    (reference: portfolio_history_flow.py:44-86)."""
    from nt_data_pipelines_spark.sources.broker import load_portfolio_history

    cat.upsert("portfolio_history", load_portfolio_history(spark, broker))


def ensure_tables(cat: Catalog) -> None:
    for name, spec in TABLES.items():
        cat.create(name, spec["schema"], spec["partition"], spec["pk"], mode="skip")


def backfill_flow(
    spark: SparkSession,
    cat: Catalog,
    window: int,
    half_life: float,
    on_failure=None,
) -> None:
    """Run the full DAG from the ingested price/universe tables.

    Expects ``calendar``, ``universe``, ``stock_prices``, ``etf_prices``
    already loaded (the ingestion flows S6-S9 write them). Every stage
    upserts, so reruns converge (T4).
    """
    try:
        # Empty-result guard — the reference's flows raise rather than
        # silently writing nothing (reversal_flow.py:189-190).
        for src in ("stock_prices", "etf_prices"):
            if cat.table(src).limit(1).count() == 0:
                raise ValueError(f"No values found: {src} is empty")
        stock_returns = compute_returns(cat.table("stock_prices"))
        cat.upsert("stock_returns", stock_returns)
        etf_returns = compute_returns(cat.table("etf_prices"))
        cat.upsert("etf_returns", etf_returns)

        stock_returns = cat.table("stock_returns")
        etf_returns = cat.table("etf_returns")

        # pinned: BOTH the loadings and idio-vol upserts materialize
        # `fitted` — unpinned, the rolling-OLS grouped-map kernel (the
        # flow's most expensive stage) executes twice
        fitted = _pin(estimate_factor_model(stock_returns, etf_returns, FACTORS, window))
        cat.upsert(
            "factor_loadings", clean_factor_loadings(fitted, FACTORS, half_life)
        )
        cat.upsert("idio_vol", clean_idio_vol(fitted, window, half_life))
        cat.upsert(
            "factor_covariances",
            estimate_factor_covariances(etf_returns, FACTORS, window, half_life),
        )

        signals = calculate_signals(stock_returns)
        cat.upsert("signals", signals)
        scores = calculate_scores(cat.table("signals"))
        cat.upsert("scores", scores)
        cat.upsert("alphas", calculate_alphas(cat.table("scores"), cat.table("idio_vol")))

        # pinned: the weights and returns upserts both read uni_ret —
        # unpinned, the full-panel universe x returns join runs twice
        uni_ret = (
            cat.table("universe")
            .join(stock_returns.select("date", "ticker", "return"), ["date", "ticker"], "left")
            .filter(F.col("return").isNotNull())
        )
        uni_ret = _pin(uni_ret)
        bweights = calculate_benchmark_weights(uni_ret)
        cat.upsert("benchmark_weights", bweights)
        bret = calculate_benchmark_returns(uni_ret, cat.table("benchmark_weights"))
        cat.upsert("benchmark_returns", bret)

        cat.upsert(
            "betas",
            estimate_betas(stock_returns, cat.table("benchmark_returns"), window, half_life),
        )

        weights = compute_portfolio_weights(
            cat.table("alphas"),
            cat.table("benchmark_weights"),
            cat.table("factor_loadings"),
            cat.table("factor_covariances"),
            cat.table("idio_vol"),
            FACTORS,
        ).cache()
        try:
            cat.upsert(
                "portfolio_weights",
                weights.select(
                    "ticker", "date", F.year("date").cast("int").alias("year"), "weight"
                ),
            )
            cat.upsert(
                "portfolio_metrics",
                weights.select("date", "lambda", "active_risk").distinct(),
            )
        finally:
            weights.unpersist()
    except Exception as exc:
        _fire_failure_hook(on_failure, exc)
        raise


def daily_flow(
    spark: SparkSession,
    cat: Catalog,
    today,
    window: int,
    half_life: float,
    reversal_window: int = 21,
    on_failure=None,
) -> bool:
    """The nightly incremental run (reference daily_*_flow semantics).

    T2: skip unless yesterday was the last market date. T3: each stage
    recomputes over its trailing lookback (2xWINDOW for regressions,
    WINDOW for covariances, 21 for reversal) read through date-range
    filters — with year-partitioned tables Catalyst prunes the scan to
    the tail partitions — then keeps only the end date and PK-upserts,
    so reruns are idempotent (T4).

    Faithful reference caveat: EWMA-smoothed outputs (loadings,
    idio vol, covariances, betas) are recomputed over the truncated
    tail exactly as the reference does, so they drift slightly from
    full-history backfill values — that approximation is the
    reference's own (factor_model_flow.py:179-199).
    """
    from nt_data_pipelines_spark.pipelines.calendar import freshness_gate, last_market_date

    cal = cat.table("calendar")
    if not freshness_gate(cal, today):
        return False
    # bounded by today: the calendar covers future schedule dates, and
    # the nightly flow processes data through the last COMPLETED
    # market day, never a future one
    end = last_market_date(cal, before=today)

    from nt_data_pipelines_spark.pipelines.calendar import trading_date_range

    tail_starts: dict[int, object] = {}
    # lookbacks are windows of COMPLETED market dates: the calendar
    # covers today and future schedule dates, and an unbounded
    # last-N would silently shift (or empty) every factor window
    cal_past = cal.filter(F.col("date") <= F.lit(end))

    def tail(df, n_dates: int):
        # one driver action per distinct lookback size, cached
        if n_dates not in tail_starts:
            tail_starts[n_dates] = (
                trading_date_range(cal_past, n_dates).agg(F.min("date")).first()[0]
            )
        start = tail_starts[n_dates]
        return df.filter((F.col("date") >= F.lit(start)) & (F.col("date") <= F.lit(end)))

    def only_end(df):
        return df.filter(F.col("date") == F.lit(end))

    try:
        # returns recompute over FULL price history, like the reference
        # (returns_flow.py has only a full-replace variant, no tail) —
        # so a ticker resuming after any gap still gets its end-date
        # return from the last available close; only the end date is
        # upserted.
        stock_ret = only_end(compute_returns(cat.table("stock_prices")))
        cat.upsert("stock_returns", stock_ret)
        etf_ret = only_end(compute_returns(cat.table("etf_prices")))
        cat.upsert("etf_returns", etf_ret)

        stock_returns = tail(cat.table("stock_returns"), 2 * window)
        etf_returns = tail(cat.table("etf_returns"), 2 * window)

        # pinned: both tail upserts materialize `fitted` (see backfill)
        fitted = _pin(estimate_factor_model(stock_returns, etf_returns, FACTORS, window))
        cat.upsert(
            "factor_loadings",
            only_end(clean_factor_loadings(fitted, FACTORS, half_life)),
        )
        cat.upsert("idio_vol", only_end(clean_idio_vol(fitted, window, half_life)))
        cat.upsert(
            "factor_covariances",
            only_end(
                estimate_factor_covariances(
                    tail(cat.table("etf_returns"), window), FACTORS, window, half_life
                )
            ),
        )

        # NOTE: the reference's daily reversal flow uses exactly a
        # 21-date lookback (get_trading_date_range(window=21)), so a
        # ticker missing one of those dates loses its end-date signal —
        # faithful zero-slack behavior, same as the reference.
        signals = only_end(
            calculate_signals(
                tail(cat.table("stock_returns"), reversal_window), window=reversal_window
            )
        )
        if signals.limit(1).count() == 0:
            raise ValueError("No values found: empty daily signals")
        cat.upsert("signals", signals)
        scores = calculate_scores(only_end(cat.table("signals")))
        cat.upsert("scores", scores)
        cat.upsert(
            "alphas",
            only_end(calculate_alphas(only_end(cat.table("scores")), cat.table("idio_vol"))),
        )

        uni_ret = (
            only_end(cat.table("universe"))
            .join(
                only_end(cat.table("stock_returns")).select("date", "ticker", "return"),
                ["date", "ticker"],
                "left",
            )
            .filter(F.col("return").isNotNull())
        )
        if uni_ret.limit(1).count() == 0:
            raise ValueError("No values found: end-date universe returns are empty")
        bweights = calculate_benchmark_weights(uni_ret)
        cat.upsert("benchmark_weights", bweights)
        cat.upsert(
            "benchmark_returns",
            calculate_benchmark_returns(uni_ret, only_end(cat.table("benchmark_weights"))),
        )

        cat.upsert(
            "betas",
            only_end(
                estimate_betas(
                    tail(cat.table("stock_returns"), 2 * window),
                    tail(cat.table("benchmark_returns"), 2 * window),
                    window,
                    half_life,
                )
            ),
        )

        weights = compute_portfolio_weights(
            only_end(cat.table("alphas")),
            only_end(cat.table("benchmark_weights")),
            only_end(cat.table("factor_loadings")),
            only_end(cat.table("factor_covariances")),
            only_end(cat.table("idio_vol")),
            FACTORS,
        ).cache()
        try:
            cat.upsert(
                "portfolio_weights",
                weights.select("ticker", "date", F.year("date").cast("int").alias("year"), "weight"),
            )
            cat.upsert("portfolio_metrics", weights.select("date", "lambda", "active_risk").distinct())
        finally:
            weights.unpersist()
        return True
    except Exception as exc:
        _fire_failure_hook(on_failure, exc)
        raise
