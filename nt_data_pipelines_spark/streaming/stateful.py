"""Custom stateful streaming operator: per-key streaming EWMA (W4, streaming).

The batch EWMA kernel (operators/ewma.py) recomputes a group's whole
series; streams can't. This operator keeps O(1) state per key — the
numerator/denominator of the adjust=True recursion:

    num_t = x_t + (1-a) * num_{t-1}
    den_t = 1  + (1-a) * den_{t-1}
    y_t   = num_t / den_t,     a = 1 - 0.5^(1/half_life)

which equals pandas/Polars ``ewm(halflife=h, adjust=True).mean()``
exactly, but carries across micro-batches via
``applyInPandasWithState``. Rows are sorted by event time *within*
each batch; cross-batch order must be monotone per key (the usual
contract for time-partitioned ingestion — enforce upstream with a
watermark + sorted file layout).

State size: three doubles + a count per key — millions of keys fit in
executor memory, and the state store checkpoints it for exactly-once
recovery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("num", T.DoubleType()),
        T.StructField("den", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_ewma(
    events: DataFrame,
    half_life: float = 60.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """groupBy(key).applyInPandasWithState EWMA over a stream.

    Output columns: (key_col, ts_col, value_col) with their input
    types, plus ``ewma`` and the per-row running ``n_seen``.
    """
    alpha = 1.0 - 0.5 ** (1.0 / half_life)
    decay = 1.0 - alpha
    in_fields = {f.name: f for f in events.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[key_col],
            in_fields[ts_col],
            in_fields[value_col],
            T.StructField("ewma", T.DoubleType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        num, den, n = state.get if state.exists else (0.0, 0.0, 0)
        # One micro-batch group can arrive as several Arrow chunks;
        # sorting per chunk would interleave event time across chunk
        # boundaries — concatenate first, sort once.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        out_ewma, out_seen = [], []
        import math

        for x in pdf[value_col]:
            xv = float(x)
            if math.isnan(xv):
                # pandas ewm(adjust=True, ignore_na=False): a missing
                # row decays the existing weights one step and re-emits
                # the carried mean. It must NOT enter the recursion —
                # num = nan + decay*num would poison the CHECKPOINTED
                # state with NaN for every later row of this key.
                num = decay * num
                den = decay * den
            else:
                num = xv + decay * num
                den = 1.0 + decay * den
                n += 1
            out_ewma.append(num / den if den > 0 else float("nan"))
            out_seen.append(n)
        state.update((num, den, n))
        yield pd.DataFrame(
            {
                key_col: pdf[key_col],
                ts_col: pdf[ts_col],
                value_col: pdf[value_col],
                "ewma": out_ewma,
                "n_seen": out_seen,
            }
        )

    out = (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # NaN -> NULL, matching the batch kernel's nan_to_null conversion
    # (a not-yet-seeded mean is ABSENT, not a float)
    return out.withColumn("ewma", F.when(~F.isnan("ewma"), F.col("ewma")))


PEAK_STATE_SCHEMA = T.StructType([T.StructField("peak", T.DoubleType())])


def streaming_drawdown(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key streaming running peak + drawdown (risk monitor tier).

    The streaming twin of :func:`operators.windows.drawdown`: one
    double of state per key (the running maximum) carried across
    micro-batches by ``applyInPandasWithState``, so a live portfolio
    monitor emits value/peak - 1 per tick without recomputing any
    history. Same ordering contract as :func:`streaming_ewma` —
    in-batch rows sort by event time, cross-batch order is monotone
    per key.
    """
    in_fields = {f.name: f for f in events.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[key_col],
            in_fields[ts_col],
            in_fields[value_col],
            T.StructField("running_peak", T.DoubleType()),
            T.StructField("drawdown", T.DoubleType()),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (peak,) = state.get if state.exists else (float("-inf"),)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        peaks, dds = [], []
        import math

        for x in pdf[value_col]:
            x = float(x)
            if math.isnan(x):
                # missing tick: state untouched, no fake drawdown row
                peaks.append(peak if peak != float("-inf") else None)
                dds.append(None)
                continue
            peak = x if x > peak else peak
            peaks.append(peak)
            dds.append(x / peak - 1.0 if peak != 0 else None)
        state.update((peak,))
        yield pd.DataFrame(
            {
                key_col: pdf[key_col],
                ts_col: pdf[ts_col],
                value_col: pdf[value_col],
                "running_peak": peaks,
                "drawdown": dds,
            }
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=PEAK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RSI_STATE_SCHEMA = T.StructType(
    [
        T.StructField("avg_gain", T.DoubleType()),
        T.StructField("avg_loss", T.DoubleType()),
        T.StructField("prev", T.DoubleType()),
        T.StructField("n_diffs", T.LongType()),
    ]
)


def streaming_rsi(
    events: DataFrame,
    period: int = 14,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key streaming Wilder RSI — the EWMA recursion the batch
    window form (operators/windows.rsi, Cutler's SMA variant)
    deliberately leaves to this tier.

    Wilder's smoothing: after seeding with the simple average of the
    first ``period`` diffs,

        avg_t = (avg_{t-1} * (period-1) + x_t) / period

    for gains and losses separately; RSI = 100 - 100/(1 + ag/al)
    (al == 0 pins 100). State per key: two smoothed averages, the
    previous price, and the diff count — four numbers, carried across
    micro-batches by ``applyInPandasWithState``. Same ordering
    contract as :func:`streaming_ewma`: monotone event time per key
    across batches, sorted within each batch here.

    Emits ``rsi`` null until ``period`` diffs have been seen
    (matching the batch operator's full-window gate).
    """

    in_fields = {f.name: f for f in events.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[key_col],
            in_fields[ts_col],
            in_fields[value_col],
            T.StructField("rsi", T.DoubleType()),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ag, al, prev, n = state.get
        else:
            ag, al, prev, n = 0.0, 0.0, float("nan"), 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        out = []
        import math

        for x in pdf[value_col]:
            x = float(x)
            if math.isnan(x):
                # missing tick: skip entirely — a NaN diff would make
                # max(NaN, 0) poison the smoothed averages in the
                # CHECKPOINTED state forever, and it must not become
                # `prev` either
                out.append(None)
                continue
            if math.isnan(prev):
                out.append(None)  # no diff yet
            else:
                d = x - prev
                g, lo = max(d, 0.0), max(-d, 0.0)
                n += 1
                if n < period:
                    # seeding phase: plain accumulation
                    ag, al = ag + g, al + lo
                    out.append(None)
                elif n == period:
                    ag, al = (ag + g) / period, (al + lo) / period
                    out.append(100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al))
                else:
                    ag = (ag * (period - 1) + g) / period
                    al = (al * (period - 1) + lo) / period
                    out.append(100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al))
            prev = x
        state.update((ag, al, prev, n))
        yield pd.DataFrame(
            {
                key_col: pdf[key_col],
                ts_col: pdf[ts_col],
                value_col: pdf[value_col],
                "rsi": out,
            }
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=RSI_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
