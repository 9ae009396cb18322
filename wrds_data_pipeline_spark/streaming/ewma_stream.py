"""Stateful streaming EWMA: the batch grouped-Arrow operator
(operators/windows.ewma, pandas ``ewm(alpha, adjust=True)``) as an
incremental operator.

The adjust-form recursion carries exactly two scalars per key —
num_t = x_t + (1-α)·num_{t-1}, den_t = 1 + (1-α)·den_{t-1},
y_t = num_t / den_t — so streaming state is (num, den), bounded
regardless of stream length, and every arriving row emits its smoothed
value immediately (append mode, no watermark needed; the value for a
row depends only on rows at or before it).

Assumes time-ordered arrival per key across micro-batches (same
contract as stateful_ffill — run behind a watermark/sort stage if the
source reorders).  NULL values are dropped (the event tables carry no
nulls; pandas-NaN decay semantics are a batch-side concern).

The per-row python loop runs over one key's micro-batch slice (small
by construction); the recursion is inherently sequential, so there is
nothing to vectorize away — this is the textbook case for
applyInPandasWithState rather than a window function (the recursion
has no bounded-frame window form; see operators/windows.ewma).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("num", T.DoubleType()),
    T.StructField("den", T.DoubleType()),
])


def stateful_ewma_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """stream(key, ts, value) → (key, ts, value, ewma), one output row
    per input row, EWMA carried across micro-batches."""
    key_field = stream.schema[key_col]
    out_schema = T.StructType([
        key_field,
        stream.schema[ts_col],
        T.StructField(value_col, T.DoubleType()),
        T.StructField(out_col, T.DoubleType()),
    ])
    a = float(alpha)

    def step(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.dropna(subset=[value_col]).sort_values(ts_col)
        if not len(rows):
            return
        if state.exists:
            num, den = state.get
        else:
            num, den = None, None
        out = []
        for v in rows[value_col].astype("float64"):
            if num is None:
                num, den = v, 1.0
            else:
                num = v + (1.0 - a) * num
                den = 1.0 + (1.0 - a) * den
            out.append(num / den)
        state.update((float(num), float(den)))
        yield pd.DataFrame({
            key_col: key[0],
            ts_col: rows[ts_col].values,
            value_col: rows[value_col].values,
            out_col: out,
        })

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            step,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_ewma_over_parquet(
    spark,
    path: str,
    schema,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    query_name: str = "ewma_stream",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Local smoke harness (memory sink, bounded input)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    smoothed = stateful_ewma_stream(stream, key_col, ts_col, value_col, alpha)
    q = (
        smoothed.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
