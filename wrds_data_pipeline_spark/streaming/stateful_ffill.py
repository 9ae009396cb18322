"""Stateful streaming forward-fill: the full W1 (grid + gap fill) as
an incremental operator.

``streaming_bucket_last`` (resample_stream.py) emits only buckets
that saw data; the batch engine fills gaps afterwards.  This variant
fills gaps *inside* the stream with ``applyInPandasWithState``: per
key, the state holds the **open** (in-progress) bucket and its
running last value.  A bucket is emitted only once event time moves
past it — so a bucket that straddles micro-batches emits exactly one
row with its true final value, same as the batch operator.

State is two scalars per key — bounded regardless of stream length.
Rows with NULL value act as flush markers: they close and emit the
open bucket (the bounded-input analog of a watermark passing the last
window).  Late data older than the open bucket is dropped; run behind
a watermark/dedup stage if the source reorders across batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("open_bucket", T.LongType()),   # epoch secs, in-progress bucket
    T.StructField("open_value", T.DoubleType()),  # its running last value
])


def stateful_ffill_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    freq_seconds: int,
) -> DataFrame:
    """stream(key, ts, value) → dense (key, bucket, price) with
    forward-fill across empty buckets, incrementally."""
    key_field = stream.schema[key_col]
    out_schema = T.StructType([
        key_field,
        T.StructField("bucket", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
    ])

    def fill(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        flush = rows[value_col].isna().any()
        rows = rows.dropna(subset=[value_col]).sort_values(ts_col)

        open_b, open_v = state.get if state.exists else (None, None)

        out_buckets: list[int] = []
        out_values: list[float] = []

        if len(rows):
            epochs = rows[ts_col].astype("int64") // 10**9
            # day-anchored buckets (same as operators.resample.bucketize)
            day = (epochs // 86400) * 86400
            rows = rows.assign(_bucket=day + ((epochs - day) // freq_seconds) * freq_seconds)
            per_bucket = rows.groupby("_bucket")[value_col].last()
            batch_max = int(per_bucket.index.max())

            if open_b is None:
                open_b = int(per_bucket.index.min())
            new_open = max(batch_max, open_b)

            carry = open_v
            b = open_b
            while b < new_open:  # emit only CLOSED buckets
                if b in per_bucket.index:
                    carry = float(per_bucket.loc[b])
                if carry is not None:
                    out_buckets.append(b)
                    out_values.append(carry)
                b += freq_seconds
            if new_open in per_bucket.index:
                carry = float(per_bucket.loc[new_open])
            open_b, open_v = new_open, carry

        if flush and open_b is not None and open_v is not None:
            out_buckets.append(open_b)
            out_values.append(open_v)
            state.remove()
        elif open_b is not None:
            state.update((int(open_b), open_v))

        if out_buckets:
            yield pd.DataFrame({
                key_col: key[0],
                "bucket": pd.to_datetime(pd.Series(out_buckets), unit="s"),
                "price": out_values,
            })

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fill,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_ffill_over_parquet(
    spark,
    path: str,
    schema,
    key_col: str,
    ts_col: str,
    value_col: str,
    freq_seconds: int,
    query_name: str = "ffilled",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Local smoke harness (memory sink, bounded input).  Stage a
    final file of NULL-value rows (one per key) to flush open buckets."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    filled = stateful_ffill_stream(stream, key_col, ts_col, value_col, freq_seconds)
    q = (
        filled.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
