"""Streaming resample: the incremental form of W1.

The reference replays per-day NBBO event tables in a batch loop
(cloud_TAQ/taq_chunks.py:111-147); the quote stream is naturally
streaming-shaped, and the batch `resample(freq).last()` is exactly a
tumbling-window `last()` aggregation.  Structured Streaming gives the
incremental version: watermark bounds state, window(freq) buckets,
max_by picks the in-bucket last observation.

Forward-fill across *empty* buckets is deliberately NOT done inside
the stream: gap fill needs the previous bucket's state per key, which
in streaming-land is `applyInPandasWithState` (stateful_ffill below)
or a downstream batch window over the sink table — at 100 TB the sink
-side fill is usually right because it keeps streaming state bounded
at one row per (key, open window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_bucket_last(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    freq: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window last-observation aggregation with late-data
    tolerance ``watermark``.  Append-mode compatible: a window emits
    once the watermark passes its end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), freq), *key_cols)
        .agg(F.max_by(value_col, ts_col).alias(value_col))
        .select(
            F.col("window.start").alias("bucket"),
            *key_cols,
            value_col,
        )
    )


def run_stream_over_parquet(
    spark,
    path: str,
    schema,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    freq: str = "1 minute",
    query_name: str = "resampled",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the streaming query over a static parquet dir to
    completion (memory sink) — the local-smoke harness; production
    swaps the source for kafka/files and the sink for a table.

    Append-mode caveat: windows later than (max event time −
    watermark) stay open when the input ends — the stream doesn't
    know time has moved on.  Feed a far-future sentinel row in a
    *later file* with ``max_files_per_trigger=1`` to flush them (the
    watermark only advances between micro-batches)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)
    agg = streaming_bucket_last(stream, key_cols, ts_col, value_col, freq)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
