"""Sinks (SURVEY S6-S9).

The reference writes gzip CSVs with hand-built directory layouts
(``data/{year}/{month:02d}/`` + one file per day, taq_chunks.py:136-142;
one CSV per correlation window with bounds in the filename,
correlation_matrix_exporter.py:227-235).  The engine writes
partitioned Parquet by default (the reference's own README wants this,
README.md:67) and keeps CSV for export compatibility.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] = ("year", "month"),
    fmt: str = "parquet",
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """S7: date-partitioned sink.  Adds year/month from a `date`
    column when asked for the reference's layout."""
    out = df
    if "year" in partition_cols and "year" not in df.columns:
        out = out.withColumn("year", F.year("date"))
    if "month" in partition_cols and "month" not in df.columns:
        out = out.withColumn("month", F.month("date"))
    w = out.write.mode(mode).partitionBy(*partition_cols)
    if compression:
        w = w.option("compression", compression)
    getattr(w, fmt)(path)


def write_csv_single(df: DataFrame, path: str, compression: str | None = None) -> None:
    """S6/S8: one CSV artifact (the reference's per-window matrix
    files).  coalesce(1) is deliberate: these exports are small
    (matrix ≤ universe², universe file ≤ millions of rows) — never
    use this for fact tables."""
    w = df.coalesce(1).write.mode("overwrite").option("header", True)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def corr_window_filename(out_dir: str, start, end) -> str:
    """The exporter's filename convention: one artifact per window
    with the bounds stamped (correlation_matrix_exporter.py:229-233)."""
    return os.path.join(out_dir, f"corr_{start:%Y%m%d_%H%M}_{end:%Y%m%d_%H%M}")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    partition_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: pre-shuffles rows into ``n_buckets`` by
    hash of ``bucket_cols`` (optionally sorted within buckets) so
    later aggregations/joins keyed on those columns read data already
    co-located — Catalyst drops the Exchange entirely.

    This is the 100 TB layout move for the quote table: bucket by
    symbol, partition by date, and the per-symbol resample+ffill
    (the engine's hottest path) runs shuffle-free day after day —
    the one-time write shuffle is amortized over every downstream
    read.  Requires a table (metastore) target, not a bare path:
    bucketing metadata lives in the catalog.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    if partition_cols:
        if isinstance(partition_cols, str):
            partition_cols = [partition_cols]
        w = w.partitionBy(*partition_cols)
    w.saveAsTable(table)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 32,
    order_col: str | list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSONL corpus sink: one ``.json(.gz)`` file per shard — the
    interchange format most training-data loaders consume (one JSON
    object per line; Spark's json writer IS JSONL).  ``order_col``
    range-partitions and sorts so each shard covers a dense key
    interval (the write_packed_shards layout rule); without it the
    existing partitioning is kept and no shuffle is added.  Gzip by
    default: corpus text compresses ~3-5× and every downstream loader
    streams gzip natively."""
    if order_col is not None:
        cols = [order_col] if isinstance(order_col, str) else list(order_col)
        df = df.repartitionByRange(n_shards, *cols).sortWithinPartitions(
            *cols
        )
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
