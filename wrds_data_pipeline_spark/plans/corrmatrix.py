"""Correlation-matrix exporter: windowed all-pairs correlations.

Re-expresses ``TAQpipeline/correlation_matrix_exporter.py:128-238``:
slice the calendar into tumbling intra-day ('4h') or multi-day ('2d')
windows, correlate every security pair within each window, one matrix
per window.  The reference loops windows on the driver and calls
``panel.corr()``; here every window is a group of one distributed plan
(pairwise-complete semantics preserved — SURVEY A4).

Multi-day windows additionally restrict each block to the securities
present on *every* day of the block (the common-ticker intersection,
correlation_matrix_exporter.py:200-208, SURVEY A5) — expressed as
count(distinct date) == block-size-in-days, a group-by, not a Python
set intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.corr import pairwise_corr
from wrds_data_pipeline_spark.operators.windows import intraday_window, multiday_block


def intraday_corr(
    prices: DataFrame,
    interval_seconds: int,
    open_time: str = "09:30:00",
) -> DataFrame:
    """One correlation matrix per (date, intra-day window):
    (date, win_start, k1, k2, corr_val) in long form."""
    windowed = prices.withColumn(
        "win_start", intraday_window(F.col("bucket"), interval_seconds, open_time)
    )
    return pairwise_corr(
        windowed,
        bucket_col="bucket",
        key_col="permno",
        value_col="price",
        window_cols=["date", "win_start"],
    )


def multiday_corr(
    prices: DataFrame,
    calendar: DataFrame,
    interval_days: int,
) -> DataFrame:
    """One correlation matrix per block of ``interval_days`` trading
    days, over securities with data on every day of the block:
    (block_start, block_end, k1, k2, corr_val)."""
    blocks = multiday_block(calendar, interval_days).select(
        "date", "block_id", "block_start", "block_end"
    )
    p = prices.join(F.broadcast(blocks), "date")

    # A5: keep securities present on every trading day of the block
    block_days = blocks.groupBy("block_id").agg(
        F.countDistinct("date").alias("_n_days")
    )
    present = (
        p.groupBy("block_id", "permno")
        .agg(F.countDistinct("date").alias("_days_present"))
        .join(F.broadcast(block_days), "block_id")
        .filter(F.col("_days_present") == F.col("_n_days"))
        .select("block_id", "permno")
    )
    p = p.join(present, ["block_id", "permno"], "left_semi")

    return pairwise_corr(
        p,
        bucket_col="bucket",
        key_col="permno",
        value_col="price",
        window_cols=["block_id", "block_start", "block_end"],
    ).drop("block_id")
