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

from wrds_data_pipeline_spark.operators.corr import grouped_corr_pandas, pairwise_corr
from wrds_data_pipeline_spark.operators.windows import intraday_window, multiday_block

# Above this many securities the bucket self-join's O(buckets × k²)
# shuffle dominates and the grouped-Arrow dense path wins (SURVEY
# §4.2).  ~500 keys ⇒ 250k pairs/bucket is where the two cross over
# on the reference workload shape.
AUTO_DENSE_KEYS = 500


def _windowed_corr(long_df, window_cols: list[str], method: str) -> DataFrame:
    """Route one windowed correlation: 'pairwise' (self-join, the
    defined semantics), 'grouped' (per-window Arrow + BLAS, same
    pairwise-complete result for unique (bucket, key) panels), or
    'auto' (count keys once, pick)."""
    if method == "auto":
        n_keys = long_df.select(
            F.approx_count_distinct("permno").alias("k")
        ).first()["k"]
        method = "grouped" if n_keys > AUTO_DENSE_KEYS else "pairwise"
    fn = grouped_corr_pandas if method == "grouped" else pairwise_corr
    return fn(
        long_df,
        bucket_col="bucket",
        key_col="permno",
        value_col="price",
        window_cols=window_cols,
    )


def intraday_corr(
    prices: DataFrame,
    interval_seconds: int,
    open_time: str = "09:30:00",
    method: str = "pairwise",
) -> DataFrame:
    """One correlation matrix per (date, intra-day window):
    (date, win_start, k1, k2, corr_val) in long form."""
    windowed = prices.withColumn(
        "win_start", intraday_window(F.col("bucket"), interval_seconds, open_time)
    )
    return _windowed_corr(windowed, ["date", "win_start"], method)


def multiday_corr(
    prices: DataFrame,
    calendar: DataFrame,
    interval_days: int,
    method: str = "pairwise",
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

    return _windowed_corr(
        p, ["block_id", "block_start", "block_end"], method
    ).drop("block_id")
