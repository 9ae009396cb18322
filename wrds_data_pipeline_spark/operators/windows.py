"""Tumbling analysis windows (SURVEY W4/W5/W6).

The exporter slices the trading calendar two ways
(TAQpipeline/correlation_matrix_exporter.py:128-213):

- intra-day tumbling windows of ``interval`` (e.g. '4h') walked from
  09:30 to 16:00, last window clamped at the close (W4),
- multi-day blocks of ``interval_days`` business days (W5) — blocks of
  the *trading-day index*, not wall-clock, so a calendar table drives
  them (W6), and the window label is the block's first/last day.

Both become grouping keys of one plan here — no driver loop.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def trading_calendar(spark, start: date, end: date) -> DataFrame:
    """W6: weekday calendar as a DataFrame with a dense trading-day
    index (replaces pd.bdate_range, correlation_matrix_exporter.py:133).
    Broadcast-sized at any horizon (250 rows/year)."""
    days = spark.sql(
        f"SELECT explode(sequence(DATE'{start}', DATE'{end}', INTERVAL 1 DAY)) AS date"
    )
    # Spark dayofweek: Sunday=1 .. Saturday=7; keep Mon-Fri (P17)
    bdays = days.filter(~F.dayofweek("date").isin(1, 7))
    # The dense index needs a total order; the input is calendar-sized
    # (≤260 rows/year) so one partition is correct AND bounded.  The
    # partition key is a non-foldable constant (a bare literal would be
    # constant-folded out, tripping Spark's unpartitioned-window warn).
    w = W.partitionBy(F.pmod(F.year("date"), F.lit(1))).orderBy("date")
    return bdays.withColumn("day_index", F.row_number().over(w) - 1)


def intraday_window(
    ts: Column,
    interval_seconds: int,
    open_time: str = "09:30:00",
    close_time: str = "16:00:00",
) -> Column:
    """W4: tumbling intra-day window id anchored at the session open
    (the reference anchors at 09:30, not midnight —
    correlation_matrix_exporter.py:146-152).  Returns the window-start
    timestamp; the clamp-at-close of the last window is implicit
    (timestamps past the close were already clipped)."""
    open_secs = (
        int(open_time[0:2]) * 3600 + int(open_time[3:5]) * 60 + int(open_time[6:8])
    )
    day_start = F.date_trunc("day", ts)
    secs_into_session = (
        F.unix_timestamp(ts) - F.unix_timestamp(day_start) - F.lit(open_secs)
    )
    slot = F.floor(secs_into_session / F.lit(interval_seconds))
    return F.timestamp_seconds(
        F.unix_timestamp(day_start) + F.lit(open_secs) + slot * F.lit(interval_seconds)
    )


def multiday_block(calendar: DataFrame, interval_days: int) -> DataFrame:
    """W5: assign each trading day to a tumbling block of
    ``interval_days`` *business* days.  Returns the calendar with
    (block_id, block_start, block_end) labels — join it to any
    date-keyed table to group by block."""
    blocked = calendar.withColumn(
        "block_id", F.floor(F.col("day_index") / F.lit(interval_days))
    )
    bw = W.partitionBy("block_id")
    return blocked.withColumn("block_start", F.min("date").over(bw)).withColumn(
        "block_end", F.max("date").over(bw)
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    n: int = 20,
    out_col: str = "zscore",
) -> DataFrame:
    """Trailing-window z-score: (v - mean) / sample-stddev over the
    last ``n`` rows per key (inclusive).  Pure window expressions —
    whole-stage codegen, one shuffle on the key.  NULL until the
    window has ≥2 rows (stddev undefined), matching SQL semantics."""
    w = (
        W.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), 0)
    )
    mean, sd = F.avg(value_col).over(w), F.stddev_samp(value_col).over(w)
    return df.withColumn(out_col, (F.col(value_col) - mean) / sd)


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key (pandas
    ``ewm(alpha, adjust=True).mean()`` semantics).

    The recursion has no numerically-stable closed form as a window
    expression (the tempting (1/(1-α))^i reweighting overflows on
    long series), so this is a grouped-Arrow op: one shuffle on the
    key, per-task state = one key's series — partition by (key, day)
    upstream if single-key histories outgrow a task.  Closure binds
    everything locally (ships by value; executors don't need this
    package importable)."""
    from pyspark.sql import types as T

    schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())])
    a, vcol, ocols, oc = float(alpha), value_col, list(order_cols), out_col

    def fn(pdf):
        pdf = pdf.sort_values(ocols).reset_index(drop=True)
        pdf[oc] = pdf[vcol].ewm(alpha=a, adjust=True).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema)
