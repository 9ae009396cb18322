"""Resample to a fixed time grid with gap fill (SURVEY W1/W2).

The reference resamples each security's midquote series per day:
``perm_df['price'].resample(freq).ffill()`` (cloud_TAQ/taq_chunks.py:86-91,
TAQpipeline/correlation_matrix_exporter.py:111-116) — pandas semantics:
left-closed, left-labeled buckets; the bucket value is the *last*
observation in the bucket; empty buckets inherit the previous bucket's
value (forward-fill), and buckets before the first observation stay
NULL.

Spark-first formulation (no per-key driver loop, no UDF):

1. bucket-last: ``groupBy(key, floor(ts/freq))`` + ``max_by(value, ts)``
   — one shuffle on (key, bucket); map-side partial agg collapses the
   O(10^5) quotes/bucket to 1 row before shuffling, so the shuffle
   carries only O(keys × buckets).
2. dense grid: per (key, grid-span) ``sequence(start, end, step)`` +
   ``explode`` — generated distributedly, never on the driver.
3. gap fill: ``last(value, ignorenulls=True)`` over
   ``Window.partitionBy(key [, day]).orderBy(bucket)``.

Scale note: the window in step 3 partitions by (key, day) when a
``day_col`` is given — each partition is then ≤ one symbol-day
(≈ 23.4k one-second buckets), bounded regardless of total data size,
so no single task ever degenerates (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def bucketize(ts, freq_seconds: int):
    """Left-closed, left-labeled bucket start for a timestamp column.

    Anchored at the start of each DAY (pandas ``resample`` default
    ``origin='start_day'``) — epoch anchoring agrees only when the
    frequency divides 86400 (found by the Hypothesis sweep at 7s)."""
    day = F.date_trunc("day", ts)
    sec_of_day = F.unix_timestamp(ts) - F.unix_timestamp(day)
    slot = sec_of_day - (sec_of_day % F.lit(freq_seconds))
    return F.timestamp_seconds(F.unix_timestamp(day) + slot)


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    freq_seconds: int,
    agg: str = "last",
) -> DataFrame:
    """Step 1: collapse observations to one row per (key, bucket).

    ``agg='last'`` reproduces pandas ``resample(...).last()`` (what
    ffill-resampling uses); 'mean'/'first'/'min'/'max' also supported.
    'last' = max_by(value, (ts, monotonic tiebreak)) — deterministic
    because the reference pre-collapses duplicate timestamps with A1
    groupby-mean first (taq_chunks.py:84), which callers should too.
    """
    if agg == "twap":
        return _twap(df, key_cols, ts_col, value_col, freq_seconds)
    bucket = bucketize(F.col(ts_col), freq_seconds).alias("bucket")
    g = df.groupBy(*key_cols, bucket)
    if agg == "last":
        out = g.agg(F.max_by(value_col, ts_col).alias(value_col))
    elif agg == "first":
        out = g.agg(F.min_by(value_col, ts_col).alias(value_col))
    elif agg == "mean":
        out = g.agg(F.avg(value_col).alias(value_col))
    elif agg == "min":
        out = g.agg(F.min(value_col).alias(value_col))
    elif agg == "max":
        out = g.agg(F.max(value_col).alias(value_col))
    else:
        raise ValueError(f"unsupported agg: {agg}")
    return out


def _twap(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    freq_seconds: int,
) -> DataFrame:
    """Time-weighted average per bucket: each observation holds until
    the next one (the last until bucket end), weights = holding time
    in µs.  TWAP is the honest resample for irregular quote arrivals
    — a plain mean over-weights bursts.

    Within-bucket carry-in from the previous bucket is deliberately
    excluded (each bucket averages its own observations, starting at
    its first tick) — composing with the ffill grid is how a value
    spans empty buckets.  Ties on ``ts_col`` break by value so the
    weighting is deterministic; as with 'last', A1-collapse duplicate
    timestamps first for semantic (not just deterministic) cleanness.
    One window + one aggregation, both on the same (keys, bucket)
    partitioning — a single shuffle.
    """
    from pyspark.sql.window import Window as W

    b = df.withColumn("bucket", bucketize(F.col(ts_col), freq_seconds))
    w = W.partitionBy(*key_cols, "bucket").orderBy(ts_col, value_col)
    nxt = F.lead(ts_col).over(w)
    bucket_end = F.col("bucket") + F.expr(f"INTERVAL {freq_seconds} SECONDS")
    dur = F.unix_micros(F.coalesce(nxt, bucket_end)) - F.unix_micros(F.col(ts_col))
    return (
        b.withColumn("_dur", dur)
        .groupBy(*key_cols, "bucket")
        .agg(
            (F.sum(F.col(value_col) * F.col("_dur")) / F.sum("_dur")).alias(value_col)
        )
    )


def dense_grid(
    sampled: DataFrame,
    key_cols: list[str],
    freq_seconds: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-key dense bucket grid spanning each key's observed min/max
    bucket (pandas resample semantics).

    Takes the already-bucketized output of :func:`resample`, NOT the
    raw events: the span aggregation then groups the same
    (keys, bucket) exchange the bucket-last agg produced, so Catalyst
    reuses the shuffle instead of replaying the whole upstream
    pipeline a second time.

    The grid is generated per civil day so every grid point lands on
    a :func:`bucketize` day-anchored slot.  A single continuous
    ``sequence(lo, hi, freq)`` drifts off the day anchor whenever the
    frequency does not divide 86400 (86400 % 7 = 3): past the first
    midnight its points would match no bucketized observation, the
    left join would null them all, and ffill would carry day-1 values
    forever — found by the midnight-crossing Hypothesis sweep."""
    spans = sampled.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    days = spans.select(
        *key_cols,
        "_lo",
        "_hi",
        F.explode(F.sequence(F.to_date("_lo"), F.to_date("_hi"))).alias("_day"),
    )
    midnight = F.col("_day").cast("timestamp")
    # first slot of the day (the span's own start on its first day),
    # last slot = largest freq-multiple before the next midnight,
    # clamped to the span end on its last day.
    start = F.when(F.col("_day") == F.to_date("_lo"), F.col("_lo")).otherwise(midnight)
    last_slot = 86399 - (86399 % freq_seconds)
    day_end = F.timestamp_seconds(F.unix_timestamp(midnight) + F.lit(last_slot))
    end = F.when(F.col("_day") == F.to_date("_hi"), F.col("_hi")).otherwise(day_end)
    step = F.expr(f"INTERVAL {freq_seconds} SECONDS")
    return days.select(
        *key_cols,
        F.explode(F.sequence(start, end, step)).alias("bucket"),
    )


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    freq_seconds: int,
    agg: str = "last",
    day_col: str | None = None,
    direction: str = "ffill",
) -> DataFrame:
    """W1 (ffill) / W2 (bfill): dense per-key grid with gap fill.

    Returns (key_cols..., bucket, value) where value is the filled
    series.  ``day_col`` (if given) bounds the fill window to one day
    per key — matching the reference's per-day processing AND keeping
    window partitions small at scale.
    """
    # with a day column, both the grid and the fill are per (key, day):
    # no bucket spans the overnight gap, matching the reference's
    # per-day processing (taq_chunks.py:111-147)
    grid_keys = [*key_cols, day_col] if day_col else key_cols
    sampled = resample(df, grid_keys, ts_col, value_col, freq_seconds, agg)
    grid = dense_grid(sampled, grid_keys, freq_seconds)
    full = grid.join(sampled, [*grid_keys, "bucket"], "left")

    part = grid_keys
    if direction == "ffill":
        w = (
            W.partitionBy(*part)
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        fill = F.last(value_col, ignorenulls=True).over(w)
    elif direction == "bfill":
        w = (
            W.partitionBy(*part)
            .orderBy("bucket")
            .rowsBetween(0, W.unboundedFollowing)
        )
        fill = F.first(value_col, ignorenulls=True).over(w)
    else:
        raise ValueError(f"unsupported direction: {direction}")

    out = full.withColumn(value_col, fill)
    return out
