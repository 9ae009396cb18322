"""Skew-mitigation utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in session.get_spark) handles most skew at runtime.
These helpers cover the cases AQE can't: aggregations over a hot key,
and joins where the build side must be replicated per salt.

The reference never needed this (its universe is ~500 symbols with
comparable quote volumes), but at 100 TB a handful of symbols (e.g.
index ETFs) can carry 100× the median symbol's quotes — exactly the
shape that strands one task at the end of a stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, n_salts): spreads a hot key
    over n_salts shuffle partitions.  Derived from a hash of the full
    row's monotonic id substitute (crc of all columns would collide on
    duplicate rows — use spark_partition_id + a per-partition counter
    via monotonically_increasing_id, stable within a run)."""
    return df.withColumn(
        salt_col, (F.monotonically_increasing_id() % n_salts).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the re-aggregable functions; avg =
    sum/count composed by the caller).  Stage 1 aggregates per
    (key, salt) — splitting each hot key n_salts ways — stage 2 merges
    the partials.  Identical result to a direct groupBy, two small
    shuffles instead of one skewed one.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}

    s = salted(df, n_salts)
    stage1 = s.groupBy(*key_cols, "_salt").agg(
        *[first_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return stage1.groupBy(*key_cols).agg(
        *[merge_fn[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof fact⋈dim join: salt the fact side, replicate the
    dim side once per salt value, join on (keys + salt).

    Only worth it when the dim is too big to broadcast outright but
    the fact's key distribution is pathological; with a broadcastable
    dim, plain `F.broadcast` already avoids skew entirely (no shuffle
    of the fact at all).
    """
    if isinstance(on, str):
        on = [on]
    f = salted(fact, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = f.join(d, [*on, "_salt"], how)
    return out.drop("_salt")
