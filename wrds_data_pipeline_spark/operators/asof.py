"""As-of (latest-record-before) joins and lookups (SURVEY J5/W8).

The reference does this with an N+1 loop: one SQL query per ticker
pulling ``public_date BETWEEN year_ago AND date ORDER BY public_date``
then ``sort_values(desc).head(1)`` (graph_code/pyg_graphs.py:165-179).
The engine form joins *all* keys at once:

- ``latest_per_key``: top-1-by-time per key (W8) — one window pass.
- ``asof_join``: for every left row (key, ts), the most recent right
  row with ``right.ts <= left.ts`` within an optional staleness
  horizon (the reference uses 1 year).

Implementation: union the two sides tagged, one window sort per key —
O(n log n) per key partition, no range-join blowup.  This is the
standard streaming-merge as-of formulation (same idea as
pandas.merge_asof, expressed with Spark windows so it distributes by
key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def latest_per_key(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W8: most recent record per key (`sort desc → head(1)`,
    graph_code/pyg_graphs.py:179) with explicit tie-breaks."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    order = [F.desc(order_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_expr: str | None = None,
) -> DataFrame:
    """J5: for each left row, latest right row at-or-before its
    timestamp (per key), optionally within ``tolerance_expr``
    (e.g. "INTERVAL 365 DAYS" — the reference's 1-year lookback,
    graph_code/pyg_graphs.py:176).

    Union-tag + single ordered window per key: right rows carry their
    values forward (last ignorenulls); left rows read the carried
    state.  One shuffle on key, partition size bounded by per-key
    history length.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    # right rows carry their entire payload as ONE struct: the as-of
    # match must return the latest *row* wholesale (NULL fields
    # included) — per-column ignorenulls fill would resurrect stale
    # values for fields that are NULL in the latest record, which is
    # not what `head(1)` does (pyg_graphs.py:179)
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(v) for v in value_cols]
        ).alias("_payload"),
    )
    lt = lt.withColumn("_payload", F.lit(None).cast(rt.schema["_payload"].dataType))

    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # right rows sort before left rows at the same timestamp (a record
    # published AT t is visible to a lookup AT t — BETWEEN inclusive,
    # pyg_graphs.py:176)
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("_p", F.last("_payload", ignorenulls=True).over(w))

    out = filled.filter(F.col("_side") == 1)
    if tolerance_expr is not None:
        fresh = F.col("_p._rts") >= F.col("_ts") - F.expr(tolerance_expr)
        out = out.withColumn("_p", F.when(fresh, F.col("_p")))
    for v in value_cols:
        out = out.withColumn(v, F.col("_p").getField(v))
    return (
        out.withColumn("asof_ts", F.col("_p._rts"))
        .drop("_ts", "_side", "_payload", "_p")
    )
