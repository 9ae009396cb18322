"""SCD-2 (slowly-changing-dimension) maintenance without a lakehouse
MERGE.

The reference *consumes* SCD-2 tables (msenames name history,
ccmxpf_linktable link history — SURVEY J2) but maintains them
upstream in WRDS.  An engine that owns such tables needs the writer
side too: apply a snapshot of current attribute values at ``as_of``
to a validity-interval history, closing changed rows and opening new
ones.

Without Delta/Iceberg MERGE INTO (jars not present — stubbed behind
import), the standard emulation is join + union + rewrite:

1. classify history rows: unchanged-open, changed-open (close them),
   closed (keep);
2. classify snapshot rows: new key or changed value (open them);
3. union.

This rewrites the partition(s) it touches — at scale, partition the
history by a stable key hash so a daily snapshot rewrite touches all
partitions but shuffles each row at most once (it is a full-outer
join on key + union, two exchanges total).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str],
    as_of: datetime.date,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Apply ``snapshot`` (key + attribute columns, valid at
    ``as_of``) to an SCD-2 ``history`` (key + attributes + validity
    interval, NULL ``end_col`` = open).

    Returns the new history:
    - closed rows pass through untouched;
    - open rows whose attributes equal the snapshot stay open;
    - open rows that changed (or whose key left the snapshot) close
      at ``as_of - 1 day``;
    - snapshot rows that are new or changed open at ``as_of``.

    Attribute comparison is null-safe (<=>).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    closed = history.filter(F.col(end_col).isNotNull())
    open_rows = history.filter(F.col(end_col).isNull())

    snap = snapshot.select(
        *key_cols,
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_snap"),  # membership marker: survives
        # all-NULL attribute rows, unlike checking _new_* for nulls
    )
    joined = open_rows.join(snap, key_cols, "full_outer")

    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"_new_{c}"))
    in_history = F.col(start_col).isNotNull()
    in_snapshot = F.col("_in_snap").isNotNull()

    day_before = F.lit(as_of) - F.expr("INTERVAL 1 DAY")

    # surviving open rows (unchanged)
    keep_open = joined.filter(in_history & in_snapshot & same).select(
        *key_cols, *compare_cols, start_col, F.col(end_col)
    )
    # close: changed or disappeared
    to_close = joined.filter(
        in_history & (~in_snapshot | ~same)
    ).select(
        *key_cols, *compare_cols, start_col,
        day_before.cast("date").alias(end_col),
    )
    # open: new key or changed value
    to_open = joined.filter(
        in_snapshot & (~in_history | ~same)
    ).select(
        *key_cols,
        *[F.col(f"_new_{c}").alias(c) for c in compare_cols],
        F.lit(as_of).cast("date").alias(start_col),
        F.lit(None).cast("date").alias(end_col),
    )

    return (
        closed.select(*key_cols, *compare_cols, start_col, end_col)
        .unionByName(keep_open)
        .unionByName(to_close)
        .unionByName(to_open)
    )
