"""Long↔wide panel reshaping (SURVEY J7 / W3).

The reference builds its time×security price matrix by concatenating
per-security resampled Series column-wise (``pd.concat(series, axis=1)``,
cloud_TAQ/taq_chunks.py:94,105) — an outer join on the time index with
columns named by permno.  The engine equivalent is a pivot:
``groupBy(bucket).pivot(key).agg(first(value))``.

The engine's *native* shape stays long (bucket, key, value) — every
downstream operator (corr, windows, sinks) consumes long form, and the
wide matrix only materializes at an export boundary (the reference's
CSV-of-matrix sinks S6/S7), where its width is the universe size
(~500 cols), not data-scale-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_wide(
    long_df: DataFrame,
    bucket_col: str,
    key_col: str,
    value_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Pivot long panel to wide.  Passing ``keys`` explicitly avoids
    the extra distinct-scan Spark otherwise runs to discover pivot
    columns (always pass it at scale)."""
    g = long_df.groupBy(bucket_col)
    p = g.pivot(key_col, keys) if keys else g.pivot(key_col)
    return p.agg(F.first(value_col))


def to_long(
    wide_df: DataFrame, bucket_col: str, key_cols: list[str],
    key_name: str = "key", value_name: str = "value",
) -> DataFrame:
    """Unpivot via the built-in stack() generator (no UDF)."""
    n = len(key_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in key_cols)
    return wide_df.selectExpr(
        f"`{bucket_col}`", f"stack({n}, {pairs}) as (`{key_name}`, `{value_name}`)"
    )
