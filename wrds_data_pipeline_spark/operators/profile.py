"""Column profiling: the look-before-you-curate pass.

One aggregation over the table computes, per requested column, the
row count, null count, exact distinct count, and min/max (rendered
as strings so heterogeneous columns share one output schema) — then
unpivots to one row per column with ``stack``.  Exact distinct (not
approx_count_distinct) keeps the result engine-portable and
oracle-checkable; Spark plans multi-distinct aggregates with one
Expand, which is the right trade for a profiling pass that runs once
per dataset.  At 100 TB, run per partition-slice first and merge, or
swap in approx_count_distinct and accept ±2%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """→ (column, n_rows, n_null, n_distinct, min_str, max_str), one
    row per profiled column."""
    cols = cols or [f.name for f in df.schema.fields]

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
