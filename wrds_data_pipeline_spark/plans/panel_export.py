"""Daily panel export: pipeline 2's sink stage.

The reference writes one wide (time × permno) gzip CSV per day under
``data/{year}/{month:02d}/`` (cloud_TAQ/taq_chunks.py:136-142).  The
engine keeps the panel long and partitioned (parquet, the layout its
own README wants — reference README.md:67); the wide-CSV export
remains available for downstream compatibility.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.panel import to_wide
from wrds_data_pipeline_spark.sinks import write_partitioned


def write_daily_panels_long(prices: DataFrame, path: str) -> None:
    """Engine-native: long (date, permno, bucket, price) parquet
    partitioned year/month — S7 with partition pruning for readers."""
    write_partitioned(prices, path, ["year", "month"])


def export_daily_panels_csv(
    prices: DataFrame, out_dir: str, compression: str = "gzip"
) -> list[str]:
    """Reference-layout export: one wide CSV per day at
    ``{out_dir}/{year}/{month:02d}/{yyyy-mm-dd}.csv[.gz]``.

    The day loop is driver-side but each file is panel-sized
    (buckets × universe ≈ 23k × 500 ≈ 40 MB) — the distributed work
    (resample) already happened; this is a sink fan-out.
    """
    days = [r[0] for r in prices.select("date").distinct().orderBy("date").collect()]
    permnos = [r[0] for r in prices.select("permno").distinct().orderBy("permno").collect()]
    written = []
    for day in days:
        wide = to_wide(
            prices.filter(F.col("date") == F.lit(day)),
            "bucket", "permno", "price", keys=permnos,
        ).orderBy("bucket")
        sub = os.path.join(out_dir, f"{day.year}", f"{day.month:02d}")
        os.makedirs(sub, exist_ok=True)
        path = os.path.join(sub, f"{day}.csv" + (".gz" if compression == "gzip" else ""))
        pdf = wide.toPandas().set_index("bucket")
        pdf.to_csv(path, compression=compression if compression else None)
        written.append(path)
    return written


def export_daily_panels_csv_distributed(
    prices: DataFrame, out_dir: str, compression: str = "gzip"
) -> DataFrame:
    """Distributed reference-layout export: same per-day wide CSVs and
    paths as ``export_daily_panels_csv``, but each day's pivot + write
    happens *inside* an Arrow task (``groupBy(date).applyInPandas``,
    the plans/features.export_graph_tensors pattern) — no per-day
    ``toPandas()`` round-trips through the driver, so thousands of
    days fan out across the cluster.

    Returns a lazy manifest (date, n_buckets, n_cols, path); files are
    written when the manifest is materialized.  ``out_dir`` must be a
    filesystem all executors share (true on local[n]; a mounted FS or
    object store on a cluster).
    """
    from pyspark.sql import types as T

    permnos = [r[0] for r in prices.select("permno").distinct().orderBy("permno").collect()]
    schema = T.StructType([
        prices.schema["date"],
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("n_cols", T.IntegerType()),
        T.StructField("path", T.StringType()),
    ])
    target, comp, cols = out_dir, compression, permnos

    def write_day(key, pdf):
        import os as _os

        import pandas as pd

        day = key[0]
        # plain pivot (unique (bucket, permno) after resampling), then
        # reindex to the global universe so every day has the same
        # columns — matching the driver-loop exporter's keys= pivot.
        wide = (
            pdf.pivot(index="bucket", columns="permno", values="price")
            .reindex(columns=cols)
            .sort_index()
        )
        sub = _os.path.join(target, f"{day.year}", f"{day.month:02d}")
        _os.makedirs(sub, exist_ok=True)
        path = _os.path.join(sub, f"{day}.csv" + (".gz" if comp == "gzip" else ""))
        wide.to_csv(path, compression=comp if comp else None)
        return pd.DataFrame([{
            "date": day, "n_buckets": len(wide),
            "n_cols": len(wide.columns), "path": path,
        }])

    return prices.groupBy("date").applyInPandas(write_day, schema)
