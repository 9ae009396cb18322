"""Correlation-matrix export: the exporter's sink stage.

The reference writes one CSV per window, the matrix in wide
security×security form, window bounds stamped into the filename
(TAQpipeline/correlation_matrix_exporter.py:227-235).  Matrices are
universe-bounded (≤ ~500×500 doubles ≈ 2 MB), so the window loop is a
legitimate driver-side sink loop — the heavy lifting (the pairwise
corr over all windows) already happened distributed; only tiny
finished matrices flow through the driver here.

For lakehouse consumers, `write_corr_long` keeps the engine-native
long form as partitioned parquet instead — the form every downstream
join/filter actually wants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from wrds_data_pipeline_spark.sinks import corr_window_filename, write_partitioned


def write_corr_long(corr: DataFrame, path: str, partition_cols=("date",)) -> None:
    """Long-form (window..., k1, k2, corr_val) partitioned parquet."""
    write_partitioned(corr, path, list(partition_cols))


def export_corr_csvs(
    corr: DataFrame,
    out_dir: str,
    window_start_col: str,
    window_end_col: str | None = None,
    window_seconds: int | None = None,
) -> list[str]:
    """One wide CSV per window, reference filename convention
    (bounds in the name, correlation_matrix_exporter.py:229-233).
    End bound from ``window_end_col`` (multi-day blocks) or
    ``window_seconds`` after start (intraday).  Returns the paths."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    pdf = corr.toPandas()
    written = []
    for start, g in pdf.groupby(window_start_col):
        if window_end_col:
            end = g[window_end_col].iloc[0]
        elif window_seconds:
            end = pd.Timestamp(start) + pd.Timedelta(seconds=window_seconds)
        else:
            end = start
        wide = g.pivot_table(
            index="k1", columns="k2", values="corr_val", aggfunc="first"
        ).sort_index(axis=0).sort_index(axis=1)
        path = corr_window_filename(
            out_dir, pd.Timestamp(start), pd.Timestamp(end)
        ) + ".csv"
        wide.to_csv(path)
        written.append(path)
    return written


def export_corr_csvs_distributed(
    corr: DataFrame,
    out_dir: str,
    window_start_col: str,
    window_end_col: str | None = None,
    window_seconds: int | None = None,
) -> DataFrame:
    """Distributed twin of :func:`export_corr_csvs`: each window's
    matrix is pivoted and written *inside* an Arrow task
    (``groupBy(window).applyInPandas``), so a multi-year export
    (thousands of windows) fans out across executors instead of
    streaming every matrix through the driver.

    Same filenames and CSV content as the driver-loop exporter.
    Returns a lazy manifest (window_start, n_keys, path); files are
    written when the manifest materializes.  ``out_dir`` must be
    shared by all executors (true on local[n])."""
    from pyspark.sql import types as T

    import pandas as pd  # noqa: F401  (re-exported into the closure)

    schema = T.StructType([
        corr.schema[window_start_col],
        T.StructField("n_keys", T.IntegerType()),
        T.StructField("path", T.StringType()),
    ])
    target, wend, wsecs, wstart = out_dir, window_end_col, window_seconds, window_start_col

    def write_window(key, g):
        # self-contained closure (ships by value; executors never
        # import this package) — the filename format mirrors
        # sinks.corr_window_filename exactly
        import os as _os

        import pandas as pd

        start = key[0]
        if wend:
            end = g[wend].iloc[0]
        elif wsecs:
            end = pd.Timestamp(start) + pd.Timedelta(seconds=wsecs)
        else:
            end = start
        s, e = pd.Timestamp(start), pd.Timestamp(end)
        _os.makedirs(target, exist_ok=True)
        path = _os.path.join(target, f"corr_{s:%Y%m%d_%H%M}_{e:%Y%m%d_%H%M}.csv")
        wide = g.pivot_table(
            index="k1", columns="k2", values="corr_val", aggfunc="first"
        ).sort_index(axis=0).sort_index(axis=1)
        wide.to_csv(path)
        return pd.DataFrame([{wstart: start, "n_keys": len(wide), "path": path}])

    return corr.groupBy(window_start_col).applyInPandas(write_window, schema)
