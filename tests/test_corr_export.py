"""End-to-end pipeline 3: quotes → panel → windowed corr → one CSV
per window with the reference's filename convention."""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.plans.corr_export import export_corr_csvs, write_corr_long
from wrds_data_pipeline_spark.plans.corrmatrix import intraday_corr
from wrds_data_pipeline_spark.plans.taq import day_universe_symbols, resampled_prices


def test_export_corr_csvs(spark, wrds, tmp_path):
    universe = day_universe_symbols(wrds["taqmclink"].select("date", "permno", "ticker"))
    prices = resampled_prices(wrds["nbbo"], universe, freq_seconds=60)
    day = prices.select(F.min("date")).first()[0]
    corr = intraday_corr(prices.filter(F.col("date") == F.lit(day)), 2 * 3600)

    out = os.path.join(str(tmp_path), "corr_csvs")
    paths = export_corr_csvs(corr, out, "win_start", window_seconds=2 * 3600)
    assert len(paths) >= 3  # 09:30-16:00 at 2h → ≥3 windows
    assert all(os.path.basename(p).startswith("corr_2016") for p in paths)

    m = pd.read_csv(paths[0], index_col=0)
    assert m.shape[0] == m.shape[1] > 1          # square matrix
    assert (m.columns.astype(int) == m.index.astype(int)).all()
    diag = [m.iloc[i][str(m.index[i])] for i in range(len(m))]
    assert all(abs(d - 1.0) < 1e-12 for d in diag)

    longp = os.path.join(str(tmp_path), "corr_long")
    write_corr_long(corr, longp)
    assert glob.glob(os.path.join(longp, "date=*"))


def test_export_corr_csvs_distributed_parity(spark, wrds, tmp_path):
    """The Arrow-task corr exporter writes byte-identical files (same
    names, same content) to the driver-loop exporter."""
    from wrds_data_pipeline_spark.plans.corr_export import (
        export_corr_csvs_distributed,
    )

    universe = day_universe_symbols(wrds["taqmclink"].select("date", "permno", "ticker"))
    prices = resampled_prices(wrds["nbbo"], universe, freq_seconds=60)
    day = prices.select(F.min("date")).first()[0]
    corr = intraday_corr(prices.filter(F.col("date") == F.lit(day)), 2 * 3600)

    old_dir = os.path.join(str(tmp_path), "old")
    new_dir = os.path.join(str(tmp_path), "new")
    old_paths = export_corr_csvs(corr, old_dir, "win_start", window_seconds=2 * 3600)
    manifest = export_corr_csvs_distributed(
        corr, new_dir, "win_start", window_seconds=2 * 3600
    ).toPandas()

    assert len(manifest) == len(old_paths) > 0
    for old in old_paths:
        new = old.replace(old_dir, new_dir)
        assert os.path.exists(new), new
        with open(old, "rb") as f:
            want = f.read()
        with open(new, "rb") as f:
            got = f.read()
        assert got == want, os.path.basename(old)
