"""Panel export (S7) + panel reshaping unit tests."""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.intervals import point_in_time_filter
from wrds_data_pipeline_spark.operators.panel import to_long, to_wide
from wrds_data_pipeline_spark.plans.panel_export import (
    export_daily_panels_csv,
    write_daily_panels_long,
)
from wrds_data_pipeline_spark.plans.taq import day_universe_symbols, resampled_prices


def test_to_wide_to_long_roundtrip(spark):
    long_df = spark.createDataFrame(
        [("b1", "A", 1.0), ("b1", "B", 2.0), ("b2", "A", 3.0)],
        ["bucket", "key", "value"],
    )
    wide = to_wide(long_df, "bucket", "key", "value", keys=["A", "B"])
    assert set(wide.columns) == {"bucket", "A", "B"}
    back = to_long(wide, "bucket", ["A", "B"]).dropna(subset=["value"])
    assert back.count() == 3
    got = {(r.bucket, r.key): r.value for r in back.collect()}
    assert got[("b1", "A")] == 1.0 and got[("b2", "A")] == 3.0


def test_point_in_time_filter(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.date(2020, 1, 1), datetime.date(2020, 6, 30)),
         (2, datetime.date(2020, 1, 1), None),
         (3, datetime.date(2021, 1, 1), None)],
        "k int, start date, ending date",
    )
    got = {r.k for r in point_in_time_filter(
        df, datetime.date(2020, 7, 1), "start", "ending"
    ).collect()}
    assert got == {2}  # 1 expired, 3 not yet valid, 2 open-ended


def test_export_daily_panels(spark, wrds, tmp_path):
    universe = day_universe_symbols(wrds["taqmclink"].select("date", "permno", "ticker"))
    prices = resampled_prices(wrds["nbbo"], universe, freq_seconds=300)

    out = os.path.join(str(tmp_path), "panels_csv")
    paths = export_daily_panels_csv(prices, out)
    assert len(paths) == 3
    # reference layout: {year}/{month:02d}/{date}.csv.gz
    assert all(p.split(os.sep)[-3] == "2016" for p in paths)
    pdf = pd.read_csv(paths[0], index_col=0, compression="gzip")
    assert pdf.shape[1] >= 9  # ~10 symbols wide

    longp = os.path.join(str(tmp_path), "panels_long")
    write_daily_panels_long(prices, longp)
    assert glob.glob(os.path.join(longp, "year=2016", "month=*"))
