"""resample_ffill (operators/resample.py) vs pandas
``resample(freq).ffill()`` — the reference's exact call
(cloud_TAQ/taq_chunks.py:86-91) — on the nbbo fixture."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.scalars import midquote
from wrds_data_pipeline_spark.operators.resample import resample_ffill


@pytest.fixture(scope="module")
def prices(spark, wrds):
    """Midquote per (timestamp, symbol) after A1 dedup-average —
    the reference's pre-resample state (taq_chunks.py:74-84)."""
    nbbo = wrds["nbbo"]
    return (
        nbbo.withColumn("price", midquote("best_bid", "best_ask"))
        .dropna(subset=["price"])
        .groupBy("date", "sym_root", "time_m")
        .agg(F.avg("price").alias("price"))
    )


@pytest.mark.parametrize("freq", [1, 60])
def test_ffill_matches_pandas(spark, prices, freq):
    got = (
        resample_ffill(
            prices,
            key_cols=["sym_root"],
            ts_col="time_m",
            value_col="price",
            freq_seconds=freq,
            agg="last",
            day_col="date",
        )
        .toPandas()
        .sort_values(["sym_root", "date", "bucket"])
        .reset_index(drop=True)
    )

    pdf = prices.toPandas()
    frames = []
    for (sym, day), g in pdf.groupby(["sym_root", "date"]):
        s = (
            g.set_index("time_m")["price"]
            .sort_index()
            .resample(f"{freq}s")
            .last()
            .ffill()
        )
        frames.append(
            pd.DataFrame({
                "sym_root": sym, "date": day,
                "bucket": s.index, "price": s.values,
            })
        )
    want = (
        pd.concat(frames)
        .sort_values(["sym_root", "date", "bucket"])
        .reset_index(drop=True)
    )

    assert len(got) == len(want)
    assert (got["bucket"].values == want["bucket"].values).all()
    pd.testing.assert_series_equal(got["price"], want["price"], check_names=False)


def test_bfill_matches_pandas(spark, prices):
    got = (
        resample_ffill(
            prices, ["sym_root"], "time_m", "price", 60,
            agg="last", day_col="date", direction="bfill",
        )
        .toPandas()
        .sort_values(["sym_root", "date", "bucket"])
        .reset_index(drop=True)
    )
    pdf = prices.toPandas()
    frames = []
    for (sym, day), g in pdf.groupby(["sym_root", "date"]):
        s = g.set_index("time_m")["price"].sort_index().resample("60s").last().bfill()
        frames.append(pd.DataFrame({
            "sym_root": sym, "date": day, "bucket": s.index, "price": s.values,
        }))
    want = pd.concat(frames).sort_values(["sym_root", "date", "bucket"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["price"], want["price"], check_names=False)
