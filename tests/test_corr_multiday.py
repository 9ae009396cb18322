"""multiday_corr values vs a pandas replay of the reference's
multi-day loop (correlation_matrix_exporter.py:172-211): block the
trading days, intersect tickers, concat panels, .corr()."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.windows import trading_calendar
from wrds_data_pipeline_spark.plans.corrmatrix import multiday_corr
from wrds_data_pipeline_spark.plans.taq import day_universe_symbols, resampled_prices


def test_multiday_corr_values(spark, wrds):
    universe = day_universe_symbols(wrds["taqmclink"].select("date", "permno", "ticker"))
    prices = resampled_prices(wrds["nbbo"], universe, freq_seconds=300).cache()
    start, end = prices.select(F.min("date"), F.max("date")).first()
    cal = trading_calendar(spark, start, end)

    got = multiday_corr(prices, cal, interval_days=2).toPandas()

    pdf = prices.toPandas()
    days = sorted(pdf["date"].unique())
    # reference: chunk business-day list into blocks of 2
    blocks = [days[i:i + 2] for i in range(0, len(days), 2)]
    checked = 0
    for block in blocks:
        block_pdf = pdf[pdf["date"].isin(block)]
        # common tickers across all days of the block (A5)
        per_day = [set(block_pdf[block_pdf["date"] == d]["permno"]) for d in block]
        common = set.intersection(*per_day)
        sl = block_pdf[block_pdf["permno"].isin(common)]
        wide = sl.pivot_table(index="bucket", columns="permno", values="price")
        corr = wide.corr()

        g = got[(got["block_start"] == block[0]) & (got["block_end"] == block[-1])]
        gmap = {(int(r.k1), int(r.k2)): r.corr_val for r in g.itertuples()}
        assert {k for k, _ in gmap} == {int(c) for c in corr.columns}
        for a in corr.columns:
            for b in corr.columns:
                w = corr.loc[a, b]
                gv = gmap.get((int(a), int(b)))
                if pd.isna(w):
                    assert gv is None or pd.isna(gv)
                else:
                    assert gv is not None and abs(gv - w) < 1e-9
                checked += 1
    assert checked > 0
