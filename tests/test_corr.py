"""pairwise_corr (operators/corr.py) and the corrmatrix plans vs
pandas ``panel.corr()`` — pairwise-complete semantics
(TAQpipeline/correlation_matrix_exporter.py:163,209)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.corr import ml_corr, pairwise_corr
from wrds_data_pipeline_spark.operators.windows import trading_calendar
from wrds_data_pipeline_spark.plans.corrmatrix import intraday_corr, multiday_corr
from wrds_data_pipeline_spark.plans.taq import day_universe_symbols, resampled_prices


@pytest.fixture(scope="module")
def prices(spark, wrds):
    universe = day_universe_symbols(wrds["taqmclink"].select("date", "permno", "ticker"))
    return resampled_prices(wrds["nbbo"], universe, freq_seconds=60).cache()


def _pandas_corr_long(panel: pd.DataFrame) -> dict[tuple, float]:
    """pandas .corr() (pairwise-complete) → {(k1,k2): corr}."""
    wide = panel.pivot_table(index="bucket", columns="permno", values="price", aggfunc="first")
    corr = wide.corr()
    out = {}
    for a in corr.columns:
        for b in corr.columns:
            out[(int(a), int(b))] = corr.loc[a, b]
    return out


def test_pairwise_corr_matches_pandas(spark, prices):
    day = prices.select(F.min("date")).first()[0]
    one_day = prices.filter(F.col("date") == F.lit(day))
    got = pairwise_corr(one_day, "bucket", "permno", "price").toPandas()
    want = _pandas_corr_long(one_day.toPandas())

    got_map = {(int(r.k1), int(r.k2)): r.corr_val for r in got.itertuples()}
    # same pair set (pandas emits NaN rows for all pairs; engine emits
    # a row per pair with any paired observations)
    for (a, b), w in want.items():
        g = got_map.get((a, b))
        if pd.isna(w):
            assert g is None or pd.isna(g), (a, b)
        else:
            assert g is not None and abs(g - w) < 1e-9, (a, b, g, w)


def test_intraday_windows_match_pandas(spark, prices):
    got = intraday_corr(prices, interval_seconds=2 * 3600).toPandas()
    pdf = prices.toPandas()

    # replay: per day, tumbling 2h windows anchored at 09:30
    anchor = pd.Timedelta(hours=9, minutes=30)
    for (day, win), g in got.groupby(["date", "win_start"]):
        day_pdf = pdf[pdf["date"] == day].copy()
        t0 = pd.Timestamp(win)
        t1 = t0 + pd.Timedelta(hours=2)
        sl = day_pdf[(day_pdf["bucket"] >= t0) & (day_pdf["bucket"] < t1)]
        want = _pandas_corr_long(sl)
        for r in g.itertuples():
            w = want[(int(r.k1), int(r.k2))]
            if pd.isna(w):
                assert pd.isna(r.corr_val)
            else:
                assert abs(r.corr_val - w) < 1e-9


def test_multiday_common_ticker_restriction(spark, wrds, prices):
    start, end = prices.select(F.min("date"), F.max("date")).first()
    cal = trading_calendar(spark, start, end)
    got = multiday_corr(prices, cal, interval_days=3)
    keys = {int(r.k1) for r in got.select("k1").distinct().collect()}
    # the symbol absent on the last fixture day must be excluded from
    # the 3-day block (A5 common-ticker intersection)
    present_per_day = (
        prices.groupBy("permno").agg(F.countDistinct("date").alias("n")).toPandas()
    )
    always = set(present_per_day[present_per_day["n"] == 3]["permno"].astype(int))
    sometimes = set(present_per_day["permno"].astype(int)) - always
    assert sometimes, "fixture should have a partially-present symbol"
    assert keys == always


def test_ml_corr_dense_path(spark, prices):
    """Fast path agrees with long-form on a dense (ffilled) panel."""
    day = prices.select(F.min("date")).first()[0]
    one_day = prices.filter(F.col("date") == F.lit(day)).dropna(subset=["price"])
    # restrict to symbols present from the first bucket (fully dense)
    counts = one_day.groupBy("permno").count()
    max_n = counts.select(F.max("count")).first()[0]
    dense_keys = counts.filter(F.col("count") == max_n).select("permno")
    dense = one_day.join(dense_keys, "permno", "left_semi")

    keys, m = ml_corr(dense, "bucket", "permno", "price")
    long = pairwise_corr(dense, "bucket", "permno", "price").toPandas()
    lmap = {(int(r.k1), int(r.k2)): r.corr_val for r in long.itertuples()}
    for i, a in enumerate(keys):
        for j, b in enumerate(keys):
            assert abs(m[i, j] - lmap[(int(a), int(b))]) < 1e-9


def test_corr_matrix_auto_routing(spark, prices):
    from wrds_data_pipeline_spark.operators.corr import corr_matrix

    day = prices.select(F.min("date")).first()[0]
    one_day = prices.filter(F.col("date") == F.lit(day)).dropna(subset=["price"])
    counts = one_day.groupBy("permno").count()
    max_n = counts.select(F.max("count")).first()[0]
    dense_keys = counts.filter(F.col("count") == max_n).select("permno")
    dense = one_day.join(dense_keys, "permno", "left_semi")

    # dense panel → both routes agree
    auto = corr_matrix(dense, "bucket", "permno", "price", method="auto").toPandas()
    pair = corr_matrix(dense, "bucket", "permno", "price", method="pairwise").toPandas()
    amap = {(int(r.k1), int(r.k2)): r.corr_val for r in auto.itertuples()}
    pmap = {(int(r.k1), int(r.k2)): r.corr_val for r in pair.itertuples()}
    assert set(amap) == set(pmap)
    for k, v in pmap.items():
        assert abs(amap[k] - v) < 1e-9

    # sparse panel → auto must pick pairwise (drop some rows)
    sparse = one_day.sample(0.5, seed=1)
    s = corr_matrix(sparse, "bucket", "permno", "price", method="auto").toPandas()
    sp = corr_matrix(sparse, "bucket", "permno", "price", method="pairwise").toPandas()
    assert len(s) == len(sp)


def _corr_map(pdf):
    return {
        tuple(r[:-1]): r[-1]
        for r in pdf.itertuples(index=False)
    }


def test_grouped_corr_matches_pairwise(spark, prices):
    """grouped-Arrow dense path ≡ self-join path, plain and windowed
    (including sparse panels: pairwise-complete + NaN placement)."""
    from wrds_data_pipeline_spark.operators.corr import grouped_corr_pandas

    day = prices.select(F.min("date")).first()[0]
    one_day = prices.filter(F.col("date") == F.lit(day))
    # sparse on purpose: missing cells exercise the common-count mask
    sparse = one_day.sample(0.6, seed=7)

    for df, wcols in [
        (one_day, []),
        (sparse, []),
        (sparse.withColumn("date", F.col("date")), ["date"]),
    ]:
        got = _corr_map(
            grouped_corr_pandas(df, "bucket", "permno", "price", wcols).toPandas()
        )
        want = _corr_map(
            pairwise_corr(df, "bucket", "permno", "price", wcols).toPandas()
        )
        assert set(got) == set(want)
        for k, w in want.items():
            g = got[k]
            if pd.isna(w):
                assert pd.isna(g), k
            else:
                assert abs(g - w) < 1e-9, (k, g, w)


def test_intraday_corr_grouped_method(spark, prices):
    from wrds_data_pipeline_spark.plans.corrmatrix import intraday_corr

    pair = intraday_corr(prices, interval_seconds=2 * 3600).toPandas()
    grp = intraday_corr(prices, interval_seconds=2 * 3600, method="grouped").toPandas()
    key = ["date", "win_start", "k1", "k2"]
    pmap = _corr_map(pair[key + ["corr_val"]])
    gmap = _corr_map(grp[key + ["corr_val"]])
    assert set(pmap) == set(gmap)
    for k, w in pmap.items():
        g = gmap[k]
        assert (pd.isna(w) and pd.isna(g)) or abs(g - w) < 1e-9, k


def test_corr_matrix_ml_route_capped_at_scale(spark):
    """The 'ml' route's driver-side k×k materialization is unreachable
    past ML_MAX_KEYS: corr_matrix re-routes to the distributed
    grouped-Arrow path (FlatMapGroupsInPandas in the plan), while a
    small-key request keeps the driver route (local relation)."""
    from wrds_data_pipeline_spark.operators.corr import ML_MAX_KEYS, corr_matrix

    wide = spark.range(ML_MAX_KEYS + 1).selectExpr(
        "explode(sequence(0, 2)) AS bucket",
        "id AS permno",
        "cast(id % 97 + bucket AS double) AS price",
    )
    out = corr_matrix(wide, "bucket", "permno", "price", method="ml")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" in plan

    small = wide.filter(F.col("permno") < 4)
    out_small = corr_matrix(small, "bucket", "permno", "price", method="ml")
    plan_small = out_small._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" not in plan_small
    assert len(out_small.columns) == 3  # k1, k2, corr_val
