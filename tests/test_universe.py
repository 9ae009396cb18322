"""Universe build (plans/universe.py) vs a pandas oracle that
replays the reference's exact dataflow
(cloud_TAQ/sp500ccm_generator.py:7-48): SQL interval join, then two
merge+query validity filters, then fillna/drop."""

from __future__ import annotations

import datetime

import pandas as pd

from wrds_data_pipeline_spark.plans.universe import build_universe

AS_OF = datetime.date(2017, 6, 30)


def pandas_oracle(tables: dict[str, pd.DataFrame]) -> pd.DataFrame:
    dsp, dsf = tables["dsp500list"], tables["dsf"]
    mse, ccm = tables["msenames"], tables["ccmxpf_linktable"].copy()

    # J1: membership interval join (sp500ccm_generator.py:7-13)
    sp500 = dsf.merge(dsp, on="permno")
    sp500 = sp500[(sp500["date"] >= sp500["start"]) & (sp500["date"] <= sp500["ending"])]

    # J2 #1: names (sp500ccm_generator.py:24-28)
    m = sp500.merge(mse, how="left", on="permno")
    m = m.query("date >= namedt and date <= nameendt")

    # link filters + pinned as-of fill (sp500ccm_generator.py:35-40)
    ccm = ccm[ccm["linktype"].str.startswith("L") & ccm["linkprim"].isin(["C", "P"])]
    ccm["linkenddt"] = ccm["linkenddt"].fillna(AS_OF)

    # J2 #2: links (sp500ccm_generator.py:43-47)
    m2 = m.merge(ccm, how="left", on="permno")
    m2 = m2.query("date >= linkdt and date <= linkenddt")
    return m2.drop(
        columns=["start", "ending", "namedt", "nameendt",
                 "linktype", "linkprim", "linkdt", "linkenddt"]
    )


def test_universe_matches_reference_semantics(spark, wrds, wrds_dir):
    got = build_universe(
        wrds["dsp500list"], wrds["dsf"], wrds["msenames"],
        wrds["ccmxpf_linktable"], as_of=AS_OF,
    )
    gpdf = got.toPandas()

    raw = {name: pd.read_parquet(f"{wrds_dir}/{name}.parquet")
           for name in ["dsp500list", "dsf", "msenames", "ccmxpf_linktable"]}
    want = pandas_oracle(raw)

    assert len(gpdf) > 0
    assert len(gpdf) == len(want)
    key = ["permno", "date", "gvkey", "iid", "ticker"]
    g = gpdf.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert set(g.columns) == set(w.columns)
    for c in ["permno", "gvkey", "iid", "ticker", "comnam"]:
        assert g[c].tolist() == w[c].tolist(), c
    pd.testing.assert_series_equal(
        g["ret"].astype(float), w["ret"].astype(float), check_names=False
    )


def test_universe_rows_drop_when_intervals_cut(spark, wrds):
    """Validity intervals must genuinely filter: the inner interval
    join output is strictly smaller than the unconstrained equi-join."""
    dsf, dsp = wrds["dsf"], wrds["dsp500list"]
    unconstrained = dsf.join(dsp, "permno").count()
    got = build_universe(
        wrds["dsp500list"], wrds["dsf"], wrds["msenames"],
        wrds["ccmxpf_linktable"], as_of=AS_OF,
    ).count()
    assert 0 < got < unconstrained


def test_universe_build_is_shuffle_free(spark, wrds):
    """SCALE.md claims the universe build is three broadcast joins
    over one dsf scan with ZERO shuffles — pin that in the plan: no
    hash-partition exchange, only broadcast exchanges."""
    import re

    uni = build_universe(
        wrds["dsp500list"], wrds["dsf"], wrds["msenames"],
        wrds["ccmxpf_linktable"], as_of=AS_OF,
    )
    plan = uni._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert not re.search(r"Exchange (hash|range)partitioning", plan), plan[:1500]
