"""Deterministic WRDS-shaped synthetic fixtures (FIXTURES.md).

Generates the eight semantic test tables with the invariants that make
the reference's pipelines observable (interval joins that actually
filter, dotted tickers, null suffixes, quote gaps, pre/post-market
rows, re-entering index members, open-ended links, ...).  Pure
pandas/numpy + pyarrow — no Spark dependency, so pytest can build a
fixture dir before a session exists.  Seed is fixed (42).
"""

from __future__ import annotations

import os
from datetime import date, datetime, timedelta

import numpy as np
import pandas as pd

from wrds_data_pipeline_spark.schemas import FIRM_RATIO_FEATURES

SEED = 42

# 40 securities; a handful get dotted (class-share) tickers like BRK.B
# (exercises sym_root/sym_suffix split, cloud_TAQ/taq_chunks.py:44-45).
N_SECURITIES = 40
PERMNOS = [10000 + 25 * i for i in range(N_SECURITIES)]

START = date(2016, 1, 4)  # a Monday
N_WEEKS = 50


def trading_days(start: date = START, n_weeks: int = N_WEEKS) -> list[date]:
    """Weekday calendar (the reference skips weekends, taq_chunks.py:117)."""
    days = []
    d = start
    while len(days) < n_weeks * 5:
        if d.weekday() < 5:
            days.append(d)
        d += timedelta(days=1)
    return days


def _ticker(i: int) -> str:
    base = ""
    n = i
    while True:
        base = chr(ord("A") + n % 26) + base
        n //= 26
        if n == 0:
            break
    base = ("T" + base).upper()
    # every 7th security is a class share with a dotted suffix
    if i % 7 == 3:
        return base + "." + "AB"[i % 2]
    return base


def generate(out_dir: str, seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Write all fixture tables as parquet under ``out_dir``."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    days = trading_days()
    n_days = len(days)

    # --- dsp500list: membership intervals, some re-entry, some partial span
    rows = []
    for i, permno in enumerate(PERMNOS):
        if i % 5 == 0 and i > 0:
            # two disjoint spells (re-entry)
            a, b = days[5], days[n_days // 3]
            c, d = days[n_days // 2], days[-10]
            rows.append((permno, a, b))
            rows.append((permno, c, d))
        elif i % 5 == 1:
            rows.append((permno, days[n_days // 4], days[-1]))
        else:
            rows.append((permno, days[0], days[-1]))
    dsp500list = pd.DataFrame(rows, columns=["permno", "start", "ending"])

    # --- dsf: daily stock file
    prices = 20.0 + 80.0 * rng.random(N_SECURITIES)
    recs = []
    for i, permno in enumerate(PERMNOS):
        ret = rng.normal(0.0, 0.02, n_days)
        ret[rng.random(n_days) < 0.01] = np.nan
        prc = prices[i] * np.cumprod(np.where(np.isnan(ret), 1.0, 1.0 + ret))
        # flat days so lag labels include 0 (graph_code/pyg_graphs.py:194)
        flat = rng.random(n_days) < 0.03
        prc[flat] = np.roll(prc, 1)[flat]
        for j, d in enumerate(days):
            recs.append((permno, d, ret[j], round(float(prc[j]), 4)))
    dsf = pd.DataFrame(recs, columns=["permno", "date", "ret", "prc"])

    # --- msenames: 1-4 validity ranges per permno, ticker changes
    recs = []
    for i, permno in enumerate(PERMNOS):
        n_ranges = 1 + i % 3
        cuts = [0] + sorted(rng.integers(20, n_days - 20, n_ranges - 1).tolist()) + [n_days - 1]
        for r in range(n_ranges):
            tick = _ticker(i) if r == n_ranges - 1 else _ticker(i) + "X"
            # ranges are contiguous and non-overlapping: each starts
            # the day after the previous one ends (FIXTURES.md §3)
            lo = cuts[r] + (1 if r > 0 else 0)
            # one permno's ranges deliberately don't cover early dates
            namedt = days[lo] if not (i % 11 == 4 and r == 0) else days[lo + 15]
            recs.append((
                f"COMPANY {i}", f"{10000000 + i}", f"{20000000 + i}",
                namedt, days[cuts[r + 1]], permno,
                int(rng.choice([10, 11, 18])), int(rng.choice([1, 2, 3])),
                int(rng.integers(1000, 9999)), tick, tick,
            ))
    msenames = pd.DataFrame(recs, columns=[
        "comnam", "cusip", "ncusip", "namedt", "nameendt", "permno",
        "shrcd", "exchcd", "hsiccd", "ticker", "tsymbol",
    ])

    # --- ccmxpf_linktable: ~most permnos linked, decoy linktypes, null ends
    recs = []
    for i, permno in enumerate(PERMNOS):
        if i % 9 == 8:
            continue  # some permnos unlinked (left-join nulls)
        gvkey = f"{100000 + i:06d}"
        linktype = ["LU", "LC", "LS", "NR"][i % 4]  # NR filtered out
        linkprim = ["C", "P", "J", "N"][i % 4]      # J/N filtered out
        linkend = None if i % 6 == 5 else days[-1]  # open-ended links
        recs.append((gvkey, "01", permno, linktype, linkprim, days[0], linkend))
        if i % 4 == 0:
            # an always-valid secondary link that passes the filters
            recs.append((gvkey, "02", permno, "LU", "C", days[0], None))
    ccm = pd.DataFrame(recs, columns=[
        "gvkey", "iid", "permno", "linktype", "linkprim", "linkdt", "linkenddt",
    ])

    # --- nbbo: 3 days × ~10 symbols, gaps, pre/post-market, dup timestamps
    nbbo_days = days[20:23]
    nbbo_syms = []
    for i in range(10):
        t = _ticker(i)
        parts = t.split(".")
        nbbo_syms.append((parts[0], parts[1] if len(parts) > 1 else None))
    recs = []
    for d in nbbo_days:
        base = datetime(d.year, d.month, d.day)
        for (root, suffix) in nbbo_syms:
            mid0 = 20 + 80 * rng.random()
            # ~2000 quotes between 04:00 and 20:00, clustered in RTH
            n_q = 1800
            secs = np.sort(np.concatenate([
                rng.uniform(4 * 3600, 20 * 3600, n_q // 6),
                rng.uniform(9.5 * 3600, 16 * 3600, n_q - n_q // 6),
            ]))
            # inject gaps > resample grid: drop quotes in 2 random RTH windows
            for _ in range(2):
                g0 = rng.uniform(9.5 * 3600, 15.5 * 3600)
                secs = secs[(secs < g0) | (secs > g0 + 600)]
            mids = mid0 * np.cumprod(1 + rng.normal(0, 1e-4, len(secs)))
            spread = 0.01 + 0.02 * rng.random(len(secs))
            for k in range(len(secs)):
                ts = base + timedelta(seconds=round(float(secs[k]), 6))
                bid = round(float(mids[k] - spread[k] / 2), 4)
                ask = round(float(mids[k] + spread[k] / 2), 4)
                if rng.random() < 0.005:
                    ask = None  # NaN best_ask rows (notebook cell 12)
                recs.append((d, ts, root, suffix, bid, ask))
                if rng.random() < 0.01:  # duplicate identical timestamp
                    recs.append((d, ts, root, suffix, bid + 0.01, (ask + 0.01) if ask else None))
    # one symbol absent on the last day (common-ticker intersection test)
    nbbo = pd.DataFrame(recs, columns=["date", "time_m", "sym_root", "sym_suffix", "best_bid", "best_ask"])
    # microsecond (not ns) precision so Spark reads the same values
    nbbo["time_m"] = pd.to_datetime(nbbo["time_m"]).astype("datetime64[us]")
    drop_root = nbbo_syms[9][0]
    nbbo = nbbo[~((nbbo["date"] == nbbo_days[-1]) & (nbbo["sym_root"] == drop_root))]
    nbbo = nbbo.reset_index(drop=True)

    # --- firm_ratio: monthly fundamentals, 14 months, nulls sprinkled
    gvkeys = sorted(ccm["gvkey"].unique())
    months = pd.date_range("2015-03-31", periods=14, freq="ME").date
    recs = []
    for g in gvkeys:
        for m in months:
            feats = rng.normal(0, 1, len(FIRM_RATIO_FEATURES))
            feats[rng.random(len(feats)) < 0.05] = np.nan
            recs.append([g, m] + [round(float(x), 6) if not np.isnan(x) else None for x in feats])
    firm_ratio = pd.DataFrame(recs, columns=["gvkey", "public_date"] + list(FIRM_RATIO_FEATURES))

    # --- taqmclink: symbol→permno per day for the nbbo days
    recs = []
    for d in nbbo_days:
        for i, (root, suffix) in enumerate(nbbo_syms):
            tick = root + ("." + suffix if suffix else "")
            recs.append((root, d, PERMNOS[i], tick))
    taqmclink = pd.DataFrame(recs, columns=["sym_root", "date", "permno", "ticker"])

    # --- adjacency_edges: per-day long-form graph, incl. non-positive weights
    recs = []
    tickers = [_ticker(i) for i in range(N_SECURITIES)]
    for d in nbbo_days:
        for _ in range(int(N_SECURITIES * N_SECURITIES * 0.05)):
            a, b = rng.choice(N_SECURITIES, 2, replace=False)
            w = float(rng.normal(0.2, 0.3))  # some ≤ 0, filtered by P18
            recs.append((d, tickers[a], tickers[b], round(w, 6)))
    adjacency_edges = pd.DataFrame(recs, columns=["date", "src", "dst", "weight"])

    tables = {
        "dsp500list": dsp500list,
        "dsf": dsf,
        "msenames": msenames,
        "ccmxpf_linktable": ccm,
        "nbbo": nbbo,
        "firm_ratio": firm_ratio,
        "taqmclink": taqmclink,
        "adjacency_edges": adjacency_edges,
    }
    for name, pdf in tables.items():
        pdf.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return tables
