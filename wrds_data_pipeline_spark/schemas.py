"""Declared StructType schemas for the WRDS-shaped tables.

The reference infers schemas from whatever each SQL SELECT returns,
with per-call overrides (``date_cols=[...]``,
``cloud_TAQ/sp500ccm_generator.py:14,21,37``) — silent dtype drift is
a real hazard there (e.g. permno becoming float after a left merge
introduces NaNs).  We declare fixed schemas once (SURVEY.md §1.3);
column sets and types follow FIXTURES.md, which cites every column's
source in the reference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# 65 firm-fundamental ratio columns, exact list from
# graph_code/pyg_graphs.py:144-156 (reference SELECT list).
FIRM_RATIO_FEATURES: tuple[str, ...] = (
    "bm", "evm", "pe_op_basic", "pe_op_dil", "pe_exi", "pe_inc", "ps", "pcf",
    "dpr", "npm", "opmbd", "opmad", "gpm", "ptpm", "cfm", "roa", "roe", "roce",
    "efftax", "aftret_eq", "aftret_invcapx", "aftret_equity", "pretret_noa",
    "pretret_earnat", "equity_invcap", "debt_invcap", "totdebt_invcap",
    "capital_ratio", "int_debt", "int_totdebt", "cash_lt", "invt_act",
    "rect_act", "debt_at", "debt_ebitda", "short_debt", "curr_debt", "lt_debt",
    "profit_lct", "ocf_lct", "cash_debt", "fcf_ocf", "lt_ppent", "dltt_be",
    "debt_assets", "debt_capital", "de_ratio", "intcov", "intcov_ratio",
    "cash_ratio", "quick_ratio", "curr_ratio", "cash_conversion", "inv_turn",
    "at_turn", "rect_turn", "pay_turn", "sale_invcap", "sale_equity",
    "sale_nwc", "rd_sale", "adv_sale", "staff_sale", "accrual", "ptb",
)

DSP500LIST = T.StructType([
    T.StructField("permno", T.IntegerType(), False),
    T.StructField("start", T.DateType(), False),
    T.StructField("ending", T.DateType(), False),
])

DSF = T.StructType([
    T.StructField("permno", T.IntegerType(), False),
    T.StructField("date", T.DateType(), False),
    T.StructField("ret", T.DoubleType(), True),
    T.StructField("prc", T.DoubleType(), True),
])

MSENAMES = T.StructType([
    T.StructField("comnam", T.StringType(), True),
    T.StructField("cusip", T.StringType(), True),
    T.StructField("ncusip", T.StringType(), True),
    T.StructField("namedt", T.DateType(), False),
    T.StructField("nameendt", T.DateType(), False),
    T.StructField("permno", T.IntegerType(), False),
    T.StructField("shrcd", T.IntegerType(), True),
    T.StructField("exchcd", T.IntegerType(), True),
    T.StructField("hsiccd", T.IntegerType(), True),
    T.StructField("ticker", T.StringType(), True),
    T.StructField("tsymbol", T.StringType(), True),
])

CCMXPF_LINKTABLE = T.StructType([
    T.StructField("gvkey", T.StringType(), False),
    T.StructField("iid", T.StringType(), True),
    T.StructField("permno", T.IntegerType(), False),
    T.StructField("linktype", T.StringType(), True),
    T.StructField("linkprim", T.StringType(), True),
    T.StructField("linkdt", T.DateType(), False),
    # nullable: NULL means the link is still active; the engine fills
    # with an explicit pinned as_of date (never "today" — determinism,
    # unlike cloud_TAQ/sp500ccm_generator.py:40).
    T.StructField("linkenddt", T.DateType(), True),
])

# One table partitioned by date replaces the reference's per-day
# physical tables taqmsec.complete_nbbo_YYYYMMDD
# (cloud_TAQ/taq_chunks.py:61; SURVEY.md S2).
NBBO = T.StructType([
    T.StructField("date", T.DateType(), False),
    # Full timestamp (day + intraday time, microsecond precision);
    # Spark has no time-of-day type (SURVEY.md §1.2).
    T.StructField("time_m", T.TimestampType(), False),
    T.StructField("sym_root", T.StringType(), False),
    T.StructField("sym_suffix", T.StringType(), True),
    T.StructField("best_bid", T.DoubleType(), True),
    T.StructField("best_ask", T.DoubleType(), True),
])

FIRM_RATIO = T.StructType(
    [
        T.StructField("gvkey", T.StringType(), False),
        T.StructField("public_date", T.DateType(), False),
    ]
    + [T.StructField(c, T.DoubleType(), True) for c in FIRM_RATIO_FEATURES]
)

TAQMCLINK = T.StructType([
    T.StructField("sym_root", T.StringType(), False),
    T.StructField("date", T.DateType(), False),
    T.StructField("permno", T.IntegerType(), False),
    T.StructField("ticker", T.StringType(), True),
])

# Long-form edge list (engine-native shape for the per-day PMFG
# adjacency matrices of graph_code/pyg_graphs.py:89-94).
ADJACENCY_EDGES = T.StructType([
    T.StructField("date", T.DateType(), False),
    T.StructField("src", T.StringType(), False),
    T.StructField("dst", T.StringType(), False),
    T.StructField("weight", T.DoubleType(), True),
])

WRDS_SCHEMAS: dict[str, T.StructType] = {
    "dsp500list": DSP500LIST,
    "dsf": DSF,
    "msenames": MSENAMES,
    "ccmxpf_linktable": CCMXPF_LINKTABLE,
    "nbbo": NBBO,
    "firm_ratio": FIRM_RATIO,
    "taqmclink": TAQMCLINK,
    "adjacency_edges": ADJACENCY_EDGES,
}
