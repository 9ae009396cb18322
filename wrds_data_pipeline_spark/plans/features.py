"""Graph-dataset feature extraction (pipeline §3.3).

Re-expresses ``graph_code/pyg_graphs.py:78-206`` without the N+1
per-ticker queries:

- node features: each (date, gvkey)'s most recent firm-fundamental
  record within a 1-year lookback, 65 ratio columns imputed to 0.0
  (pyg_graphs.py:172-180) — one as-of join for all days/tickers.
- labels: next-day price direction int(prc_t > prc_{t-1}) via lag
  over (permno, date) (pyg_graphs.py:184-195) — one window pass.
- edges: positive-weight adjacency entries per day
  (pyg_graphs.py:92-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from wrds_data_pipeline_spark.functions.scalars import direction_label
from wrds_data_pipeline_spark.operators.asof import asof_join
from wrds_data_pipeline_spark.schemas import FIRM_RATIO_FEATURES


def node_features(
    nodes: DataFrame,
    firm_ratio: DataFrame,
    feature_cols: tuple[str, ...] = FIRM_RATIO_FEATURES,
    lookback: str = "INTERVAL 365 DAYS",
) -> DataFrame:
    """nodes (date, gvkey, ...) → + 65 ratio features as-of date.

    NULL ratios (and tickers with no in-horizon record) impute to 0.0
    — exactly the reference's `float(v) if pd.notnull(v) else 0.0`
    (pyg_graphs.py:180, SURVEY F5)."""
    joined = asof_join(
        nodes,
        firm_ratio,
        key_cols="gvkey",
        left_ts="date",
        right_ts="public_date",
        value_cols=list(feature_cols),
        tolerance_expr=lookback,
    )
    for c in feature_cols:
        joined = joined.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return joined


def direction_labels(dsf: DataFrame) -> DataFrame:
    """(permno, date) → up_label = int(prc_t > prc_{t-1}) (W7/F14;
    pyg_graphs.py:190-194).  First day per permno → NULL label (the
    reference errors/skips there; we surface NULL)."""
    w = W.partitionBy("permno").orderBy("date")
    prev = F.lag("prc").over(w)
    return dsf.select(
        "permno", "date", "prc",
        prev.alias("prev_prc"),
        direction_label(F.col("prc"), prev).alias("up_label"),
    )


def positive_edges(adjacency_edges: DataFrame) -> DataFrame:
    """P18: keep positive-weight edges (`adj_df[adj_df > 0]`,
    pyg_graphs.py:92-94)."""
    return adjacency_edges.filter(F.col("weight") > 0)


def edge_degrees(edges: DataFrame) -> DataFrame:
    """Per-day node degrees from the long edge list (undirected view:
    src and dst both count).  The graph-side summary the reference
    computes implicitly when indexing tickers (pyg_graphs.py:92-94),
    exposed as a first-class aggregate."""
    s = edges.select("date", F.col("src").alias("ticker"))
    d = edges.select("date", F.col("dst").alias("ticker"))
    return (
        s.unionByName(d)
        .groupBy("date", "ticker")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def graph_tensors_per_day(
    edges: DataFrame,
    features: DataFrame,
    labels: DataFrame,
    feature_cols: tuple[str, ...] = FIRM_RATIO_FEATURES,
):
    """S9 tensor-export boundary: yields per-day dicts of numpy arrays
    (node ids, X matrix, y vector, COO edge index + weights) via one
    Arrow transfer per day — torch stays OUT of the engine core
    (SURVEY §2.9); callers wrap these in torch_geometric.data.Data.

    The iterator is driver-side by design: each day's graph is small
    (N≈500 nodes), and this is a sink, not a dataflow operator.
    """
    import numpy as np

    days = [r[0] for r in edges.select("date").distinct().orderBy("date").collect()]
    feats = features.toPandas()
    labs = labels.toPandas()
    eds = edges.toPandas()
    for day in days:
        e = eds[eds["date"] == day]
        f = feats[feats["date"] == day].sort_values("ticker")
        l = labs[labs["date"] == day]
        tickers = sorted(set(e["src"]) | set(e["dst"]))
        idx = {t: i for i, t in enumerate(tickers)}
        f = f[f["ticker"].isin(idx)]
        x = np.zeros((len(tickers), len(feature_cols)))
        for _, row in f.iterrows():
            x[idx[row["ticker"]]] = [row[c] for c in feature_cols]
        y = np.zeros(len(tickers))
        lmap = dict(zip(l["ticker"], l["up_label"])) if "ticker" in l else {}
        for t, i in idx.items():
            if t in lmap and lmap[t] is not None:
                y[i] = lmap[t]
        edge_index = np.array(
            [[idx[s] for s in e["src"]], [idx[d] for d in e["dst"]]], dtype=np.int64
        )
        edge_attr = e["weight"].to_numpy(dtype=np.float64)
        yield {
            "date": day, "tickers": tickers, "x": x, "y": y,
            "edge_index": edge_index, "edge_attr": edge_attr,
        }


def save_graphs_pt(
    edges: DataFrame,
    features: DataFrame,
    labels: DataFrame,
    out_dir: str,
    feature_cols: tuple[str, ...] = FIRM_RATIO_FEATURES,
) -> list[str]:
    """S9 parity sink: one ``torch_geometric.data.Data`` per day saved
    as ``data_{i}.pt`` — the reference's exact artifact
    (graph_code/pyg_graphs.py:201-206: Data(x, edge_index, edge_attr,
    y, id=date), torch.save per day).

    Import-guarded: torch/torch_geometric are *not* engine
    dependencies (SURVEY §2.9 keeps torch out of the core; the
    dataflow ends at numpy via ``graph_tensors_per_day``).  Without
    them this raises ImportError naming the extras; the .npz sink
    (``export_graph_tensors``) is the torch-free equivalent.
    Driver-side by design, like the reference sink (days are few and
    graphs are ~500 nodes)."""
    try:
        import torch
        from torch_geometric.data import Data
    except ImportError as exc:  # pragma: no cover - torch not in test env
        raise ImportError(
            "save_graphs_pt requires torch and torch_geometric; "
            "install them or use export_graph_tensors (.npz) instead"
        ) from exc

    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, g in enumerate(
        graph_tensors_per_day(edges, features, labels, feature_cols)
    ):
        data = Data(
            x=torch.tensor(g["x"], dtype=torch.float),
            edge_index=torch.tensor(g["edge_index"], dtype=torch.long),
            edge_attr=torch.tensor(g["edge_attr"], dtype=torch.float),
            y=torch.tensor(g["y"], dtype=torch.float),
        )
        data.id = g["date"].isoformat()
        path = os.path.join(out_dir, f"data_{i}.pt")
        torch.save(data, path)
        paths.append(path)
    return paths


def save_graphs_pt_portable(
    edges: DataFrame,
    features: DataFrame,
    labels: DataFrame,
    out_dir: str,
    feature_cols: tuple[str, ...] = FIRM_RATIO_FEATURES,
) -> list[str]:
    """Dependency-free ``.pt`` sink: one torch-LOADABLE file per day
    written via the documented torch.save zip format
    (functions/pt_format) — no torch import at write time, so the
    artifact (and its round-trip) is testable in environments where
    ``save_graphs_pt``'s guard fires.

    Deliberately a DIFFERENT artifact shape from ``save_graphs_pt``:
    a dict of plain tensors (x, edge_index, edge_attr, y) plus the
    ``id`` date string, NOT a pickled ``torch_geometric.data.Data``
    — unpickling a Data requires torch_geometric at LOAD time anyway,
    and this sink never writes something it cannot itself verify.
    ``torch.load(path)`` yields the dict; wrap in
    ``Data(**{k: v for k, v in d.items() if k != 'id'})`` if PyG is
    installed.  Same per-day layout/dtypes as the reference sink
    (graph_code/pyg_graphs.py:201-206): float32 x/edge_attr/y, int64
    edge_index."""
    import os

    import numpy as np

    from wrds_data_pipeline_spark.functions.pt_format import (
        write_pt_tensor_dict,
    )

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, g in enumerate(
        graph_tensors_per_day(edges, features, labels, feature_cols)
    ):
        path = os.path.join(out_dir, f"data_{i}.pt")
        write_pt_tensor_dict(
            path,
            {
                "x": np.asarray(g["x"], dtype=np.float32),
                "edge_index": np.asarray(g["edge_index"], dtype=np.int64),
                "edge_attr": np.asarray(g["edge_attr"], dtype=np.float32),
                "y": np.asarray(g["y"], dtype=np.float32),
            },
            meta={"id": g["date"].isoformat()},
        )
        paths.append(path)
    return paths


def export_graph_tensors(
    edges: DataFrame,
    features: DataFrame,
    labels: DataFrame,
    out_dir: str,
    feature_cols: tuple[str, ...] = FIRM_RATIO_FEATURES,
) -> DataFrame:
    """Distributed S9 sink: per-day graphs assembled and written
    (.npz) *inside* Arrow tasks — cogroup edges with the node table
    by date, so each day's tensors are built where its data lands and
    never route through the driver (unlike graph_tensors_per_day,
    whose driver-side iterator is fine for ~500-node days but not for
    thousands of days × large graphs).

    Returns a lazy manifest (date, n_nodes, n_edges, path); the files
    are written when the manifest is materialized.  ``out_dir`` must
    be a filesystem all executors share (true for local[n]; a mounted
    FS or object store via a real committer on a cluster).
    """
    from pyspark.sql import types as T

    # full outer: a label for a ticker with no feature row must still
    # land in y (the driver-side generator reads the two tables
    # independently).  Requires unique (date, ticker) keys on both
    # sides — with duplicates, "the" feature/label row is undefined
    # in any formulation.
    node_df = features.join(labels, ["date", "ticker"], "full_outer").select(
        "date", "ticker", *feature_cols, "up_label"
    )
    # callers routinely derive the node table FROM the edge table
    # (e.g. its distinct dates), which makes the two cogroup children
    # share the same `date` attribute id and trips the analyzer's
    # ambiguous-self-join check; re-deriving the node-side key as a
    # fresh expression (date_add 0 is a no-op on values) gives it a
    # new attribute identity
    node_df = node_df.withColumn("date", F.date_add("date", 0))
    manifest_schema = T.StructType([
        edges.schema["date"],
        T.StructField("n_nodes", T.IntegerType()),
        T.StructField("n_edges", T.IntegerType()),
        T.StructField("path", T.StringType()),
    ])
    fcols = list(feature_cols)
    target = out_dir

    def build(key, e_pdf, n_pdf):
        import os

        import numpy as np
        import pandas as pd

        if len(e_pdf) == 0:  # node-only days: mirror the driver
            return pd.DataFrame(columns=["date", "n_nodes", "n_edges", "path"])
        day = key[0]
        tickers = sorted(set(e_pdf["src"]) | set(e_pdf["dst"]))
        idx = {t: i for i, t in enumerate(tickers)}
        x = np.zeros((len(tickers), len(fcols)))
        y = np.zeros(len(tickers))
        for row in n_pdf.itertuples(index=False):
            i = idx.get(row.ticker)
            if i is None:
                continue
            vals = [getattr(row, c) for c in fcols]
            if not any(pd.isna(v) for v in vals):  # outer-join null row = no features
                x[i] = vals
            if row.up_label is not None and not pd.isna(row.up_label):
                y[i] = row.up_label
        edge_index = np.array(
            [[idx[s] for s in e_pdf["src"]], [idx[d] for d in e_pdf["dst"]]],
            dtype=np.int64,
        )
        edge_attr = e_pdf["weight"].to_numpy(dtype=np.float64)
        os.makedirs(target, exist_ok=True)
        path = os.path.join(target, f"{day.isoformat()}.npz")
        np.savez(
            path,
            tickers=np.array(tickers, dtype=str),
            x=x, y=y, edge_index=edge_index, edge_attr=edge_attr,
        )
        return pd.DataFrame([{
            "date": day, "n_nodes": len(tickers),
            "n_edges": len(e_pdf), "path": path,
        }])

    return (
        edges.groupBy("date")
        .cogroup(node_df.groupBy("date"))
        .applyInPandas(build, manifest_schema)
    )
