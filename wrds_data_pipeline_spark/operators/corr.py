"""Pearson correlation matrices (SURVEY A4).

The reference computes ``panel.corr()`` per window
(TAQpipeline/correlation_matrix_exporter.py:163,209) — pandas
semantics: **pairwise-complete** observations (each pair of securities
correlated over the rows where *both* are non-null), min_periods=1.

Engine formulation: keep the panel in long form (bucket, key, value)
and self-join on the time bucket, then ``groupBy(k1, k2).agg(corr)``.
This reproduces pairwise-complete exactly — rows where either side is
null simply don't pair — and parallelizes over pairs.

Scale: the self-join fans out to |keys|² pairs per bucket.  For the
reference workload (~500 symbols) that's 250k pairs/bucket — Spark's
sort-merge join on bucket handles it; for much wider universes route
through ``ml_corr`` (dense path) which computes the Gram matrix in one
pass over vectors (listwise-complete — only correct when the panel
has no nulls, e.g. after W1 ffill with a full leading window;
SURVEY §4.2 routes on density).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many keys the 'ml' route's driver-side k×k materialization
# (ml_corr collects the distinct keys, then builds k² rows in Python)
# stops being "small driver-side result" and becomes a driver OOM at
# 10⁴+ keys.  corr_matrix refuses to take it past this and routes to
# the distributed grouped-Arrow path instead, so no caller can reach
# the driver path at scale.  Mirrors plans/corrmatrix.AUTO_DENSE_KEYS.
ML_MAX_KEYS = 500


def pairwise_corr(
    long_df: DataFrame,
    bucket_col: str,
    key_col: str,
    value_col: str,
    window_cols: list[str] | None = None,
    full_matrix: bool = True,
) -> DataFrame:
    """All-pairs Pearson correlation from a long panel.

    Returns (window_cols..., k1, k2, corr_val).  ``full_matrix=True``
    emits both (a,b) and (b,a) plus the unit diagonal, matching the
    shape of ``DataFrame.corr()``; False emits k1 < k2 only (half the
    shuffle for symmetric consumers).
    """
    window_cols = window_cols or []
    a = long_df.select(
        *window_cols,
        F.col(bucket_col).alias("_b"),
        F.col(key_col).alias("k1"),
        F.col(value_col).alias("_v1"),
    )
    b = long_df.select(
        *window_cols,
        F.col(bucket_col).alias("_b"),
        F.col(key_col).alias("k2"),
        F.col(value_col).alias("_v2"),
    )
    cond = [*window_cols, "_b"]
    pairs = a.join(b, cond, "inner")
    pairs = pairs.filter(F.col("k1") < F.col("k2"))
    half = pairs.groupBy(*window_cols, "k1", "k2").agg(
        F.corr("_v1", "_v2").alias("corr_val")
    )
    if not full_matrix:
        return half

    mirrored = half.select(
        *window_cols,
        F.col("k2").alias("k1"),
        F.col("k1").alias("k2"),
        "corr_val",
    )
    diag = (
        long_df.filter(F.col(value_col).isNotNull())
        .select(*window_cols, F.col(key_col).alias("k1"))
        .distinct()
        .select(*window_cols, "k1", F.col("k1").alias("k2"), F.lit(1.0).alias("corr_val"))
    )
    return half.unionByName(mirrored).unionByName(diag)


def corr_matrix(
    long_df: DataFrame,
    bucket_col: str,
    key_col: str,
    value_col: str,
    window_cols: list[str] | None = None,
    method: str = "auto",
    dense_threshold: float = 0.999,
) -> DataFrame:
    """Correlation with automatic physical-path routing.

    ``method='pairwise'`` → long-form self-join (pairwise-complete,
    always correct).  ``method='ml'`` → one Gram-matrix pass
    (listwise-complete — only equal when the panel is dense).
    ``'auto'`` measures density with one cheap aggregate (observed
    cells / (buckets × keys)) and routes: after W1 forward-fill the
    panel is dense except before each key's first quote, so wide
    universes take the O(buckets×k²) path and sparse panels keep
    exact pairwise semantics.  Returns long form either way.

    The 'ml' route (requested or auto-chosen) is additionally capped
    at ``ML_MAX_KEYS`` distinct keys: past that, its driver-side k×k
    materialization is re-routed to ``grouped_corr_pandas`` (same
    dense-panel result, computed executor-side), so the driver path
    is unreachable at scale through any argument combination.
    """
    n_keys = None
    if method == "auto":
        counts = long_df.agg(
            F.count(value_col).alias("cells"),
            F.countDistinct(bucket_col).alias("b"),
            F.countDistinct(key_col).alias("k"),
        ).first()
        n_keys = counts["k"]
        dense = counts["b"] * counts["k"] > 0 and (
            counts["cells"] / (counts["b"] * counts["k"]) >= dense_threshold
        )
        method = "ml" if dense and not window_cols else "pairwise"

    if method == "pairwise":
        return pairwise_corr(long_df, bucket_col, key_col, value_col, window_cols)

    if n_keys is None:
        n_keys = long_df.agg(F.countDistinct(key_col).alias("k")).first()["k"]
    if n_keys > ML_MAX_KEYS:
        return grouped_corr_pandas(
            long_df, bucket_col, key_col, value_col, window_cols
        )

    keys, m = ml_corr(long_df, bucket_col, key_col, value_col)
    spark = long_df.sparkSession
    rows = [
        (keys[i], keys[j], float(m[i, j]))
        for i in range(len(keys))
        for j in range(len(keys))
    ]
    out = spark.createDataFrame(rows, ["k1", "k2", "corr_val"])
    return out


def grouped_corr_pandas(
    long_df: DataFrame,
    bucket_col: str,
    key_col: str,
    value_col: str,
    window_cols: list[str] | None = None,
) -> DataFrame:
    """Dense per-window correlation via grouped Arrow batches.

    Same output contract as ``pairwise_corr(full_matrix=True)`` —
    (window_cols..., k1, k2, corr_val), pairwise-complete, mirrored,
    unit diagonal — but computed per window group with one BLAS
    ``DataFrame.corr()`` call instead of the k² bucket self-join.
    Windows are independent, so ``groupBy(window).applyInPandas``
    distributes perfectly; each task holds one window's
    buckets × keys panel (~8 bytes a cell — a 4h/1s × 5000-symbol
    window is ~0.6 GB, still one-task-sized).

    This is the wide-universe scale path for SURVEY §4.2's "self-join
    blow-up": the self-join shuffles O(buckets × k²) rows per window,
    the grouped path shuffles the long panel once.  Requires unique
    (window, bucket, key) rows (true after W1 resampling); with
    duplicates the self-join formulation is the defined semantics.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    window_cols = list(window_cols or [])
    schema = StructType(
        [long_df.schema[c] for c in window_cols]
        + [
            StructField("k1", long_df.schema[key_col].dataType),
            StructField("k2", long_df.schema[key_col].dataType),
            StructField("corr_val", DoubleType()),
        ]
    )
    bcol, kcol, vcol, wcols = bucket_col, key_col, value_col, window_cols

    def one_window(pdf):
        import numpy as np
        import pandas as pd

        wide = pdf.pivot_table(index=bcol, columns=kcol, values=vcol, aggfunc="first")
        m = wide.corr(min_periods=1).to_numpy()
        np.fill_diagonal(m, 1.0)  # every pivot column has ≥1 observation
        nn = wide.notna().to_numpy(dtype="int32")
        common = nn.T @ nn  # per-pair count of buckets where both observed
        mask = common >= 1  # pairwise_corr emits a row iff ≥1 paired bucket
        ii, jj = np.nonzero(mask)
        keys = wide.columns.to_numpy()
        out = pd.DataFrame(
            {"k1": keys[ii], "k2": keys[jj], "corr_val": m[mask]}
        )
        for c in wcols:
            out[c] = pdf[c].iloc[0]
        return out[wcols + ["k1", "k2", "corr_val"]]

    grouped = long_df.groupBy(*wcols) if wcols else long_df.groupBy(F.lit(True))
    return grouped.applyInPandas(one_window, schema)


def ml_corr(long_df: DataFrame, bucket_col: str, key_col: str, value_col: str):
    """Dense fast path: pivot to vectors and use ml.stat.Correlation
    (one distributed Gram-matrix pass; listwise-complete semantics).
    Returns (keys, numpy matrix) — small driver-side result, like the
    reference's per-window matrix."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    keys = [r[0] for r in long_df.select(key_col).distinct().orderBy(key_col).collect()]
    wide = (
        long_df.groupBy(bucket_col)
        .pivot(key_col, keys)
        .agg(F.first(value_col))
        .na.drop()
    )
    key_cols = [str(k) for k in keys]  # pivot names columns by str(value)
    vec = VectorAssembler(inputCols=key_cols, outputCol="_features").transform(wide)
    m = Correlation.corr(vec, "_features").head()[0].toArray()
    return keys, m
