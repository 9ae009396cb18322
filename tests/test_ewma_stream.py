"""Streaming EWMA == batch grouped-Arrow EWMA when events arrive
time-ordered across micro-batches (the stateful_ffill contract)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.windows import ewma
from wrds_data_pipeline_spark.streaming.ewma_stream import (
    run_stateful_ewma_over_parquet,
)


def test_stateful_ewma_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(5)
    n = 120
    pdf = pd.DataFrame({
        "sym": (["A"] * 50 + ["B"] * 40 + ["C"] * 30),
        "ts": pd.to_datetime("2024-03-04 09:30:00")
        + pd.to_timedelta(np.concatenate(
            [np.arange(50), np.arange(40), np.arange(30)]
        ), unit="s"),
        "value": rng.normal(100, 5, n),
    })
    src = spark.createDataFrame(pdf)

    # stage as 3 time-ordered files = 3 micro-batches, state carries
    stage = os.path.join(str(tmp_path), "ewma_src")
    for lo, hi in [(0, 17), (17, 34), (34, 50)]:
        cut_lo = pdf["ts"].min() + pd.Timedelta(seconds=lo)
        cut_hi = pdf["ts"].min() + pd.Timedelta(seconds=hi)
        part = src.filter(
            (F.col("ts") >= F.lit(cut_lo))
            & (F.col("ts") < F.lit(cut_hi) if hi < 50 else F.lit(True))
        )
        part.coalesce(1).write.mode("append").parquet(stage)

    got = (
        run_stateful_ewma_over_parquet(
            spark, stage, src.schema,
            key_col="sym", ts_col="ts", value_col="value", alpha=0.2,
            query_name="t_ewma_stream",
        )
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    want = (
        ewma(src, ["sym"], ["ts"], "value", alpha=0.2)
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    )
    assert len(got) == len(want) == n
    assert (got["sym"] == want["sym"]).all()
    # batch (pandas C ewm) and stream (num/den recursion) are the same
    # recursion in different fp orderings — equal to ~1e-12 relative
    assert np.allclose(got["ewma"], want["ewma"], rtol=1e-11, atol=1e-11)
