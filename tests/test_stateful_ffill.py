"""Stateful streaming ffill == batch resample_ffill when events
arrive time-ordered across micro-batches."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.resample import resample_ffill
from wrds_data_pipeline_spark.streaming.stateful_ffill import (
    run_stateful_ffill_over_parquet,
)


def test_stateful_ffill_matches_batch(spark, wrds, tmp_path):
    nbbo = wrds["nbbo"]
    day = nbbo.select(F.min("date")).first()[0]
    src = (
        nbbo.filter(F.col("date") == F.lit(day))
        .withColumn("price", (F.col("best_bid") + F.col("best_ask")) / 2)
        .dropna(subset=["price"])
        # A1 dedup-average first (as the reference pipeline does,
        # taq_chunks.py:84) — duplicate timestamps otherwise make
        # "last in bucket" tie-broken arbitrarily in both engines
        .groupBy("sym_root", F.col("time_m").cast("timestamp").alias("ts"))
        .agg(F.avg("price").alias("price"))
    )

    # stage as 3 time-ordered files = 3 micro-batches
    stage = os.path.join(str(tmp_path), "ffill_src")
    bounds = src.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    span = (bounds.hi - bounds.lo) / 3
    for i in range(3):
        lo = bounds.lo + i * span
        hi = bounds.lo + (i + 1) * span if i < 2 else bounds.hi
        part = src.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi) if i == 2 else F.col("ts") < F.lit(hi)))
        part.coalesce(1).write.mode("append").parquet(stage)
    # flush markers: one NULL-value row per key closes the open buckets
    markers = src.select("sym_root").distinct().select(
        "sym_root",
        F.lit(bounds.hi).alias("ts"),
        F.lit(None).cast("double").alias("price"),
    )
    markers.coalesce(1).write.mode("append").parquet(stage)

    got = (
        run_stateful_ffill_over_parquet(
            spark, stage, src.schema,
            key_col="sym_root", ts_col="ts", value_col="price",
            freq_seconds=60, query_name="t_stateful_ffill",
        )
        .toPandas()
        .sort_values(["sym_root", "bucket"])
        .reset_index(drop=True)
    )

    want = (
        resample_ffill(
            src.withColumnRenamed("ts", "time_m"),
            ["sym_root"], "time_m", "price", 60, agg="last",
        )
        .toPandas()
        .rename(columns={"price": "price_w"})
        .sort_values(["sym_root", "bucket"])
        .reset_index(drop=True)
    )

    assert len(got) == len(want) > 0
    assert got["sym_root"].tolist() == want["sym_root"].tolist()
    assert (got["bucket"].values == want["bucket"].values).all()
    pd.testing.assert_series_equal(
        got["price"], want["price_w"], check_names=False
    )
