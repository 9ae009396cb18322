"""Streaming resample == batch resample on the same data (the
incremental/batch parity that makes the streaming variant trustworthy)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.resample import resample
from wrds_data_pipeline_spark.streaming.resample_stream import run_stream_over_parquet


def test_streaming_bucket_last_matches_batch(spark, wrds, wrds_dir, tmp_path):
    # stage one day of quotes as the "stream"
    nbbo = wrds["nbbo"]
    day = nbbo.select(F.min("date")).first()[0]
    src = (
        nbbo.filter(F.col("date") == F.lit(day))
        .withColumn("price", (F.col("best_bid") + F.col("best_ask")) / 2)
        .dropna(subset=["price"])
        .select("sym_root", F.col("time_m").cast("timestamp").alias("ts"), "price")
    )
    stage = os.path.join(str(tmp_path), "stream_src")
    src.write.mode("overwrite").parquet(stage)
    # far-future sentinel in a second file: advances the watermark in a
    # later micro-batch so the tail windows emit in append mode
    sentinel = spark.createDataFrame(
        [("_SENTINEL", (pd.Timestamp(day) + pd.Timedelta(days=2)).to_pydatetime(), 0.0)],
        src.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(stage)

    got = (
        run_stream_over_parquet(
            spark, stage, src.schema,
            key_cols=["sym_root"], ts_col="ts", value_col="price",
            freq="1 minute", query_name="t_resampled",
            max_files_per_trigger=1,
        )
        .filter(F.col("sym_root") != "_SENTINEL")
        .toPandas()
        .sort_values(["sym_root", "bucket"])
        .reset_index(drop=True)
    )

    want = (
        resample(
            src.withColumnRenamed("ts", "time_m"),
            ["sym_root"], "time_m", "price", 60, agg="last",
        )
        .toPandas()
        .sort_values(["sym_root", "bucket"])
        .reset_index(drop=True)
    )

    assert len(got) == len(want) > 0
    assert got["sym_root"].tolist() == want["sym_root"].tolist()
    assert (pd.to_datetime(got["bucket"]).values == pd.to_datetime(want["bucket"]).values).all()
    pd.testing.assert_series_equal(got["price"], want["price"], check_names=False)
