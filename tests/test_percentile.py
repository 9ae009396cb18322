"""Exact interpolated percentiles — pytest coverage for the operator
whose oracle row (q22) rotated out in round 5.  Spark's percentile()
implements the same linear-interpolation definition DuckDB's
quantile_cont does; verify against a closed-form replay."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_percentile_matches_numpy_linear_interpolation(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.5]
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    got = df.agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.0)), 6).alias("p0"),
        F.round(F.percentile("value", F.lit(1.0)), 6).alias("p100"),
    ).first()
    assert got["p50"] == round(float(np.percentile(vals, 50)), 6)
    assert got["p90"] == round(float(np.percentile(vals, 90)), 6)
    assert got["p0"] == min(vals)
    assert got["p100"] == max(vals)


def test_percentile_grouped(spark):
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i * i)) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, ["k", "value"])
    got = {
        r["k"]: (r["p50"], r["p90"])
        for r in df.groupBy("k")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        )
        .collect()
    }
    a = [float(i) for i in range(1, 101)]
    b = [float(i * i) for i in range(1, 11)]
    assert got["a"] == (
        round(float(np.percentile(a, 50)), 6),
        round(float(np.percentile(a, 90)), 6),
    )
    assert got["b"] == (
        round(float(np.percentile(b, 50)), 6),
        round(float(np.percentile(b, 90)), 6),
    )
