"""TAQ-path throughput benchmark at reference-like volume.

The reference's hot path is O(10^8) NBBO rows per full-universe day
(BASELINE.md).  This script synthesizes N quotes Spark-side (no
driver loop), runs the full resample pipeline (midquote → clip →
dedup-mean → 1s ffill grid → re-clip), and reports rows/sec — the
number that predicts 100 TB behavior, unlike sf0.1's fixed 600k rows.

Usage: python tools/bench_taq.py [n_quotes] [n_symbols]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_quotes = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    n_symbols = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from wrds_data_pipeline_spark.session import get_spark
    from wrds_data_pipeline_spark.plans.taq import resampled_prices

    spark = get_spark("bench_taq")

    # synthesize one trading day of quotes distributed: symbol i gets
    # n_quotes/n_symbols quotes spread over 04:00-20:00
    sym = (F.col("id") % n_symbols).cast("int")
    quotes = (
        spark.range(n_quotes)
        .withColumn("sym_root", F.concat(F.lit("S"), sym.cast("string")))
        .withColumn("sym_suffix", F.lit(None).cast("string"))
        .withColumn("date", F.lit("2016-02-01").cast("date"))
        .withColumn(
            "time_m",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit("2016-02-01 04:00:00").cast("timestamp"))
                + (F.col("id") / n_quotes * 16 * 3600)
                + (F.rand(42) * 0.5)
            ),
        )
        .withColumn("mid", 50 + 50 * F.sin(F.col("id") / 1e5) + F.randn(7) * 0.01)
        .withColumn("best_bid", F.col("mid") - 0.01)
        .withColumn("best_ask", F.col("mid") + 0.01)
        .drop("id", "mid")
    )
    universe = spark.createDataFrame(
        [(f"S{i}", None, i, "2016-02-01") for i in range(n_symbols)],
        "sym_root string, sym_suffix string, permno int, date string",
    ).withColumn("date", F.col("date").cast("date"))

    t0 = time.time()
    panel = resampled_prices(quotes, universe, freq_seconds=1)
    n_out = panel.count()
    dt = time.time() - t0
    print(
        f"{n_quotes:,} quotes x {n_symbols} symbols -> {n_out:,} grid rows "
        f"in {dt:.1f}s = {n_quotes / dt / 1e6:.1f}M quotes/sec"
    )


if __name__ == "__main__":
    main()
