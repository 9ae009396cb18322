"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries`` /
``oracle_sql`` expose one entry per implemented operator from
SURVEY.md §2 (plus the beyond-reference LLM-data operators), each
checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wrds_data_pipeline_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interval-join (the universe-build join shape, SURVEY
    J1) + broadcast dims + aggregation, on /root/testdata/sf0.001."""
    return driver_queries.q04_interval_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_queries.ORACLES)
