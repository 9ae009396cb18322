"""Sources (SURVEY S1-S5, S10)."""

from wrds_data_pipeline_spark.sources.readers import (
    read_csv,
    read_gzip_csv,
    read_jdbc,
    read_parquet_table,
)

__all__ = ["read_csv", "read_gzip_csv", "read_jdbc", "read_parquet_table"]
