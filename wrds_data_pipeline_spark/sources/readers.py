"""Source readers (SURVEY §2.1).

The reference pulls data three ways: parameterized SQL over a live
Postgres connection (`wrds.Connection().raw_sql`, S1), cached gzip
CSVs with `usecols` projection (S3,
cloud_TAQ/taq_chunks.py:14-18), and plain CSV / Parquet files
(S4/S5).  Engine equivalents:

- Parquet snapshots are the primary substrate (columnar, pushdown,
  partition pruning — replaces the per-day table templating S2).
- CSV readers take *declared* schemas: `usecols`-style projection is
  just a select, and Catalyst prunes it into the scan.
- Live pulls go through spark.read.jdbc with predicate pushdown; the
  connector is config-driven (no credentials in source — the
  reference hard-codes a username at
  TAQpipeline/correlation_matrix_exporter.py:9, which we explicitly
  do not replicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet_table(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """S5/S2: parquet scan; `columns` narrows ReadSchema (verify with
    .explain — the scan should list only these)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    columns: list[str] | None = None,
) -> DataFrame:
    """S4: CSV with declared schema (inferSchema double-scans and
    guesses — never in production paths)."""
    df = spark.read.schema(schema).option("header", header).csv(path)
    return df.select(*columns) if columns else df


def read_gzip_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    columns: list[str] | None = None,
) -> DataFrame:
    """S3: gzip CSV (codec auto-detected from extension, like
    pandas compression='gzip'); the reference's usecols=[...] becomes
    a pruned select.  NB gzip is not splittable — one task per file;
    fine for per-day artifacts, wrong for big extracts (use parquet)."""
    return read_csv(spark, path, schema, header=True, columns=columns)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1: live relational pull (the raw_sql replacement).

    `table_or_query` may be a table name or a parenthesized subquery
    alias — filters written there push to the remote planner exactly
    like the reference's WHERE-in-SQL-string.  For big pulls give a
    numeric/date `partition_column` + bounds so Spark issues
    `num_partitions` parallel range queries instead of one giant
    cursor (the distributed version of the reference's 100-symbol
    chunking, cloud_TAQ/taq_chunks.py:21-29).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_jsonl(
    spark,
    path: str,
    schema,
    keep_corrupt: bool = False,
):
    """JSON-lines source with a declared schema — the standard
    training-corpus interchange format (one document object per
    line; gzip transparent by extension, splittable when plain).

    Schema is declared, never inferred: inference scans the whole
    input once before the real read, which at 100 TB doubles the job.
    Malformed lines are dropped by default; ``keep_corrupt=True``
    switches to PERMISSIVE and surfaces the raw line in
    ``_corrupt_record`` for a quarantine sink (count it — silent
    drops hide upstream breakage).
    """
    from pyspark.sql import types as T

    if keep_corrupt:
        full = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
