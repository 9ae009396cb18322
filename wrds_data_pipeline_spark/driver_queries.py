"""Driver-facing query registry: one entry per SURVEY.md §2 operator,
expressed over the driver's TPC-H-ish tables (TESTDATA.md), each with
a DuckDB oracle SQL twin.

Determinism rules (so order-insensitive value hashes match):

- Additive float aggregates go through DECIMAL(38,6) — exact,
  order-independent arithmetic in both engines (double sums are
  order-dependent at the 1e-12 level and Spark sums partition-parallel).
- Ratio-like outputs (avg, corr, similarity) are ROUNDed to 6 places.
- Every computed column is aliased identically in both dialects.
- Ties in top-k / dedup are broken by a unique key column.

Each query function documents which SURVEY.md operator IDs it covers
and the reference site whose semantics it re-expresses.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_T = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, _T] = {}
ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin the session TZ so timestamp rendering/bucketing is identical
    # to the (TZ-naive) DuckDB oracle even if the caller's session was
    # built with a local timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with its nanosecond parquet timestamps.

    The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects; DuckDB silently *truncates* to
    microseconds.  We read the raw int64 (legacy nanosAsLong), derive
    ``ts_us`` = floor(ns/1000) — bit-identical to DuckDB's
    ``epoch_us(ts)`` — and a proper TimestampType ``ts`` from it for
    window/bucketing operators.  Scan stays native + vectorized."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = _t(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "bigint":
        e = e.withColumn("ts_us", F.expr("ts div 1000"))
    else:  # parquet already micro-precision (future-proof)
        e = e.withColumn("ts_us", F.unix_micros("ts"))
    return e.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def query(name: str, oracle: str | None):
    def deco(fn: _T) -> _T:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


DEC = "decimal(38,6)"


# ---------------------------------------------------------------------------
# Aggregation core (SURVEY A1; reference groupby-mean cloud_TAQ/taq_chunks.py:84)
# ---------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS sum_base_price,
           sum(CAST(l_extendedprice AS DECIMAL(38,6)) * (1 - CAST(l_discount AS DECIMAL(38,6)))) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 groupby-agg with map-side partial aggregation (the Spark
    analog of the reference's groupby-mean at cloud_TAQ/taq_chunks.py:84,
    TAQpipeline/correlation_matrix_exporter.py:109)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast(DEC))
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / predicates (SURVEY P1-P8; sp500ccm_generator.py:8-36)
# ---------------------------------------------------------------------------

@query(
    "q02_filter_project",
    """
    SELECT o_orderkey,
           o_orderstatus,
           substr(o_orderpriority, 1, 1) AS prio_code,
           CAST(o_totalprice AS DECIMAL(38,6)) * 2 AS doubled,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      AND o_orderstatus IN ('O', 'F')
      AND substr(o_orderpriority, 1, 1) = '1'
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection, P6 constant date-range BETWEEN
    (sp500ccm_generator.py:12), P7 IN-list (sp500ccm_generator.py:36),
    P8 prefix predicate SUBSTR(x,1,1)= (sp500ccm_generator.py:35),
    P2 alias, F12 substring, F13 cast. All pushed to the parquet scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderdate").between(
                F.lit("1995-01-01 00:00:00").cast("timestamp"),
                F.lit("1996-12-31 00:00:00").cast("timestamp"),
            )
        )
        .filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.substring("o_orderpriority", 1, 1) == "1")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            (F.col("o_totalprice").cast(DEC) * 2).alias("doubled"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY J1-J6)
# ---------------------------------------------------------------------------

@query(
    "q03_broadcast_dims",
    """
    SELECT r_name AS region, n_name AS nation,
           count(*) AS n_customers,
           sum(CAST(c_acctbal AS DECIMAL(38,6))) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q03_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment as broadcast hash joins — the engine's
    default for every small dim (SURVEY §2.3 note): no shuffle of the
    fact side at any scale."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).alias("total_acctbal"),
        )
    )


@query(
    "q04_interval_join",
    """
    SELECT o_orderpriority,
           count(*) AS n_lines,
           sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS shipped_value
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
               AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def q04_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: equi-key + interval-containment join — the universe-build
    join shape (crsp.dsp500list ⋈ crsp.dsf ON permno + date BETWEEN
    start AND ending, sp500ccm_generator.py:7-13) on driver tables:
    lineitems shipped within 60 days of their order date."""
    from wrds_data_pipeline_spark.operators.intervals import interval_join

    o = _t(spark, sf_dir, "orders").withColumn(
        "window_end", F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    joined = interval_join(
        li, o,
        keys="o_orderkey", point_col="l_shipdate",
        start_col="o_orderdate", end_col="window_end",
        broadcast_dim=False,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("shipped_value"),
    )


@query(
    "q05_semi_join",
    """
    SELECT c_mktsegment, count(*) AS n_active
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 semi-join: the reference hand-rolls this as a dynamic
    OR-of-ANDs WHERE clause pushed into SQL (cloud_TAQ/taq_chunks.py:47-55,
    SURVEY P9) — the engine uses a real left-semi hash join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "q06_anti_join",
    """
    SELECT c_mktsegment, count(*) AS n_inactive
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (SURVEY §2.7 'not present in reference' — engine
    completeness): customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


@query(
    "q07_topk_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM customer JOIN orders ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def q07_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8/O2 latest-record-per-key generalized to top-k: the engine
    form of `sort_values(desc).head(1)` (graph_code/pyg_graphs.py:179),
    with an explicit orderkey tie-break for determinism (SURVEY §5.3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q08_dedup_first",
    """
    SELECT user_id, event_id AS first_event_id, value AS first_value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q08_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 keyed dedup with *explicit ordering* — the deterministic
    engine version of drop_duplicates('permno')
    (cloud_TAQ/taq_chunks.py:36; SURVEY A2 flags the reference as
    order-nondeterministic)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("value").alias("first_value"),
        )
    )


# ---------------------------------------------------------------------------
# Window / time-series (SURVEY W1-W8)
# ---------------------------------------------------------------------------

@query(
    "q09_asof_join",
    """
    SELECT event_id, user_id, ts_us, value, last_click_value
    FROM (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, event_type,
             last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_value
      FROM events
    )
    WHERE event_type = 'purchase'
    """,
)
def q09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 as-of (latest-before) lookup, all keys at once — replaces the
    reference's N+1 per-ticker `ORDER BY public_date` + head(1) loop
    (graph_code/pyg_graphs.py:172-179): for each purchase event, the
    most recent prior click's value for the same user."""
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        e.withColumn(
            "click_value",
            F.when(F.col("event_type") == "click", F.col("value")),
        )
        .withColumn("last_click_value", F.last("click_value", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts_us", "value", "last_click_value")
    )


@query(
    "q10_tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(38,6))) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q10_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 tumbling windows via native window() as grouping key — the
    declarative form of the exporter's `current_dt += interval` loop
    (TAQpipeline/correlation_matrix_exporter.py:146-166)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q11_lag_label",
    """
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           CAST(value > lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS up_label
    FROM events
    """,
)
def q11_lag_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 lag + F14 direction label: the engine form of the
    prev/curr iloc comparison producing the binary price-direction
    label (graph_code/pyg_graphs.py:190-194)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "user_id", "ts_us", "event_id", "value",
        prev.alias("prev_value"),
        (F.col("value") > prev).cast("int").alias("up_label"),
    )


@query(
    "q12_distinct",
    "SELECT DISTINCT event_type, user_id FROM events WHERE value > 50",
)
def q12_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 distinct (permnos-of-the-day, cloud_TAQ/taq_chunks.py:122)."""
    e = _events(spark, sf_dir)
    return e.filter(F.col("value") > 50).select("event_type", "user_id").distinct()
