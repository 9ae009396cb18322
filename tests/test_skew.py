"""Salted aggregation / join equal their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
)


def test_salted_aggregate_matches_plain(spark, driver_tables):
    li = driver_tables["lineitem"]
    got = (
        salted_aggregate(
            li,
            ["l_returnflag"],
            {
                "total_qty": ("l_quantity", "sum"),
                "n": ("l_quantity", "count"),
                "max_price": ("l_extendedprice", "max"),
            },
            n_salts=8,
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    want = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count("l_quantity").alias("n"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert (got["n"] == want["n"]).all()
    assert (abs(got["total_qty"] - want["total_qty"]) < 1e-6).all()
    assert (got["max_price"] == want["max_price"]).all()


def test_salted_join_matches_plain(spark, driver_tables):
    o = driver_tables["orders"]
    c = driver_tables["customer"].withColumnRenamed("c_custkey", "o_custkey")
    got = salted_broadcast_join(o, c, "o_custkey", n_salts=4).count()
    want = o.join(c, "o_custkey").count()
    assert got == want
