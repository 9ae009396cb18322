"""Registry-wide plan audit: structural scale-killers are banned from
every registered query's physical plan, not just the ones a human
remembered to check.  Catches future rotations that would reintroduce
an all-pairs join or a row-at-a-time Python UDF."""

from __future__ import annotations


def test_no_registered_plan_has_cartesian_or_python_row_udf(spark, sf_dir):
    from wrds_data_pipeline_spark import driver_queries as dq

    offenders = {}
    for name, fn in dq.QUERIES.items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = [
            marker
            for marker in ("CartesianProduct", "BatchEvalPython")
            if marker in plan
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders
