"""Capture .explain("formatted") for headline queries into plans/$SPARK_GRAFT_PLAN_ROUND/ (default r15).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes plans/<round>/<q>_<suffix>.txt)
  query:  optional subset; default = every bench HEADLINE query.

The captured plan is the plan the bench times: the registered
callable's DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from wrds_data_pipeline_spark import driver_queries
    from wrds_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    names = only or HEADLINE
    for name in names:
        df = driver_queries.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
        )
        n_map = plan.count("MapInPandas") + plan.count("MapInArrow")
        joins = {
            j: plan.count(j)
            for j in (
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct",
            )
            if plan.count(j)
        }
        print(
            f"{name}: {len(plan)}B exchanges={n_ex} pyeval={n_py} "
            f"mapin={n_map} joins={joins}"
        )


if __name__ == "__main__":
    main()
