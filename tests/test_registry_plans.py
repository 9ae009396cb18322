"""Registry-wide plan audit: structural scale-killers are banned from
every registered query's physical plan, not just the ones a human
remembered to check.  Catches future rotations that would reintroduce
an all-pairs join or a row-at-a-time Python UDF.

Banned markers:

- ``CartesianProduct`` — an unconditioned cross join.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the
  hot path must stay JVM-side; Arrow exchanges show up as
  ArrowEvalPython / MapInPandas instead and are allowed).
- ``BroadcastNestedLoopJoin`` — the shape an all-pairs comparison
  takes when one side fits the broadcast threshold at test scale
  (e.g. ``embedding_dup_pairs(n_planes=0)``): it slips past the
  CartesianProduct check but is still O(n·m) comparisons and dies at
  100×.  Legitimate exceptions — crossJoins against a PROVABLY 1-row
  relation (a global aggregate: corpus-wide doc count / total token
  count in the TF-IDF and cross-entropy pipelines) — are allowlisted
  per query WITH the expected occurrence count, so a rotation that
  adds a new BNLJ (or a new occurrence in an allowlisted query) fails
  the audit and must be justified here.
"""

from __future__ import annotations

# query -> max BroadcastNestedLoopJoin nodes allowed in its physical
# plan; every entry must be a crossJoin whose broadcast side is a
# single-row global aggregate (driver-verified 1-row relations):
#   q57_tfidf_keywords: keywords.py tf_idf_keywords — corpus doc count
#   q58_cross_entropy:  keywords.py unigram_lm / doc_cross_entropy —
#                       corpus total-token count (one per stage)
BNLJ_ALLOWED_ONE_ROW_BROADCASTS = {
    "q57_tfidf_keywords": 1,
    "q58_cross_entropy": 2,
}


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
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj > BNLJ_ALLOWED_ONE_ROW_BROADCASTS.get(name, 0):
            bad.append(f"BroadcastNestedLoopJoin x{n_bnlj}")
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders
