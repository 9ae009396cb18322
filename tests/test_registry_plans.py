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


def test_q66_constants_regenerate_from_the_hash_mirror():
    """q66's hot phrase and hidden-cluster texts are PINNED LITERALS
    (the DuckDB oracle needs them verbatim), derived once from
    operators/lsh_fixtures' rejection sampling against the production
    hash arithmetic.  Regenerate and compare — a drift in the hash
    scheme (MINHASH_AB, md5 form, shingle tokenization) breaks this
    loudly instead of silently demoting the fixture to a non-hot,
    non-salvageable corpus that would pass vacuously."""
    from wrds_data_pipeline_spark import driver_queries as dq
    from wrds_data_pipeline_spark.operators import lsh_fixtures as fx

    assert fx.find_hot_phrase() == dq._Q66_HOT
    regen = [t for _, t in fx.demoted_cluster_docs(len(dq._Q66_CLUSTER))]
    pinned = [
        f"{dq._Q66_BASE} xq{tag}a xq{tag}b"
        for _, tag in sorted(dq._Q66_CLUSTER.items())
    ]
    assert regen == pinned


def test_q66_salvage_is_load_bearing(spark, sf_dir):
    """The registered q66 plan must carry the salvage subtree LIVE and
    the subtree must be doing the recall work: re-running the same
    composition with salvage disabled loses EXACTLY the hidden
    cluster's 15 pairs, every emitted pair meets the threshold or is
    an accepted-bucket star edge, and no two viral-cohort noise docs
    are ever merged."""
    import itertools

    from wrds_data_pipeline_spark import driver_queries as dq
    from wrds_data_pipeline_spark.operators.dedup import near_dup_pairs

    corpus = dq._q66_corpus(spark, sf_dir)
    on = {
        (r.id_a, r.id_b): r.jaccard
        for r in dq.QUERIES["q66_gated_near_dup"](spark, sf_dir).collect()
    }
    off = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs(
            corpus, threshold=dq._Q66_T, n_hashes=12, bands=4,
            max_bucket=dq._Q66_MAXB, star_accept_frac=dq._Q66_FRAC,
            demoted_salvage_cap=0,
        ).collect()
    }
    cluster = sorted(dq._Q66_CLUSTER)
    want = {
        (min(a, b), max(a, b))
        for a, b in itertools.combinations(cluster, 2)
    }
    assert set(on) - off == want, "salvage is not the cluster's only path"
    assert all(j >= dq._Q66_T for (a, b), j in on.items() if (a, b) in want)
    cs = set(cluster)
    noise_merged = [
        (a, b)
        for (a, b) in on
        if a % 20 == 1 and b % 20 == 1 and a not in cs and b not in cs
    ]
    assert noise_merged == []
