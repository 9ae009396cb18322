"""Corpus curation plan: fates assigned correctly on a corpus with
planted exact dups, near dups, wrong-language and junk docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.plans.corpus import curate, curation_report

GOOD = (
    "the project is a large data processing engine and it is built to "
    "scale with the cluster for all of the usual workloads that teams "
    "run in production with careful attention to the details"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),                                  # exact dup of 0
        (2, GOOD + " extra trailing words here ok"),  # near dup of 0
        (3, "der hund und die katze ist nicht ein mit für zu der und "
            "die das ist nicht ein mit für zu der die das und ist"),   # German
        (4, "short text"),                          # too short
        (5, "x! y? z. a, b; c: d! e? f. g, h; i: j! k? l. m, n; o: p!"
            " q? r. s, t; u: v! w? x."),           # punctuation junk
        (6, "the other good document is about the engine too and it "
            "covers all of the parts that matter for the tests in "
            "this file with some more of the usual words"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_fates(spark, corpus):
    kept, audit = curate(corpus, near_dup_threshold=0.6)
    fates = {r.doc_id: r.fate for r in audit.collect()}
    assert fates[0] == "kept"
    assert fates[1] == "exact_dup"
    assert fates[2] == "near_dup"
    assert fates[3] == "lang"
    assert fates[4] == "too_short"
    assert fates[5] == "low_quality"
    assert fates[6] == "kept"
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {0, 6}


def test_curation_report(spark, corpus):
    _, audit = curate(corpus, near_dup_threshold=0.6)
    rep = {r.fate: r for r in curation_report(audit).collect()}
    assert rep["kept"].n_docs == 2
    assert rep["kept"].bpe_tokens > 0


def test_curate_driver_documents(spark, driver_tables):
    """On the driver corpus: near-dups exist (q27 finds candidates),
    so curation must drop some docs while keeping the majority."""
    docs = driver_tables["documents"]
    kept, audit = curate(docs, min_quality=0.0, min_tokens=1)
    n_in, n_kept = docs.count(), kept.count()
    fates = {r.fate: r.n_docs for r in curation_report(audit).collect()}
    assert n_kept < n_in                # the planted near-dups drop
    assert n_kept >= 0.8 * n_in        # but most of the corpus survives
    assert audit.count() == n_in        # every doc has a fate
    assert fates.get("near_dup", 0) + fates.get("exact_dup", 0) > 0


def test_curate_null_text_docs_do_not_alias(spark):
    """Null-text docs have NULL fingerprints; Window.partitionBy puts
    all NULLs in ONE partition (unlike the old join formulation, where
    NULL keys never matched), so without the per-doc sentinel two
    null-text docs would tag each other exact_dup.  Pinned intended
    behavior (ADVICE r5): each null-text doc is its OWN dedup group
    and falls through to the content gates — deterministically 'lang'
    (NULL stopword scores argmax to the tie-break tail)."""
    docs = spark.createDataFrame(
        [(0, GOOD), (1, None), (2, None)],
        schema="doc_id INT, text STRING",
    )
    _, audit = curate(docs)
    fates = {r.doc_id: r.fate for r in audit.collect()}
    assert fates[0] == "kept"
    assert fates[1] != "exact_dup" and fates[2] != "exact_dup"
    assert fates[1] == fates[2] == "lang"


def test_curate_group_dedup_closes_transitive_cluster(spark):
    """Star-shaped near-dup cluster 1—3—2 (3 resembles both 1 and 2,
    but 1 and 2 share nothing): pair mode drops only the higher id of
    each pair {3}; group mode resolves the component and keeps only
    its minimum {1}."""
    # word sets chosen so the fixed-constant MinHash banding yields
    # BOTH star edges as candidates (J≈0.48 sits below the LSH S-curve
    # knee, so candidate recall is fixture-dependent; deterministic
    # here because every hash constant is fixed)
    wa = [f"a0w{i}" for i in range(30)]
    wb = [f"b0w{i}" for i in range(30)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(wa)),
            (2, " ".join(wb)),
            (3, " ".join(wa + wb)),
        ],
        ["doc_id", "text"],
    )

    def near_dups(group_dedup):
        _, audit = curate(
            docs,
            near_dup_threshold=0.4,
            min_quality=0.0,
            min_tokens=1,
            group_dedup=group_dedup,
        )
        return {r.doc_id for r in audit.collect() if r.fate == "near_dup"}

    assert near_dups(False) == {3}
    assert near_dups(True) == {2, 3}


def test_stratified_sample_exact(spark, driver_tables):
    """Exact per-stratum counts, deterministic across runs and
    repartitionings, dict-weighted mixture support."""
    from wrds_data_pipeline_spark.plans.corpus import stratified_sample_exact

    base = driver_tables["documents"].select("doc_id", "lang")
    langs = {r["lang"] for r in base.select("lang").distinct().collect()}

    s = stratified_sample_exact(base, "lang", 3, seed=7)
    counts = {r["lang"]: r["n"] for r in
              s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang in langs:
        avail = base.filter(F.col("lang") == lang).count()
        assert counts.get(lang, 0) == min(3, avail)

    # deterministic: same ids regardless of partitioning
    a = sorted(r["doc_id"] for r in s.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(
            base.repartition(13), "lang", 3, seed=7
        ).collect()
    )
    assert a == b

    # mixture weights via dict caps
    some = sorted(langs)[:2]
    mix = stratified_sample_exact(base, "lang", {some[0]: 2, some[1]: 1}, seed=7)
    got = {r["lang"]: r["n"] for r in
           mix.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get(some[0], 0) <= 2 and got.get(some[1], 0) <= 1
    assert set(got) <= set(some)  # unlisted strata excluded


def test_hash_split_deterministic_and_proportional(spark):
    import pytest

    from wrds_data_pipeline_spark.plans.corpus import hash_split

    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = hash_split(ids, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    fr = {
        r.split: r.n / 20_000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(fr) == {"train", "val", "test"}  # exhaustive, one split each
    assert abs(fr["train"] - 0.8) < 0.02
    assert abs(fr["val"] - 0.1) < 0.02
    assert abs(fr["test"] - 0.1) < 0.02

    # pure function of (id, seed): repartitioning cannot move a row
    a = {r.doc_id: r.split for r in out.collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(
            ids.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
        ).collect()
    }
    assert a == b
    # a new seed is a different assignment
    c = {
        r.doc_id: r.split
        for r in hash_split(
            ids, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=8
        ).collect()
    }
    assert a != c

    with pytest.raises(ValueError):
        hash_split(ids, {"train": 0.8, "val": 0.1})  # doesn't sum to 1


def test_hash_split_md5_portable_cross_engine(spark):
    """method="md5" exists so the split can be recomputed OUTSIDE
    Spark: DuckDB rebuilds the same draw from md5 hex and must assign
    every row to the same split (this is q64's oracle contract, pinned
    here at unit scope with non-default weights and seed)."""
    import duckdb
    import pytest

    from wrds_data_pipeline_spark.plans.corpus import hash_split

    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    weights = {"train": 0.7, "val": 0.2, "test": 0.1}
    out = hash_split(ids, weights, seed=11, method="md5")
    got = {r.doc_id: r.split for r in out.collect()}

    cut1 = 0.7
    cut2 = 0.7 + 0.2  # same float accumulation as hash_split
    want = dict(
        duckdb.connect()
        .execute(
            f"""
            SELECT doc_id,
                   CASE WHEN u < {cut1!r} THEN 'train'
                        WHEN u < {cut2!r} THEN 'val'
                        ELSE 'test' END
            FROM (
              SELECT doc_id,
                     (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 8))::BIGINT)::DOUBLE
                       / 4294967296.0 AS u
              FROM range(5000) t(doc_id)
            )
            """
        )
        .fetchall()
    )
    assert len(got) == len(want) == 5_000
    assert got == want

    # repartition-invariant, like the default method
    b = {
        r.doc_id: r.split
        for r in hash_split(
            ids.repartition(13), weights, seed=11, method="md5"
        ).collect()
    }
    assert got == b

    with pytest.raises(ValueError):
        hash_split(ids, weights, method="sha1")  # unknown method


def test_shuffle_for_training_total_deterministic_order(spark):
    from wrds_data_pipeline_spark.plans.corpus import shuffle_for_training

    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in shuffle_for_training(ids, seed=1).collect()]
    assert sorted(a) == list(range(5_000))  # a permutation
    assert a != list(range(5_000))  # and not the identity
    # deterministic under re-run and repartition
    b = [
        r.doc_id
        for r in shuffle_for_training(ids.repartition(13), seed=1).collect()
    ]
    assert a == b
    # fresh seed, fresh permutation
    c = [r.doc_id for r in shuffle_for_training(ids, seed=2).collect()]
    assert a != c and sorted(c) == sorted(a)
    # distributed total order: range partitioning, no single-partition sort
    plan = (
        shuffle_for_training(ids, seed=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()


def test_temperature_weights_and_sample(spark):
    """alpha=1 reproduces natural shares, alpha=0 is uniform,
    alpha=0.5 lifts the low-resource stratum; the realized sample hits
    the per-stratum targets exactly and is deterministic."""
    from wrds_data_pipeline_spark.plans.corpus import (
        temperature_sample,
        temperature_weights,
    )

    rows = (
        [(i, "en") for i in range(800)]
        + [(800 + i, "de") for i in range(150)]
        + [(950 + i, "fr") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    w1 = {r.lang: r for r in temperature_weights(df, "lang", alpha=1.0).collect()}
    assert abs(w1["en"].q - 0.8) < 1e-6 and abs(w1["en"].upsample - 1.0) < 1e-6

    w0 = {r.lang: r for r in temperature_weights(df, "lang", alpha=0.0).collect()}
    assert all(abs(w0[lang].q - 1 / 3) < 1e-5 for lang in ("en", "de", "fr"))

    wh = {r.lang: r for r in temperature_weights(df, "lang", alpha=0.5).collect()}
    import math

    un = {lang: math.sqrt(n / 1000) for lang, n in (("en", 800), ("de", 150), ("fr", 50))}
    z = sum(un.values())
    for lang in un:
        assert abs(wh[lang].q - un[lang] / z) < 1e-5
    assert wh["fr"].upsample > 1.0 > wh["en"].upsample

    got = temperature_sample(df, n_total=200, stratum_col="lang", alpha=0.5, seed=7)
    by_lang = {
        r.lang: r.n for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {lang: round(un[lang] / z * 200) for lang in un}
    assert by_lang == want
    # deterministic: same seed -> same ids
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(
        r.doc_id
        for r in temperature_sample(
            df, n_total=200, stratum_col="lang", alpha=0.5, seed=7
        ).collect()
    )
    assert a == b


def test_stratified_sample_md5_portable_cross_engine(spark, sf_dir):
    """method="md5" makes the exact-count draw replayable outside
    Spark: DuckDB re-ranks by the same md5 hex key and must select the
    SAME ids per stratum (with the hex-then-id tie order)."""
    import duckdb

    from wrds_data_pipeline_spark.plans.corpus import (
        stratified_sample_exact,
        temperature_sample,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        r.doc_id
        for r in stratified_sample_exact(
            d, "lang", 7, seed=3, method="md5"
        ).collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.connect()
        .execute(
            f"""
            SELECT doc_id FROM (
              SELECT doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':3'), doc_id
                     ) AS rk
              FROM read_parquet('{sf_dir}/documents.parquet')
            ) WHERE rk <= 7
            """
        )
        .fetchall()
    )
    assert got == want and len(got) > 0

    # temperature_sample really threads the method to the ranking:
    # the md5 selection must DIFFER from the xxhash64 selection (same
    # per-stratum targets, different ranking keys) — a self-equality
    # check would pass even if `method` were silently dropped
    ids_md5 = sorted(
        r.doc_id
        for r in temperature_sample(
            d, 100, "lang", alpha=0.5, seed=3, method="md5"
        ).collect()
    )
    ids_xx = sorted(
        r.doc_id
        for r in temperature_sample(
            d, 100, "lang", alpha=0.5, seed=3, method="xxhash64"
        ).collect()
    )
    assert len(ids_md5) == len(ids_xx) > 0  # same targets either way
    assert ids_md5 != ids_xx  # different ranking family selected


def test_temperature_weights_duckdb_twin(spark, sf_dir):
    """Oracle-grade check for temperature_weights (pytest-only tail —
    registry capped at 50): DuckDB independently replays the mBERT/
    XLM-R re-weighting (p = share, q = p^alpha renormalized,
    upsample = q/p, all rounded 6dp) over the driver documents table
    and every stratum row must agree."""
    import duckdb

    from wrds_data_pipeline_spark.plans.corpus import temperature_weights

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.lang: (r.n_docs, r.p, r.q, r.upsample)
        for r in temperature_weights(d, "lang", alpha=0.3).collect()
    }
    want = {
        lang: (n, p, q, u)
        for lang, n, p, q, u in duckdb.connect()
        .execute(
            f"""
            WITH c AS (
              SELECT lang, count(*) AS n_docs
              FROM read_parquet('{sf_dir}/documents.parquet')
              GROUP BY lang
            ), t AS (
              SELECT lang, n_docs,
                     n_docs / CAST(sum(n_docs) OVER () AS DOUBLE) AS p,
                     pow(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 0.3) AS u
              FROM c
            )
            SELECT lang, n_docs, round(p, 6) AS p,
                   round(u / sum(u) OVER (), 6) AS q,
                   round((u / sum(u) OVER ()) / p, 6) AS upsample
            FROM t
            """
        )
        .fetchall()
    }
    assert len(got) == len(want) > 1
    assert got == want
