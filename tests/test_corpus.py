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
