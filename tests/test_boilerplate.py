"""Boilerplate line removal + quality-quantile filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.boilerplate import (
    boilerplate_lines,
    remove_boilerplate,
)
from wrds_data_pipeline_spark.plans.corpus import quality_quantile_filter

FOOTER = "Subscribe to our newsletter for updates"
NAV = "home | about | contact"


def _docs(spark):
    rows = [
        (1, f"unique article one body text\n{FOOTER}\n{NAV}"),
        (2, f"{NAV}\nsecond article with its own words\n{FOOTER}"),
        (3, f"third piece of content entirely\n  {FOOTER.upper()}  "),
        (4, "a document with no shared lines at all"),
        (5, f"{FOOTER}\n{NAV}"),  # all boilerplate
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_lines_detected_normalized(spark):
    # FOOTER appears in docs 1,2,3,5 (doc 3 upper+padded:
    # normalization must unify); NAV in 1,2,5
    bp = boilerplate_lines(_docs(spark), min_docs=3).collect()
    assert len(bp) == 2
    assert sorted(r.n_docs for r in bp) == [3, 4]


def test_remove_boilerplate_preserves_order(spark):
    out = {
        r.doc_id: r
        for r in remove_boilerplate(_docs(spark), min_docs=3).collect()
    }
    assert out[1].text == "unique article one body text"
    assert out[2].text == "second article with its own words"
    assert out[3].text == "third piece of content entirely"
    assert out[4].text == "a document with no shared lines at all"
    assert out[5].text == ""  # fully boilerplate -> empty, not dropped
    assert out[5].n_lines_removed == 2 and out[5].n_lines_in == 2
    assert out[1].n_lines_removed == 2 and out[1].n_lines_in == 3
    assert out[4].n_lines_removed == 0


def test_remove_boilerplate_multiline_order(spark):
    docs = spark.createDataFrame(
        [
            (1, f"alpha\n{FOOTER}\nbravo\ncharlie"),
            (2, f"{FOOTER}\nx"),
            (3, f"{FOOTER}\ny"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text
        for r in remove_boilerplate(docs, min_docs=3).collect()
    }
    assert out[1] == "alpha\nbravo\ncharlie"


def test_quality_quantile_filter_per_stratum(spark):
    # two strata with disjoint quality ranges: a global threshold
    # would wipe out the low stratum; per-stratum keeps ~30% of each
    rows = [(i, "a", float(i)) for i in range(100)] + [
        (1000 + i, "b", 1000.0 + i) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "stratum", "q"])
    kept = quality_quantile_filter(
        docs, keep_frac=0.3, stratum_col="stratum", quality_col="q"
    )
    by = {
        r.stratum: r.n
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert 25 <= by["a"] <= 35
    assert 25 <= by["b"] <= 35
    # and the kept docs are the top of each stratum
    assert kept.filter((F.col("stratum") == "a") & (F.col("doc_id") < 60)).count() == 0


def test_quality_quantile_filter_global_from_text(spark, driver_tables):
    docs = driver_tables["documents"]
    n = docs.count()
    kept = quality_quantile_filter(docs, keep_frac=0.5).count()
    # the >= cutoff keeps the whole tie mass at the median quality
    # value, so the kept fraction can exceed keep_frac by the tie width
    assert 0.5 * n <= kept < n
