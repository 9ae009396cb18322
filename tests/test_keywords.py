"""TF-IDF keyword extraction vs a hand-computed / sklearn-style
python replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.keywords import tfidf_top_terms


def _docs(spark):
    rows = [
        (1, "spark spark spark catalyst optimizer"),
        (2, "catalyst rewrites plans and the optimizer improves plans"),
        (3, "pandas is a python dataframe library for local analysis"),
        (4, "the the the the filler document with common words only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _replay(rows, min_df=1, max_df_frac=1.0, k=3):
    """Python oracle mirroring the operator's formula."""
    tok_lists = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    df = {}
    for toks in tok_lists.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, toks in tok_lists.items():
        scores = []
        for t in set(toks):
            if df[t] < min_df or df[t] > n * max_df_frac:
                continue
            tf = toks.count(t)
            tfidf = round(tf * (math.log((n + 1) / (df[t] + 1)) + 1), 6)
            scores.append((-tfidf, t, tf))
        scores.sort()
        out[i] = [(t, tf, round(-s, 6)) for s, t, tf in scores[:k]]
    return out


def test_tfidf_matches_python_replay(spark):
    rows = [
        (1, "spark spark spark catalyst optimizer"),
        (2, "catalyst rewrites plans and the optimizer improves plans"),
        (3, "pandas is a python dataframe library for local analysis"),
        (4, "the the the the filler document with common words only"),
    ]
    got = (
        tfidf_top_terms(_docs(spark), k=3, max_df_frac=1.0)
        .orderBy("doc_id", "rank")
        .collect()
    )
    want = _replay(rows, max_df_frac=1.0, k=3)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.term, r.tf, r.tfidf))
    assert by_doc == want


def test_tfidf_max_df_prunes_common_terms(spark):
    # 'the' appears in docs 2 and 4 (2/4 = 0.5); max_df_frac=0.4
    # must exclude it everywhere
    got = tfidf_top_terms(_docs(spark), k=5, max_df_frac=0.4).collect()
    assert all(r.term != "the" for r in got)
    # doc 1's top term is its dominant unique token
    top1 = [r for r in got if r.doc_id == 1 and r.rank == 1][0]
    assert top1.term == "spark" and top1.tf == 3


def test_tfidf_driver_documents_smoke(spark, driver_tables):
    docs = driver_tables["documents"]
    out = tfidf_top_terms(docs, k=3)
    agg = out.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert agg.filter(F.col("n") > 3).count() == 0
    assert out.count() > 0
