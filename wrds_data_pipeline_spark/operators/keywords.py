"""TF-IDF keyword extraction: the classic corpus-statistics text
analysis — per-document top-k terms by tf·idf.

Scale design:
- One token explode feeds BOTH aggregates: per-(doc, term) tf and
  per-term document frequency (df is a count over the distinct
  (doc, term) relation tf already materializes — no second pass over
  text).
- The corpus size enters as a broadcast 1-row aggregate (no driver
  `.count()` round-trip — the plan stays lazy end-to-end).
- ``max_df_frac`` prunes stopword-ish terms (df above the fraction)
  BEFORE the tf⋈df join: those are exactly the join's skewed hot
  keys, so the prune is simultaneously the relevance filter and the
  skew guard.  AQE handles whatever residual skew remains.
- Top-k per document is a window partitioned by doc — state bounded
  by document vocabulary, never corpus vocabulary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from wrds_data_pipeline_spark.functions.text import tokens


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """(id, term, tf, df, tfidf, rank) — top ``k`` terms per document
    by tf·idf, idf = ln((N+1)/(df+1)) + 1 (the smoothed scikit-style
    form; public).  Terms in more than ``max_df_frac`` of documents or
    fewer than ``min_df`` documents are excluded.  Ties break on term
    text for determinism."""
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs")
    )
    df_rel = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("_n_docs") * max_df_frac)
        )
    )
    scored = tf.join(df_rel, "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * (
                F.log((F.col("_n_docs") + 1) / (F.col("df") + 1))
                + F.lit(1.0)
            ),
            6,
        ),
    )
    w = W.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col), "term", "tf", "df", "tfidf", "rank"
        )
    )


def build_vocab(
    docs: DataFrame,
    size: int = 30_000,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(term, count, rank): the ``size`` most frequent tokens — the
    vocabulary pass of a tokenizer pipeline.  One explode +
    hash-aggregate (map-side combined); the sort+limit plans as
    TakeOrderedAndProject (per-partition top-``size``, size-row driver
    merge — never a global sort).  The rank window then runs over the
    already-limited ``size`` rows, not the vocabulary.  Ties break on
    term text."""
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    top = counts.orderBy(F.desc("count"), F.asc("term")).limit(size)
    # Column-referencing constant partition key (pmod(xxhash64(term),1)
    # = 0 for every row) — a bare literal would be constant-folded out
    # of the window spec and trigger the unpartitioned-window path;
    # this keeps WindowExec partitioned while its input is ≤size rows.
    w = W.partitionBy(F.pmod(F.xxhash64(F.col("term")), F.lit(1))).orderBy(
        F.desc("count"), F.asc("term")
    )
    return top.withColumn("rank", F.row_number().over(w))


def doc_cross_entropy(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_tokens, n_oov, cross_entropy, perplexity) per document
    under an add-``alpha``-smoothed unigram LM estimated from
    ``vocab`` (a ``(term, count)`` relation, e.g. ``build_vocab``
    output) — the classic cheap perplexity proxy for corpus quality
    filtering (CCNet-style: keep documents the reference LM finds
    unsurprising).  P(t) = (count_t + α) / (N + α(V+1)); all
    out-of-vocabulary tokens share the one reserved bucket
    P(OOV) = α / (N + α(V+1)).  ``cross_entropy`` is bits/token;
    ``perplexity`` = 2^H.  Documents with zero tokens produce no row.

    Scale: the LM totals enter as a broadcast 1-row aggregate (lazy,
    no driver round-trip); the vocab side is bounded by construction
    (``build_vocab(size=...)``) so the token→logp join broadcasts;
    the corpus side is explode → broadcast-join → one hash-agg per
    document.  OOV mass is applied per-document (after the agg), so
    the 1-row totals relation never joins the exploded token stream.
    """
    totals = vocab.agg(
        F.sum("count").cast("double").alias("_n_tok"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    denom = F.col("_n_tok") + alpha * (F.col("_v") + 1)
    vocab_logp = (
        vocab.crossJoin(F.broadcast(totals))
        .select("term", F.log((F.col("count") + alpha) / denom).alias("_logp"))
    )
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    scored = toks.join(F.broadcast(vocab_logp), "term", "left")
    per_doc = (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # decimal sum: a DOUBLE sum is partition-order-dependent
            # at the ulp level; summing through decimal(38,18) makes
            # the aggregate order-independent WITHIN each engine (repo
            # determinism rule).  Cross-engine it is near-exact, not
            # exact: Spark renders double->decimal via the shortest
            # decimal repr while DuckDB rounds the exact binary value,
            # a ~1e-16-per-term divergence that the 6dp output rounding
            # absorbs except at astronomically unlikely boundaries
            F.sum(
                F.coalesce(F.col("_logp"), F.lit(0.0)).cast("decimal(38,18)")
            ).cast("double").alias("_ln_known"),
            F.sum(F.col("_logp").isNull().cast("long")).alias("n_oov"),
        )
        .crossJoin(F.broadcast(totals))
    )
    mean_ln = (
        F.col("_ln_known") + F.col("n_oov") * F.log(F.lit(alpha) / denom)
    ) / F.col("n_tokens")
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_oov",
        F.round(-mean_ln / math.log(2.0), 6).alias("cross_entropy"),
        F.round(F.exp(-mean_ln), 6).alias("perplexity"),
    )
