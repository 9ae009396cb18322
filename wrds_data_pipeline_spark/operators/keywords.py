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

from wrds_data_pipeline_spark.functions.text import _bound, tokens


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 0.5,
    scope=None,
) -> DataFrame:
    """(id, term, tf, df, tfidf, rank) — top ``k`` terms per document
    by tf·idf, idf = ln((N+1)/(df+1)) + 1 (the smoothed scikit-style
    form; public).  Terms in more than ``max_df_frac`` of documents or
    fewer than ``min_df`` documents are excluded.  Ties break on term
    text for determinism.

    ``scope`` (caching.PersistScope): the tf relation feeds BOTH the
    df aggregate and the tf⋈df join — without a persist the whole
    tokenize+explode+aggregate pipeline is computed twice per action
    (physical exchange reuse does not fire across the two
    differently-shaped consumers; measured at sf0.1 the doubled read
    was ~0.45s of the ~1.0s action).  With a caller-owned scope the
    tf relation is persisted into it (the shingle-table convention,
    see dedup.near_dup_pairs); at cluster scale the same role is a
    materialized per-corpus term-frequency table.  Default None keeps
    the fully-lazy plan for composability."""
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    if scope is not None:
        tf = scope.persist(tf)
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


def _token_pairs(
    docs: DataFrame, id_col: str | None, text_col: str
) -> DataFrame:
    """(_id, w1, w2) — or (w1, w2) when ``id_col`` is None — adjacent
    token pairs per document.  The token array binds once
    (aggregate-finish shape) before the pair zip — referencing
    ``tokens(text)`` from inside the zip lambda would re-tokenize per
    pair (the SCALE.md HOF trap)."""
    pairs = _bound(
        tokens(text_col),
        F.array().cast("array<struct<w1:string,w2:string>>"),
        lambda t: F.when(
            F.size(F.filter(t, lambda x: x != "")) >= 2,
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    if id_col is None:
        return docs.select(F.explode(pairs).alias("_p")).select(
            F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
        )
    return (
        docs.select(F.col(id_col).alias("_id"), F.explode(pairs).alias("_p"))
        .select("_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def build_bigram_vocab(
    docs: DataFrame,
    size: int = 100_000,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(w1, w2, count): the ``size`` most frequent adjacent token
    pairs — the bigram analogue of ``build_vocab``, same plan shape
    (one pair explode + hash-agg, TakeOrderedAndProject top-``size``,
    ties break on the pair text)."""
    counts = (
        _token_pairs(docs, None, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    return counts.orderBy(
        F.desc("count"), F.asc("w1"), F.asc("w2")
    ).limit(size)


def doc_cross_entropy_bigram(
    docs: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """(id, n_pairs, n_oov_pairs, cross_entropy, perplexity) per
    document under an INTERPOLATED bigram LM (the CCNet-style
    perplexity filter, one order up from ``doc_cross_entropy``):

        P(w2 | w1) = λ·P_bi(w2|w1) + (1−λ)·P_uni(w2)
        P_bi(w2|w1) = (c(w1,w2) + α) / (c(w1,·) + α(V+1))
        P_uni(w2)   = (c(w2) + α) / (N + α(V+1))

    ``vocab`` is a (term, count) relation (``build_vocab``);
    ``bigrams`` a (w1, w2, count) relation (``build_bigram_vocab``).
    c(w1,·) is the context total within ``bigrams``; unseen contexts
    and pairs fall through the same add-α formula (c = 0), so every
    transition has a well-defined probability — no special backoff
    branch.  Caveat for tiny reference corpora: an unseen context
    yields P_bi = 1/(V+1), which is LARGE when the reference
    vocabulary is small (V < ~100) and compresses the fluent-vs-OOV
    perplexity gap — score against a reference big enough that
    1/(V+1) is far below typical seen-transition probabilities.  Only the n−1 transitions are scored; documents with
    fewer than 2 tokens produce no row.  ``cross_entropy`` is
    bits/transition; ``perplexity`` = 2^H.

    Scale: all three model relations (unigram probabilities, bigram
    counts, context totals) are bounded by vocab size and broadcast;
    the corpus side is one pair explode → three broadcast joins →
    one per-doc hash-agg — the q58 shape with two more broadcast
    probes, still zero corpus shuffles beyond the aggregate.  Unlike
    q58 the totals constants DO ride the exploded stream (a 1-row
    broadcast BNLJ, O(1)/row — the q57 crossJoin precedent): the
    interpolation is nonlinear in them, so they cannot move past the
    aggregate the way q58's OOV mass does."""
    totals = vocab.agg(
        F.sum("count").cast("double").alias("_n_tok"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    uni_p = vocab.crossJoin(F.broadcast(totals)).select(
        F.col("term").alias("w2"),
        (
            (F.col("count") + alpha)
            / (F.col("_n_tok") + alpha * (F.col("_v") + 1))
        ).alias("_p_uni"),
    )
    ctx = bigrams.groupBy("w1").agg(
        F.sum("count").cast("double").alias("_c_ctx")
    )
    big = bigrams.select(
        "w1", "w2", F.col("count").cast("double").alias("_c_pair")
    )
    pairs = _token_pairs(docs, id_col, text_col)
    scored = (
        pairs.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(uni_p), "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    v1 = F.col("_v") + 1
    p_bi = (F.coalesce(F.col("_c_pair"), F.lit(0.0)) + alpha) / (
        F.coalesce(F.col("_c_ctx"), F.lit(0.0)) + alpha * v1
    )
    p_uni = F.coalesce(
        F.col("_p_uni"), alpha / (F.col("_n_tok") + alpha * v1)
    )
    p = F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # decimal sum: order-independent within the engine (the q58
        # determinism rule)
        F.sum(F.log(p).cast("decimal(38,18)")).cast("double").alias("_ln"),
        F.sum(F.col("_p_uni").isNull().cast("long")).alias("n_oov_pairs"),
    )
    mean_ln = F.col("_ln") / F.col("n_pairs")
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_pairs",
        "n_oov_pairs",
        F.round(-mean_ln / math.log(2.0), 6).alias("cross_entropy"),
        F.round(F.exp(-mean_ln), 6).alias("perplexity"),
    )
