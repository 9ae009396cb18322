"""Model-based quality filtering: a hashed-n-gram linear classifier
(the fastText-style filter of the DCLM / phi / Llama data reports —
all public) scored entirely JVM-side.

Heuristic quality signals (``functions/text.quality_score``,
``gopher_keep``) rank documents by fixed rules; the modern curation
stack adds a LEARNED filter: train a linear model over hashed bag-of-
n-gram features on a small labeled seed (high-quality reference
corpus vs random web), then score the full corpus and keep the top
fraction.  fastText's classifier is exactly this shape (Joulin et
al., "Bag of Tricks for Efficient Text Classification", 2016 —
hashed uni+bigram features, linear layer, softmax/sigmoid).

Scale design (100 TB):
- Scoring is the hot path: tokens → uni+bigram terms → xxhash64
  bucket → broadcast-join the (bucket, weight) table → one per-doc
  hash-agg.  The corpus is never shuffled except the per-doc agg
  (contamination_scores' class); the weight table is bounded by
  ``n_buckets`` (2^18 default ⇒ ≤ a few MB) and explicitly
  broadcast.  No Python in the plan.
- The token array is bound ONCE per row (``_bound``) before the
  uni+bigram fan-out — the per-element re-evaluation trap
  (SCALE.md) would otherwise re-tokenize per term.
- Training is driver-side numpy on a deterministic hash-sample
  (``pq_train`` precedent: TakeOrderedAndProject, never a full
  collect), with the design matrix kept SPARSE (COO triplets +
  bincount segment sums — driver memory is nnz×24 bytes ≈ tens of
  MB at sample=10k, never the n×occupied-buckets dense matrix,
  which realistic web text would push to ~20 GB).  The expensive
  part — featurizing the sample — runs in Spark with the SAME
  expression the scorer uses, so train/score skew is impossible.
- The persisted artifact (weights parquet + one-row meta) follows
  the band-index/vector-index convention: hashing scheme pinned in
  meta, mismatched scoring impossible rather than documented.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.text import _bound, tokens

#: feature-hash seed column position: xxhash64(seed_lit, term)
_EMPTY_STR_ARR = "array<string>"


def _term_array(text_col, ngram_max: int) -> F.Column:
    """array<string>: non-empty unigrams + space-joined bigrams of the
    normalized tokens.  The token array is a bound lambda variable, so
    tokenization runs once per row regardless of fan-out."""

    if ngram_max not in (1, 2):
        raise ValueError(
            f"ngram_max must be 1 or 2, got {ngram_max} — higher orders "
            "blow up the feature space without helping a linear filter"
        )

    def body(t: F.Column) -> F.Column:
        uni = F.filter(t, lambda x: x != "")
        if ngram_max < 2:
            return uni
        big = F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast(_EMPTY_STR_ARR))
        return F.concat(uni, F.filter(big, lambda x: x != " "))

    return _bound(
        tokens(text_col), F.array().cast(_EMPTY_STR_ARR), body
    )


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    ngram_max: int = 2,
    seed: int = 0,
) -> DataFrame:
    """(_id, bucket, cnt): sparse hashed bag-of-n-grams per document,
    ``bucket = pmod(xxhash64(seed, term), n_buckets)``.  The doc's L1
    mass is ``sum(cnt)`` — the scorer folds it into its per-doc agg
    rather than materializing a second corpus pass here.  Docs with
    no terms emit no rows."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    terms = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(_term_array(text_col, ngram_max)).alias("term"),
    )
    bucketed = terms.select(
        "_id",
        F.pmod(
            F.xxhash64(F.lit(seed).cast("long"), F.col("term")),
            F.lit(n_buckets).cast("long"),
        ).alias("bucket"),
    )
    return bucketed.groupBy("_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@dataclass(frozen=True)
class QualityModel:
    """A trained hashed-n-gram linear classifier.

    ``weights`` is sparse: buckets never seen in training score 0.
    ``prob = sigmoid(bias + sum_b weights[b] * cnt_b / n_terms)``.
    """

    n_buckets: int
    ngram_max: int
    seed: int
    bias: float
    weights: dict[int, float]

    def weights_df(self, spark: SparkSession) -> DataFrame:
        rows = [(int(b), float(w)) for b, w in sorted(self.weights.items())]
        return spark.createDataFrame(rows, "bucket long, weight double")


def train_quality_model(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    ngram_max: int = 2,
    seed: int = 0,
    sample: int = 10_000,
    iters: int = 500,
    lr: float = 5.0,
    l2: float = 1e-6,
) -> QualityModel:
    """Fit the classifier on a deterministic hash-sample of ``docs``
    (``label_col``: 1 = high quality, 0 = low).  Full-batch gradient
    descent from a zero init — no RNG anywhere, so the same corpus +
    seed always yields the same model.  The sample is drawn by
    ``ORDER BY xxhash64(id) LIMIT sample`` (TakeOrderedAndProject —
    bounded driver memory, never a full collect)."""
    import numpy as np

    picked = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_text"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .orderBy(F.xxhash64(F.lit(seed).cast("long"), F.col("_id")), "_id")
        .limit(sample)
    )
    feats = hashed_features(
        picked, "_id", "_text", n_buckets, ngram_max, seed
    )
    rows = (
        feats.groupBy("_id")
        .agg(
            F.collect_list(F.struct("bucket", "cnt")).alias("_f"),
            F.sum("cnt").alias("_n"),
        )
        .join(picked.select("_id", "_y"), "_id")
        .select("_f", "_n", "_y")
        .collect()
    )
    if not rows:
        raise ValueError("train_quality_model: no non-empty documents")
    # SPARSE design matrix (L1-normalized counts) in COO triplets over
    # the buckets that actually occur in the sample.  Never densified:
    # realistic web text at sample=10k saturates O(10^5) buckets, and
    # a dense n×d float64 matrix would be ~20 GB on the driver
    # (ADVICE r6).  Memory bound here is nnz×24 bytes — nnz = total
    # DISTINCT (doc, bucket) pairs, ~10^6 at defaults ⇒ tens of MB.
    buckets = sorted(
        {int(f["bucket"]) for r in rows for f in r["_f"]}
    )
    col_of = {b: j for j, b in enumerate(buckets)}
    n, d = len(rows), len(buckets)
    nnz = sum(len(r["_f"]) for r in rows)
    row_ix = np.empty(nnz, dtype=np.int64)
    col_ix = np.empty(nnz, dtype=np.int64)
    data = np.empty(nnz, dtype=np.float64)
    y = np.empty(n)
    k = 0
    for i, r in enumerate(rows):
        y[i] = r["_y"]
        inv = 1.0 / float(r["_n"])
        for f in r["_f"]:
            row_ix[k] = i
            col_ix[k] = col_of[int(f["bucket"])]
            data[k] = f["cnt"] * inv
            k += 1
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        # X @ w and X.T @ g as segment sums over the triplets
        # (np.bincount = one pass over nnz) — identical arithmetic to
        # the dense products, no scipy dependency
        z = np.bincount(row_ix, weights=data * w[col_ix], minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        xtg = np.bincount(col_ix, weights=data * g[row_ix], minlength=d)
        w -= lr * (xtg / n + l2 * w)
        b -= lr * float(g.mean())
    return QualityModel(
        n_buckets=n_buckets,
        ngram_max=ngram_max,
        seed=seed,
        bias=float(b),
        weights={buckets[j]: float(w[j]) for j in range(d) if w[j] != 0.0},
    )


def score_quality(
    docs: DataFrame,
    model: QualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_terms, logit, prob) for every row of ``docs`` — docs
    with no terms (null/empty text) score ``sigmoid(bias)``.

    Plan: explode → bucket → broadcast-join weights PER OCCURRENCE →
    one per-doc agg.  Deliberately NOT the (doc, bucket, cnt) relation
    ``hashed_features`` builds for training: pre-grouping on (doc,
    bucket) would add a second corpus exchange just to multiply the
    weight by cnt, while the per-occurrence join costs nothing extra
    (broadcast probe per row) and sums to the identical dot product —
    so the corpus side's only exchange is the per-doc aggregate, plus
    the id-join that restores termless docs."""
    spark = docs.sparkSession
    if model.n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {model.n_buckets}")
    occ = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(_term_array(text_col, model.ngram_max)).alias("term"),
    ).select(
        "_id",
        F.pmod(
            F.xxhash64(F.lit(model.seed).cast("long"), F.col("term")),
            F.lit(model.n_buckets).cast("long"),
        ).alias("bucket"),
    )
    joined = occ.join(F.broadcast(model.weights_df(spark)), "bucket", "left")
    per_doc = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_wsum"),
    )
    logit = F.lit(model.bias) + F.coalesce(
        F.col("_wsum") / F.col("n_terms"), F.lit(0.0)
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_terms"), F.lit(0)).alias("n_terms"),
            logit.alias("logit"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
        )
    )


def filter_by_quality_model(
    docs: DataFrame,
    model: QualityModel,
    min_prob: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``docs`` whose model probability is >= ``min_prob``."""
    keep = (
        score_quality(docs, model, id_col, text_col)
        .filter(F.col("prob") >= F.lit(min_prob))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def save_quality_model(model: QualityModel, path: str) -> None:
    """Persist as weights parquet + one-row meta (the band-index
    convention: the hashing scheme travels with the artifact)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("save_quality_model needs an active session")
    model.weights_df(spark).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/weights"
    )
    spark.createDataFrame(
        [
            (
                int(model.n_buckets),
                int(model.ngram_max),
                int(model.seed),
                float(model.bias),
            )
        ],
        "n_buckets long, ngram_max int, seed long, bias double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_quality_model(spark: SparkSession, path: str) -> QualityModel:
    [meta] = spark.read.parquet(f"{path}/meta").collect()
    weights = {
        int(r["bucket"]): float(r["weight"])
        for r in spark.read.parquet(f"{path}/weights").collect()
    }
    return QualityModel(
        n_buckets=int(meta["n_buckets"]),
        ngram_max=int(meta["ngram_max"]),
        seed=int(meta["seed"]),
        bias=float(meta["bias"]),
        weights=weights,
    )


def evaluate_quality_model(
    docs: DataFrame,
    label_col: str,
    model: QualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_bins: int = 1000,
) -> dict:
    """Held-out evaluation of a quality model, scale-safely:
    ``{"n", "n_pos", "accuracy", "auc"}``.

    Accuracy is one aggregate.  AUC deliberately avoids the exact
    rank-sum formulation — a global rank is a total order (one
    unpartitioned sort/window, the forbidden shape) — and instead
    bins probabilities into ``n_bins`` equal-width buckets per class
    (one hash-agg; ≤ n_bins rows collected) and computes the
    Mann-Whitney statistic from the two histograms with the standard
    half-credit tie treatment for same-bin pairs.  Exact to bin
    resolution: the error is bounded by the mass of cross-class pairs
    landing in the same bin (≤ 1/n_bins of probability space), which
    is also exactly the reported ``auc_tie_mass``."""
    scores = score_quality(docs, model, id_col, text_col).join(
        docs.select(
            F.col(id_col), F.col(label_col).cast("int").alias("_y")
        ),
        id_col,
    )
    binned = (
        scores.select(
            F.least(
                F.lit(n_bins - 1),
                F.floor(F.col("prob") * n_bins).cast("int"),
            ).alias("_b"),
            "_y",
            (
                (F.col("prob") >= threshold).cast("int") == F.col("_y")
            ).cast("long").alias("_ok"),
        )
        .groupBy("_b")
        .agg(
            F.sum("_y").alias("pos"),
            F.sum(1 - F.col("_y")).alias("neg"),
            F.sum("_ok").alias("ok"),
        )
        .collect()
    )
    if not binned:
        raise ValueError("evaluate_quality_model: empty input")
    hist = sorted((r["_b"], r["pos"], r["neg"], r["ok"]) for r in binned)
    n_pos = sum(p for _, p, _, _ in hist)
    n_neg = sum(g for _, _, g, _ in hist)
    n = n_pos + n_neg
    ok = sum(o for _, _, _, o in hist)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            "evaluate_quality_model needs both classes present"
        )
    # Mann-Whitney from histograms: positives in bin b beat all
    # negatives in lower bins, half-credit against negatives in b
    auc_num = 0.0
    tie_pairs = 0.0
    neg_below = 0
    for _, p, g, _ in hist:
        auc_num += p * neg_below + 0.5 * p * g
        tie_pairs += p * g
        neg_below += g
    return {
        "n": n,
        "n_pos": n_pos,
        "accuracy": ok / n,
        "auc": auc_num / (n_pos * n_neg),
        "auc_tie_mass": tie_pairs / (n_pos * n_neg),
    }
