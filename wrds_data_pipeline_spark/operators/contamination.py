"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark corpus by shared word n-grams.

The standard hygiene step before training on web-scale corpora (the
GPT-3 / Gopher / Llama reports all describe n-gram-overlap filters,
all public): any training document containing a long-enough n-gram
that also appears in a held-out benchmark is flagged (and usually
dropped) so eval numbers aren't inflated by memorized test items.

Scale design:
- Benchmark side first collapses to a DISTINCT int64 n-gram hash set
  — benchmarks are tiny relative to the corpus (thousands of items vs
  billions of docs), so this relation is broadcast-joined; the 100 TB
  training side is never shuffled.
- Training side explodes to (doc, hash) pairs, map-side-combines the
  per-doc distinct count, and left-joins the broadcast benchmark set.
  One wide scan, zero corpus shuffles beyond the per-doc aggregate.
- Hashing is the 60-bit md5-prefix form (dedup.shingle_hash_wide):
  membership here is EXACT, so the mod-1e9+7 MinHash space would
  false-hit clean documents at corpus scale.  Still has an exact
  DuckDB twin (no modulus, same 15-hex-char cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.text import word_shingles
from wrds_data_pipeline_spark.operators.dedup import (
    _shingled,
    shingle_hash_wide,
)


def benchmark_ngram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct hashed n-grams of the benchmark corpus: one column
    ``h`` (int64).  Small by construction — broadcast it."""
    return (
        benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("shingle")
        )
        .select(shingle_hash_wide(F.col("shingle")).alias("h"))
        .distinct()
    )


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    strategy: str = "broadcast",
) -> DataFrame:
    """Per-document contamination against ``benchmark``:
    (id, n_ngrams, n_contaminated, contamination_ratio).

    Documents shorter than ``n`` words contribute their whole text as
    one shingle (word_shingles' short-doc rule), so every doc gets a
    row — n_ngrams >= 1.

    ``strategy``: "broadcast" (default) pins the benchmark n-gram set
    to a broadcast join — the corpus side is never shuffled; right for
    eval suites (thousands of items).  "shuffle" drops the hint for
    reference sets too large for executor memory (decontaminating one
    corpus against ANOTHER corpus): the (doc, hash) relation then
    shuffles on the hash — two corpus-mass exchanges instead of zero,
    the honest price of an oversized right side.  AQE still downgrades
    to broadcast at runtime if the set turns out small.
    """
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    bench = benchmark_ngram_set(benchmark, bench_text_col, n)
    if strategy == "broadcast":
        bench = F.broadcast(bench)
    doc_grams = _shingled(docs, id_col, text_col, n, hash_fn=shingle_hash_wide)
    flagged = doc_grams.join(
        bench.withColumn("_hit", F.lit(1)), "h", "left"
    )
    return (
        flagged.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_ngrams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6).alias(
                "contamination_ratio"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_ratio: float = 0.0,
    strategy: str = "broadcast",
) -> DataFrame:
    """Drop documents whose contamination_ratio exceeds ``max_ratio``
    (default: any benchmark n-gram hit drops the doc).  Returns the
    surviving rows of ``docs`` unchanged.  ``strategy`` as in
    ``contamination_scores``."""
    scores = contamination_scores(
        docs, benchmark, id_col, text_col, bench_text_col, n, strategy
    )
    # filter on the UNROUNDED ratio: the display column rounds to 6dp,
    # so a multi-million-gram doc with one genuine hit would round to
    # 0.0 and slip past a max_ratio=0.0 cut
    dirty = scores.filter(
        F.col("n_contaminated") / F.col("n_ngrams") > F.lit(max_ratio)
    ).select(id_col)
    return docs.join(dirty, id_col, "left_anti")
