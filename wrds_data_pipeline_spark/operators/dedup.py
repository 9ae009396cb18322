"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup — all
partition-parallel, no driver-side state, designed so the candidate
generation (the quadratic part) is bounded by LSH bucketing rather
than all-pairs.

Portability note: every hash here is md5-based (available and
bit-identical in Spark and DuckDB), so each operator has an exact SQL
oracle.  At production scale you'd swap md5 for xxhash64 (~5× faster)
without changing any plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.text import fingerprint, word_shingles


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content fingerprint: one row per duplicate
    group with the canonical (min) id and the group size.  A single
    hash-aggregate — the map-side partial agg means only one record
    per (partition, fingerprint) shuffles."""
    return (
        docs.withColumn("fingerprint", fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _shingled(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, k)).alias("shingle"),
    ).distinct()


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    n_hashes: int = 12,
) -> DataFrame:
    """MinHash signature per document: for seed i, sig_i =
    min(md5(i || '|' || shingle)).  min-of-keyed-md5 is a valid
    min-wise permutation approximation, string-comparable, and
    reproducible in any engine with md5.

    Returns (_id, seed, sig) long form — one groupBy, map-side combine
    keeps the shuffle at |docs|×n_hashes rows.
    """
    sh = _shingled(docs, id_col, text_col, k_shingle)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    exploded = sh.select("_id", "shingle", seeds)
    return exploded.groupBy("_id", "seed").agg(
        F.min(F.md5(F.concat_ws("|", F.col("seed").cast("string"), "shingle").cast("binary"))).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: signatures split into ``bands`` bands of
    ``n_hashes/bands`` rows; documents colliding on any band's hash
    are candidates.  The self-join is on (band, band_hash) — i.e. only
    within buckets, never all-pairs.

    Returns (id_a, id_b) with id_a < id_b, distinct.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, k_shingle, n_hashes)
    banded = (
        sig.withColumn("band", F.floor(F.col("seed") / rows_per_band))
        .groupBy("_id", "band")
        # band hash = md5 of the ordered concat of the band's sigs
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("seed").cast("string"), "sig")
        ))).cast("binary")).alias("band_hash"))
    )
    a = banded.select(F.col("_id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("_id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity pairs ≥ threshold.

    Without ``candidates``: inverted-index join (pairs sharing ≥1
    shingle) — exact but fans out on common shingles.  With
    ``candidates`` (e.g. from LSH): verification is restricted to the
    candidate set — the scale path.
    Returns (id_a, id_b, jaccard).
    """
    sh = _shingled(docs, id_col, text_col, k_shingle)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))

    a = sh.select(F.col("_id").alias("id_a"), "shingle")
    b = sh.select(F.col("_id").alias("id_b"), "shingle")
    pairs = a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
    if candidates is not None:
        pairs = pairs.join(candidates, ["id_a", "id_b"], "left_semi")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))

    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash fingerprint: per token, hash to ``bits`` bits (md5 hex
    nibbles); each bit contributes +1/-1; fingerprint bit b is the
    sign of the sum.  Near-duplicate docs land at small Hamming
    distance.  Pure expression pipeline: explode tokens → per-bit
    votes via bit arithmetic → groupBy id.

    Returns (_id, simhash) with simhash as a ``bits``-wide bigint.

    Bit source: bit b of a token = the high bit of md5-hex nibble b
    (md5 char ∈ '89abcdef') — 32 usable independent bits, identical
    and cheap in any engine with md5 (no hex→int conversion needed).
    """
    from wrds_data_pipeline_spark.functions.text import tokens

    assert bits <= 32
    high = [c for c in "89abcdef"]
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
    ).select("_id", F.md5(F.col("tok").cast("binary")).alias("h"))
    votes = [
        F.sum(
            F.when(F.substring(F.col("h"), b + 1, 1).isin(high), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("_id").agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select("_id", fp.cast("bigint").alias("simhash"))
