"""Streaming corpus operators: exact dedup and sessionization.

Beyond the reference's batch surface (SURVEY §2.10): a training-data
ingest pipeline is naturally a stream of documents/events, and the
two batch operators with real streaming twins are

- **exact dedup** (operators/dedup.exact_duplicates): in a stream,
  global dedup state is unbounded, so the production form is
  ``dropDuplicatesWithinWatermark`` keyed on the content fingerprint
  — the first arrival of each fingerprint passes through, repeats
  within the watermark horizon are dropped, and state is evicted once
  the watermark passes (bounded by the dedup horizon, not the corpus).
- **sessionization** (driver_queries.q33's lag + running-sum form):
  ``session_window(ts, gap)`` is the built-in incremental equivalent
  — state is one open session per key, windows emit when the
  watermark passes their close.

Edge note on session gaps: the batch formulation starts a new session
when ``diff > gap``; ``session_window`` merges when ``diff < gap`` —
they disagree only when an inter-event gap equals the boundary
exactly (measure-zero for µs event time; pin the batch rule to ``>=``
if your data has quantized timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.text import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup over a document stream.

    Emits each first-seen fingerprint's full row immediately (append
    mode); duplicates arriving within ``watermark`` of the original
    are dropped.  State: one small row per fingerprint inside the
    horizon — eviction is what makes this run forever at 100 TB/day.
    """
    return (
        stream.withColumn("fingerprint", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_sessionize(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Incremental sessionization: one row per closed session with
    the same aggregate surface as the batch form (q33) — event count,
    duration, value sum."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1e6, 6
            ).alias("duration_sec"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "duration_sec",
            "session_value",
        )
    )


def streaming_near_dedup(
    spark,
    path: str,
    schema,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    max_files_per_trigger: int | None = None,
):
    """Streaming MinHash-LSH near-dedup: each micro-batch's documents
    are signature-banded ONCE, probed against the persisted corpus
    band table (``index_dir``) for cross-batch candidates plus the
    batch's own new-vs-new pairs, and then appended to the index —
    the streaming form of the batch incremental path
    (operators/dedup.incremental_lsh_candidates).

    Invariant (the parity test's contract): with globally-unique ids,
    the union of per-batch candidate pairs over any arrival order
    equals ``minhash_lsh_candidates`` over the accumulated corpus —
    every pair is emitted exactly once, by whichever batch completes
    it.

    Scale: per-batch cost is O(|batch|) signature work + a probe join
    sized by band-bucket collisions; the accumulated corpus is never
    re-hashed.  NOTE this harness manages ``index_dir`` with
    driver-local os calls, so it is LOCAL-FILESYSTEM-ONLY (an
    s3a://-style URI would silently probe an empty index).  At
    production scale write the index bucketed by (band, band_hash)
    into a transactional table format — which also replaces the
    existence check with the catalog and prevents a failed batch
    double-appending bands (plain parquet append here is
    at-least-once; re-emitted pairs are idempotent under the
    downstream distinct / group-resolution, but the index would hold
    duplicate band rows).

    Returns the concatenated pandas of all emitted (id_a, id_b).
    """
    import os

    import pandas as pd

    from wrds_data_pipeline_spark.operators.dedup import (
        lsh_probe_bands,
        minhash_band_table,
    )

    os.makedirs(index_dir, exist_ok=True)
    out: list = []

    def _sink(bdf: DataFrame, _epoch: int) -> None:
        if bdf.isEmpty():
            return
        banded = minhash_band_table(
            bdf, id_col, text_col, k_shingle, n_hashes, bands
        ).persist()
        # the index schema is whatever minhash_band_table produces —
        # in particular _id has the stream's id type (long, string,
        # ...), so a non-long id round-trips through the stored
        # parquet unchanged instead of failing against a hardcoded
        # LongType
        band_schema = banded.schema
        has_index = any(
            f.endswith(".parquet") for f in os.listdir(index_dir)
        ) or any(
            os.path.isdir(os.path.join(index_dir, f))
            for f in os.listdir(index_dir)
        )
        stored = (
            bdf.sparkSession.read.schema(band_schema).parquet(index_dir)
            if has_index
            else bdf.sparkSession.createDataFrame([], band_schema)
        )
        pairs = lsh_probe_bands(banded, stored).toPandas()
        if len(pairs):
            out.append(pairs)
        banded.write.mode("append").parquet(index_dir)
        banded.unpersist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = reader.parquet(path).writeStream.foreachBatch(_sink).start()
    q.processAllAvailable()
    q.stop()
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["id_a", "id_b"])
    )


def run_stream_foreach_batch(
    spark,
    path: str,
    schema,
    batch_fn,
    max_files_per_trigger: int | None = None,
):
    """Apply full batch semantics per micro-batch via ``foreachBatch``
    — the streaming form of any *per-document-independent* batch
    operator.  Inside the callback each micro-batch is an ordinary
    batch DataFrame, so operators that need aggregation + anti-join
    (e.g. operators/contamination.decontaminate against a static
    benchmark — unsupported as a single append-mode streaming plan)
    run unchanged, and per-doc independence makes the union of
    per-batch outputs exactly the batch-over-everything result.

    This harness collects each batch's output as pandas and returns
    the concatenation; a production sink would write parquet/Kafka
    inside the callback instead.  Stateless scalar filters
    (gopher_keep, quality thresholds, redact_pii) do NOT need this —
    they stream natively (see the parity test).
    """
    import pandas as pd

    out: list = []

    def _sink(bdf: DataFrame, _epoch: int) -> None:
        pdf = batch_fn(bdf).toPandas()
        if len(pdf):
            out.append(pdf)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = reader.parquet(path).writeStream.foreachBatch(_sink).start()
    q.processAllAvailable()
    q.stop()
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def run_corpus_stream(
    spark,
    path: str,
    schema,
    build,
    query_name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive ``build(stream_df)`` over a staged parquet dir to
    completion via the memory sink (the local-smoke harness; see
    resample_stream.run_stream_over_parquet for the append-mode
    watermark-flush caveat)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        build(reader.parquet(path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
