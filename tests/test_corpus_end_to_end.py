"""The full training-data pipeline, composed end-to-end on the driver
documents table: boilerplate removal -> curation (group dedup) ->
benchmark decontamination -> quality-quantile cut -> sequence packing
-> sharded write.  Each stage is tested on its own elsewhere; this
pins that they compose (schemas line up, nothing collapses to zero,
invariants survive the chain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.boilerplate import remove_boilerplate
from wrds_data_pipeline_spark.operators.components import (
    connected_components,
)
from wrds_data_pipeline_spark.operators.contamination import decontaminate
from wrds_data_pipeline_spark.operators.packing import (
    pack_sequences,
    sequence_stats,
    write_packed_shards,
)
from wrds_data_pipeline_spark.plans.corpus import (
    curate,
    quality_quantile_filter,
)

MAX_TOKENS = 2048


def test_full_training_pipeline(spark, driver_tables, tmp_path):
    docs = driver_tables["documents"]
    n0 = docs.count()

    # 1. strip cross-document boilerplate lines
    cleaned = remove_boilerplate(docs, min_docs=5).select("doc_id", "text")

    # 2. curation with group-resolved near-dedup
    kept, audit = curate(
        cleaned, min_quality=0.0, min_tokens=1, group_dedup=True
    )
    n_kept = kept.count()
    assert 0 < n_kept < n0

    # 3. decontaminate against a pseudo-benchmark (every 97th doc)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    decon = decontaminate(kept, bench, n=8)
    n_decon = decon.count()
    # the pseudo-benchmark docs that survived curation must drop
    assert n_decon < n_kept

    # 4. keep the top half by quality
    top = quality_quantile_filter(decon, keep_frac=0.5)
    n_top = top.count()
    assert 0 < n_top <= n_decon

    # 5. pack into training sequences
    packed = pack_sequences(top, MAX_TOKENS)
    assert packed.count() == n_top
    stats = sequence_stats(packed, MAX_TOKENS)
    assert stats.filter(F.col("seq_tokens") > MAX_TOKENS).count() == 0
    fill = stats.agg(F.avg("fill_ratio")).first()[0]
    assert fill > 0.5  # sequences are actually packed, not one-doc rows

    # 6. sharded write round-trip
    out = str(tmp_path / "shards")
    write_packed_shards(top, packed, out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == packed.filter(F.col("seq_id").isNotNull()).count()
    assert {"doc_id", "text", "seq_id", "seq_pos"} <= set(back.columns)


def test_components_hub_graph_converges_fast(spark):
    """A 1500-leaf hub (one page duplicated everywhere) collapses in
    the first large-star round — the star algorithm's whole point."""
    edges = [(0, i) for i in range(1, 1501)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    cc = connected_components(df, max_iters=4)
    rows = cc.collect()
    assert len(rows) == 1501
    assert {r["group_id"] for r in rows} == {0}
