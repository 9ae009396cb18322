"""Micro-bench for the training-corpus operator family at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1): the operators
added beyond the 14-query headline set — dup-group resolution,
decontamination, boilerplate removal, sequence packing, incremental
LSH, script routing.  Same output convention as bench.py: one JSON
line with per-stage seconds (warm pass first, best of 2 timed).

Usage: python tools/bench_corpus.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stages(spark, sf_dir):
    from pyspark.sql import functions as F

    from wrds_data_pipeline_spark.operators.boilerplate import (
        paragraph_dedup,
        remove_boilerplate,
    )
    from wrds_data_pipeline_spark.operators.spans import span_dedup
    from wrds_data_pipeline_spark.operators.keywords import (
        build_bigram_vocab,
        build_vocab,
        doc_cross_entropy,
        doc_cross_entropy_bigram,
    )
    from wrds_data_pipeline_spark.operators.quality_model import (
        score_quality,
        train_quality_model,
    )
    from wrds_data_pipeline_spark.operators.components import (
        dedup_keep_canonical,
    )
    from wrds_data_pipeline_spark.operators.contamination import (
        contamination_scores,
    )
    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_table,
        minhash_lsh_candidates,
    )
    from wrds_data_pipeline_spark.operators.packing import (
        chunk_documents,
        pack_sequences,
    )
    from wrds_data_pipeline_spark.functions.text import detect_script

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench_set = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    # materialize the index OUTSIDE the timed region: the whole point
    # of incremental mode is that the stored corpus is never re-hashed,
    # so timing must cover only the increment + probe
    band_table = minhash_band_table(old).persist()
    band_table.count()
    # pseudo-labels are fine for a throughput bench: the scoring cost
    # is independent of what the weights are
    qmodel = train_quality_model(
        docs.withColumn("label", (F.col("doc_id") % 2).cast("int")),
        "label",
        sample=2000,
    )

    return {
        "dup_groups_resolve": lambda: dedup_keep_canonical(
            docs, minhash_lsh_candidates(docs)
        ).count(),
        "contamination": lambda: contamination_scores(
            docs, bench_set
        ).count(),
        "boilerplate": lambda: remove_boilerplate(docs, min_docs=5).count(),
        "packing": lambda: pack_sequences(docs, 4096).count(),
        "incremental_lsh": lambda: incremental_lsh_candidates(
            new, band_table
        ).count(),
        "script_route": lambda: docs.groupBy(
            detect_script("text").alias("script")
        ).count().count(),
        "cross_entropy": lambda: doc_cross_entropy(
            docs, build_vocab(docs, size=30_000)
        ).count(),
        "chunking": lambda: chunk_documents(docs, max_tokens=256).count(),
        # sum over length(text) too: with text unread Catalyst would
        # prune the whole rebuild expression out of the timed plan
        "span_dedup": lambda: span_dedup(docs, k=8)
        .agg(F.sum("n_tok_removed"), F.sum(F.length("text")))
        .collect(),
        "paragraph_dedup": lambda: paragraph_dedup(docs).count(),
        # scoring is the 100 TB path; training (driver-side, sample-
        # bounded) stays OUTSIDE the timed region like the band table
        "quality_score": lambda: score_quality(docs, qmodel)
        .agg(F.sum("prob"))
        .collect(),
        "bigram_cross_entropy": lambda: doc_cross_entropy_bigram(
            docs, build_vocab(docs, size=30_000), build_bigram_vocab(docs)
        ).count(),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from wrds_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-corpus")
    ops = stages(spark, sf_dir)

    for fn in ops.values():  # warm pass, untimed
        fn()

    times: dict[str, float] = {}
    total = 0.0
    for name, fn in ops.items():
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
            for _ in range(2)
        )
        times[name] = round(best, 3)
        total += best
    print(
        json.dumps(
            {
                "metric": "corpus_operator_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
