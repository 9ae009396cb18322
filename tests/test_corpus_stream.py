"""Streaming corpus operators (dedup, sessionization) == their batch
forms on the same data — the incremental/batch parity gate."""

from __future__ import annotations

import datetime
import os

import pandas as pd
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.streaming.corpus_stream import (
    run_corpus_stream,
    streaming_exact_dedup,
    streaming_sessionize,
)

T0 = datetime.datetime(2024, 3, 1, 9, 0, 0)


def _ts(sec: float) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=sec)


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    from wrds_data_pipeline_spark.operators.dedup import exact_duplicates

    # three files arriving in order; dup texts across files
    batches = [
        [(1, "alpha beta gamma", _ts(0)), (2, "delta epsilon", _ts(1))],
        [(3, "alpha beta gamma", _ts(60)), (4, "zeta eta", _ts(61))],
        [(5, "delta epsilon", _ts(120)), (6, "alpha beta gamma", _ts(121))],
    ]
    schema = "doc_id int, text string, ingest_ts timestamp"
    stage = os.path.join(str(tmp_path), "docs_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(stage)

    got = run_corpus_stream(
        spark, stage, spark.createDataFrame([], schema).schema,
        lambda s: streaming_exact_dedup(s, watermark="10 minutes"),
        query_name="t_dedup_stream", max_files_per_trigger=1,
    ).toPandas()

    all_docs = spark.createDataFrame([r for b in batches for r in b], schema)
    want_groups = exact_duplicates(all_docs).toPandas()

    # one survivor per fingerprint group, and the survivor is the
    # earliest arrival (file order == event-time order here)
    assert sorted(got["fingerprint"]) == sorted(want_groups["fingerprint"])
    earliest = {
        r.fingerprint: r.canonical_id for r in want_groups.itertuples()
    }  # canonical = min doc_id = first arrival in this fixture
    for r in got.itertuples():
        assert r.doc_id == earliest[r.fingerprint], r


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    # two users, sessions split by >5min gaps; µs offsets avoid the
    # exact-boundary edge documented in corpus_stream
    rows = []
    for u, base in [("u1", 0.0), ("u2", 7.5)]:
        rows += [(u, _ts(base + s), 1.0) for s in (0, 10, 200)]        # session 1
        rows += [(u, _ts(base + 1000 + s), 2.0) for s in (0, 30)]      # session 2
        rows += [(u, _ts(base + 5000), 3.0)]                           # session 3
    schema = "user_id string, ts timestamp, value double"
    stage = os.path.join(str(tmp_path), "events_stream")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(stage)
    # later-file sentinel advances the watermark so all sessions close
    spark.createDataFrame(
        [("_S", _ts(10 * 24 * 3600), 0.0)], schema
    ).coalesce(1).write.mode("append").parquet(stage)

    got = (
        run_corpus_stream(
            spark, stage, spark.createDataFrame([], schema).schema,
            lambda s: streaming_sessionize(
                s, ["user_id"], "ts", "value", gap="5 minutes", watermark="1 minute"
            ),
            query_name="t_sess_stream", max_files_per_trigger=1,
        )
        .filter(F.col("user_id") != "_S")
        .toPandas()
    )

    # batch replay: q33's lag + running-sum formulation, 5-minute gap
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"]).sort_values(
        ["user_id", "ts"]
    )
    want = []
    for u, g in pdf.groupby("user_id"):
        sid = (g["ts"].diff().dt.total_seconds() > 300).cumsum()
        for _, s in g.groupby(sid):
            want.append((
                u,
                len(s),
                round((s["ts"].max() - s["ts"].min()).total_seconds(), 6),
                s["value"].sum(),
            ))

    got_t = sorted(
        (r.user_id, r.n_events, r.duration_sec, r.session_value)
        for r in got.itertuples()
    )
    assert got_t == sorted(want)


def test_streaming_decontaminate_foreach_batch_parity(spark, tmp_path):
    """decontaminate is per-doc independent, so the union of per-batch
    outputs equals the batch-over-everything result exactly."""
    from wrds_data_pipeline_spark.operators.contamination import decontaminate
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        run_stream_foreach_batch,
    )

    bench_item = (
        "what is the capital of france the capital of france is paris "
        "and it has been the capital since the middle ages"
    )
    bench = spark.createDataFrame([(0, bench_item)], ["qid", "text"])
    batches = [
        [(1, "clean words about distributed query engines and the "
             "catalyst optimizer rewriting declarative plans")],
        [(2, "prefix " + bench_item + " suffix"),
         (3, "another clean document about arrow batches and codegen "
             "stages fusing scalar expressions")],
        [(4, "totally " + bench_item)],
    ]
    schema = "doc_id int, text string"
    stage = os.path.join(str(tmp_path), "decon_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    got = run_stream_foreach_batch(
        spark, stage, spark.createDataFrame([], schema).schema,
        lambda b: decontaminate(b, bench, n=8),
        max_files_per_trigger=1,
    )
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    want = decontaminate(all_docs, bench, n=8).toPandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"]) == [1, 3]


def test_streaming_stateless_quality_filter_native(spark, tmp_path):
    """Pure-expression filters stream natively in append mode — no
    foreachBatch needed; parity with the batch filter."""
    from wrds_data_pipeline_spark.functions.text import quality_score

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and keeps "
            "going with many normal readable words in this text",
         _ts(0)),
        (2, "x! y? z.", _ts(1)),
        (3, "another perfectly ordinary document with the usual words "
            "that score well for quality and length overall", _ts(2)),
    ]
    schema = "doc_id int, text string, ingest_ts timestamp"
    stage = os.path.join(str(tmp_path), "quality_stream")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(stage)

    got = run_corpus_stream(
        spark, stage, spark.createDataFrame([], schema).schema,
        lambda s: s.filter(quality_score("text") >= 0.5),
        query_name="t_quality_stream",
    ).toPandas()
    batch = spark.createDataFrame(rows, schema).filter(
        quality_score("text") >= 0.5
    )
    assert sorted(got["doc_id"]) == sorted(
        r.doc_id for r in batch.collect()
    )
    assert 2 not in set(got["doc_id"])


def test_streaming_near_dedup_matches_batch(spark, tmp_path):
    """Union of per-batch MinHash-band probe emissions == the batch
    LSH candidates over the accumulated corpus: every pair emitted by
    exactly one micro-batch (cross pairs by the later doc's batch,
    within pairs by their own)."""
    from wrds_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_near_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    batches = [
        [(1, base + "version one"), (2, "completely unrelated text about spark plans")],
        [(3, base + "version one"), (4, base + "version two slightly changed")],
        [(5, "completely unrelated text about spark plans"), (6, base + "version one")],
    ]
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "neardup_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    idx = os.path.join(str(tmp_path), "band_index")
    got = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1,
    )
    got_pairs = sorted(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    # no pair emitted twice
    assert len(got_pairs) == len(set(got_pairs))

    all_docs = spark.createDataFrame([r for b in batches for r in b], schema)
    want = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(all_docs).collect()
    )
    assert got_pairs == want
    # and the persisted index now answers a fresh increment without
    # touching the corpus text again
    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
    )

    stored = spark.read.parquet(idx)
    new = spark.createDataFrame([(7, base + "version one")], schema)
    probe = sorted(
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(new, stored).collect()
    )
    full = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            all_docs.unionByName(new)
        ).collect()
        if r.id_a == 7 or r.id_b == 7
    )
    assert probe == full


def test_streaming_near_dedup_string_ids(spark, tmp_path):
    """The stored band index takes its schema from the band table, so
    non-long doc ids (here strings) round-trip through the persisted
    parquet instead of failing a hardcoded LongType read."""
    from wrds_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_near_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    batches = [
        [("a1", base + "version one")],
        [("b2", base + "version one"), ("c3", "unrelated text about plans")],
        [("d4", base + "version one")],
    ]
    schema = "doc_id string, text string"
    stage = os.path.join(str(tmp_path), "neardup_stream_str")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    idx = os.path.join(str(tmp_path), "band_index_str")
    got = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1,
    )
    got_pairs = sorted(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    all_docs = spark.createDataFrame([r for b in batches for r in b], schema)
    want = sorted(
        (r.id_a, r.id_b) for r in minhash_lsh_candidates(all_docs).collect()
    )
    assert got_pairs == want == [("a1", "b2"), ("a1", "d4"), ("b2", "d4")]


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    """Union of per-batch SemDeDup emissions == batch
    semantic_dup_pairs over the accumulated corpus, each pair emitted
    exactly once regardless of arrival order (cell assignment is a
    pure function of (vector, centroids), so both members of a pair
    land in the same cell whenever they arrive)."""
    import math

    from wrds_data_pipeline_spark.operators.similarity import (
        semantic_dup_pairs,
    )
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_semantic_dedup,
    )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # two clusters + an outlier, spread across arrival batches so
    # cross-batch AND within-batch pairs both occur
    batches = [
        [(0, unit([1.0, 0.01, 0.0])), (5, unit([0.0, 0.0, 1.0]))],
        [(1, unit([1.0, 0.02, 0.0])), (3, unit([0.01, 1.0, 0.0]))],
        [(2, unit([1.0, 0.03, 0.0])), (4, unit([0.02, 1.0, 0.0]))],
    ]
    schema = "vec_id long, embedding array<double>"
    stage = os.path.join(str(tmp_path), "sem_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]
    idx = os.path.join(str(tmp_path), "cell_index")
    got = streaming_semantic_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        centroids=cents, threshold=0.999, max_files_per_trigger=1,
    )
    got_pairs = sorted(
        map(tuple, got[["id_a", "id_b", "cell", "cos_sim"]].values.tolist())
    )
    assert len(got_pairs) == len({(a, b) for a, b, _, _ in got_pairs})

    all_vecs = spark.createDataFrame([r for b in batches for r in b], schema)
    want = sorted(
        (r.id_a, r.id_b, r.cell, r.cos_sim)
        for r in semantic_dup_pairs(all_vecs, cents, threshold=0.999).collect()
    )
    assert got_pairs == want
    assert want  # the fixture really plants near-pairs
    # the persisted per-cell index holds every assigned vector
    assert spark.read.parquet(idx).count() == 6


def test_streaming_semantic_dedup_order_invariant(spark, tmp_path):
    """The union of emitted pairs is identical under a reversed
    arrival order (each cross-batch pair is completed by whichever
    member arrives later; the set algebra cannot depend on which one
    that is)."""
    import math

    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_semantic_dedup,
    )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    batches = [
        [(0, unit([1.0, 0.01, 0.0])), (5, unit([0.0, 0.0, 1.0]))],
        [(1, unit([1.0, 0.02, 0.0])), (3, unit([0.01, 1.0, 0.0]))],
        [(2, unit([1.0, 0.03, 0.0])), (4, unit([0.02, 1.0, 0.0]))],
    ]
    schema = "vec_id long, embedding array<double>"
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]

    results = []
    for tag, order in (("fwd", batches), ("rev", list(reversed(batches)))):
        stage = os.path.join(str(tmp_path), f"sem_{tag}")
        for rows in order:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(stage)
        got = streaming_semantic_dedup(
            spark, stage, spark.createDataFrame([], schema).schema,
            os.path.join(str(tmp_path), f"idx_{tag}"),
            centroids=cents, threshold=0.999, max_files_per_trigger=1,
        )
        results.append(
            sorted(map(tuple, got[["id_a", "id_b", "cell", "cos_sim"]].values.tolist()))
        )
    assert results[0] == results[1]
    assert results[0]


def test_streaming_paragraph_dedup(spark, tmp_path):
    """Keep-first paragraph dedup across micro-batches: every distinct
    paragraph survives in exactly ONE emitted document (whichever
    arrived first), bypass/blank handling matches the batch operator,
    and a single-batch stream reproduces the batch result exactly."""
    from wrds_data_pipeline_spark.operators.boilerplate import paragraph_dedup
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_paragraph_dedup,
    )

    quote = "shared quotation that repeats in many documents"
    lic = "licensed under the public license version two"
    batches = [
        [(1, f"alpha body\n\n{quote}"), (2, f"{lic}\n\nbeta body")],
        [(3, f"{quote}\n\ngamma body\n\n{lic}"), (4, "delta body only")],
        [(5, f"{quote}\n\n{lic}")],
    ]
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "pardedup_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    idx = os.path.join(str(tmp_path), "par_index")
    got = streaming_paragraph_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1,
    )
    # each doc emitted exactly once
    assert sorted(got["doc_id"].tolist()) == [1, 2, 3, 4, 5]
    texts = dict(zip(got["doc_id"], got["text"]))
    # arrival-order-invariant: each repeated paragraph survives exactly
    # once across the whole corpus; unique content is untouched
    all_text = "\n\n".join(texts.values())
    assert all_text.count(quote) == 1 and all_text.count(lic) == 1
    for frag in ("alpha body", "beta body", "gamma body", "delta body only"):
        assert all_text.count(frag) == 1
    # total drops = total dedupable paragraphs minus distinct ones
    assert int(got["n_dropped"].sum()) == 10 - 6
    # the persisted index holds exactly the distinct paragraph hashes
    stored = spark.read.parquet(idx)
    assert stored.distinct().count() == 6

    # single-batch stream == batch operator, row for row
    stage1 = os.path.join(str(tmp_path), "pardedup_one")
    all_rows = [r for b in batches for r in b]
    spark.createDataFrame(all_rows, schema).coalesce(1).write.parquet(stage1)
    one = streaming_paragraph_dedup(
        spark, stage1, spark.createDataFrame([], schema).schema,
        os.path.join(str(tmp_path), "par_index_one"),
    )
    want = paragraph_dedup(spark.createDataFrame(all_rows, schema)).toPandas()
    merged = one.sort_values("doc_id").reset_index(drop=True)
    wantd = want.sort_values("doc_id").reset_index(drop=True)
    assert merged[["doc_id", "text", "n_paragraphs", "n_dropped"]].equals(
        wantd[["doc_id", "text", "n_paragraphs", "n_dropped"]]
    )


def test_streaming_quality_model_filter_parity(spark, tmp_path):
    """The learned quality filter is per-doc-independent, so it
    streams via foreachBatch with exact batch parity: union of
    per-batch survivors == batch filter over everything."""
    from wrds_data_pipeline_spark.operators.quality_model import (
        filter_by_quality_model,
        train_quality_model,
    )
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        run_stream_foreach_batch,
    )

    good = "a careful analysis of the estimator gives stable results"
    bad = "click here buy now free free prize winner casino jackpot"
    labeled = spark.createDataFrame(
        [(i, f"{good} v{i}", 1) for i in range(8)]
        + [(50 + i, f"{bad} v{i}", 0) for i in range(8)],
        ["doc_id", "text", "label"],
    )
    model = train_quality_model(labeled, "label", n_buckets=1 << 12)

    schema = "doc_id int, text string"
    batches = [
        [(100, good + " again"), (101, bad + " again")],
        [(102, bad + " once more")],
        [(103, good + " reprised"), (104, good + " indeed")],
    ]
    stage = os.path.join(str(tmp_path), "quality_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    got = run_stream_foreach_batch(
        spark, stage, spark.createDataFrame([], schema).schema,
        lambda b: filter_by_quality_model(b, model, min_prob=0.5),
        max_files_per_trigger=1,
    )
    want = (
        filter_by_quality_model(
            spark.read.parquet(stage), model, min_prob=0.5
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"]) == [100, 103, 104]


def test_streaming_scrub_spans_parity(spark, tmp_path):
    """Span-level scrubbing vs a STATIC benchmark is per-doc-
    independent, so foreachBatch gives exact batch parity — the
    surgical twin of the streaming decontamination test."""
    from wrds_data_pipeline_spark.operators.contamination import (
        scrub_contaminated_spans,
    )
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        run_stream_foreach_batch,
    )

    leak = (
        "what is the capital of france the capital of france is paris "
        "and it has been the capital since the middle ages"
    )
    bench = spark.createDataFrame([(0, leak)], ["qid", "text"])
    schema = "doc_id int, text string"
    batches = [
        [(1, "clean opening words then " + leak + " and a tail here")],
        [(2, "nothing leaked in this one at all just filler words"),
         (3, leak)],
    ]
    stage = os.path.join(str(tmp_path), "scrub_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    got = run_stream_foreach_batch(
        spark, stage, spark.createDataFrame([], schema).schema,
        lambda b: scrub_contaminated_spans(b, bench, n=8),
        max_files_per_trigger=1,
    ).sort_values("doc_id").reset_index(drop=True)
    want = (
        scrub_contaminated_spans(spark.read.parquet(stage), bench, n=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(want)
    assert "capital of france" not in got[got.doc_id == 1]["text"].iloc[0]
    assert got[got.doc_id == 3]["text"].iloc[0] == ""


def test_streaming_near_dedup_restart_from_checkpoint(spark, tmp_path):
    """Restart recovery (VERDICT r6 next #4): a stream stopped after
    its first batches and RESTARTED from the same checkpointLocation
    resumes after the last committed batch — already-processed files
    are never re-read, so no pair is emitted twice and no index rows
    are re-appended.  Union across the restart equals the batch
    operator over the accumulated corpus; an idle restart emits
    nothing."""
    from wrds_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_near_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    early = [
        [(1, base + "version one"), (2, "completely unrelated text about spark plans")],
        [(3, base + "version one"), (4, base + "version two slightly changed")],
    ]
    late = [[(5, "completely unrelated text about spark plans"),
             (6, base + "version one")]]
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "rst_stream")
    ckpt = os.path.join(str(tmp_path), "rst_ckpt")
    idx = os.path.join(str(tmp_path), "rst_index")
    for rows in early:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    run1 = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    p1 = set(map(tuple, run1[["id_a", "id_b"]].values.tolist()))
    assert p1  # versions one collide within the early batches

    # stop happened above (the run returned); late data arrives, the
    # query restarts from the SAME checkpoint + index
    for rows in late:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    run2 = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    p2 = set(map(tuple, run2[["id_a", "id_b"]].values.tolist()))

    # exactly-once across the restart: disjoint, union == batch
    assert not (p1 & p2)
    all_docs = spark.createDataFrame(
        [r for b in early + late for r in b], schema
    )
    want = {
        (r.id_a, r.id_b) for r in minhash_lsh_candidates(all_docs).collect()
    }
    assert (p1 | p2) == want
    # the index holds each doc's bands exactly once (no re-appends)
    stored = spark.read.parquet(idx)
    assert stored.count() == stored.distinct().count() == 6 * 4

    # idle restart: nothing new, nothing emitted
    run3 = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    assert len(run3) == 0


def test_streaming_paragraph_dedup_restart_from_checkpoint(spark, tmp_path):
    """Restart recovery for the richer harness variant (index_select:
    paragraphs probed, distinct hashes stored): each document is
    emitted by exactly one run, each repeated paragraph survives
    exactly once ACROSS the restart, and the stored hash index gains
    no duplicates."""
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_paragraph_dedup,
    )

    quote = "shared quotation that repeats in many documents"
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "prst_stream")
    ckpt = os.path.join(str(tmp_path), "prst_ckpt")
    idx = os.path.join(str(tmp_path), "prst_index")
    spark.createDataFrame(
        [(1, f"alpha body\n\n{quote}"), (2, "beta body only")], schema
    ).coalesce(1).write.mode("append").parquet(stage)

    run1 = streaming_paragraph_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    assert sorted(run1["doc_id"]) == [1, 2]

    spark.createDataFrame(
        [(3, f"{quote}\n\ngamma body")], schema
    ).coalesce(1).write.mode("append").parquet(stage)
    run2 = streaming_paragraph_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    # only the NEW doc is emitted, with the quote already deduped
    assert sorted(run2["doc_id"]) == [3]
    assert quote not in run2["text"].iloc[0]
    assert "gamma body" in run2["text"].iloc[0]
    # quote survives exactly once across the restart boundary
    all_text = "\n\n".join(list(run1["text"]) + list(run2["text"]))
    assert all_text.count(quote) == 1
    stored = spark.read.parquet(idx)
    assert stored.count() == stored.distinct().count()


def test_store_has_rows_ignores_non_data_entries(tmp_path):
    """A crash during the FIRST batch's docs-store write can leave only
    underscore/dot residue (_ingest_meta.json, a _temporary dir) in the
    store dir; counting those as data would make the restart take the
    has-rows path and die on schema inference over an empty read
    instead of recovering."""
    import os

    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        _store_has_rows,
    )

    d = str(tmp_path / "docs_store")
    os.makedirs(os.path.join(d, "_temporary"))
    with open(os.path.join(d, "_ingest_meta.json"), "w") as fh:
        fh.write("{}")
    with open(os.path.join(d, "._SUCCESS.crc"), "w") as fh:
        fh.write("")
    assert not _store_has_rows(d)

    # a partition dir or a bare parquet file IS data
    os.makedirs(os.path.join(d, "shard=3"))
    assert _store_has_rows(d)
    os.rmdir(os.path.join(d, "shard=3"))
    with open(os.path.join(d, "part-000.parquet"), "w") as fh:
        fh.write("")
    assert _store_has_rows(d)


def test_streaming_verified_maintains_groups_store(spark, tmp_path):
    """groups_dir: the streaming verified twin keeps the persisted
    duplicate-GROUP table in lockstep per micro-batch — two groups
    formed by batch 1 merge when batch 2's bridge docs arrive
    (relabeled to the global min), the table equals the batch
    recompute over every emitted pair, and string ids refuse before
    the stream starts."""
    import os

    import pytest

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from wrds_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_near_dedup_verified,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    words = [f"tok{i:02d}" for i in range(30)]

    def mut(idxs):
        w = list(words)
        for i in idxs:
            w[i] = f"alt{i:02d}"
        return " ".join(w)

    ta, tb = " ".join(words), mut((4, 9, 14, 19, 24))
    batches = [
        [(100, ta), (101, ta), (200, tb), (201, tb)],
        [(300, mut((4, 9))), (301, mut((4, 9, 14, 19)))],
    ]
    stage = str(tmp_path / "stage")
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    groups = str(tmp_path / "groups")
    res = streaming_near_dedup_verified(
        spark, stage, schema,
        str(tmp_path / "bands"), str(tmp_path / "docs"),
        max_files_per_trigger=1, threshold=0.5, groups_dir=groups,
    )
    got = {
        (r.id, r.group_id)
        for r in spark.read.parquet(groups).select("id", "group_id").collect()
    }
    want = {
        (r["id"], r["group_id"])
        for r in connected_components(
            spark.createDataFrame(
                list(zip(res.id_a, res.id_b)), ["id_a", "id_b"]
            )
        ).collect()
    }
    assert got == want
    assert {g for _, g in got} == {100}  # everything merged to the min
    assert os.path.exists(os.path.join(groups, "_ingest_meta.json"))

    str_schema = StructType(
        [StructField("doc_id", StringType()), StructField("text", StringType())]
    )
    with pytest.raises(ValueError, match="integral ids"):
        streaming_near_dedup_verified(
            spark, stage, str_schema,
            str(tmp_path / "b2"), str(tmp_path / "d2"),
            groups_dir=str(tmp_path / "g2"),
        )


def test_streaming_tokenizer_stats_parity_and_restart(
    spark, driver_tables, tmp_path
):
    """The eval verb's streaming twin: per-batch partial sums
    accumulate to EXACTLY the batch tokenizer_corpus_stats numbers
    over everything seen, a checkpointed restart with no new files
    changes nothing (persisted partials + never-re-read batches), and
    a later arrival folds in."""
    import shutil

    from wrds_data_pipeline_spark.functions.pybpe import (
        local_tokenizer_factory,
    )
    from wrds_data_pipeline_spark.functions.tokenize import (
        tokenizer_corpus_stats,
    )
    from wrds_data_pipeline_spark.functions.tokenizer_train import (
        bpe_tokenizer_spec,
        learn_bpe_from_counts,
        write_tokenizer_json,
    )
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_tokenizer_stats,
    )

    vocab, merges = learn_bpe_from_counts(
        [("the", 30), (" doc", 20), (" text", 15)], 300,
        special_tokens=("<|endoftext|>",),
    )
    tok_json = str(tmp_path / "tok.json")
    write_tokenizer_json(bpe_tokenizer_spec(vocab, merges), tok_json)
    factory = local_tokenizer_factory(tok_json)

    docs = (
        driver_tables["documents"].select("doc_id", "text").limit(60)
    )
    stream_dir = str(tmp_path / "incoming")
    os.makedirs(stream_dir)

    def _drop(df, name):
        src = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(src)
        part = [f for f in os.listdir(src) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(src, part), os.path.join(stream_dir, name))

    f1 = docs.filter(F.col("doc_id") % 3 == 0)
    f2 = docs.filter(F.col("doc_id") % 3 == 1)
    f3 = docs.filter(F.col("doc_id") % 3 == 2)
    _drop(f1, "f1.parquet")
    _drop(f2, "f2.parquet")

    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "stats_store")
    kw = dict(
        text_col="text", max_files_per_trigger=1,
        checkpoint_dir=ckpt, stats_store=store,
    )
    got = streaming_tokenizer_stats(
        spark, stream_dir, docs.schema, factory, **kw
    )

    def batch_over(df):
        r = tokenizer_corpus_stats(df, factory).first()
        return {k: r[k] for k in got}

    assert got == batch_over(f1.unionByName(f2))
    assert got["n_docs"] > 0 and got["n_tokens"] > 0

    # restart, no new files: totals exact, nothing re-counted
    again = streaming_tokenizer_stats(
        spark, stream_dir, docs.schema, factory, **kw
    )
    assert again == got

    # a new arrival folds into the running totals
    _drop(f3, "f3.parquet")
    final = streaming_tokenizer_stats(
        spark, stream_dir, docs.schema, factory, **kw
    )
    assert final == batch_over(docs)

    # the in-memory (storeless) form over a fresh stream matches too
    solo = streaming_tokenizer_stats(
        spark, stream_dir, docs.schema, factory,
        text_col="text", max_files_per_trigger=1,
    )
    assert solo == batch_over(docs)


def test_streaming_tokenizer_stats_refuses_store_without_checkpoint(
    spark, tmp_path
):
    """ADVICE r12: a stats_store without a checkpoint double-counts
    across restarts (re-run re-reads all files under colliding per-run
    epoch ids) — the combination must refuse up front, before any
    stream starts or partial lands."""
    import pytest

    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_tokenizer_stats,
    )

    with pytest.raises(ValueError, match="requires.*checkpoint"):
        streaming_tokenizer_stats(
            spark,
            str(tmp_path / "incoming"),
            "doc_id long, text string",
            tokenizer_factory=None,  # refusal fires before any use
            stats_store=str(tmp_path / "stats_store"),
        )
    # nothing was created: the refusal happened before the stream
    import os

    assert not os.path.exists(str(tmp_path / "stats_store"))
