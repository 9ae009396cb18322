"""CLI entry points (the reference's operational surface,
README.md:18-43) driven end-to-end on the WRDS-shaped fixtures."""

from __future__ import annotations

import glob
import gzip
import os

import pandas as pd
import pytest

from wrds_data_pipeline_spark.cli import (
    corr_main,
    panels_main,
    parse_interval_seconds,
    universe_main,
)


def test_parse_interval_seconds():
    assert parse_interval_seconds("4h") == 4 * 3600
    assert parse_interval_seconds("1min") == 60
    assert parse_interval_seconds("2d") == 2 * 86400
    assert parse_interval_seconds("1s") == 1
    assert parse_interval_seconds("250ms") == 1  # whole-second grid floor
    with pytest.raises(ValueError):
        parse_interval_seconds("fortnight")


def test_universe_cli(spark, wrds_dir, tmp_path):
    out = os.path.join(str(tmp_path), "sp500ccm")
    rc = universe_main([wrds_dir, out, "--as-of", "2017-06-30"])
    assert rc == 0
    uni = pd.read_parquet(out)
    assert len(uni) > 0
    assert {"date", "permno", "ticker", "gvkey"} <= set(uni.columns)

    gz = os.path.join(str(tmp_path), "sp500ccm_csv")
    rc = universe_main([wrds_dir, gz, "--as-of", "2017-06-30", "--format", "csv.gz"])
    assert rc == 0
    part = glob.glob(os.path.join(gz, "part-*.csv.gz"))
    assert len(part) == 1
    assert len(pd.read_csv(part[0], compression="gzip")) == len(uni)


def test_panels_cli(spark, wrds_dir, tmp_path):
    out = os.path.join(str(tmp_path), "panels")
    rc = panels_main(
        [wrds_dir, out, "2016-02-01", "2016-02-03", "--freq", "5min"]
    )
    assert rc == 0
    files = sorted(glob.glob(os.path.join(out, "*", "*", "*.csv.gz")))
    assert len(files) == 3  # Mon-Wed
    # reference layout: {year}/{month:02d}/{date}.csv.gz
    assert files[0].split(os.sep)[-3:] == ["2016", "02", "2016-02-01.csv.gz"]
    pdf = pd.read_csv(files[0], index_col=0, compression="gzip")
    assert pdf.shape[0] > 0 and pdf.shape[1] > 1


def test_corr_cli_intraday(spark, wrds_dir, tmp_path):
    out = os.path.join(str(tmp_path), "corr")
    rc = corr_main(
        [wrds_dir, out, "2016-02-01", "2016-02-01", "2h", "5min"]
    )
    assert rc == 0
    files = sorted(glob.glob(os.path.join(out, "corr_*.csv")))
    assert len(files) >= 3  # 09:30-16:00 at 2h
    m = pd.read_csv(files[0], index_col=0)
    assert m.shape[0] == m.shape[1] > 1


def test_export_daily_panels_distributed_parity(spark, wrds, tmp_path):
    """The Arrow-task exporter writes byte-identical CSV *content* to
    the driver-loop exporter (gzip headers embed mtime, so compare
    decompressed bytes)."""
    from wrds_data_pipeline_spark.plans.panel_export import (
        export_daily_panels_csv,
        export_daily_panels_csv_distributed,
    )
    from wrds_data_pipeline_spark.plans.taq import (
        day_universe_symbols,
        resampled_prices,
    )

    universe = day_universe_symbols(
        wrds["taqmclink"].select("date", "permno", "ticker")
    )
    prices = resampled_prices(wrds["nbbo"], universe, freq_seconds=300)

    old_dir = os.path.join(str(tmp_path), "panels_old")
    new_dir = os.path.join(str(tmp_path), "panels_new")
    old_paths = export_daily_panels_csv(prices, old_dir)
    manifest = export_daily_panels_csv_distributed(prices, new_dir).toPandas()

    assert len(old_paths) == len(manifest) > 0
    for old in old_paths:
        new = old.replace(old_dir, new_dir)
        assert os.path.exists(new), new
        with gzip.open(old) as f:
            want = f.read()
        with gzip.open(new) as f:
            got = f.read()
        assert got == want, f"content mismatch for {os.path.basename(old)}"


def test_prices_date_filter_pushes_to_scan(spark, wrds_dir):
    """The CLI's date-range restriction must reach the parquet scans
    as PushedFilters (partition-pruning-shaped at scale), not live in
    a post-scan Filter only."""
    import datetime

    from wrds_data_pipeline_spark.cli import _prices

    prices = _prices(
        spark, wrds_dir,
        datetime.date(2016, 2, 1), datetime.date(2016, 2, 2), 300,
    )
    plan = prices._jdf.queryExecution().executedPlan().toString()
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
        if "date" in seg.split("]")[0]
    ]
    assert pushed, f"no date PushedFilters in:\n{plan[:2000]}"
    assert any("GreaterThanOrEqual(date" in p and "LessThanOrEqual(date" in p
               for p in pushed), pushed


def test_corpus_cli_end_to_end(spark, sf_dir, tmp_path):
    from wrds_data_pipeline_spark.cli import corpus_main

    # a 1/3 slice keeps the full pipeline exercised at 1/3 the cost
    docs_path = os.path.join(str(tmp_path), "docs")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        "doc_id % 3 = 0"
    ).write.parquet(docs_path)
    bench = os.path.join(str(tmp_path), "bench")
    spark.read.parquet(docs_path).filter("doc_id % 97 = 0").select(
        "text"
    ).write.parquet(bench)
    out = os.path.join(str(tmp_path), "corpus_out")
    rc = corpus_main([
        docs_path, out,
        "--bench", bench,
        "--max-tokens", "2048",
        "--min-quality", "0.0",
        "--group-dedup",
        "--keep-frac", "0.8",
    ])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out, "shards"))
    assert len(shards) > 0
    assert {"doc_id", "text", "seq_id", "seq_pos"} <= set(shards.columns)
    assert shards.groupby("seq_id")["n_tokens"].sum().max() <= 2048
    assert "_q_cut" not in shards.columns  # internal cutoff must not leak
    report = pd.read_parquet(os.path.join(out, "report"))
    assert {"fate", "n_docs"} <= set(report.columns)
    assert report["n_docs"].sum() == len(pd.read_parquet(docs_path))
    # post-filter summary reconciles with the shards actually written
    summary = pd.read_parquet(os.path.join(out, "shards_summary"))
    assert summary["n_docs"].iloc[0] == shards["doc_id"].nunique()
    assert summary["n_seqs"].iloc[0] == shards["seq_id"].nunique()


def test_index_cli_band_lifecycle(spark, sf_dir, tmp_path):
    """build-band -> probe-band -> append-band -> probe again: the
    shell form of the continuous-ingest loop, checked against the
    library path."""
    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_table,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_p = os.path.join(str(tmp_path), "base.parquet")
    inc_p = os.path.join(str(tmp_path), "inc.parquet")
    docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text").write.parquet(base_p)
    docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text").write.parquet(inc_p)
    idx = os.path.join(str(tmp_path), "band_idx")
    out = os.path.join(str(tmp_path), "cand")

    assert index_main(["build-band", base_p, idx]) == 0
    assert index_main(["probe-band", inc_p, idx, out]) == 0
    got = {
        (r.id_a, r.id_b) for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(
            spark.read.parquet(inc_p),
            minhash_band_table(spark.read.parquet(base_p)),
        ).collect()
    }
    assert got == want
    # append, then an empty probe of the SAME increment now also hits itself
    assert index_main(["append-band", inc_p, idx]) == 0
    assert index_main(["probe-band", inc_p, idx, out]) == 0
    again = {(r.id_a, r.id_b) for r in spark.read.parquet(out).collect()}
    assert want <= again  # old cross pairs still found via the index

    # --mark-resolved plumbs resolved_col through probe_band_index:
    # the flagged output adds the boolean column, pairs unchanged
    out2 = os.path.join(str(tmp_path), "cand_flagged")
    assert index_main(
        ["probe-band", inc_p, idx, out2, "--mark-resolved"]
    ) == 0
    flagged = spark.read.parquet(out2)
    assert set(flagged.columns) == {"id_a", "id_b", "resolved"}
    assert {(r.id_a, r.id_b) for r in flagged.collect()} == again
    assert all(r.resolved is not None for r in flagged.collect())


def test_index_cli_vector_lifecycle(spark, sf_dir, tmp_path):
    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    emb_p = os.path.join(sf_dir, "embeddings.parquet")
    idx = os.path.join(str(tmp_path), "vec_idx")
    assert index_main(["build-vector", emb_p, idx, "--n-cells", "8",
                       "--pq-m", "8"]) == 0

    emb = spark.read.parquet(emb_p)
    qrow = emb.filter(F.col("vec_id") == 5).first()
    q_p = os.path.join(str(tmp_path), "queries.parquet")
    spark.createDataFrame(
        [(5, [float(x) for x in qrow["embedding"]])],
        "query_id long, query_vec array<double>",
    ).write.parquet(q_p)
    out = os.path.join(str(tmp_path), "topk")
    assert index_main(["query-vector", idx, q_p, out, "--k", "5",
                       "--n-probe", "8"]) == 0
    got = spark.read.parquet(out).toPandas().sort_values("rank")
    assert int(got.iloc[0]["vec_id"]) == 5
    assert set(got["query_id"]) == {5}
    assert abs(got.iloc[0]["cos_sim"] - 1.0) < 1e-6
    # --exact within probed cells: with every cell probed this must
    # equal brute force over the corpus, id for id
    out2 = os.path.join(str(tmp_path), "topk_exact")
    assert index_main(["query-vector", idx, q_p, out2, "--k", "5",
                       "--n-probe", "8", "--exact"]) == 0
    exact = spark.read.parquet(out2).toPandas().sort_values("rank")
    want = brute_force_topk(emb, [float(x) for x in qrow["embedding"]], 5).toPandas()
    assert exact["vec_id"].tolist() == want["vec_id"].tolist()


def test_corpus_cli_paragraph_dedup_stage(spark, tmp_path):
    """--paragraph-dedup collapses repeated paragraphs before curation:
    the shared block survives in exactly one shard document."""
    from wrds_data_pipeline_spark.cli import corpus_main

    shared = "this exact same disclaimer paragraph appears everywhere " * 3
    rows = [
        (i, f"unique body of document number {i} with several words\n\n{shared}")
        for i in range(8)
    ]
    docs_path = os.path.join(str(tmp_path), "pdocs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        docs_path
    )
    out = os.path.join(str(tmp_path), "pcorpus_out")
    rc = corpus_main([
        docs_path, out, "--min-quality", "0.0", "--paragraph-dedup",
    ])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out, "shards"))
    assert shards["text"].str.count(shared.strip()).sum() == 1
    assert len(shards) == 8  # no document dropped, only trimmed


def test_corpus_cli_span_dedup_stage(spark, tmp_path):
    """--span-dedup-k cuts a repeated mid-paragraph passage: the
    shared span survives in exactly one shard document."""
    from wrds_data_pipeline_spark.cli import corpus_main

    shared = " ".join(f"shared{i}" for i in range(12))
    rows = [
        (i, f"unique lead {i} alpha beta {shared} unique tail {i} gamma")
        for i in range(8)
    ]
    docs_path = os.path.join(str(tmp_path), "sdocs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        docs_path
    )
    out = os.path.join(str(tmp_path), "scorpus_out")
    rc = corpus_main([
        docs_path, out, "--min-quality", "0.0", "--span-dedup-k", "6",
    ])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out, "shards"))
    assert shards["text"].str.count(shared).sum() == 1
    assert len(shards) == 8


def test_quality_cli_train_score_filter(spark, tmp_path):
    """wrds-spark-quality lifecycle: train on a labeled seed, score,
    filter; then the corpus pipeline consumes the persisted model via
    --quality-model and keeps only the docs the model likes."""
    from wrds_data_pipeline_spark.cli import corpus_main, quality_main

    good = "the careful analysis of the estimator shows stable results"
    bad = "click here buy now free free prize winner casino jackpot"
    labeled = os.path.join(str(tmp_path), "labeled")
    spark.createDataFrame(
        [(i, f"{good} v{i}", 1) for i in range(12)]
        + [(100 + i, f"{bad} v{i}", 0) for i in range(12)],
        ["doc_id", "text", "label"],
    ).write.parquet(labeled)
    model_dir = os.path.join(str(tmp_path), "qmodel")
    rc = quality_main(["train", labeled, model_dir, "--n-buckets", "4096"])
    assert rc == 0

    scores_dir = os.path.join(str(tmp_path), "scores")
    rc = quality_main(["score", labeled, model_dir, scores_dir])
    assert rc == 0
    scores = pd.read_parquet(scores_dir)
    assert {"doc_id", "n_terms", "logit", "prob"} <= set(scores.columns)
    assert len(scores) == 24

    kept_dir = os.path.join(str(tmp_path), "kept")
    rc = quality_main(["filter", labeled, model_dir, kept_dir])
    assert rc == 0
    kept = pd.read_parquet(kept_dir)
    assert set(kept["doc_id"]) == set(range(12))

    rc = quality_main(["eval", labeled, model_dir])
    assert rc == 0

    # corpus pipeline with the learned stage: the spam docs vanish
    # from the shards even though they pass the heuristic filters
    out = os.path.join(str(tmp_path), "corpus_out")
    rc = corpus_main([
        labeled, out,
        "--min-quality", "0.0",
        "--quality-model", model_dir,
    ])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out, "shards"))
    assert set(shards["doc_id"]) <= set(range(12))
    assert len(set(shards["doc_id"])) > 0


def test_corpus_cli_bench_scrub_mode(spark, tmp_path):
    """--bench-scrub cuts the leaked passage but KEEPS the carrier
    document in the shards (drop mode loses it entirely)."""
    from wrds_data_pipeline_spark.cli import corpus_main

    leak = (
        "what is the capital of france the capital of france is paris "
        "and it has been the capital since the middle ages"
    )
    carrier_body = " ".join(f"useful{i} training{i} content{i}" for i in range(30))
    docs_path = os.path.join(str(tmp_path), "docs")
    spark.createDataFrame(
        [
            (1, carrier_body + " " + leak),
            (2, "a clean document with enough words to survive basic "
                "quality screens and packing stages intact"),
        ],
        ["doc_id", "text"],
    ).write.parquet(docs_path)
    bench = os.path.join(str(tmp_path), "bench")
    spark.createDataFrame([(0, leak)], ["qid", "text"]).write.parquet(bench)

    out_drop = os.path.join(str(tmp_path), "out_drop")
    rc = corpus_main([docs_path, out_drop, "--bench", bench,
                      "--min-quality", "0.0"])
    assert rc == 0
    drop_ids = set(
        pd.read_parquet(os.path.join(out_drop, "shards"))["doc_id"]
    )
    assert drop_ids == {2}
    # leak report artifact: the one benchmark item reports its hits
    leak_rep = pd.read_parquet(os.path.join(out_drop, "leak_report"))
    assert set(leak_rep["qid"]) == {0}
    assert int(leak_rep["n_docs_hit"].iloc[0]) == 1
    assert int(leak_rep["n_leaked_grams"].iloc[0]) > 0

    out_scrub = os.path.join(str(tmp_path), "out_scrub")
    rc = corpus_main([docs_path, out_scrub, "--bench", bench,
                      "--bench-scrub", "--min-quality", "0.0"])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out_scrub, "shards"))
    assert set(shards["doc_id"]) == {1, 2}
    t1 = shards[shards.doc_id == 1]["text"].iloc[0]
    assert "capital of france" not in t1
    assert "useful0" in t1


def test_corpus_cli_jsonl_shards(spark, tmp_path):
    """--shard-format jsonl writes gzip JSON-lines shards holding the
    same document set the parquet layout would."""
    docs_path = os.path.join(str(tmp_path), "docs")
    spark.createDataFrame(
        [(i, f"document number {i} with several plain words attached "
             f"for padding and token mass {i}") for i in range(40)],
        ["doc_id", "text"],
    ).write.parquet(docs_path)
    from wrds_data_pipeline_spark.cli import corpus_main

    out = os.path.join(str(tmp_path), "out")
    rc = corpus_main([docs_path, out, "--min-quality", "0.0",
                      "--shard-format", "jsonl"])
    assert rc == 0
    back = spark.read.json(os.path.join(out, "shards"))
    assert {"doc_id", "text", "seq_id", "seq_pos"} <= set(back.columns)
    assert back.count() == 40


def test_index_cli_prune_vector(spark, tmp_path):
    from wrds_data_pipeline_spark.cli import index_main

    emb_path = os.path.join(str(tmp_path), "emb")
    spark.range(48).selectExpr(
        "id as vec_id",
        "transform(sequence(0, 7), j -> cos(id * (j+1) * 0.37) + id % 2) as embedding",
    ).write.parquet(emb_path)
    idx_path = os.path.join(str(tmp_path), "vidx")
    assert index_main(["build-vector", emb_path, idx_path, "--n-cells", "4"]) == 0
    out = os.path.join(str(tmp_path), "pruned")
    assert index_main(["prune-vector", idx_path, out, "--keep-frac", "0.5"]) == 0
    kept = pd.read_parquet(out)
    assert {"id", "cell", "proto_sim"} <= set(kept.columns)
    assert 0 < len(kept) <= 48
    # per-cell quota: ceil(0.5 * |cell|)
    full = pd.read_parquet(os.path.join(idx_path, "vectors"))
    sizes = full.groupby("cell").size() if "cell" in full.columns else None
    got_sizes = kept.groupby("cell").size()
    if sizes is not None:
        for c, n in got_sizes.items():
            assert n == -(-sizes[c] // 2)


def test_corpus_cli_perplexity_stage(spark, tmp_path):
    """--lm-ref keeps the docs a reference bigram LM finds least
    surprising: all-OOV gibberish drops, reference-style prose stays
    (vocabulary big enough that unseen-context add-alpha mass 1/(V+1)
    is small — the realistic regime)."""
    from wrds_data_pipeline_spark.cli import corpus_main

    words = [f"word{i}" for i in range(300)]
    ref_sents = [
        " ".join(words[(7 * i + j) % 300] for j in range(12))
        for i in range(60)
    ]
    ref_path = os.path.join(str(tmp_path), "ref")
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(ref_sents)], ["rid", "text"]
    ).write.parquet(ref_path)

    docs_path = os.path.join(str(tmp_path), "docs")
    fluent = [(i, ref_sents[i] + " " + ref_sents[i + 20]) for i in range(8)]
    gibberish = [
        (100 + i,
         " ".join(f"novel{i}tok{j}" for j in range(24)))
        for i in range(8)
    ]
    spark.createDataFrame(fluent + gibberish, ["doc_id", "text"]).write.parquet(
        docs_path
    )
    out = os.path.join(str(tmp_path), "out")
    rc = corpus_main([docs_path, out, "--min-quality", "0.0",
                      "--lm-ref", ref_path,
                      "--perplexity-keep-frac", "0.5"])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out, "shards"))
    kept_ids = set(shards["doc_id"])
    assert kept_ids and kept_ids <= {i for i, _ in fluent}


def test_corpus_cli_fused_gates_parity_with_stock_operators(spark, tmp_path):
    """Round-7 stage fusion: --quality-model + --lm-ref + --keep-frac
    are applied as one persisted scored relation with driver-side
    scalar cutoffs (one corpus materialization) — the kept set must
    equal the sequential stock-operator chain (filter_by_quality_model
    → inner-join cross-entropy → quantile(keep_low) → quantile),
    whose crossJoin plans replayed the upstream chain per gate."""
    from wrds_data_pipeline_spark.cli import corpus_main, quality_main
    from wrds_data_pipeline_spark.operators.keywords import (
        build_bigram_vocab,
        build_vocab,
        doc_cross_entropy_bigram,
    )
    from wrds_data_pipeline_spark.operators.quality_model import (
        filter_by_quality_model,
        load_quality_model,
    )
    from wrds_data_pipeline_spark.plans.corpus import (
        curate,
        quality_quantile_filter,
    )

    good = "the committee reviewed the quarterly findings in detail"
    bad = "win cash now lucky prize casino bonus click subscribe"
    rows = [
        (i, f"{good} section {i} with extra discussion of item {i}")
        for i in range(16)
    ] + [(100 + i, f"{bad} spin {i} offer {i}") for i in range(8)]
    docs_path = os.path.join(str(tmp_path), "fdocs")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(docs_path)

    labeled = os.path.join(str(tmp_path), "flabeled")
    spark.createDataFrame(
        [(i, f"{good} v{i}", 1) for i in range(12)]
        + [(50 + i, f"{bad} v{i}", 0) for i in range(12)],
        ["doc_id", "text", "label"],
    ).write.parquet(labeled)
    model_dir = os.path.join(str(tmp_path), "fmodel")
    assert quality_main(["train", labeled, model_dir,
                         "--n-buckets", "4096"]) == 0

    ref_path = os.path.join(str(tmp_path), "fref")
    spark.createDataFrame(
        [(i, f"{good} reference passage number {i}") for i in range(20)],
        ["doc_id", "text"],
    ).write.parquet(ref_path)

    out = os.path.join(str(tmp_path), "fout")
    rc = corpus_main([
        docs_path, out, "--min-quality", "0.0",
        "--quality-model", model_dir, "--model-min-prob", "0.4",
        "--lm-ref", ref_path, "--perplexity-keep-frac", "0.6",
        "--keep-frac", "0.8",
    ])
    assert rc == 0
    got = set(pd.read_parquet(os.path.join(out, "shards"))["doc_id"])

    # stock chain
    docs = spark.read.parquet(docs_path)
    kept, _ = curate(docs, min_quality=0.0)
    kept = filter_by_quality_model(
        kept, load_quality_model(spark, model_dir), min_prob=0.4
    )
    ref = spark.read.parquet(ref_path)
    ce = doc_cross_entropy_bigram(
        kept, build_vocab(ref), build_bigram_vocab(ref)
    ).select("doc_id", "cross_entropy")
    kept = quality_quantile_filter(
        kept.join(ce, "doc_id"), keep_frac=0.6,
        quality_col="cross_entropy", keep_low=True,
    ).drop("_q_cut", "cross_entropy")
    kept = quality_quantile_filter(kept, keep_frac=0.8).drop("_q_cut")
    want = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want and got


def test_apply_corpus_gates_validates_fractions_standalone(spark):
    """apply_corpus_gates is a public importable helper: a direct
    caller passing an out-of-range fraction gets a clear ValueError,
    not an obscure percentile_approx failure (ADVICE r8)."""
    import pytest

    from wrds_data_pipeline_spark.cli import apply_corpus_gates

    docs = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match=r"keep_frac must be in \(0, 1\]"):
        apply_corpus_gates(spark, docs, keep_frac=1.5)
    with pytest.raises(ValueError, match="perplexity_keep_frac"):
        apply_corpus_gates(
            spark, docs, lm_ref="unused", perplexity_keep_frac=0.0
        )
    # perplexity fraction is only validated when the lm gate is on
    # (matching the CLI's long-standing behavior)
    kept, scored = apply_corpus_gates(
        spark, docs, perplexity_keep_frac=0.0
    )
    assert scored is None


def test_corpus_cli_scrub_recomputes_text_derived_columns(spark, tmp_path):
    """After --bench-scrub the known text-derived metadata columns are
    recomputed from the SCRUBBED text (ADVICE r6: n_chars etc. rode
    stale from the pre-scrub text into the shards)."""
    from wrds_data_pipeline_spark.cli import corpus_main

    leak = (
        "what is the capital of france the capital of france is paris "
        "and it has been there since the early middle ages period"
    )
    body = " ".join(f"carrier{i} words{i} here{i}" for i in range(30))
    rows = [
        (1, body + " " + leak),
        (2, "a clean document with enough plain words to survive the "
            "quality screens and the packing stage easily"),
    ]
    from pyspark.sql import functions as F

    docs_path = os.path.join(str(tmp_path), "cdocs")
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text")
    )
    df.write.parquet(docs_path)
    bench = os.path.join(str(tmp_path), "cbench")
    spark.createDataFrame([(0, leak)], ["qid", "text"]).write.parquet(bench)

    out = os.path.join(str(tmp_path), "cout")
    rc = corpus_main([docs_path, out, "--bench", bench, "--bench-scrub",
                      "--min-quality", "0.0"])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out, "shards"))
    assert set(shards["doc_id"]) == {1, 2}
    for _, r in shards.iterrows():
        assert r["n_chars"] == len(r["text"])
    # the carrier actually shrank, so the recompute is observable
    t1 = shards[shards.doc_id == 1].iloc[0]
    assert t1["n_chars"] < len(rows[0][1])


def test_corpus_cli_scrub_warns_on_sub_window_bench_items(
    spark, tmp_path, capsys
):
    """--bench-short-items=warn (the legacy mode): items under the
    8-token window are reported rather than covered (ADVICE r6; the
    round-8 default is 'cover' — see
    test_corpus_cli_short_item_covered_by_default)."""
    from wrds_data_pipeline_spark.cli import corpus_main

    docs_path = os.path.join(str(tmp_path), "wdocs")
    spark.createDataFrame(
        [(1, "a clean document with plenty of ordinary words to keep "
             "the quality screens happy through packing")],
        ["doc_id", "text"],
    ).write.parquet(docs_path)
    bench = os.path.join(str(tmp_path), "wbench")
    spark.createDataFrame(
        [(0, "tiny item"), (1, "a benchmark passage long enough to "
                               "carry full eight token windows fine")],
        ["qid", "text"],
    ).write.parquet(bench)

    out = os.path.join(str(tmp_path), "wout")
    rc = corpus_main([docs_path, out, "--bench", bench, "--bench-scrub",
                      "--bench-short-items", "warn",
                      "--min-quality", "0.0"])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "warning: 1 benchmark item(s) shorter than 8 tokens" in stdout


def test_corpus_cli_short_item_covered_by_default(spark, tmp_path):
    """Round-8 default (--bench-short-items=cover): a 3-token
    benchmark answer leaked inside a long document is scrubbed out at
    its own width in scrub mode and drops the carrier in drop mode —
    no warning, actual coverage."""
    from wrds_data_pipeline_spark.cli import corpus_main

    answer = "tiny benchmark answer"
    carrier = ("a long document with plenty of ordinary words to pass "
               f"the screens which quotes {answer} in the middle and "
               "keeps going with more ordinary filler words afterwards")
    docs_path = os.path.join(str(tmp_path), "cvdocs")
    spark.createDataFrame(
        [(1, carrier),
         (2, "a clean document with enough ordinary words to pass the "
             "screens and reach the shards easily")],
        ["doc_id", "text"],
    ).write.parquet(docs_path)
    bench = os.path.join(str(tmp_path), "cvbench")
    spark.createDataFrame([(0, answer)], ["qid", "text"]).write.parquet(bench)

    out_scrub = os.path.join(str(tmp_path), "cv_scrub")
    rc = corpus_main([docs_path, out_scrub, "--bench", bench,
                      "--bench-scrub", "--min-quality", "0.0"])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out_scrub, "shards"))
    t1 = shards[shards.doc_id == 1]["text"].iloc[0]
    assert answer not in t1
    assert "keeps going" in t1  # surgical: rest of the doc survives

    out_drop = os.path.join(str(tmp_path), "cv_drop")
    rc = corpus_main([docs_path, out_drop, "--bench", bench,
                      "--min-quality", "0.0"])
    assert rc == 0
    dropped = pd.read_parquet(os.path.join(out_drop, "shards"))
    assert set(dropped["doc_id"]) == {2}


def test_corpus_cli_scrub_strict_catches_spliced_grams(spark, tmp_path):
    """--bench-scrub-strict: the rebuild can SPLICE a new benchmark
    8-gram across a cut boundary (doc = S[0:4] + LEAK + S[4:8] —
    cutting LEAK joins the halves into S).  Plain scrub mode ships the
    spliced text; strict mode re-checks and drops the document."""
    from wrds_data_pipeline_spark.cli import corpus_main

    S = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    leak_words = ("the secret benchmark passage phrase with precisely "
                  "twelve tokens inside").split()
    assert len(leak_words) >= 8
    body = " ".join(f"pad{i}" for i in range(30))
    doc1 = " ".join([body] + S[:4] + leak_words + S[4:])
    docs_path = os.path.join(str(tmp_path), "spdocs")
    spark.createDataFrame(
        [
            (1, doc1),
            (2, "a clean document with enough ordinary words to pass "
                "the screens and reach the shards easily"),
        ],
        ["doc_id", "text"],
    ).write.parquet(docs_path)
    bench = os.path.join(str(tmp_path), "spbench")
    spark.createDataFrame(
        [(0, " ".join(leak_words)), (1, " ".join(S))],
        ["qid", "text"],
    ).write.parquet(bench)

    spliced = " ".join(S)
    out_plain = os.path.join(str(tmp_path), "sp_plain")
    rc = corpus_main([docs_path, out_plain, "--bench", bench,
                      "--bench-scrub", "--min-quality", "0.0"])
    assert rc == 0
    shards = pd.read_parquet(os.path.join(out_plain, "shards"))
    t1 = shards[shards.doc_id == 1]["text"].iloc[0]
    assert "secret benchmark" not in t1          # the leak was cut
    assert spliced in t1                         # ...but S got spliced in

    out_strict = os.path.join(str(tmp_path), "sp_strict")
    rc = corpus_main([docs_path, out_strict, "--bench", bench,
                      "--bench-scrub", "--bench-scrub-strict",
                      "--min-quality", "0.0"])
    assert rc == 0
    strict = pd.read_parquet(os.path.join(out_strict, "shards"))
    assert set(strict["doc_id"]) == {2}          # residual leak dropped


def test_index_cli_refuses_mark_resolved_with_verify_docs(spark, tmp_path):
    """--mark-resolved is meaningless on the verified path (its output
    has no resolved column — hot buckets are evidence-gated instead);
    combining the flags refuses loudly rather than silently handing
    back a different schema than asked for."""
    import pytest

    from wrds_data_pipeline_spark.cli import index_main

    docs_p = os.path.join(str(tmp_path), "docs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    ).write.parquet(docs_p)
    with pytest.raises(SystemExit, match="mark-resolved"):
        index_main([
            "probe-band", docs_p, os.path.join(str(tmp_path), "idx"),
            os.path.join(str(tmp_path), "out"),
            "--verify-docs", docs_p, "--mark-resolved",
        ])


def test_corpus_cli_materialize_stages_parity(spark, tmp_path):
    """--materialize-stages (the production deployment shape: each
    stage writes a table its successor scans) must change NOTHING
    observable: shard contents, report, and summary identical to the
    lazy default, with the stage tables actually on disk."""
    from wrds_data_pipeline_spark.cli import corpus_main

    rows = []
    boiler = "subscribe to our newsletter for updates"
    para = "this paragraph repeats across many documents verbatim"
    for i in range(40):
        body = f"document {i} discusses topic {i % 7} in useful detail"
        text = f"{body}\n{boiler}" if i % 2 else f"{body}\n{para}\n{boiler}"
        rows.append((i, text))
    docs_p = os.path.join(str(tmp_path), "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        docs_p
    )
    flags = [
        "--min-quality", "0.0", "--langs", "xx,en,unknown",
        "--boilerplate-min-docs", "5", "--paragraph-dedup",
        "--keep-frac", "0.9",
    ]
    out_lazy = os.path.join(str(tmp_path), "out_lazy")
    out_mat = os.path.join(str(tmp_path), "out_mat")
    stages = os.path.join(str(tmp_path), "stages")
    assert corpus_main([docs_p, out_lazy] + flags) == 0
    assert corpus_main(
        [docs_p, out_mat] + flags + ["--materialize-stages", stages]
    ) == 0

    def rows_of(d, sub):
        return sorted(
            map(tuple, spark.read.parquet(os.path.join(d, sub)).collect())
        )

    got = rows_of(out_mat, "shards")
    assert got, "empty shards would make the parity vacuous"
    assert got == rows_of(out_lazy, "shards")
    assert rows_of(out_mat, "report") == rows_of(out_lazy, "report")
    assert rows_of(out_mat, "shards_summary") == rows_of(
        out_lazy, "shards_summary"
    )
    # the enabled stages each left their table
    for stage in ("boilerplate", "paragraph_dedup", "curated", "gated"):
        assert spark.read.parquet(os.path.join(stages, stage)).count() > 0
    assert not os.path.exists(os.path.join(stages, "span_dedup"))
