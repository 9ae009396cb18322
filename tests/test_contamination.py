"""Decontamination operator: planted benchmark overlap + DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd

from wrds_data_pipeline_spark.operators.contamination import (
    contamination_scores,
    decontaminate,
)

BENCH_ITEM = (
    "what is the capital of france the capital of france is paris "
    "and it has been the capital since the middle ages"
)
CLEAN = (
    "spark executes declarative dataframe plans through catalyst "
    "which rewrites them into whole stage generated java bytecode"
)


def _docs(spark):
    rows = [
        (1, CLEAN),
        # contains an 8-gram straight out of the benchmark item
        (2, "as everyone knows " + BENCH_ITEM + " which is well documented"),
        (3, "short doc"),
        (4, CLEAN + " with an extra tail that changes nothing upstream"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bench(spark):
    return spark.createDataFrame(
        [(100, BENCH_ITEM), (101, "unrelated benchmark question text here "
                                  "padded to cross the n gram width")],
        ["qid", "text"],
    )


def test_contamination_scores_flags_only_overlap(spark):
    out = (
        contamination_scores(_docs(spark), _bench(spark), n=8)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(out.index) == {1, 2, 3, 4}
    assert out.loc[2, "n_contaminated"] > 0
    assert out.loc[1, "n_contaminated"] == 0
    assert out.loc[3, "n_contaminated"] == 0  # short doc = 1 whole-text shingle
    assert out.loc[3, "n_ngrams"] == 1
    assert 0 < out.loc[2, "contamination_ratio"] <= 1


def test_decontaminate_drops_dirty_doc(spark):
    kept = sorted(
        r.doc_id for r in decontaminate(_docs(spark), _bench(spark), n=8).collect()
    )
    assert kept == [1, 3, 4]


def test_contamination_duckdb_twin(spark):
    """Exact parity with a DuckDB replay of the same hash pipeline."""
    docs_pd = _docs(spark).toPandas()
    bench_pd = _bench(spark).toPandas()
    con = duckdb.connect()
    con.register("docs", docs_pd)
    con.register("bench", bench_pd)
    sql = """
    WITH norm AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      FROM docs
    ), grams AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+7], ' ')
                            FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)]) AS gs
      FROM norm
    ), doc_h AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS h
      FROM grams, unnest(gs) AS t(g)
    ), bnorm AS (
      SELECT list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      FROM bench
    ), bgrams AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
                                     FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)])) AS g
        FROM bnorm
      )
    )
    SELECT doc_id,
           count(*) AS n_ngrams,
           sum(CASE WHEN h IN (SELECT h FROM bgrams) THEN 1 ELSE 0 END) AS n_contaminated
    FROM doc_h GROUP BY doc_id ORDER BY doc_id
    """
    want = con.execute(sql).df()
    got = (
        contamination_scores(_docs(spark), _bench(spark), n=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_ngrams) == list(want.n_ngrams)
    assert list(got.n_contaminated) == list(want.n_contaminated)


def test_shuffle_strategy_same_results_no_broadcast_hint(spark):
    """strategy='shuffle' (oversized reference sets) matches the
    broadcast path row-for-row and leaves no broadcast hint in the
    pre-AQE plan; unknown strategies fail fast."""
    import pytest

    docs, bench = _docs(spark), _bench(spark)
    a = (
        contamination_scores(docs, bench, n=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        contamination_scores(docs, bench, n=8, strategy="shuffle")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    kept = sorted(
        r.doc_id
        for r in decontaminate(docs, bench, n=8, strategy="shuffle").collect()
    )
    assert kept == [1, 3, 4]
    plan = (
        contamination_scores(docs, bench, n=8, strategy="shuffle")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "ResolvedHint" not in plan and "broadcast" not in plan.lower()
    with pytest.raises(ValueError):
        contamination_scores(docs, bench, n=8, strategy="bogus")


def test_bloom_strategy_no_false_negatives_and_exact_here(spark):
    """strategy='bloom' never under-counts (every exact hit is a
    bloom hit); at default sizing on this tiny fixture there are no
    false positives either, so the relations match exactly."""
    docs, bench = _docs(spark), _bench(spark)
    exact = (
        contamination_scores(docs, bench, n=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    bloom = (
        contamination_scores(docs, bench, n=8, strategy="bloom")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (bloom["n_contaminated"] >= exact["n_contaminated"]).all()
    assert bloom.equals(exact)
    kept = sorted(
        r.doc_id
        for r in decontaminate(docs, bench, n=8, strategy="bloom").collect()
    )
    assert kept == [1, 3, 4]


def test_bloom_fpp_bounded_on_disjoint_reference(spark):
    """A reference disjoint from the corpus: bloom hits are pure
    false positives — measure the rate well under 2% at the default
    12 bits/key (deterministic: fixed seeds, fixed data)."""
    import pyspark.sql.functions as F

    corpus = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"c{w}x"), F.col("id")) for w in range(12)],
        ).alias("text"),
    )
    ref = spark.range(500).select(
        F.col("id").alias("qid"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"r{w}y"), F.col("id")) for w in range(12)],
        ).alias("text"),
    )
    out = contamination_scores(corpus, ref, n=8, strategy="bloom").agg(
        F.sum("n_contaminated").alias("hits"),
        F.sum("n_ngrams").alias("grams"),
    ).collect()[0]
    assert out["hits"] / out["grams"] < 0.02


def test_bloom_plan_has_no_corpus_side_join(spark):
    """The bloom probe is a pure expression against a literal bitset:
    the corpus plan has NO join of any kind (the bitset is collected
    at plan build — carrying it as a broadcast-joined column instead
    re-materializes it per gram inside the probe HOF, measured ~50×
    the whole probe)."""
    docs, bench = _docs(spark), _bench(spark)
    plan = (
        contamination_scores(docs, bench, n=8, strategy="bloom")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_auto_bloom_params_and_oversize_guard(spark):
    import pytest

    from wrds_data_pipeline_spark.operators.contamination import (
        auto_bloom_params,
    )

    m, k = auto_bloom_params(1000, bits_per_key=12)
    assert m >= 12_000 and (m & (m - 1)) == 0
    assert 1 <= k <= 8
    with pytest.raises(ValueError, match="shuffle"):
        auto_bloom_params(1 << 30)
    # empty benchmark: bloom strategy scores everything clean
    docs = _docs(spark)
    empty = spark.createDataFrame([], "qid long, text string")
    out = contamination_scores(docs, empty, n=8, strategy="bloom").toPandas()
    assert (out["n_contaminated"] == 0).all()


def test_scrub_contaminated_spans_surgical(spark):
    """Span-level decontamination: the leaked benchmark passage is cut
    from the carrier document (every other token kept, single-space
    rebuild), clean docs pass through verbatim, and a doc that IS the
    passage is emptied rather than dropped."""
    from wrds_data_pipeline_spark.operators.contamination import (
        scrub_contaminated_spans,
    )

    lead = "completely original opening words about distributed systems"
    tail = "followed by equally original closing commentary here"
    docs = spark.createDataFrame(
        [
            (1, f"{lead} {BENCH_ITEM} {tail}"),
            (2, CLEAN),
            (3, BENCH_ITEM),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(0, BENCH_ITEM)], ["qid", "text"])
    out = {r["doc_id"]: r for r in scrub_contaminated_spans(docs, bench, n=8).collect()}
    n_bench = len(BENCH_ITEM.split())
    assert out[1]["text"] == f"{lead} {tail}"
    assert out[1]["n_tok_removed"] == n_bench
    assert out[2]["text"] == CLEAN and out[2]["n_tok_removed"] == 0
    assert out[3]["text"] == "" and out[3]["n_tok_removed"] == n_bench
    # clean doc is byte-identical (verbatim pass-through, not rebuilt)
    assert out[2]["n_tok_in"] == len(CLEAN.split())


def test_benchmark_leak_report(spark):
    """Per-item view: the leaked item reports its hit breadth, the
    clean item reports zero, and gram totals match the item's own
    shingle count."""
    from wrds_data_pipeline_spark.operators.contamination import (
        benchmark_leak_report,
    )

    docs = _docs(spark)  # doc 2 carries BENCH_ITEM
    extra = spark.createDataFrame(
        [(9, "prefix " + BENCH_ITEM + " suffix")], ["doc_id", "text"]
    )
    both = docs.union(extra)
    bench = _bench(spark)
    out = {r["qid"]: r for r in benchmark_leak_report(both, bench, n=8).collect()}
    assert set(out) == {100, 101}
    n_tokens = len(BENCH_ITEM.split())
    assert out[100]["n_grams"] == n_tokens - 8 + 1
    assert out[100]["n_docs_hit"] == 2          # docs 2 and 9
    assert out[100]["n_leaked_grams"] == out[100]["n_grams"]
    assert out[101]["n_leaked_grams"] == 0 and out[101]["n_docs_hit"] == 0


def test_short_item_coverage_drop_scrub_strict(spark):
    """The r7 'missing #1': a 5-token benchmark answer leaked inside a
    LONG document has no 8-gram signature — invisible at n=8 in every
    mode.  cover_short_items matches it at its own width: drop mode
    drops the carrier, scrub mode cuts exactly the 5 leaked tokens,
    and the strict re-check catches a post-scrub splice."""
    from wrds_data_pipeline_spark.operators.contamination import (
        scrub_contaminated_spans,
        short_item_hit_docs,
    )

    answer = "the mitochondria powers the cell"  # 5 tokens
    lead = "a long original paragraph explaining cellular biology basics"
    tail = "with plenty of surrounding original prose afterwards too"
    docs = spark.createDataFrame(
        [
            (1, f"{lead} {answer} {tail}"),  # carrier: leak embedded
            (2, CLEAN),
            (3, "as everyone knows " + BENCH_ITEM + " documented"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(0, answer), (1, BENCH_ITEM)], ["qid", "text"]
    )

    # without coverage the carrier slips through (the documented gap)
    kept_ids = {
        r["doc_id"] for r in decontaminate(docs, bench, n=8).collect()
    }
    assert kept_ids == {1, 2}
    # drop mode with coverage: carrier and 8-gram doc both dropped
    kept_ids = {
        r["doc_id"]
        for r in decontaminate(
            docs, bench, n=8, cover_short_items=True
        ).collect()
    }
    assert kept_ids == {2}
    # scrub mode with coverage: exactly the 5 leaked tokens cut
    out = {
        r["doc_id"]: r
        for r in scrub_contaminated_spans(
            docs, bench, n=8, cover_short_items=True
        ).collect()
    }
    assert out[1]["text"] == f"{lead} {tail}"
    assert out[1]["n_tok_removed"] == 5
    assert out[2]["text"] == CLEAN and out[2]["n_tok_removed"] == 0
    # the direct hit relation: only the carrier
    hits = short_item_hit_docs(docs, bench)
    assert {r["_id"] for r in hits.collect()} == {1}
    # strict-mode contract: after a scrub whose cuts may SPLICE the
    # answer back together across a boundary, one more decontaminate
    # pass with coverage leaves zero residual short-item leaks
    toks = answer.split()
    spliced = (
        f"{lead} {toks[0]} {toks[1]} {answer} {toks[2]} {toks[3]} {toks[4]} {tail}"
    )
    docs2 = spark.createDataFrame([(9, spliced)], ["doc_id", "text"])
    scrubbed2 = scrub_contaminated_spans(
        docs2, bench, n=8, cover_short_items=True
    ).select("doc_id", "text")
    # whatever the scrub left, the strict pass guarantees zero
    # residual short-item leaks
    residual = decontaminate(
        scrubbed2, bench, n=8, cover_short_items=True
    )
    for r in residual.collect():
        assert answer not in r["text"]


def test_short_item_coverage_inert_without_short_items(spark):
    """All benchmark items ≥ n tokens → the coverage path adds
    NOTHING: plan and results identical to the plain call, and
    short_item_hit_docs returns None (no corpus subtree built)."""
    from wrds_data_pipeline_spark.operators.contamination import (
        short_item_hit_docs,
    )

    docs, bench = _docs(spark), _bench(spark)
    assert short_item_hit_docs(docs, bench) is None
    plain = {r["doc_id"] for r in decontaminate(docs, bench, n=8).collect()}
    covered = {
        r["doc_id"]
        for r in decontaminate(
            docs, bench, n=8, cover_short_items=True
        ).collect()
    }
    assert plain == covered
