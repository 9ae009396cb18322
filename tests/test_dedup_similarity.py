"""Dedup + similarity operators: behavioral tests with planted
duplicates (the driver tables have none, so we synthesize)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_candidates,
    simhash,
)
from wrds_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest to find some quiet rest"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact dup of 0
        (2, BASE + " with a tiny extra suffix here"),  # near dup of 0
        (3, "completely different content about spark query engines "
            "and distributed columnar execution at massive scale"),
        (4, "  THE  quick   brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find some quiet rest "),  # normalizes to 0
        (5, "another unrelated document that shares no phrasing at all "
            "with the previous texts in this tiny corpus whatsoever"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(spark, docs):
    out = exact_duplicates(docs).toPandas()
    groups = {r.canonical_id: r.group_size for r in out.itertuples()}
    assert groups[0] == 3          # 0, 1, 4 collapse (normalization)
    assert out["group_size"].sum() == 6


def test_jaccard_finds_near_dup(spark, docs):
    pairs = jaccard_pairs(docs, threshold=0.5).toPandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    # exact dups have jaccard 1.0; near-dup 2 overlaps heavily with 0/1/4
    assert (0, 1) in got and (0, 4) in got and (1, 4) in got
    assert (0, 2) in got
    assert not any(3 in p or 5 in p for p in got)


def test_minhash_lsh_candidates_superset_of_exact_dups(spark, docs):
    cand = minhash_lsh_candidates(docs, n_hashes=12, bands=4).toPandas()
    got = {(int(a), int(b)) for a, b in zip(cand.id_a, cand.id_b)}
    # identical docs always collide on every band
    assert {(0, 1), (0, 4), (1, 4)} <= got
    # dissimilar docs should not collide
    assert (3, 5) not in got


def test_lsh_verify_pipeline(spark, docs):
    """LSH candidates → jaccard verification = the scalable near-dedup."""
    cand = minhash_lsh_candidates(docs, n_hashes=12, bands=4)
    verified = jaccard_pairs(docs, threshold=0.9, candidates=cand).toPandas()
    got = {(int(a), int(b)) for a, b in zip(verified.id_a, verified.id_b)}
    assert {(0, 1), (0, 4), (1, 4)} <= got


def test_simhash_hamming(spark, docs):
    out = {r._id: r.simhash for r in simhash(docs, bits=16).collect()}
    assert out[0] == out[1] == out[4]  # identical content → identical hash

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(out[0], out[2]) <= 4        # near dup → close
    assert ham(out[0], out[3]) >= ham(out[0], out[2])


def test_brute_force_topk(spark, driver_tables, sf_dir):
    emb = driver_tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = brute_force_topk(emb, qv, k=5).toPandas()
    assert list(top["rank"]) == [1, 2, 3, 4, 5]
    assert top.iloc[0]["vec_id"] == 0 and abs(top.iloc[0]["cos_sim"] - 1.0) < 1e-6
    assert top["cos_sim"].is_monotonic_decreasing


def test_lsh_topk_contains_query(spark, driver_tables):
    emb = driver_tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = lsh_topk(emb, qv, k=5, n_planes=3).toPandas()
    assert int(top.iloc[0]["vec_id"]) == 0  # query's own vector is in its bucket
    assert len(top) >= 1


def test_ivf_topk_recall(spark, driver_tables):
    emb = driver_tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    assigned, cents = ivf_build(emb, n_cells=8)
    approx = ivf_topk(assigned, cents, qv, k=5, n_probe=4).toPandas()
    exact = brute_force_topk(emb, qv, k=5).toPandas()
    # probing half the cells should recover most of the exact top-5
    overlap = set(approx["vec_id"]) & set(exact["vec_id"])
    assert int(exact.iloc[0]["vec_id"]) in set(approx["vec_id"])
    assert len(overlap) >= 3


def test_embedding_dup_pairs_lsh_recall(spark, driver_tables):
    from wrds_data_pipeline_spark.operators.similarity import embedding_dup_pairs

    emb = driver_tables["embeddings"]
    exact = embedding_dup_pairs(emb, threshold=0.45, n_planes=0).toPandas()
    approx = embedding_dup_pairs(emb, threshold=0.45, n_planes=2).toPandas()
    ep = {(int(a), int(b)) for a, b in zip(exact.id_a, exact.id_b)}
    ap = {(int(a), int(b)) for a, b in zip(approx.id_a, approx.id_b)}
    assert ap <= ep          # bucket restriction can only drop pairs
    if ep:
        assert len(ap) / len(ep) >= 0.5  # modest planes -> decent recall


def test_embedding_dup_pairs_multiprobe(spark, driver_tables):
    """Hamming-1 multi-probe: a strict superset of the exact-bucket
    pairs, still a subset of all-pairs truth, and emits each pair at
    most once (distinct XOR masks -> distinct probe values)."""
    from wrds_data_pipeline_spark.operators.similarity import embedding_dup_pairs

    emb = driver_tables["embeddings"]
    planes = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(7, 113, 251, 401))
        .orderBy("vec_id")
        .collect()
    ]
    exact = embedding_dup_pairs(emb, threshold=0.45, n_planes=0).toPandas()
    bucket = embedding_dup_pairs(emb, threshold=0.45, planes=planes).toPandas()
    probe = embedding_dup_pairs(
        emb, threshold=0.45, planes=planes, hamming_probe=1
    ).toPandas()
    ep = {(int(a), int(b)) for a, b in zip(exact.id_a, exact.id_b)}
    bp = {(int(a), int(b)) for a, b in zip(bucket.id_a, bucket.id_b)}
    pp = {(int(a), int(b)) for a, b in zip(probe.id_a, probe.id_b)}
    assert bp <= pp <= ep
    assert len(pp) == len(probe)  # no pair emitted twice
    if ep:
        assert len(pp) / len(ep) >= 0.5
    # the scale shape: bucket equi-join, never a nested-loop product
    plan = embedding_dup_pairs(
        emb, threshold=0.45, planes=planes, hamming_probe=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_auto_sizing_formulas_match_duckdb():
    """The q36/q44/q56 registrations derive hyperparameter COUNTS from
    the corpus size on both engines — Python (auto_n_planes /
    auto_n_cells) and the oracle SQL (greatest/ceil/log2 over
    count(*)).  If the two formulas ever disagree for any n, the
    driver's hash check fails with a baffling bucket mismatch; pin
    the parity across a wide, boundary-heavy range of n here."""
    import duckdb

    from wrds_data_pipeline_spark.operators.similarity import (
        auto_n_cells,
        auto_n_planes,
    )

    ns = sorted(
        {1, 2, 31, 32, 33, 63, 64, 65, 500, 511, 512, 513, 2000, 4095, 4096,
         4097, 10_000, 65_536, 1_000_000, 2**24, 2**24 + 1}
        | {2**k + d for k in range(5, 22, 3) for d in (-1, 0, 1)}
    )
    con = duckdb.connect()
    for n in ns:
        sql_planes, sql_cells = con.execute(
            f"SELECT greatest(4, CAST(ceil(log2({n} / 32.0)) AS INT)),"
            f"       greatest(16, CAST(ceil({n} / 64.0) AS INT))"
        ).fetchone()
        assert auto_n_planes(n, target_bucket_size=32) == sql_planes, n
        assert auto_n_cells(n, target_cell_size=64) == sql_cells, n


def test_embedding_dup_pairs_probe_without_planes_raises(spark, driver_tables):
    """hamming_probe>0 with no buckets must fail loudly instead of
    silently handing back the quadratic all-pairs plan (ADVICE r5)."""
    import pytest

    from wrds_data_pipeline_spark.operators.similarity import embedding_dup_pairs

    emb = driver_tables["embeddings"]
    with pytest.raises(ValueError, match="hamming_probe"):
        embedding_dup_pairs(emb, threshold=0.45, hamming_probe=1)
    # an EMPTY plane list (e.g. a collect over missing pinned ids)
    # must hit the same guard, not fall through to all-pairs
    with pytest.raises(ValueError, match="hamming_probe"):
        embedding_dup_pairs(emb, threshold=0.45, planes=[], hamming_probe=1)


def test_lsh_topk_zero_planes_degrades_to_exact(spark, driver_tables):
    """n_planes=0 is the documented degenerate baseline: one bucket
    holding everything, i.e. exact brute-force top-k."""
    from wrds_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = driver_tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    exact = brute_force_topk(emb, qv, k=5).toPandas()
    degenerate = lsh_topk(emb, qv, k=5, n_planes=0).toPandas()
    assert list(degenerate["vec_id"]) == list(exact["vec_id"])
    assert list(degenerate["cos_sim"]) == list(exact["cos_sim"])


def test_bpe_ish_token_count(spark):
    from wrds_data_pipeline_spark.functions.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(0, "Hello, world's 42 cats!"), (1, ""), (2, "a")], ["i", "text"]
    )
    out = {r.i: r.n for r in df.select("i", bpe_ish_token_count("text").alias("n")).collect()}
    # Hello |,| world|'s| 42| cats|! -> 7
    assert out[0] == 7
    assert out[1] == 0
    assert out[2] == 1


def test_winnowing_shared_run_guarantee(spark):
    from wrds_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token run
    docs = spark.createDataFrame(
        [
            (0, "intro words then " + shared + " and a tail"),
            (1, "different opening here " + shared + " closing words"),
            (2, "no overlap with anything else at all in this one"),
        ],
        ["doc_id", "text"],
    )
    fp = winnowing_fingerprints(docs, k_shingle=3, window=4).toPandas()
    sets = {i: set(fp[fp._id == i]["fp"]) for i in (0, 1, 2)}
    # MOSS guarantee: a shared run of >= k+window-1 = 6 tokens yields
    # at least one shared fingerprint
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])
    # storage reduction vs full shingle set
    from wrds_data_pipeline_spark.operators.dedup import _shingled
    full = _shingled(docs, "doc_id", "text", 3).toPandas()
    assert len(fp) < len(full)


def test_lsh_multiprobe_recall_dominates_single_probe(spark, driver_tables):
    """Multi-probe (Hamming-1) recall vs the exact top-k is >= the
    single-probe recall at equal n_planes, and the probed candidate
    set is a superset of the single-probe set."""
    emb = driver_tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = set(
        brute_force_topk(emb, qv, k=10).toPandas()["vec_id"].astype(int)
    )
    single = set(
        lsh_topk(emb, qv, k=10, n_planes=5).toPandas()["vec_id"].astype(int)
    )
    multi = set(
        lsh_topk(emb, qv, k=10, n_planes=5, hamming_probe=1)
        .toPandas()["vec_id"].astype(int)
    )
    recall_single = len(single & exact) / len(exact)
    recall_multi = len(multi & exact) / len(exact)
    assert recall_multi >= recall_single
    # probing strictly more buckets can only add candidates; with k
    # fixed the result set may rotate, but the query's own vector must
    # stay rank-1 in both
    assert 7 in single and 7 in multi


def test_brute_force_topk_batch_matches_per_query(spark, driver_tables):
    """The batched two-stage top-k returns exactly the per-query
    brute-force result for every query, and its plan never sorts the
    whole corpus in one task (both windows partitioned)."""
    from wrds_data_pipeline_spark.operators.similarity import brute_force_topk_batch

    emb = driver_tables["embeddings"]
    qids = [3, 11, 42]
    queries = (
        emb.filter(F.col("vec_id").isin(qids))
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
    )
    got = brute_force_topk_batch(queries, emb, k=5).toPandas()
    assert sorted(got["query_id"].unique()) == qids
    for qid in qids:
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).first()["embedding"]]
        want = brute_force_topk(emb, qv, k=5).toPandas()
        g = got[got["query_id"] == qid].sort_values("rank")
        assert list(g["vec_id"]) == list(want["vec_id"])
        assert list(g["rank"]) == list(want["rank"])

    # no unpartitioned window: every Window spec carries a partition key
    import re

    plan = brute_force_topk_batch(queries, emb, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.count(",") >= 2, f"unpartitioned window: {spec}"


def test_incremental_lsh_equals_full_recompute(spark, driver_tables):
    """incremental(new, band_table(old)) ∪ candidates(old) must equal
    candidates(old ∪ new) — the amortized-index contract."""
    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_table,
        minhash_lsh_candidates,
    )

    all_docs = driver_tables["documents"].select("doc_id", "text")
    old = all_docs.filter(F.col("doc_id") % 5 != 0)
    new = all_docs.filter(F.col("doc_id") % 5 == 0)

    band_table = minhash_band_table(old).persist()
    inc = incremental_lsh_candidates(new, band_table)
    old_pairs = minhash_lsh_candidates(old)
    full = minhash_lsh_candidates(all_docs)

    got = {(r.id_a, r.id_b) for r in inc.collect()} | {
        (r.id_a, r.id_b) for r in old_pairs.collect()
    }
    want = {(r.id_a, r.id_b) for r in full.collect()}
    assert got == want
    # and the increment genuinely contributes cross pairs
    assert any(
        (a % 5 == 0) != (b % 5 == 0) for a, b in got
    )


def test_int8_quantization_preserves_topk(spark, driver_tables):
    """Round-trip error is bounded and brute-force top-10 on
    dequantized vectors matches exact top-10 with high overlap."""
    from wrds_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        cosine,
        dequantize_int8,
        quantize_int8,
    )

    emb = driver_tables["embeddings"]
    rt = emb.select(
        "vec_id",
        "embedding",
        dequantize_int8(quantize_int8(F.col("embedding"))).alias("deq"),
    )
    # cosine(original, round-trip) must stay ~1 for every vector
    worst = rt.select(
        F.min(cosine(F.col("embedding"), F.col("deq"))).alias("m")
    ).first()["m"]
    assert worst > 0.999

    query = emb.orderBy("vec_id").first()["embedding"]
    exact = {
        r.vec_id
        for r in brute_force_topk(emb, query, k=10).collect()
    }
    deq = rt.select("vec_id", F.col("deq").alias("embedding"))
    approx = {
        r.vec_id for r in brute_force_topk(deq, query, k=10).collect()
    }
    assert len(exact & approx) >= 9


def test_int8_quantize_duckdb_twin(spark, sf_dir):
    """Oracle-grade check for quantize_int8 (pytest-only tail — the
    registry is capped at 50): DuckDB independently replays the exact
    arithmetic (am = max|x| in double, scale = float32(am/127),
    q_i = round_half_away(x/(am/127))) over the driver embeddings and
    every (vec_id, pos) cell must agree BIT-EXACTLY — quantization is
    storage, a one-off mismatch corrupts every downstream distance."""
    import duckdb

    from wrds_data_pipeline_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.select(
        "vec_id", quantize_int8(F.col("embedding")).alias("_qs")
    ).select(
        "vec_id",
        F.col("_qs.scale").alias("scale"),
        F.posexplode("_qs.q").alias("pos", "qv"),
    )
    got = {(r.vec_id, r.pos): (r.scale, r.qv) for r in q.collect()}

    want = {
        (vid, pos): (scale, qv)
        for vid, pos, scale, qv in duckdb.connect()
        .execute(
            f"""
            WITH base AS (
              SELECT vec_id, embedding,
                     list_aggregate(
                       list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                       'max') AS am
              FROM read_parquet('{sf_dir}/embeddings.parquet')
            ), ex AS (
              SELECT vec_id, am,
                     generate_subscripts(embedding, 1) - 1 AS pos,
                     unnest(embedding) AS v
              FROM base
            )
            SELECT vec_id, pos, CAST(am / 127.0 AS FLOAT) AS scale,
                   CASE WHEN am > 0
                        THEN CAST(round(CAST(v AS DOUBLE) / (am / 127.0)) AS INTEGER)
                        ELSE 0 END AS qv
            FROM ex
            """
        )
        .fetchall()
    }
    assert len(got) == len(want) > 0
    assert all(
        got[k][1] == want[k][1] and got[k][0] == want[k][0] for k in got
    )


def test_candidate_driven_verification_equals_allpairs_restricted(
    spark, driver_tables
):
    """The round-4 candidate-DRIVEN jaccard path (join candidates →
    shingles; no inverted-index self-join) must return exactly the
    all-pairs result intersected with the candidate set — same pairs,
    same jaccard values — and near_dup_pairs (shared single shingle
    relation) must equal composing the stages independently."""
    from wrds_data_pipeline_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
        near_dup_pairs,
    )

    docs = driver_tables["documents"]
    cand = minhash_lsh_candidates(docs)
    cand_set = {(r.id_a, r.id_b) for r in cand.collect()}

    allp = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.2).collect()
    }
    driven = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.2, candidates=cand).collect()
    }
    assert driven == {k: v for k, v in allp.items() if k in cand_set}

    composed = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_dup_pairs(docs, threshold=0.2).collect()
    }
    assert composed == driven

    # duplicate candidate rows must not double-count intersections
    # (the old left_semi restriction was idempotent; the candidate-
    # driven join restores that via an internal distinct)
    duped = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            docs, threshold=0.2, candidates=cand.unionAll(cand)
        ).collect()
    }
    assert duped == driven
    # sanity: the planted corpus makes this non-vacuous
    assert len(driven) > 0


def test_band_index_roundtrip_and_pruning(spark, driver_tables, tmp_path):
    """On-disk band index: build → probe matches the DataFrame-level
    incremental path; shard pruning reads a strict subset of the
    index's partition directories and changes nothing."""
    from wrds_data_pipeline_spark.operators.dedup import (
        _band_index_shard,
        build_band_index,
        incremental_lsh_candidates,
        minhash_band_table,
        probe_band_index,
    )

    all_docs = driver_tables["documents"].select("doc_id", "text")
    old = all_docs.filter(F.col("doc_id") % 5 != 0)
    new = all_docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "band_index")
    build_band_index(old, path, n_shards=64)

    want = {
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(new, minhash_band_table(old)).collect()
    }
    got_pruned = {
        (r.id_a, r.id_b) for r in probe_band_index(new, path).collect()
    }
    got_full = {
        (r.id_a, r.id_b)
        for r in probe_band_index(new, path, prune_shards=False).collect()
    }
    assert got_pruned == got_full == want

    # a 1-doc increment touches at most `bands` shards; the pruned scan
    # must list/read only those partition directories
    one = new.limit(1)
    one_shards = {
        r["shard"]
        for r in minhash_band_table(one)
        .select(_band_index_shard(64).alias("shard"))
        .distinct()
        .collect()
    }
    idx = spark.read.parquet(f"{path}/bands")
    # input_file_name over the EXECUTED pruned scan (inputFiles() is
    # the unpruned listing of the relation, pruning never reaches it)
    pruned_files = [
        r["f"]
        for r in idx.filter(F.col("shard").isin(list(one_shards)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    assert 0 < len(pruned_files) < len(idx.inputFiles())
    assert all(any(f"shard={s}/" in f for s in one_shards) for f in pruned_files)
    # layout: the shard repartition keeps the file count at ~one per
    # shard, not tasks × shards
    assert len(idx.inputFiles()) <= 64


def test_band_index_append_and_meta_enforcement(spark, driver_tables, tmp_path):
    """append re-derives signature params from the stored meta (probe
    after append sees the first increment); a non-default index proves
    meta is actually read rather than defaults silently reused."""
    from wrds_data_pipeline_spark.operators.dedup import (
        append_band_index,
        build_band_index,
        minhash_band_table,
        incremental_lsh_candidates,
        probe_band_index,
    )

    all_docs = driver_tables["documents"].select("doc_id", "text")
    base = all_docs.filter(F.col("doc_id") % 5 > 1)
    inc1 = all_docs.filter(F.col("doc_id") % 5 == 1)
    inc2 = all_docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "band_index_nd")
    # non-default scheme: different banding AND shingle size
    params = dict(k_shingle=2, n_hashes=12, bands=6)
    build_band_index(base, path, n_shards=32, **params)
    append_band_index(inc1, path)

    got = {(r.id_a, r.id_b) for r in probe_band_index(inc2, path).collect()}
    want = {
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(
            inc2,
            minhash_band_table(base.unionByName(inc1), **params),
            **params,
        ).collect()
    }
    assert got == want
    # the non-default scheme yields a different candidate set than the
    # defaults would — i.e. the meta genuinely drove the probe hashing
    default_want = {
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(
            inc2, minhash_band_table(base.unionByName(inc1))
        ).collect()
    }
    assert want != default_want


def test_winnowing_duckdb_twin(spark, sf_dir):
    """The rotated q41 oracle, kept as a pytest twin: winnowing
    fingerprints on the sf0.001 documents table match the DuckDB
    replay row-for-row (same md5-prefix hash space)."""
    import duckdb

    from wrds_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    got = (
        winnowing_fingerprints(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            k_shingle=3,
            window=4,
        )
        .toPandas()
        .sort_values(["_id", "fp"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH toks AS (
          SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
          FROM documents
        ),
        posed AS (
          SELECT doc_id, i AS pos,
                 ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT
                   % 1000000007 AS h
          FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
        )
        SELECT DISTINCT doc_id AS _id,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM posed
        """
    ).df().sort_values(["_id", "fp"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["_id"].values == want["_id"].values).all()
    assert (got["fp"].values == want["fp"].values).all()


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment 1.0,
    jaccard far below any useful threshold — and the DuckDB replay of
    the containment formula agrees exactly."""
    import duckdb

    from wrds_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.replace("filler", "pad")),
            (3, "completely different text about spark catalyst plans"),
        ],
        ["doc_id", "text"],
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert all(3 not in p for p in cont)
    jac = jaccard_pairs(docs, threshold=0.3).collect()
    assert all({r["id_a"], r["id_b"]} != {1, 2} for r in jac)
    # candidate-driven path agrees with the inverted-index path
    cand = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    via_cand = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            docs, threshold=0.9, candidates=cand
        ).collect()
    }
    assert via_cand == {(1, 2): 1.0}
    # DuckDB replay of |A∩B| / min(|A|,|B|) over distinct 3-gram sets
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        """
        WITH toks AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+2], ' ') AS g
          FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(count(*) / least(sa.n, sb.n), 6) AS containment
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN sizes sa ON sa.doc_id = a.doc_id
        JOIN sizes sb ON sb.doc_id = b.doc_id
        GROUP BY 1, 2, sa.n, sb.n
        HAVING count(*) / least(sa.n, sb.n) >= 0.9
        """
    ).fetchall()
    assert {(r[0], r[1]): r[2] for r in want} == cont


def test_containment_property_vs_python(spark):
    """Hypothesis: containment_pairs matches a brute-force python
    computation of |A∩B|/min(|A|,|B|) over distinct shingle sets for
    randomized corpora (including whitespace-messy and repeated-token
    texts)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from wrds_data_pipeline_spark.operators.dedup import containment_pairs

    word = st.sampled_from([f"w{i}" for i in range(12)])
    text = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(st.lists(text, min_size=2, max_size=5))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(
                docs, k_shingle=2, threshold=0.0
            ).collect()
        }

        def shingles(t):
            # word_shingles' short-doc rule: docs shorter than k
            # contribute their whole (normalized) text as ONE shingle
            # — including the empty string, so two empty docs are
            # containment-1.0 exact duplicates, same as jaccard
            toks = t.lower().split()
            if len(toks) < 2:
                return {" ".join(toks)}
            return {
                " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
            }

        want = {}
        for i, a in rows:
            for j, b in rows:
                if i >= j:
                    continue
                sa, sb = shingles(a), shingles(b)
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                if inter:
                    want[(i, j)] = round(inter / min(len(sa), len(sb)), 6)
        assert got == want

    run()
