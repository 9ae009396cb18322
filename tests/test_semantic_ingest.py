"""semantic_ingest_increment (operators/vector_index.py): the
embedding family's one-verb verified ingest — batch-fold parity with
semantic_dup_pairs, cross-increment detection, replay + compact
repair, refusals, cell pruning, groups-store resolution, and the
ingest-vectors CLI."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.similarity import (
    semantic_dup_pairs,
)
from wrds_data_pipeline_spark.operators.vector_index import (
    build_vector_index,
    compact_vector_index,
    load_vector_index,
    semantic_ingest_increment,
    vector_index_topk,
)

_T = 0.9


def _pairs_set(df):
    return {
        (r["id_a"], r["id_b"], r["cell"], r["cos_sim"])
        for r in df.collect()
    }


def _near_copy(emb, src_id: int, new_id: int):
    """An increment row that is a near-duplicate of ``src_id``: the
    same direction scaled — cosine exactly 1.0, same cell."""
    return (
        emb.filter(F.col("vec_id") == src_id)
        .select(
            F.lit(new_id).cast("long").alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x * F.lit(1.25))
            .cast("array<float>")  # the store's element type — a
            # double increment is refused (test_refusals)
            .alias("embedding"),
        )
    )


def test_incremental_fold_matches_batch_pairs(spark, driver_tables, tmp_path):
    """Folding the corpus through the verb in two increments emits
    EXACTLY the batch semantic_dup_pairs set under the stored
    centroids (the increment is assigned with the stored quantizer,
    which is ivf_assign itself)."""
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    # the synthetic table has no natural pairs at this threshold, so
    # the corpus carries engineered near-copies on BOTH sides of the
    # increment split: within-inc1, within-inc2, and cross-increment
    corpus = (
        emb.unionByName(_near_copy(emb, 42, 99042))  # even + even
        .unionByName(_near_copy(emb, 7, 99007))      # odd + odd
        .unionByName(_near_copy(emb, 8, 99009))      # even + odd: cross
    )
    inc1 = corpus.filter(F.col("vec_id") % 2 == 0)
    inc2 = corpus.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "vidx")
    p1 = semantic_ingest_increment(inc1, path, threshold=_T, n_cells=8)
    p2 = semantic_ingest_increment(inc2, path, threshold=_T)
    idx = load_vector_index(spark, path)
    batch = semantic_dup_pairs(corpus, idx.centroid_list(), _T)
    got = _pairs_set(p1) | _pairs_set(p2)
    want = _pairs_set(batch)
    assert got == want and want  # non-vacuous: the corpus has pairs
    assert {(a, b) for a, b, _, _ in want} >= {
        (42, 99042), (7, 99007), (8, 99009)
    }
    # every vector present exactly once after the fold
    ids = [r["vec_id"] for r in idx.df.select("vec_id").collect()]
    assert sorted(ids) == sorted(
        r["vec_id"] for r in corpus.select("vec_id").collect()
    )


def test_cross_increment_near_dup_found_and_queryable(
    spark, driver_tables, tmp_path
):
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "vidx")
    semantic_ingest_increment(emb, path, threshold=_T, n_cells=8)
    inc = _near_copy(emb, 7, 99007).unionByName(
        _near_copy(emb, 42, 99042)
    )
    pairs = semantic_ingest_increment(inc, path, threshold=_T)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the engineered copies pair with their stored originals
    assert (7, 99007) in got and (42, 99042) in got
    for r in pairs.collect():
        if (r["id_a"], r["id_b"]) in ((7, 99007), (42, 99042)):
            assert abs(r["cos_sim"] - 1.0) < 1e-6
    # the appended copy is queryable through the index
    idx = load_vector_index(spark, path)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    top = vector_index_topk(
        idx, q, k=2, n_probe=len(idx.centroids)
    ).toPandas()
    assert set(top["vec_id"].astype(int)) == {7, 99007}


def test_replay_emits_same_pairs_and_compact_repairs(
    spark, driver_tables, tmp_path
):
    """Re-running an interrupted increment: same pair set, duplicate
    rows in the store, compact restores one-row-per-vector and the
    same post-repair query answers."""
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 400)
    inc = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "vidx")
    semantic_ingest_increment(base, path, threshold=_T, n_cells=8)
    first = _pairs_set(semantic_ingest_increment(inc, path, threshold=_T))
    replay = _pairs_set(semantic_ingest_increment(inc, path, threshold=_T))
    assert replay == first
    idx = load_vector_index(spark, path)
    n_rows = idx.df.count()
    n_ids = idx.df.select("vec_id").distinct().count()
    assert n_rows > n_ids  # the replay's duplicate rows are visible
    stats = compact_vector_index(spark, path)
    assert stats["rows_after"] == n_ids
    idx = load_vector_index(spark, path)
    assert idx.df.count() == n_ids


def test_refusals(spark, driver_tables, tmp_path):
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "vidx")
    semantic_ingest_increment(emb, path, threshold=_T, n_cells=8)
    # wrong columns
    renamed = emb.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec")
    )
    with pytest.raises(ValueError, match="built with id_col"):
        semantic_ingest_increment(
            renamed, path, id_col="doc_id", vec_col="vec"
        )
    # wrong dimension
    short = emb.select(
        "vec_id", F.slice("embedding", 1, 4).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        semantic_ingest_increment(short, path)
    # wrong element type: an array<double> increment against the
    # array<float> store would append mixed parquet element types —
    # every later read of the touched cells fails
    dbl = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    with pytest.raises(ValueError, match="element type"):
        semantic_ingest_increment(dbl, path)
    from wrds_data_pipeline_spark.operators.vector_index import (
        append_vector_index,
    )

    with pytest.raises(ValueError, match="element type"):
        append_vector_index(dbl, path)
    # vectors without meta = interrupted creation, not a fresh store
    path2 = str(tmp_path / "vidx2")
    semantic_ingest_increment(emb, path2, threshold=_T, n_cells=8)
    import shutil

    shutil.rmtree(os.path.join(path2, "meta"))
    with pytest.raises(ValueError, match="interrupted index creation"):
        semantic_ingest_increment(emb, path2)
    # string ids refuse the groups store before any append
    sids = emb.select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="integral ids"):
        semantic_ingest_increment(
            sids, str(tmp_path / "vidx3"),
            groups_store_path=str(tmp_path / "groups"),
        )


def test_stored_read_prunes_to_increment_cells(
    spark, driver_tables, tmp_path
):
    """The probe's stored-side read lists only the increment's cell
    directories — the partition-pruning contract that keeps ingest
    O(increment + probed cells) at corpus scale."""
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "vidx")
    semantic_ingest_increment(emb, path, threshold=_T, n_cells=8)
    idx = load_vector_index(spark, path)
    inc = _near_copy(emb, 7, 99007)
    from wrds_data_pipeline_spark.operators.vector_index import (
        _assigner_for,
    )

    cells = sorted(
        r["cell"]
        for r in _assigner_for(idx.centroid_list(), "embedding")(inc)
        .select("cell")
        .distinct()
        .collect()
    )
    read = {
        r[0]
        for r in idx.df.filter(F.col("cell").isin(cells))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read and read < set(idx.df.inputFiles())
    assert all(any(f"cell={c}/" in f for c in cells) for f in read)


def test_groups_store_resolves_cross_increment_merge(
    spark, driver_tables, tmp_path
):
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "vidx")
    gpath = str(tmp_path / "groups")
    semantic_ingest_increment(
        emb, path, threshold=_T, n_cells=8, groups_store_path=gpath
    )
    inc = _near_copy(emb, 7, 99007)
    semantic_ingest_increment(
        inc, path, threshold=_T, groups_store_path=gpath
    )
    groups = {
        r["id"]: r["group_id"]
        for r in spark.read.parquet(gpath).select("id", "group_id").collect()
    }
    # the appended copy joined its original's group, labeled by min id
    assert groups.get(99007) == groups.get(7)
    assert groups.get(7) is not None and groups[7] <= 7


def test_cli_ingest_vectors_and_auto_compact(
    spark, driver_tables, tmp_path, capsys
):
    from wrds_data_pipeline_spark.cli import index_main

    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    base_path = str(tmp_path / "base")
    inc_path = str(tmp_path / "inc")
    emb.filter(F.col("vec_id") < 450).write.parquet(base_path)
    emb.filter(F.col("vec_id") >= 450).write.parquet(inc_path)
    index_path = str(tmp_path / "vidx")
    out1 = str(tmp_path / "pairs1")
    rc = index_main(
        ["ingest-vectors", base_path, index_path, out1,
         "--threshold", str(_T), "--n-cells", "8"]
    )
    assert rc == 0
    out2 = str(tmp_path / "pairs2")
    rc = index_main(
        ["ingest-vectors", inc_path, index_path, out2,
         "--threshold", str(_T), "--compact-every", "2"]
    )
    assert rc == 0
    assert "auto-compact" in capsys.readouterr().out
    idx = load_vector_index(spark, index_path)
    # post-compact: one row per vector, one file per cell
    assert idx.df.count() == emb.count()
    files = idx.df.inputFiles()
    assert len(files) <= len(idx.centroids)
    # the two pair files partition the batch set
    p1 = spark.read.parquet(out1)
    p2 = spark.read.parquet(out2)
    batch = semantic_dup_pairs(emb, idx.centroid_list(), _T)
    assert _pairs_set(p1) | _pairs_set(p2) == _pairs_set(batch)


def test_cross_modality_groups_compose(spark, tmp_path):
    """The text loop (band index) and the embedding loop (vector
    index) resolve into the SAME groups store: a text near-dup pair
    (1,2) and a semantic near-dup pair (2,3) merge transitively into
    one duplicate group {1,2,3} — the id space is shared, so the two
    verified-ingest verbs compose without glue."""
    from wrds_data_pipeline_spark.operators.dedup import ingest_increment

    gpath = str(tmp_path / "groups")
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different text about other things entirely"),
        ],
        "doc_id long, text string",
    )
    tpairs = ingest_increment(
        docs,
        str(tmp_path / "bandidx"),
        str(tmp_path / "docstore"),
        n_shards=8,
        docs_shards=8,
        groups_store_path=gpath,
        groups_shards=8,
    )
    assert {(r["id_a"], r["id_b"]) for r in tpairs.collect()} == {(1, 2)}

    # embeddings keyed by the same ids: 2 and 3 share a direction
    # (semantic near-dups), 1 is orthogonal
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 1.0, 0.0]),
            (3, [0.0, 1.0, 1.0001, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    spairs = semantic_ingest_increment(
        emb,
        str(tmp_path / "vidx"),
        threshold=_T,
        n_cells=2,
        groups_store_path=gpath,
        groups_shards=8,
    )
    assert (2, 3) in {(r["id_a"], r["id_b"]) for r in spairs.collect()}

    groups = {
        r["id"]: r["group_id"]
        for r in spark.read.parquet(gpath).select("id", "group_id").collect()
    }
    # transitive cross-modality merge, labeled by the minimum member
    assert groups[1] == groups[2] == groups[3] == 1


def test_harvest_canonical_vectors(spark, driver_tables, tmp_path):
    """The embedding loop's harvest: losers of the groups store the
    semantic ingest maintains are dropped from the vector corpus,
    replay residue collapses, and the score-elected variant keeps the
    best-scoring member instead of the minimum id."""
    from wrds_data_pipeline_spark.operators.vector_index import (
        harvest_canonical_vectors,
    )

    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "vidx")
    gpath = str(tmp_path / "groups")
    semantic_ingest_increment(
        emb, path, threshold=_T, n_cells=8, groups_store_path=gpath
    )
    inc = _near_copy(emb, 7, 99007)
    semantic_ingest_increment(
        inc, path, threshold=_T, groups_store_path=gpath
    )
    semantic_ingest_increment(  # replay: duplicate rows in the store
        inc, path, threshold=_T, groups_store_path=gpath
    )
    kept = harvest_canonical_vectors(spark, path, gpath)
    ids = [r["vec_id"] for r in kept.select("vec_id").collect()]
    assert len(ids) == len(set(ids))  # replay residue collapsed
    assert 7 in ids and 99007 not in ids  # min-id canonical wins
    assert "cell" not in kept.columns and "pq_code" not in kept.columns
    n_all = emb.count() + 1
    assert len(ids) == n_all - 1  # exactly the one loser dropped

    # score election flips the winner
    scores = spark.createDataFrame(
        [(7, 0.1), (99007, 0.9)], "vec_id long, score double"
    )
    kept2 = harvest_canonical_vectors(spark, path, gpath, scores=scores)
    ids2 = {r["vec_id"] for r in kept2.select("vec_id").collect()}
    assert 99007 in ids2 and 7 not in ids2


def test_cli_harvest_vectors(spark, driver_tables, tmp_path):
    from wrds_data_pipeline_spark.cli import index_main

    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    base_path = str(tmp_path / "base")
    emb.write.parquet(base_path)
    inc_path = str(tmp_path / "incp")
    _near_copy(emb, 7, 99007).write.parquet(inc_path)
    index_path = str(tmp_path / "vidx")
    gpath = str(tmp_path / "groups")
    assert index_main(
        ["ingest-vectors", base_path, index_path, str(tmp_path / "p1"),
         "--threshold", str(_T), "--n-cells", "8",
         "--groups-store", gpath]
    ) == 0
    assert index_main(
        ["ingest-vectors", inc_path, index_path, str(tmp_path / "p2"),
         "--threshold", str(_T), "--groups-store", gpath]
    ) == 0
    out = str(tmp_path / "canon")
    assert index_main(["harvest-vectors", index_path, gpath, out]) == 0
    ids = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert 7 in ids and 99007 not in ids
    assert len(ids) == emb.count()


def test_streaming_semantic_ingest_parity_and_restart(
    spark, driver_tables, tmp_path
):
    """The streaming twin maintains the PERSISTED vector index: any
    batch split of the stream emits the batch semantic_dup_pairs set
    under the seed quantizer, a restart with the same checkpoint
    never re-emits or re-appends committed batches, and new arrivals
    after the restart pair against everything accumulated."""
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_semantic_ingest,
    )

    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") < 300)
    path = str(tmp_path / "vidx")
    semantic_ingest_increment(seed, path, threshold=_T, n_cells=8)

    stream_dir = str(tmp_path / "incoming")
    os.makedirs(stream_dir)
    ckpt = str(tmp_path / "ckpt")
    # file 1: the 300s plus a near-copy of a SEED vector (cross to the
    # seed); file 2: a near-copy of a FILE-1 vector (cross-batch)
    f1 = emb.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    ).unionByName(_near_copy(emb, 7, 99007))
    f1.coalesce(1).write.parquet(str(tmp_path / "f1"))
    import shutil as sh

    def _drop(src, name):
        part = [
            f for f in os.listdir(src) if f.endswith(".parquet")
        ][0]
        sh.copy(os.path.join(src, part), os.path.join(stream_dir, name))

    _drop(str(tmp_path / "f1"), "f1.parquet")
    schema = emb.schema
    p1 = streaming_semantic_ingest(
        spark, stream_dir, schema, path, threshold=_T,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    got1 = set(zip(p1["id_a"].astype(int), p1["id_b"].astype(int)))
    assert (7, 99007) in got1  # cross to the seed store

    # restart with the same checkpoint and no new files: a no-op
    from wrds_data_pipeline_spark.operators.vector_index import (
        load_vector_index,
    )

    rows_before = load_vector_index(spark, path).df.count()
    p_again = streaming_semantic_ingest(
        spark, stream_dir, schema, path, threshold=_T,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    assert len(p_again) == 0
    assert load_vector_index(spark, path).df.count() == rows_before

    # a new file pairs against the accumulated store (file-1's copy)
    f2 = emb.filter(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 450)
    ).unionByName(_near_copy(emb, 310, 99310))
    f2.coalesce(1).write.parquet(str(tmp_path / "f2"))
    _drop(str(tmp_path / "f2"), "f2.parquet")
    p2 = streaming_semantic_ingest(
        spark, stream_dir, schema, path, threshold=_T,
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    got2 = set(zip(p2["id_a"].astype(int), p2["id_b"].astype(int)))
    assert (310, 99310) in got2
    assert (7, 99007) not in got2  # committed batches never re-emit

    # fold parity: everything emitted == batch pairs over the
    # accumulated corpus under the stored centroids
    idx = load_vector_index(spark, path)
    corpus = seed.unionByName(f1).unionByName(f2)
    batch = semantic_dup_pairs(corpus, idx.centroid_list(), _T)
    want = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    seed_within = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            seed, idx.centroid_list(), _T
        ).collect()
    }
    assert got1 | got2 == want - seed_within
    # (the seed's own within pairs were emitted by the seed ingest,
    # before the stream — the twin's attribution contract)

    # the index must exist before the stream starts
    import pytest as _pytest

    with _pytest.raises(ValueError, match="build one from a seed"):
        streaming_semantic_ingest(
            spark, stream_dir, schema, str(tmp_path / "missing"),
        )


def test_semantic_ingest_into_pq_index(spark, driver_tables, tmp_path):
    """Ingest against a PQ-encoded index: appended rows carry codes
    from the STORED codebooks, pairs still verify on exact cosine
    (PQ is a query-side approximation, never a pairing one), and the
    appended vectors answer PQ top-k queries."""
    emb = driver_tables["embeddings"].select("vec_id", "embedding")
    path = str(tmp_path / "vidx")
    semantic_ingest_increment(
        emb.filter(F.col("vec_id") < 400), path,
        threshold=_T, n_cells=8, pq_m=8, pq_k=16,
    )
    inc = emb.filter(F.col("vec_id") >= 400).unionByName(
        _near_copy(emb, 7, 99007)
    )
    pairs = semantic_ingest_increment(inc, path, threshold=_T)
    assert (7, 99007) in {
        (r["id_a"], r["id_b"]) for r in pairs.collect()
    }
    idx = load_vector_index(spark, path)
    assert idx.codebooks is not None
    assert idx.df.filter(F.col("pq_code").isNull()).count() == 0
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    top = vector_index_topk(
        idx, q, k=2, n_probe=len(idx.centroids), rerank_factor=4
    ).toPandas()
    assert set(top["vec_id"].astype(int)) == {7, 99007}


def test_multi_probe_recovers_boundary_pair(spark, tmp_path):
    """SemDeDup's documented blind spot, and the recall knob over it:
    a near-dup pair quantized into ADJACENT cells is invisible to the
    same-cell probe (probe_cells=1 — the batch convention) and found
    at probe_cells=2, while the append/index stays identical (the
    argmax cell)."""
    import random

    from wrds_data_pipeline_spark.operators.similarity import (
        exact_assigner,
    )

    rng = random.Random(3)

    def _cluster(base, ids):
        return [
            (
                i,
                [
                    v + rng.uniform(-0.02, 0.02)
                    for v in base
                ],
            )
            for i in ids
        ]

    rows = (
        _cluster([1.0, 0.0, 0.0, 0.0], range(0, 20))
        + _cluster([0.0, 1.0, 0.0, 0.0], range(20, 40))
        # y: on cluster B's side of the boundary
        + [(40, [0.69, 0.72, 0.0, 0.0])]
    )
    store = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    # x: y's near-duplicate (cos ~0.999) on cluster A's side
    x = spark.createDataFrame(
        [(999, [0.72, 0.69, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {}
    for k in (1, 2):
        path = str(tmp_path / f"vidx{k}")
        semantic_ingest_increment(store, path, threshold=0.95, n_cells=2)
        idx = load_vector_index(spark, path)
        # premise: the pair really straddles the boundary
        cells = {
            r["vec_id"]: r["cell"]
            for r in exact_assigner(idx.centroid_list())(
                store.filter(F.col("vec_id") == 40).unionByName(x)
            ).collect()
        }
        assert cells[40] != cells[999], "fixture premise broken"
        pairs = semantic_ingest_increment(
            x, path, threshold=0.95, probe_cells=k
        )
        got[k] = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # the append landed in the argmax cell either way
        idx2 = load_vector_index(spark, path)
        [cell_x] = [
            r["cell"]
            for r in idx2.df.filter(F.col("vec_id") == 999).collect()
        ]
        assert cell_x == cells[999]
    assert (40, 999) not in got[1]  # the same-cell convention misses it
    assert (40, 999) in got[2]      # multi-probe recovers it
    assert got[1] <= got[2]         # superset, never a trade


def test_probe_cells_warns_on_index_creating_call(spark, tmp_path):
    """probe_cells has no stored side to widen on the first
    (index-creating) call — it must warn instead of silently
    delivering k=1 recall."""
    import warnings

    rows = [(i, [float(i % 3), 1.0, 0.0, 0.0]) for i in range(24)]
    inc = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "vidx")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        semantic_ingest_increment(
            inc, path, threshold=0.95, n_cells=2, probe_cells=2
        )
    assert any(
        "probe_cells applies only once an index exists"
        in str(w.message)
        for w in caught
    )
    # and a later call with the knob does NOT warn
    more = spark.createDataFrame(
        [(100, [1.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        semantic_ingest_increment(more, path, probe_cells=2)
    assert not any(
        "probe_cells applies only" in str(w.message) for w in caught2
    )


def test_audit_groups_vectors_cosine_star_pairs(spark, tmp_path):
    """The embedding loop's pre-harvest audit: star pairs of groups
    resolved by semantic ingest score their EXACT cosine from the
    persisted index; a bogus merge injected between orthogonal
    vectors surfaces near zero."""
    import random

    from wrds_data_pipeline_spark.operators.components import (
        audit_groups_vectors,
        update_groups_store,
    )

    rng = random.Random(23)

    def vecs(d, ids, noise=0.01):
        rows = []
        for i in ids:
            v = [rng.uniform(-noise, noise) for _ in range(4)]
            v[d] += 1.0
            rows.append((i, [float(x) for x in v]))
        return rows

    path = str(tmp_path / "vidx")
    groups = str(tmp_path / "groups")
    inc = spark.createDataFrame(
        vecs(0, range(0, 6)) + vecs(1, range(100, 106)),
        "vec_id long, embedding array<float>",
    )
    semantic_ingest_increment(
        inc, path, threshold=0.99, n_cells=2, groups_store_path=groups
    )
    audited = audit_groups_vectors(spark, groups, path, n_groups=8)
    rows = audited.collect()
    assert rows and all(r["cos_sim"] is not None for r in rows)
    assert min(r["cos_sim"] for r in rows) > 0.95  # genuine dups cohere

    # bogus merge across orthogonal directions
    update_groups_store(
        spark, groups,
        spark.createDataFrame([(0, 100)], ["id_a", "id_b"]),
        n_shards=64,
    )
    audited2 = audit_groups_vectors(
        spark, groups, path, n_groups=8, max_pairs_per_group=32
    )
    cross = [
        r["cos_sim"] for r in audited2.collect() if r["id_b"] >= 100
    ]
    assert cross and min(cross) < 0.2  # the false merge surfaces


def test_cli_audit_vectors(spark, tmp_path, capsys):
    import random

    from wrds_data_pipeline_spark.cli import index_main

    rng = random.Random(29)
    rows = [
        (i, [1.0 + rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01),
             0.0, 0.0])
        for i in range(8)
    ]
    inc = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    path, groups = str(tmp_path / "vidx"), str(tmp_path / "groups")
    semantic_ingest_increment(
        inc, path, threshold=0.99, n_cells=2, groups_store_path=groups
    )
    capsys.readouterr()
    rc = index_main(["audit-vectors", groups, path, "--groups", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mean cosine=" in out and "0 pair(s) below" in out
