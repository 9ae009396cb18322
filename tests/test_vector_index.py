"""Persisted vector index: build/load/append/topk lifecycle.

The quantizer state (centroids, PQ codebooks) must round-trip through
disk bit-exactly — a reloaded index answers queries identically to the
in-memory build — and the probe must read only the probed cells'
partition directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
)
from wrds_data_pipeline_spark.operators.vector_index import (
    append_vector_index,
    build_vector_index,
    load_vector_index,
    vector_index_topk,
)


def _query(emb, vid=7):
    return [float(x) for x in emb.filter(F.col("vec_id") == vid).first()["embedding"]]


def test_build_load_roundtrip_exact(spark, driver_tables, tmp_path):
    emb = driver_tables["embeddings"]
    path = str(tmp_path / "vidx")
    built = build_vector_index(emb, path, n_cells=8)
    opened = load_vector_index(spark, path)
    assert opened.centroids == built.centroids
    assert opened.codebooks is None and opened.id_col == "vec_id"

    q = _query(emb)
    # through the reloaded index == in-memory ivf_topk on the same quantizer
    assigned, _ = ivf_build(emb, n_cells=8)
    mem = ivf_topk(assigned, opened.centroid_list(), q, k=5, n_probe=2).toPandas()
    disk = vector_index_topk(opened, q, k=5, n_probe=2).toPandas()
    assert mem[["vec_id", "rank"]].values.tolist() == disk[
        ["vec_id", "rank"]
    ].values.tolist()


def test_pq_index_roundtrip_and_probe(spark, driver_tables, tmp_path):
    emb = driver_tables["embeddings"]
    path = str(tmp_path / "vidx_pq")
    built = build_vector_index(emb, path, n_cells=8, pq_m=8, pq_k=16)
    opened = load_vector_index(spark, path)
    # codebooks round-trip bit-exactly (frozen dataclass equality,
    # INCLUDING the round-7 sigma calibration that sizes auto-rerank)
    assert opened.codebooks == built.codebooks
    assert opened.codebooks.sigma is not None
    assert all(s > 0 for s in opened.codebooks.sigma)
    assert "pq_code" in opened.df.columns

    q = _query(emb, vid=11)
    got = vector_index_topk(opened, q, k=5, n_probe=len(opened.centroids))
    # probing every cell: the PQ path's candidates come from the whole
    # corpus, and the exact rerank pins the scores — the top hit is the
    # query vector itself with cos_sim 1.0
    top = got.toPandas().iloc[0]
    assert int(top["vec_id"]) == 11 and abs(top["cos_sim"] - 1.0) < 1e-6
    # exact path through the same index agrees with brute force
    exact = vector_index_topk(
        opened, q, k=5, n_probe=len(opened.centroids), use_pq=False
    ).toPandas()
    want = brute_force_topk(emb, q, 5).toPandas()
    assert exact["vec_id"].tolist() == want["vec_id"].tolist()


def test_probe_reads_only_probed_cells(spark, driver_tables, tmp_path):
    emb = driver_tables["embeddings"]
    path = str(tmp_path / "vidx_prune")
    opened = build_vector_index(emb, path, n_cells=8)
    q = _query(emb, vid=3)
    got = vector_index_topk(opened, q, k=5, n_probe=2)
    got.collect()
    # replicate the probe filter: files actually read are under the
    # two probed cells only, and a strict subset of the index
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    cents = opened.centroid_list()
    probe = [c[0] for c in sorted(cents, key=lambda c: -cos(c[1], q))[:2]]
    read = {
        r[0]
        for r in opened.df.filter(F.col("cell").isin(probe))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read and read < set(opened.df.inputFiles())
    assert all(any(f"cell={c}/" in f for c in probe) for f in read)
    # layout: ~one file per cell, not tasks × cells
    assert len(opened.df.inputFiles()) <= len(cents)


def test_append_assigns_with_stored_quantizer(spark, driver_tables, tmp_path):
    emb = driver_tables["embeddings"]
    base = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "vidx_app")
    build_vector_index(base, path, n_cells=8, pq_m=8, pq_k=16)
    append_vector_index(inc, path)
    opened = load_vector_index(spark, path)

    # every vector present exactly once; appended rows carry PQ codes
    ids = [r["vec_id"] for r in opened.df.select("vec_id").collect()]
    assert sorted(ids) == sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    assert opened.df.filter(F.col("pq_code").isNull()).count() == 0

    # appended vectors sit in their nearest STORED cell (exact assigner
    # replay over the increment)
    from wrds_data_pipeline_spark.operators.similarity import exact_assigner

    want = {
        r["vec_id"]: r["cell"]
        for r in exact_assigner(opened.centroid_list())(inc).collect()
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in opened.df.join(inc.select("vec_id"), "vec_id").collect()
    }
    assert got == want

    # a query for an appended vector finds it through the index
    q = _query(emb, vid=0)
    top = vector_index_topk(opened, q, k=3, n_probe=len(opened.centroids)).toPandas()
    assert int(top.iloc[0]["vec_id"]) == 0


def test_prune_vector_index_matches_cluster_prune(spark, tmp_path):
    """Index-side pruning (stored cells + centroid join) keeps the
    same ids as cluster_prune re-assigning from scratch with the same
    quantizer."""
    from wrds_data_pipeline_spark.operators.similarity import cluster_prune
    from wrds_data_pipeline_spark.operators.vector_index import (
        build_vector_index,
        load_vector_index,
        prune_vector_index,
    )

    emb = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.cos(F.col("id") * (j + 1) * 0.37) + (F.col("id") % 3),
        ).alias("embedding"),
    )
    path = str(tmp_path / "vidx")
    build_vector_index(emb, path, n_cells=4)
    idx = load_vector_index(spark, path)
    got = {
        r["id"] for r in prune_vector_index(spark, path, 0.5, "far").collect()
    }
    want = {
        r["vec_id"]
        for r in cluster_prune(
            emb, idx.centroid_list(), 0.5, "far", assign="exact"
        ).collect()
    }
    assert got == want and got


def test_vector_index_topk_batch_matches_per_query(spark, driver_tables, tmp_path):
    """Batch search through the stored index: one scan of the union of
    probed cells serves all queries, with per-query cell restriction
    via the broadcast probe map — ids and exact cosines equal the
    per-query vector_index_topk for every query, in the exact path and
    both PQ pool modes."""
    from wrds_data_pipeline_spark.operators.vector_index import (
        vector_index_topk_batch,
    )

    emb = driver_tables["embeddings"]
    path = str(tmp_path / "vidx_batch")
    build_vector_index(emb, path, n_cells=8, pq_m=8, pq_k=16)
    idx = load_vector_index(spark, path)

    qids = [3, 77, 211]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    queries = spark.createDataFrame(
        [(i, qvecs[i]) for i in qids], "query_id long, query_vec array<double>"
    )

    cases = [
        {"use_pq": False},
        {"use_pq": True, "rerank_factor": 4},
        {"use_pq": True, "rerank_factor": None},
    ]
    for kw in cases:
        batch = vector_index_topk_batch(
            idx, queries, k=5, n_probe=3, **kw
        ).toPandas()
        assert set(batch["query_id"]) == set(qids)
        for qid in qids:
            single = vector_index_topk(
                idx, qvecs[qid], k=5, n_probe=3, **kw
            ).toPandas()
            b = batch[batch.query_id == qid].sort_values("rank")
            assert b["vec_id"].tolist() == single["vec_id"].tolist(), kw
            assert b["cos_sim"].tolist() == pytest.approx(
                single["cos_sim"].tolist(), abs=2e-6
            ), kw


def test_compact_vector_index_repairs_duplicate_appends(
    spark, driver_tables, tmp_path
):
    """An at-least-once replay of append_vector_index re-appends its
    batch: the duplicate rows are SECOND IDENTICAL NEIGHBORS that
    top-k returns twice, crowding out real neighbors — compact is
    repair here, not just reclamation.  Post-compact the index
    answers exactly like the never-duplicated build, with one file
    per cell."""
    import os
    import shutil

    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.vector_index import (
        vector_index_topk_batch,
    )

    emb = driver_tables["embeddings"]
    clean = str(tmp_path / "vidx_clean")
    build_vector_index(emb, clean, n_cells=8)
    dirty = str(tmp_path / "vidx_dirty")
    shutil.copytree(clean, dirty)
    append_vector_index(emb, dirty)  # the replayed batch
    n = emb.count()
    assert spark.read.parquet(f"{dirty}/vectors").count() == 2 * n

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def topk(path):
        idx = load_vector_index(spark, path)
        return sorted(
            (r["query_id"], r["vec_id"], round(r["cos_sim"], 6))
            for r in vector_index_topk_batch(
                idx, queries, k=5, n_probe=8
            ).collect()
        )

    want = topk(clean)
    got_dirty = topk(dirty)
    # the corruption is real: duplicate neighbors displace true ones
    assert got_dirty != want
    assert any(
        got_dirty.count((q, v, s)) > 1 for (q, v, s) in got_dirty
    )

    assert index_main(["compact", "--vector-index", dirty]) == 0
    assert spark.read.parquet(f"{dirty}/vectors").count() == n
    assert topk(dirty) == want
    for d in os.listdir(f"{dirty}/vectors"):
        if d.startswith("cell="):
            files = [
                f
                for f in os.listdir(os.path.join(f"{dirty}/vectors", d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1


def test_vector_index_swap_crash_window_recovers_on_load(
    spark, driver_tables, tmp_path
):
    """compact_vector_index interrupted between its two renames leaves
    vectors/ at vectors.old with the compacted copy beside it —
    load_vector_index must complete the swap and answer identically;
    with the copy gone, refuse naming the recovery command."""
    import os
    import shutil

    from wrds_data_pipeline_spark.operators.vector_index import (
        vector_index_topk,
    )

    emb = driver_tables["embeddings"]
    path = str(tmp_path / "vidx")
    build_vector_index(emb, path, n_cells=8)
    [q] = emb.filter(F.col("vec_id") == 1).select("embedding").collect()
    qvec = list(q[0])

    def topk():
        idx = load_vector_index(spark, path)
        return [
            (r["vec_id"], round(r["cos_sim"], 6))
            for r in vector_index_topk(idx, qvec, k=5, n_probe=8).collect()
        ]

    want = topk()
    vectors = os.path.join(path, "vectors")
    shutil.copytree(vectors, vectors + ".compacting")
    os.rename(vectors, vectors + ".old")
    assert topk() == want  # swap completed on load
    assert not os.path.exists(vectors + ".old")
    os.rename(vectors, vectors + ".old")
    with pytest.raises(RuntimeError, match="mv "):
        load_vector_index(spark, path)
