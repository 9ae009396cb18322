"""fsck (operators/fsck.py + `wrds-spark-index fsck`): the read-only
integrity verb.  Each test builds REAL stores through the production
verbs, asserts a clean bill, then breaks ONE invariant the way an
operational accident would and asserts fsck names exactly that
corruption (and nothing else turns red)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.fsck import (
    fsck_band_index,
    fsck_docs_store,
    fsck_groups_store,
    fsck_vector_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fsck_text_stores_clean_then_each_corruption(spark, tmp_path, capsys):
    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.dedup import (
        _doc_store_shard,
        append_band_index,
        ingest_increment,
    )

    # four mutually-DISSIMILAR variant texts: near-dup groups form
    # within a variant, never across, so the store holds several
    # groups (the sidecar-hole step needs more than one gshard dir)
    variants = [
        "the quick brown fox jumps over the lazy dog every day",
        "spark plans prune partitions and push filters into scans",
        "parquet footers carry column statistics for skipping pages",
        "band hashing buckets similar documents into shared shards",
    ]
    base = "unused "
    idx = str(tmp_path / "idx")
    docs = str(tmp_path / "docs")
    groups = str(tmp_path / "groups")
    rows = [(i, variants[i % 4]) for i in range(40)]
    ingest_increment(
        _docs(spark, rows), idx, docs,
        n_shards=4, docs_shards=4, groups_store_path=groups,
        groups_shards=4,
    )

    # clean: no errors anywhere; the replayed-append residue class is
    # absent on a single fold
    b = fsck_band_index(spark, idx, docs_store=docs)
    d = fsck_docs_store(spark, docs)
    g = fsck_groups_store(spark, groups)
    assert b["errors"] == [] and d["errors"] == [] and g["errors"] == []
    assert b["stats"]["banded_ids_missing_text"] == 0
    assert b["stats"]["banded_ids_missing_signature"] == 0
    assert g["stats"]["sidecar_missing_member_shards"] == 0

    # CLI: clean run exits 0
    capsys.readouterr()
    rc = index_main([
        "fsck", "--band-index", idx, "--docs-store", docs,
        "--groups-store", groups,
    ])
    assert rc == 0
    assert "CORRUPT" not in capsys.readouterr().out

    # 1. lockstep violation: bands appended WITHOUT their texts
    #    (append-band is the low-level verb that skips the docs store)
    append_band_index(
        _docs(spark, [(900, base + "orphan banded doc")]), idx
    )
    b = fsck_band_index(spark, idx, docs_store=docs)
    assert b["stats"]["banded_ids_missing_text"] == 1
    assert any("lockstep" in e for e in b["errors"])
    # the signature side stayed covered (signatures-before-bands)
    assert b["stats"]["banded_ids_missing_signature"] == 0

    # 2. id-uniqueness violation: same id, DIFFERENT text, correct shard
    conflict = (
        _docs(spark, [(7, "an entirely different text for id 7")])
        .withColumn("shard", _doc_store_shard(F.col("doc_id"), 4))
    )
    conflict.write.mode("append").partitionBy("shard").parquet(docs)
    d = fsck_docs_store(spark, docs)
    assert d["stats"]["ids_with_conflicting_text"] == 1
    assert any("DISTINCT text" in e for e in d["errors"])

    # 3. groups label invariant: a member BELOW its group's label (a
    # negative id undercuts any label, including 0)
    lbl = spark.read.parquet(groups).agg(F.max("group_id")).first()[0]
    bad = spark.createDataFrame(
        [(-5, int(lbl))], "id long, group_id long"
    ).withColumn("shard", _doc_store_shard(F.col("id"), 4))
    bad.write.mode("append").partitionBy("shard").parquet(groups)
    g = fsck_groups_store(spark, groups)
    assert g["stats"]["groups_with_nonmin_label"] >= 1
    assert any("minimum member id" in e for e in g["errors"])

    # 4. sidecar hole: drop one gshard partition — the PARTIAL-star
    #    shape the lookup's zero-row fallback cannot detect
    sc = os.path.join(groups, "_group_shards")
    victim = next(
        e for e in os.listdir(sc)
        if e.startswith("gshard=")
        and os.path.isdir(os.path.join(sc, e))
    )
    shutil.rmtree(os.path.join(sc, victim))
    g = fsck_groups_store(spark, groups)
    assert g["stats"]["sidecar_missing_member_shards"] >= 1
    assert any("sidecar" in e for e in g["errors"])

    # CLI on the now-corrupt stores: exit 1, errors printed
    capsys.readouterr()
    rc = index_main([
        "fsck", "--band-index", idx, "--docs-store", docs,
        "--groups-store", groups,
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "CORRUPT" in out and "ERROR:" in out


def test_fsck_vector_index_corruptions(spark, tmp_path):
    import random

    from wrds_data_pipeline_spark.operators.dedup import (
        compact_flat_store,  # noqa: F401  (import guard parity)
    )
    from wrds_data_pipeline_spark.operators.vector_index import (
        append_vector_index,
        build_vector_index,
        compact_vector_index,
    )

    rng = random.Random(3)

    def vecs(direction, n):
        out = []
        for _ in range(n):
            v = [rng.uniform(-0.1, 0.1) for _ in range(4)]
            v[direction] += 1.0
            out.append(v)
        return out

    a = str(tmp_path / "a")
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs(0, 30) + vecs(1, 30))],
        "vec_id long, embedding array<float>",
    )
    build_vector_index(emb, a, n_cells=4)
    clean = fsck_vector_index(spark, a)
    assert clean["errors"] == []
    assert clean["stats"]["sampled_assignment_drift_frac"] <= 0.25

    # duplicate ids: a replayed append — ERROR with the repair verb,
    # and compact (the repair) turns it clean again
    inc = spark.createDataFrame(
        [(100, vecs(0, 1)[0])], "vec_id long, embedding array<float>"
    )
    append_vector_index(inc, a)
    append_vector_index(inc, a)  # the replay
    dup = fsck_vector_index(spark, a)
    assert dup["stats"]["duplicate_ids"] == 1
    assert any("compact --vector-index" in e for e in dup["errors"])
    compact_vector_index(spark, a)
    assert fsck_vector_index(spark, a)["errors"] == []

    # mixed generations: another quantizer's centroids copied over —
    # exactly the state the whole-index swap exists to prevent
    b = str(tmp_path / "b")
    emb_b = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs(2, 30) + vecs(3, 30))],
        "vec_id long, embedding array<float>",
    )
    build_vector_index(emb_b, b, n_cells=4)
    shutil.rmtree(os.path.join(a, "centroids"))
    shutil.copytree(
        os.path.join(b, "centroids"), os.path.join(a, "centroids")
    )
    mixed = fsck_vector_index(spark, a)
    assert mixed["stats"]["sampled_assignment_drift_frac"] > 0.25
    assert any("generations are mixed" in e for e in mixed["errors"])

    # orphan cell: a centroid row deleted from under its vectors
    c = str(tmp_path / "c")
    build_vector_index(emb, c, n_cells=4)
    cents = spark.read.parquet(os.path.join(c, "centroids"))
    kept = cents.orderBy("cell").limit(cents.count() - 1)
    kept_rows = kept.collect()  # materialize before overwrite
    spark.createDataFrame(
        kept_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(c, "centroids")
    )
    orphan = fsck_vector_index(spark, c)
    assert any("unknown to the centroid table" in e for e in orphan["errors"])


def test_fsck_classifies_corrupt_shapes_without_crashing(spark, tmp_path):
    """ADVICE r13: several corrupt-input shapes made fsck DIE with a
    traceback (ZeroDivisionError on bands=0, FileNotFoundError on a
    missing bands/ dir, IndexError on an empty centroid table) — a
    diagnostic verb must classify them as ERRORs instead."""
    from wrds_data_pipeline_spark.operators.dedup import ingest_increment
    from wrds_data_pipeline_spark.operators.vector_index import (
        build_vector_index,
    )

    # (a) meta pins a zero: bands=0 divides nothing — classified, not
    # raised (the v<1 loop must early-return before the % check)
    idx = str(tmp_path / "idx_zero")
    docs = str(tmp_path / "docs_zero")
    ingest_increment(
        _docs(spark, [(1, "a b c d e f g h"), (2, "i j k l m n o p")]),
        idx, docs, n_shards=2, docs_shards=2,
    )
    spark.createDataFrame(
        [(2, 3, 8, 0)], "n_shards int, k_shingle int, n_hashes int, bands int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(idx, "meta"))
    f = fsck_band_index(spark, idx)
    assert any("bands=0 < 1" in e for e in f["errors"])

    # (b) bands/ dir gone entirely (no .old beside it): ERROR, no
    # FileNotFoundError traceback
    idx2 = str(tmp_path / "idx_nobands")
    docs2 = str(tmp_path / "docs_nobands")
    ingest_increment(
        _docs(spark, [(1, "q r s t u v w x"), (2, "y z a1 b1 c1 d1 e1 f1")]),
        idx2, docs2, n_shards=2, docs_shards=2,
    )
    shutil.rmtree(os.path.join(idx2, "bands"))
    f = fsck_band_index(spark, idx2)
    assert any("missing" in e for e in f["errors"])

    # (c) empty centroid table: ERROR naming the rebuild, no IndexError
    vidx = str(tmp_path / "vidx_empty")
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    build_vector_index(emb, vidx, n_cells=2)
    spark.createDataFrame(
        [], "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(vidx, "centroids")
    )
    f = fsck_vector_index(spark, vidx)
    assert any("EMPTY" in e for e in f["errors"])


def test_fsck_reports_interrupted_swap_read_only(spark, tmp_path):
    """ADVICE r13: fsck advertises read-only but used to COMPLETE an
    interrupted compact swap (renaming directories) — racing a live
    compactor's two-rename window.  It must now report the state with
    the recovery route and leave the layout byte-for-byte alone; the
    lease-holding mutating verbs (and fsck --repair) stay the only
    repairers."""
    from wrds_data_pipeline_spark.operators.dedup import ingest_increment
    from wrds_data_pipeline_spark.operators.fsck import fsck_flat_store

    docs = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ingest_increment(
        _docs(spark, [(1, "one two three four five six")]),
        idx, docs, n_shards=2, docs_shards=2,
    )
    # the _swap_compacted mid-window: live renamed away, compacted
    # copy fully written beside it
    shutil.copytree(docs, docs + ".compacting")
    os.rename(docs, docs + ".old")

    f = fsck_docs_store(spark, docs)
    assert any("interrupted compaction swap" in e for e in f["errors"])
    # READ-ONLY: the layout is exactly as found — no rename happened
    assert not os.path.exists(docs)
    assert os.path.isdir(docs + ".old")
    assert os.path.isdir(docs + ".compacting")

    # groups/flat checkers share the contract
    f = fsck_groups_store(spark, docs)
    assert any("interrupted compaction swap" in e for e in f["errors"])
    assert not os.path.exists(docs)
    f = fsck_flat_store(spark, docs)
    assert any("interrupted compaction swap" in e for e in f["errors"])
    assert not os.path.exists(docs)

    # the missing-copy variant names the manual recovery command
    shutil.rmtree(docs + ".compacting")
    f = fsck_docs_store(spark, docs)
    assert any("mv " in e for e in f["errors"])
    assert os.path.isdir(docs + ".old")


def test_fsck_repair_three_invariants_one_pass(spark, tmp_path, capsys):
    """VERDICT r13 missing #3 'done' shape: break three invariants
    across one store tree (duplicate docs rows, a sidecar hole,
    duplicate vector ids), run `fsck --repair --apply` ONCE, and the
    re-check comes back clean.  Unrepairable findings are listed as
    MANUAL, never guessed at."""
    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.dedup import (
        _doc_store_shard,
        ingest_increment,
    )
    from wrds_data_pipeline_spark.operators.vector_index import (
        append_vector_index,
        build_vector_index,
    )

    idx = str(tmp_path / "idx")
    docs = str(tmp_path / "docs")
    groups = str(tmp_path / "groups")
    vidx = str(tmp_path / "vidx")
    variants = [
        "the quick brown fox jumps over the lazy dog every day",
        "spark plans prune partitions and push filters into scans",
        "parquet footers carry column statistics for skipping pages",
        "band hashing buckets similar documents into shared shards",
    ]
    ingest_increment(
        _docs(spark, [(i, variants[i % 4]) for i in range(40)]),
        idx, docs, n_shards=4, docs_shards=4,
        groups_store_path=groups, groups_shards=4,
    )
    build_vector_index(
        spark.createDataFrame(
            [(i, [float(i % 7), 1.0]) for i in range(24)],
            "vec_id long, embedding array<float>",
        ),
        vidx, n_cells=2,
    )

    # invariant 1: replayed docs append (duplicate rows)
    dup = (
        _docs(spark, [(7, variants[3])])
        .withColumn("shard", _doc_store_shard(F.col("doc_id"), 4))
    )
    dup.write.mode("append").partitionBy("shard").parquet(docs)
    dup.write.mode("append").partitionBy("shard").parquet(docs)
    # invariant 2: sidecar hole (one gshard dir dropped)
    sc = os.path.join(groups, "_group_shards")
    victim = next(
        e for e in os.listdir(sc)
        if e.startswith("gshard=") and os.path.isdir(os.path.join(sc, e))
    )
    shutil.rmtree(os.path.join(sc, victim))
    # invariant 3: replayed vector append (duplicate ids)
    inc = spark.createDataFrame(
        [(100, [3.0, 1.0])], "vec_id long, embedding array<float>"
    )
    append_vector_index(inc, vidx)
    append_vector_index(inc, vidx)

    base_args = [
        "fsck", "--docs-store", docs, "--groups-store", groups,
        "--vector-index", vidx,
    ]
    # dry run (the --repair default): prints the plan, repairs nothing
    capsys.readouterr()
    rc = index_main(base_args + ["--repair"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "repair would run: compact-docs-store" in out
    assert "repair would run: compact-groups-store" in out
    assert "repair would run: compact-vector-index" in out
    assert "dry run" in out
    # nothing changed: still corrupt
    assert index_main(base_args) == 1
    capsys.readouterr()

    # one applied pass repairs all three; the re-check is clean
    rc = index_main(base_args + ["--repair", "--apply"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "3 executed" in out
    assert index_main(base_args) == 0


def test_fsck_repair_completes_swap_and_defers_on_busy(
    spark, tmp_path, capsys
):
    """Swap completion runs under the writer lease; a store held by
    another writer DEFERS (ingest auto-compact convention) instead of
    failing or fighting for the lease."""
    import subprocess
    import sys as _sys
    import textwrap

    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.dedup import ingest_increment

    docs = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ingest_increment(
        _docs(spark, [(1, "one two three four five six")]),
        idx, docs, n_shards=2, docs_shards=2,
    )
    shutil.copytree(docs, docs + ".compacting")
    os.rename(docs, docs + ".old")

    # busy store: a REAL second process holds the docs lease
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repo!r})
        from wrds_data_pipeline_spark.operators.store_lock import (
            acquire_store_write_lock,
        )
        lease = acquire_store_write_lock({docs!r}, "compact")
        print("HELD", flush=True)
        sys.stdin.read()
        lease.release()
        """
    )
    proc = subprocess.Popen(
        [_sys.executable, "-c", code],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
    )
    assert proc.stdout.readline().strip() == "HELD"
    try:
        capsys.readouterr()
        rc = index_main(["fsck", "--docs-store", docs, "--repair", "--apply"])
        cap = capsys.readouterr()
        assert "repair deferred (store busy)" in cap.err
        assert rc == 1  # still mid-swap: the re-check stays red
        assert os.path.isdir(docs + ".old")  # untouched while held
    finally:
        proc.stdin.close()
        proc.wait(timeout=30)

    # holder gone: the same repair completes the swap; clean re-check
    capsys.readouterr()
    rc = index_main(["fsck", "--docs-store", docs, "--repair", "--apply"])
    assert rc == 0
    assert os.path.isdir(docs)
    assert not os.path.exists(docs + ".old")
    assert not os.path.exists(docs + ".compacting")


def test_doctor_healthy_degraded_and_corrupt(
    spark, tmp_path, capsys, monkeypatch
):
    """`wrds-spark-index doctor` (VERDICT r13 missing #4): the
    one-shot read-only front door — lock status + fsck + the
    maintenance advisories + the ANN scorecard per store, with a
    per-store verdict.  Healthy tree → exit 0 / HEALTHY; advisory
    fires → DEGRADED (still exit 0: reads are fine); fsck error →
    CORRUPT and exit 1."""
    import wrds_data_pipeline_spark.cli as cli
    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.dedup import ingest_increment
    from wrds_data_pipeline_spark.operators.vector_index import (
        build_vector_index,
    )

    idx = str(tmp_path / "idx")
    docs = str(tmp_path / "docs")
    groups = str(tmp_path / "groups")
    vidx = str(tmp_path / "vidx")
    variants = [
        "the quick brown fox jumps over the lazy dog every day",
        "spark plans prune partitions and push filters into scans",
        "parquet footers carry column statistics for skipping pages",
        "band hashing buckets similar documents into shared shards",
    ]
    ingest_increment(
        _docs(spark, [(i, variants[i % 4]) for i in range(40)]),
        idx, docs, n_shards=4, docs_shards=4,
        groups_store_path=groups, groups_shards=4,
    )
    build_vector_index(
        spark.createDataFrame(
            [(i, [float(i % 5), 1.0]) for i in range(32)],
            "vec_id long, embedding array<float>",
        ),
        vidx, n_cells=2,
    )
    base = [
        "doctor", "--band-index", idx, "--docs-store", docs,
        "--groups-store", groups, "--vector-index", vidx,
        "--eval-queries", "8",
    ]

    # healthy: every verdict green, lock sections say unlocked, the
    # ANN scorecard prints
    capsys.readouterr()
    rc = index_main(base)
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("verdict: HEALTHY") == 4
    assert out.count("lock: unlocked") == 4
    assert "ann: recall@" in out
    assert "CORRUPT" not in out

    # degraded: the files-per-shard compact advisory fires (threshold
    # lowered so one extra append crosses it) — verdict DEGRADED,
    # exit stays 0 (reads are unaffected)
    monkeypatch.setattr(cli, "_COMPACT_ADVISORY_AT", 2)
    ingest_increment(
        _docs(spark, [(100, variants[0] + " another appended doc")]),
        idx, docs, n_shards=4, docs_shards=4,
        groups_store_path=groups, groups_shards=4,
    )
    capsys.readouterr()
    rc = index_main(base)
    out = capsys.readouterr().out
    assert rc == 0
    assert "ADVISORY:" in out and "compact" in out
    assert "verdict: DEGRADED" in out

    # corrupt: a sidecar hole turns the groups verdict red and the
    # exit code 1, naming fsck --repair as the route
    sc = os.path.join(groups, "_group_shards")
    victim = next(
        e for e in os.listdir(sc)
        if e.startswith("gshard=") and os.path.isdir(os.path.join(sc, e))
    )
    shutil.rmtree(os.path.join(sc, victim))
    capsys.readouterr()
    rc = index_main(base)
    out = capsys.readouterr().out
    assert rc == 1
    assert "verdict: CORRUPT" in out
    assert "fsck --repair" in out

    # a held lease shows in the lock section (read-only view)
    from wrds_data_pipeline_spark.operators.store_lock import (
        acquire_store_write_lock,
    )

    lease = acquire_store_write_lock(docs, "compact")
    try:
        capsys.readouterr()
        index_main(base)
        out = capsys.readouterr().out
        assert "lock: HELD by verb='compact'" in out
    finally:
        lease.release()


def test_fsck_flat_store_residue(spark, tmp_path, capsys):
    from wrds_data_pipeline_spark.cli import index_main
    from wrds_data_pipeline_spark.operators.fsck import fsck_flat_store

    flat = str(tmp_path / "flat")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df.coalesce(1).write.mode("append").parquet(flat)
    clean = fsck_flat_store(spark, flat)
    assert clean["errors"] == [] and clean["warnings"] == []
    df.coalesce(1).write.mode("append").parquet(flat)  # the replay
    dup = fsck_flat_store(spark, flat)
    assert dup["stats"]["duplicate_rows"] == 2
    assert any("compact --flat-store" in w for w in dup["warnings"])
    capsys.readouterr()
    rc = index_main(["fsck", "--flat-store", flat])
    assert rc == 0  # residue is warnings, not errors
    assert "residue" in capsys.readouterr().out
