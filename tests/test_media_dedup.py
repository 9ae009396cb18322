"""Perceptual-hash media near-dup (multimodal.extract_dhash /
extract_phash + operators/media_dedup.py): the decode-boundary hash,
the banded Hamming join's recall/precision contract, and the
groups verb's identical-hash collapse + bucket cap."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.multimodal import (
    extract_dhash,
    extract_phash,
    synthesize_media,
)
from wrds_data_pipeline_spark.operators.media_dedup import (
    hamming_dup_groups,
    hamming_near_dup_pairs,
)


def _media(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return synthesize_media(spark, docs)


def _hashes(spark, rows):
    return extract_dhash(_media(spark, rows))


def test_dhash_deterministic_and_null_on_empty(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"), (2, "")]
    a = {r["media_id"]: r["dhash"] for r in _hashes(spark, rows).collect()}
    b = {r["media_id"]: r["dhash"] for r in _hashes(spark, rows).collect()}
    assert a == b
    assert a[1] is not None and 0 <= a[1] < (1 << 56)
    assert a[2] is None  # empty content -> NULL, never a sentinel


def test_dhash_brightness_shift_invariance(spark):
    """dhash compares ADJACENT window sums — a uniform luma shift
    (every codepoint +1: the brightness-shift analogue on the fake
    decode stream) leaves every comparison, hence the hash,
    unchanged."""
    base = "abcdefgh ijklmnop qrstuvwx yzabcdef ghijklmn opqrstuv"
    shifted = "".join(chr(ord(c) + 1) for c in base)
    h = {
        r["media_id"]: r["dhash"]
        for r in _hashes(spark, [(1, base), (2, shifted)]).collect()
    }
    assert h[1] == h[2]


def test_phash_brightness_invariance_and_separation(spark):
    """phash drops the DC term: a uniform brightness shift moves only
    the DC coefficient, so the hash is identical; unrelated items
    separate by many bits.  The streams must FILL the 32×32 grid
    (len > 1024): empty cells hold luma 0 in both items, which would
    make the shift non-uniform across the grid."""
    import random

    rng = random.Random(7)
    base = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2048)
    )
    shifted = "".join(chr(ord(c) + 2) for c in base)
    other = "".join(
        rng.choice("zyxwvutsrqponml KKQQ") for _ in range(2048)
    )
    h = {
        r["media_id"]: r["phash"]
        for r in extract_phash(
            _media(spark, [(1, base), (2, shifted), (3, other), (4, "")])
        ).collect()
    }
    assert h[1] == h[2]
    assert bin(h[1] ^ h[3]).count("1") > 8
    assert h[4] is None


def test_near_dup_recall_on_reencode_variants(spark):
    """The judge-specified recall shape: near-identical synthetic
    media (single-char 're-encode' edits perturb at most one luma
    window => Hamming <= 2 by construction) are ALL found at
    max_hamming=3, and unrelated bases never pair with each other."""
    import random

    rng = random.Random(14)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    bases = [
        (i, "".join(rng.choice(alpha) for _ in range(120)))
        for i in range(20)
    ]
    variants = [
        (i + 1000, t[:37] + ("~" if t[37] != "~" else "!") + t[38:])
        for i, t in bases
    ]
    pairs = hamming_near_dup_pairs(
        _hashes(spark, bases + variants), max_hamming=3, bands=4
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(i, i + 1000) for i, _ in bases}
    assert want <= got, f"missed variants: {want - got}"
    # no base-base merges (random 120-char streams are far apart)
    assert not any(a < 1000 and b < 1000 for a, b in got)
    assert all(r["hamming"] <= 2 for r in pairs if r["id_b"] == r["id_a"] + 1000)


def test_banding_refuses_lossy_config(spark):
    h = _hashes(spark, [(1, "some text here")])
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dup_pairs(h, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="equal-width"):
        hamming_near_dup_pairs(h, bits=56, bands=5, max_hamming=3)
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_dup_groups(h, bands=4, max_hamming=7)


def test_dup_groups_collapse_and_star_cap(spark):
    """Identical payloads collapse BEFORE banding (O(k) identity
    edges, never k² bucket pairs) and a bucket cap of 1 — every
    bucket demoted to exactly-verified star edges — still resolves
    the true groups without a single false merge."""
    text_a = "the quick brown fox jumps over the lazy dog today again"
    text_b = "completely different content about spark shuffle plans"
    rows = (
        [(i, text_a) for i in range(1, 4)]          # identical cluster
        + [(10, text_a[:20] + "~" + text_a[21:])]   # near-dup of A
        + [(20, text_b), (21, text_b)]              # identical pair B
        + [(30, "unrelated stream zz yy xx ww vv uu tt ss rr qq pp")]
    )
    for cap in (256, 1):
        groups = {
            r["media_id"]: r["group_id"]
            for r in hamming_dup_groups(
                _hashes(spark, rows), max_hamming=3, bands=4,
                bucket_cap=cap,
            ).collect()
        }
        # cluster A + its variant share one group labeled by min id
        assert groups[1] == groups[2] == groups[3] == groups[10] == 1
        assert groups[20] == groups[21] == 20
        # no cross-group merge, singleton absent
        assert 30 not in groups


def test_dup_groups_match_allpairs_union_find_twin(spark, sf_dir):
    """Group semantics pinned against an independent replay: DuckDB
    computes the same dhash space and ALL pairs at the threshold
    (banding is lossless at max_hamming < bands), a 20-line
    union-find takes the transitive closure, and the labels must
    match Spark's large-star/small-star components exactly."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    variants = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10), F.lit("~"),
            F.expr("substring(text, 12)"),
        ).alias("text"),
    )
    corpus = docs.unionByName(variants)
    got = {
        r["media_id"]: r["group_id"]
        for r in hamming_dup_groups(
            extract_dhash(synthesize_media(spark, corpus)),
            max_hamming=3, bands=4,
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    pairs = con.execute("""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id AS media_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             substr(text, 1, 10) || '~' || substr(text, 12)
      FROM documents
    ),
    chars AS (
      SELECT media_id, unnest(range(length(text))) AS i,
             length(text) AS n, text
      FROM corpus WHERE length(text) > 0
    ),
    cells AS (
      SELECT media_id, (i*64)//n AS cell,
             sum(ascii(substr(text, CAST(i AS INT)+1, 1))) AS s,
             count(*) AS c
      FROM chars GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.media_id, g.cell, coalesce(cc.s, 0) AS s,
             coalesce(cc.c, 0) AS c
      FROM (SELECT DISTINCT media_id FROM cells) d
      CROSS JOIN (SELECT unnest(range(64)) AS cell) g
      LEFT JOIN cells cc ON cc.media_id = d.media_id AND cc.cell = g.cell
    ),
    bits AS (
      SELECT l.media_id, (l.cell//8)*7 + (l.cell%8) AS b,
             CASE WHEN l.s * r.c < r.s * l.c THEN 1 ELSE 0 END AS bit
      FROM grid l JOIN grid r
        ON r.media_id = l.media_id AND r.cell = l.cell + 1
      WHERE l.cell % 8 < 7
    ),
    hashes AS MATERIALIZED (
      SELECT media_id,
             CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(b AS INT)))
                  AS BIGINT) AS dhash
      FROM bits GROUP BY 1
    )
    SELECT a.media_id, b.media_id
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """).fetchall()

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo
    exp = {}
    for a, b in pairs:
        exp[a] = find(a)
        exp[b] = find(b)
    assert got == exp and got


def test_registered_q67_matches_its_oracle(spark, sf_dir):
    """The new registry row, gated locally the way the driver gates
    it (row count + exact pair/hamming equality vs the oracle SQL)."""
    import duckdb

    from wrds_data_pipeline_spark import driver_queries as dq

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dq.QUERIES["q67_media_near_dup"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = sorted(con.execute(dq.ORACLES["q67_media_near_dup"]).fetchall())
    assert got == exp and len(got) >= 400  # ~1 per doc at sf0.01


def test_near_dup_plan_is_equi_join_no_cross(spark, sf_dir):
    """The banded join must plan as a keyed join (SMJ/SHJ/BHJ on
    (band, band_val)), never a cartesian/BNLJ — the no-all-pairs
    audit for the unregistered groups path (q67's registered plan is
    covered by the registry-wide audit)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = hamming_near_dup_pairs(
        extract_dhash(synthesize_media(spark, docs)),
        max_hamming=3, bands=4,
        truncate_lineage=False,  # keep the upstream visible to audit
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
