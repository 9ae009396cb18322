"""Band-bucket population bound (operators/dedup.DEFAULT_MAX_BUCKET):
the document-side analogue of the embedding side's auto_n_planes /
auto_n_cells closure.  A bucket holding m near-identical docs must
contribute O(m) star edges, never m²/2 clique pairs — with group
membership (connected components) preserved exactly across the batch,
incremental, and streaming paths.

Fixture: a planted hot cluster — ``M`` docs sharing a long template
with only the final token varying, so nearly every member collides on
at least one full MinHash band (deterministic given the fixed md5
constants) — plus a handful of unrelated docs that must stay in their
own singleton groups.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.dedup import (
    minhash_band_table,
    minhash_lsh_candidates,
    near_dup_pairs,
)

M = 60  # planted cluster size
B = 8   # test-scale bucket bound (production default is 256)

TEMPLATE = (
    "breaking news this viral boilerplate page is syndicated verbatim "
    "across thousands of mirror sites with exactly one varying token "
    "at the very end of the body which is the token "
)

DISTINCT = [
    "completely different content about spark query engines at scale",
    "another unrelated document about columnar shuffle exchanges",
    "a third singleton text on watermarks and stateful streaming",
    "gardening tips for growing tomatoes in cold northern climates",
]


def _hot_rows():
    rows = [(i, TEMPLATE + f"variant{i}") for i in range(M)]
    rows += [(1000 + j, t) for j, t in enumerate(DISTINCT)]
    return rows


@pytest.fixture(scope="module")
def hot_docs(spark):
    return spark.createDataFrame(_hot_rows(), ["doc_id", "text"]).persist()


def _groups(pairs, all_ids):
    """Union-find over (id_a, id_b) tuples → frozenset of frozensets,
    singletons included (the group-membership comparison the bound's
    contract is stated in)."""
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for i in all_ids:
        comps.setdefault(find(i), set()).add(i)
    return frozenset(frozenset(v) for v in comps.values())


def _ids(docs):
    return [r.doc_id for r in docs.select("doc_id").collect()]


def test_fixture_actually_has_a_hot_bucket(spark, hot_docs):
    """Guard the premise: without a band bucket over B the remaining
    tests would vacuously pass."""
    top = (
        minhash_band_table(hot_docs)
        .groupBy("band", "band_hash")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert top > B, f"max bucket {top} ≤ {B}: fixture lost its hot cluster"


def test_hot_bucket_pair_mass_linear_groups_exact(spark, hot_docs):
    ids = _ids(hot_docs)
    guarded = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(hot_docs, max_bucket=B).collect()
    ]
    unguarded = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(hot_docs, max_bucket=None).collect()
    ]
    # the clique: nearly every pair of the planted cluster is a
    # genuine collision, so the unbounded path carries ~M²/2 pairs
    # (a few members miss every band; 1764/1770 measured)
    assert len(unguarded) >= int(0.9 * M * (M - 1) / 2)
    # the bound: star edges per hot bucket + small-bucket residue —
    # linear in M (4 bands × (M-1) worst case, far under the clique)
    assert len(guarded) <= 4 * M
    # group membership identical: star edges and cliques have the
    # same connected components
    assert _groups(guarded, ids) == _groups(unguarded, ids)


def test_incremental_group_parity_and_no_old_old_pairs(spark, hot_docs):
    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
    )

    ids = _ids(hot_docs)
    old = hot_docs.filter(F.col("doc_id") % 3 != 0)
    new = hot_docs.filter(F.col("doc_id") % 3 == 0)
    old_ids = {r.doc_id for r in old.select("doc_id").collect()}

    band_table = minhash_band_table(old)
    inc = [
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(
            new, band_table, max_bucket=B
        ).collect()
    ]
    # contract: never an old-vs-old edge
    assert not any(a in old_ids and b in old_ids for a, b in inc)
    # pair mass stays linear on the hot cluster's new side
    assert len(inc) <= 4 * M
    # groups from (prior runs' old-side resolution) ∪ (this increment)
    # == groups of the full guarded batch == groups of the full
    # unbounded batch
    old_pairs = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(old, max_bucket=B).collect()
    ]
    want = _groups(
        [
            (r.id_a, r.id_b)
            for r in minhash_lsh_candidates(hot_docs, max_bucket=None).collect()
        ],
        ids,
    )
    assert _groups(old_pairs + inc, ids) == want


def test_near_dup_pairs_resolves_hot_cluster(spark, hot_docs):
    """The verified composition: hot-bucket star edges bypass the
    jaccard threshold (they are resolved by collision density) but
    carry their true measured jaccard; group membership equals the
    unbounded composition's."""
    ids = _ids(hot_docs)
    guarded = near_dup_pairs(hot_docs, threshold=0.5, max_bucket=B).collect()
    unguarded = near_dup_pairs(
        hot_docs, threshold=0.5, max_bucket=None
    ).collect()
    assert {c for c in near_dup_pairs(hot_docs, max_bucket=B).columns} == {
        "id_a", "id_b", "jaccard"
    }
    assert all(0.0 <= r.jaccard <= 1.0 for r in guarded)
    assert len(guarded) < len(unguarded)  # the point of the bound
    g = _groups([(r.id_a, r.id_b) for r in guarded], ids)
    u = _groups([(r.id_a, r.id_b) for r in unguarded], ids)
    assert g == u
    # unrelated docs stay singletons
    for grp in g:
        if len(grp) > 1:
            assert grp == frozenset(range(M))


def test_streaming_group_parity_with_hot_cluster(spark, tmp_path):
    """Across micro-batches, hot buckets emit per-batch star edges
    (new members ↔ batch hub, batch hub ↔ stored hub): the union's
    connected components equal the batch operator's, at linear pair
    mass."""
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_near_dedup,
    )

    rows = _hot_rows()
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "hot_stream")
    # three arrival batches, cluster members interleaved
    for k in range(3):
        batch = [r for i, r in enumerate(rows) if i % 3 == k]
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    idx = os.path.join(str(tmp_path), "hot_band_index")
    got = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        max_files_per_trigger=1, max_bucket=B,
    )
    pairs = list(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    assert len(pairs) <= 3 * 4 * M  # linear per batch, never the clique
    all_docs = spark.createDataFrame(rows, schema)
    ids = [r[0] for r in rows]
    want = _groups(
        [
            (r.id_a, r.id_b)
            for r in minhash_lsh_candidates(all_docs, max_bucket=None).collect()
        ],
        ids,
    )
    assert _groups(pairs, ids) == want


def test_default_bound_is_inert_below_population(spark):
    """At sub-bound bucket populations the guard changes nothing:
    default-bound output == unbounded output pair-for-pair (the
    registered oracle rows rely on this — sf-scale buckets max out at
    16 members, 16× under DEFAULT_MAX_BUCKET)."""
    rows = [(i, TEMPLATE + f"variant{i}") for i in range(5)] + [
        (100 + j, t) for j, t in enumerate(DISTINCT)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    default = sorted(
        (r.id_a, r.id_b) for r in minhash_lsh_candidates(docs).collect()
    )
    unbounded = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, max_bucket=None).collect()
    )
    assert default == unbounded


def test_bucket_bound_group_parity_is_an_invariant(spark):
    """Hypothesis: for ANY corpus and ANY bound (including an
    aggressively low B=2 that sends most buckets down the star path),
    connected components of the guarded candidate graph equal the
    unbounded clique graph's — star edges preserve per-bucket
    connectivity exactly, small buckets are untouched.  Also checks
    the incremental decomposition: guarded old-pairs ∪ guarded probe
    over any old/new split yields the same groups."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_table,
    )

    # small vocab + repeated templates → heavy collisions on purpose
    word = st.sampled_from([f"w{i}" for i in range(6)])
    text = st.lists(word, min_size=3, max_size=8).map(" ".join)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(st.lists(text, min_size=3, max_size=8), st.sampled_from([2, 3]))
    def run(texts, bound):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        ids = list(range(len(rows)))
        unb = _groups(
            [
                (r.id_a, r.id_b)
                for r in minhash_lsh_candidates(docs, max_bucket=None).collect()
            ],
            ids,
        )
        g = _groups(
            [
                (r.id_a, r.id_b)
                for r in minhash_lsh_candidates(docs, max_bucket=bound).collect()
            ],
            ids,
        )
        assert g == unb
        # incremental decomposition at the same bound
        old = docs.filter(F.col("doc_id") % 2 == 0)
        new = docs.filter(F.col("doc_id") % 2 == 1)
        old_pairs = [
            (r.id_a, r.id_b)
            for r in minhash_lsh_candidates(old, max_bucket=bound).collect()
        ]
        inc = [
            (r.id_a, r.id_b)
            for r in incremental_lsh_candidates(
                new, minhash_band_table(old), max_bucket=bound
            ).collect()
        ]
        assert _groups(old_pairs + inc, ids) == unb

    run()


# --- popular-min-shingle precision regime ---------------------------------
#
# The classic LSH false-positive regime: one popular shingle (a viral
# boilerplate phrase) whose hash is minimal under a band's hash
# functions becomes the band minimum for EVERY short doc containing it
# — a hot bucket of genuinely dissimilar documents.  The bucket bound
# must NOT wholesale-merge such a bucket (that would silently delete
# all but one member at dedup); the evidence gate demotes it because
# its star edges' measured jaccard fails the threshold.
#
# The fixture is built by mirroring the Spark-side hashing in Python
# (md5 first-15-hex → int % 1e9+7; sig_i = min (A_i·h+B_i) % M) and
# rejection-sampling docs until the shared phrase is the band-0
# minimum for every member — deterministic, no Spark needed to build.
# The mirror itself is SHARED with the scale rehearsal
# (operators/lsh_fixtures.py — one copy, constants imported from
# dedup.py); the premise guards below keep it honest against drift.

from wrds_data_pipeline_spark.operators.lsh_fixtures import (  # noqa: E402
    degenerate_hot_docs as _degenerate_hot_docs,
)


def test_popular_min_shingle_bucket_is_not_falsely_merged(spark):
    """The r7 `weak`: a hot bucket of DISSIMILAR docs must not be
    wholesale-resolved into one duplicate group.  With the evidence
    gate the bounded composition equals the unbounded one (both find
    nothing); with the legacy unconditional resolution
    (star_accept_frac=None) the false merge is demonstrable."""
    rows = _degenerate_hot_docs(40)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # premise guard: the Python hash mirror really produced a band
    # bucket over the test bound (if the mirror drifts, fail loudly
    # rather than pass vacuously)
    top = (
        minhash_band_table(docs)
        .groupBy("band", "band_hash")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert top > B, f"max bucket {top} ≤ {B}: degenerate fixture lost its bucket"

    bounded = near_dup_pairs(docs, threshold=0.5, max_bucket=B).collect()
    unbounded = near_dup_pairs(docs, threshold=0.5, max_bucket=None).collect()
    assert unbounded == []  # nothing is a real near-dup
    assert bounded == []  # the gate: no false merges either
    # and the closed regime really was live: unconditional resolution
    # would have merged the whole bucket
    legacy = near_dup_pairs(
        docs, threshold=0.5, max_bucket=B, star_accept_frac=None
    ).collect()
    assert len(legacy) >= len(rows) - 1
    assert all(r.jaccard < 0.5 for r in legacy)


def test_evidence_gate_keeps_true_clusters_and_demotes_degenerate(spark):
    """Mixed corpus: a genuine near-dup cluster (template with one
    varying token) AND a degenerate popular-min-shingle bucket.  The
    gate must resolve the former exactly as the unbounded path does
    while leaving the latter's members singletons."""
    rows = _degenerate_hot_docs(20)
    rows += [(100 + i, TEMPLATE + f"variant{i}") for i in range(20)]
    rows += [(1000 + j, t) for j, t in enumerate(DISTINCT)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ids = [r[0] for r in rows]
    bounded = [
        (r.id_a, r.id_b)
        for r in near_dup_pairs(docs, threshold=0.5, max_bucket=B).collect()
    ]
    unbounded = [
        (r.id_a, r.id_b)
        for r in near_dup_pairs(docs, threshold=0.5, max_bucket=None).collect()
    ]
    g, u = _groups(bounded, ids), _groups(unbounded, ids)
    assert g == u
    # the template cluster is one group; every degenerate doc solo
    assert frozenset(range(100, 120)) in g
    for grp in g:
        if len(grp) > 1:
            assert not grp & set(range(20))


def test_resolved_pair_with_zero_intersection_survives(spark):
    """Contract: a resolved candidate pair must never be silently
    dropped — even with ZERO shingle intersection (a band-hash
    collision without one shared shingle; astronomically rare but the
    star edge's whole point is unconditional group connectivity).
    Emitted with its true jaccard 0.0."""
    from wrds_data_pipeline_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    cand = spark.createDataFrame(
        [(1, 2, True)], ["id_a", "id_b", "_resolved"]
    )
    out = jaccard_pairs(
        docs, threshold=0.9, candidates=cand, resolved_col="_resolved"
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 0.0)]
    # and an UNresolved zero-intersection pair still vanishes
    cand2 = spark.createDataFrame(
        [(1, 2, False)], ["id_a", "id_b", "_resolved"]
    )
    assert (
        jaccard_pairs(
            docs, threshold=0.9, candidates=cand2, resolved_col="_resolved"
        ).count()
        == 0
    )


def test_resolved_col_flags_star_edges_and_feeds_verification(spark, hot_docs):
    """ADVICE r7 #1: candidate generators can mark star edges so a
    downstream Jaccard verifier does not threshold-filter them away
    (a star member has ONE edge, not m-1).  The flag must mark
    exactly the over-bound-bucket edges, and feeding the flagged
    relation through jaccard_pairs(resolved_col=...) must keep every
    hot-bucket member grouped."""
    from wrds_data_pipeline_spark.operators.dedup import (
        incremental_lsh_candidates,
        jaccard_pairs,
    )

    ids = _ids(hot_docs)
    flagged = minhash_lsh_candidates(
        hot_docs, max_bucket=B, resolved_col="resolved"
    )
    assert set(flagged.columns) == {"id_a", "id_b", "resolved"}
    rows = flagged.collect()
    plain = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(hot_docs, max_bucket=B).collect()
    }
    assert {(r.id_a, r.id_b) for r in rows} == plain  # same pair set
    assert any(r.resolved for r in rows)  # the hot cluster is live
    # verified composition over the FLAGGED candidates == near_dup_pairs
    verified = jaccard_pairs(
        hot_docs, threshold=0.5, candidates=flagged, resolved_col="resolved"
    )
    g = _groups([(r.id_a, r.id_b) for r in verified.collect()], ids)
    u = _groups(
        [
            (r.id_a, r.id_b)
            for r in near_dup_pairs(
                hot_docs, threshold=0.5, max_bucket=None
            ).collect()
        ],
        ids,
    )
    assert g == u
    # incremental path exposes the same flag
    old = hot_docs.filter(F.col("doc_id") % 3 != 0)
    new = hot_docs.filter(F.col("doc_id") % 3 == 0)
    inc = incremental_lsh_candidates(
        new, minhash_band_table(old), max_bucket=B, resolved_col="resolved"
    )
    assert set(inc.columns) == {"id_a", "id_b", "resolved"}
    assert any(r.resolved for r in inc.collect())


def test_true_pair_inside_demoted_bucket_still_found(spark):
    """Demotion recall: two genuinely near-duplicate docs that are
    ALSO members of the degenerate hot bucket must still pair up —
    their edge arrives through a small bucket in another band (their
    signatures agree beyond band 0), is verified normally, and
    survives; the demotion only withholds the UNVERIFIED wholesale
    merge.  Fixture: two docs identical except the final token,
    rejection-sampled (same Python hash mirror) until both land in
    the hot band-0 bucket AND share a band-1..3 hash."""
    import itertools

    from wrds_data_pipeline_spark.operators.lsh_fixtures import (
        hash_rows,
        py_shingle_hash,
        signature,
    )

    base = _degenerate_hot_docs(20)
    hot_phrase = " ".join(base[0][1].split()[:3])
    hot_rows = hash_rows(py_shingle_hash(hot_phrase), 3)

    def in_hot_bucket(text):
        return signature(text, n_hashes=3) == hot_rows

    pair = None
    for t in itertools.count():
        a = f"{hot_phrase} x{t} y{t} z{t} enda{t}"
        b = f"{hot_phrase} x{t} y{t} z{t} endb{t}"
        if not (in_hot_bucket(a) and in_hot_bucket(b)):
            continue
        sa, sb = signature(a), signature(b)
        # shared full band beyond band 0 (rows [3,6), [6,9), [9,12))
        if any(
            sa[3 * band : 3 * band + 3] == sb[3 * band : 3 * band + 3]
            for band in (1, 2, 3)
        ):
            pair = (a, b)
            break
    rows = base + [(500, pair[0]), (501, pair[1])]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # premise: the hot bucket is over the bound and includes the pair
    out = near_dup_pairs(docs, threshold=0.5, max_bucket=B).collect()
    got = {(r.id_a, r.id_b) for r in out}
    assert (500, 501) in got
    # and the degenerate members still merged with nothing
    assert all(a >= 500 and b >= 500 for a, b in got)


def test_split_eager_and_lazy_shapes_are_identical(spark, hot_docs):
    """The hybrid census (round 8): `_lsh_candidate_split` has two
    execution shapes — eager short-circuit (near_dup_pairs) and lazy
    annotate (candidate-only operators).  They are an OPTIMIZATION
    split, not a semantic one: on the same band relation, with hot
    buckets present AND absent, both must return identical small-pair
    and star-edge relations."""
    from wrds_data_pipeline_spark.caching import PersistScope
    from wrds_data_pipeline_spark.operators.dedup import (
        _lsh_candidate_split,
    )

    def both(docs, bound):
        out = {}
        for eager in (False, True):
            with PersistScope() as scope:
                banded = scope.persist(minhash_band_table(docs))
                small, star = _lsh_candidate_split(
                    banded, scope, bound, eager_shortcircuit=eager
                )
                out[eager] = (
                    {(r.id_a, r.id_b) for r in small.collect()},
                    None
                    if star is None
                    else {
                        (r.id_a, r.id_b, r.band, r.band_hash)
                        for r in star.collect()
                    },
                )
        return out

    # hot bucket present (the 60-member template cluster over B=8)
    got = both(hot_docs, B)
    assert got[False] == got[True]
    small, star = got[True]
    assert star  # the hot regime really was live
    # hot bucket absent (bound far above any population): the eager
    # path must short-circuit to star=None, the lazy path's star
    # relation must be EMPTY — same candidates either way
    got_cold = both(hot_docs, 100_000)
    assert got_cold[True][1] is None
    assert got_cold[False][1] == set()
    assert got_cold[False][0] == got_cold[True][0]


def test_streaming_mark_resolved_flags_star_edges(spark, tmp_path):
    """ADVICE r7 #1 closed on the LAST candidate path: streaming
    consumers can request the resolved flag, star edges from hot
    buckets arrive marked (a downstream Jaccard verifier must not
    threshold-filter them), and the pair set equals the unflagged
    stream's."""
    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_near_dedup,
    )

    rows = _hot_rows()
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "hot_stream_flagged")
    for k in range(2):
        batch = [r for i, r in enumerate(rows) if i % 2 == k]
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    flagged = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema,
        os.path.join(str(tmp_path), "idx_flagged"),
        max_files_per_trigger=1, max_bucket=B, mark_resolved=True,
    )
    assert list(flagged.columns) == ["id_a", "id_b", "resolved"]
    assert flagged["resolved"].any()  # hot-bucket star edges marked
    assert not flagged["resolved"].isna().any()

    plain = streaming_near_dedup(
        spark, stage, spark.createDataFrame([], schema).schema,
        os.path.join(str(tmp_path), "idx_plain"),
        max_files_per_trigger=1, max_bucket=B,
    )
    assert set(map(tuple, flagged[["id_a", "id_b"]].values.tolist())) == set(
        map(tuple, plain[["id_a", "id_b"]].values.tolist())
    )
