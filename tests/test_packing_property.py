"""Property-based checks: sequence packing vs the global greedy
oracle, and connected components vs union-find, on arbitrary inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wrds_data_pipeline_spark.operators.components import (
    connected_components,
)
from wrds_data_pipeline_spark.operators.packing import pack_sequences

MAX_TOKENS = 512


def _global_greedy(tokens_in_order, max_tokens):
    seq, run, cur = [], 0, 0
    for t in tokens_in_order:
        if run + t > max_tokens and run > 0:
            cur += 1
            run = 0
        seq.append(cur)
        run += t
    return seq


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=MAX_TOKENS),
        min_size=1,
        max_size=120,
    ),
    chunk_bins=st.sampled_from([2, 5, 10_000]),
)
def test_packing_invariants_property(spark, toks, chunk_bins):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], ["doc_id", "n_tok"]
    )
    rows = (
        pack_sequences(
            docs, MAX_TOKENS, token_col="n_tok", chunk_bins=chunk_bins
        )
        .orderBy("doc_id")
        .collect()
    )
    assert len(rows) == len(toks)
    assert not any(r.oversize for r in rows)
    # per-sequence budget + monotone seq ids + contiguous positions
    totals, prev_seq, prev_pos = {}, None, None
    for r in rows:
        totals[r.seq_id] = totals.get(r.seq_id, 0) + r.n_tokens
        assert prev_seq is None or r.seq_id >= prev_seq
        if r.seq_id == prev_seq:
            assert r.seq_pos == prev_pos + 1
        else:
            assert r.seq_pos == 0
        prev_seq, prev_pos = r.seq_id, r.seq_pos
    assert all(v <= MAX_TOKENS for v in totals.values())
    want = _global_greedy(toks, MAX_TOKENS)
    if chunk_bins == 10_000:
        # single chunk: exact greedy parity (relabeled)
        got = [r.seq_id for r in rows]
        remap = {}
        for g, w in zip(got, want):
            remap.setdefault(g, w)
            assert remap[g] == w
    else:
        # chunked: at most one extra sequence per chunk
        n_chunks = len({r.seq_id // (4 * chunk_bins) for r in rows})
        assert len(totals) <= len(set(want)) + n_chunks


def _union_find_groups(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_property(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["id"], r["group_id"]) for r in connected_components(df).collect()}
    assert got == set(_union_find_groups(edges).items())
