"""Duplicated-span removal (operators/spans) vs a direct python
replay of the declared semantics."""

from __future__ import annotations

import random

import pytest

from wrds_data_pipeline_spark.operators.spans import (
    duplicated_spans,
    span_dedup,
    span_windows,
)


_WS = "[ \t\n\r\f\x0b]+"  # ASCII \s, the class Java's \s+ split uses


def _toks(t):
    import re

    if t is None:
        return []
    t = re.sub(f"^{_WS}|{_WS}$", "", t)
    return re.split(_WS, t) if t else []


def _replay(rows, k):
    """Python oracle: same semantics as the module docstring."""
    toks = {d: _toks(t) for d, t in rows}
    occ = {}
    for d in sorted(toks):
        tk = [w.lower() for w in toks[d]]
        for i in range(len(tk) - k + 1):
            occ.setdefault(" ".join(tk[i : i + k]), []).append((d, i))
    covered = {d: set() for d in toks}
    for inst in occ.values():
        for d, i in inst[1:]:
            covered[d].update(range(i, i + k))
    out = {}
    for d, t in rows:
        if not covered[d]:
            out[d] = (t, len(toks[d]), 0)
        else:
            kept = [w for p, w in enumerate(toks[d]) if p not in covered[d]]
            out[d] = (" ".join(kept), len(toks[d]), len(covered[d]))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tok_in"], r["n_tok_removed"])
        for r in span_dedup(df, k=k).collect()
    }
    assert got == _replay(rows, k)
    return got


def test_cross_doc_span_removed_first_kept(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"totally different prefix {shared} and a different suffix"),
    ]
    got = _run(spark, rows, k=4)
    assert shared in got[1][0]
    assert shared not in got[2][0]
    assert got[1][2] == 0
    # doc 2 loses exactly the shared window positions (9 tokens)
    assert got[2][2] == 9


def test_within_doc_repeat_removed(spark):
    rows = [(7, "one two three four five one two three four five")]
    got = _run(spark, rows, k=5)
    assert got[7][0] == "one two three four five"
    assert got[7][2] == 5


def test_overlapping_windows_merge(spark):
    # a long shared passage: every window inside it is duplicated;
    # coverage is the union, not k * n_windows
    passage = " ".join(f"w{i}" for i in range(20))
    rows = [(1, passage), (2, f"intro {passage} outro")]
    got = _run(spark, rows, k=6)
    assert got[2][0] == "intro outro"
    assert got[2][2] == 20


def test_casing_and_whitespace_match_original_survives(spark):
    rows = [
        (1, "Shared Span Of Text Here plus more"),
        (2, "prefix   shared span OF text HERE suffix"),
    ]
    got = _run(spark, rows, k=5)
    # doc 1 keeps original casing verbatim (untouched doc)
    assert got[1][0] == rows[0][1]
    assert got[2][0] == "prefix suffix"


def test_short_null_empty_pass_through_verbatim(spark):
    rows = [
        (1, "only three tokens"),
        (2, "  weird   spacing    kept  "),
        (3, None),
        (4, ""),
        (5, "only three tokens"),  # dup but below k: untouched
    ]
    got = _run(spark, rows, k=4)
    for d, t in rows:
        assert got[d][0] == t
        assert got[d][2] == 0


def test_unaffected_doc_text_verbatim(spark):
    rows = [
        (1, "a  doc   with\tirregular\n whitespace and unique words"),
        (2, "completely disjoint vocabulary in this one right here"),
    ]
    got = _run(spark, rows, k=3)
    assert got[1][0] == rows[0][1]


def test_first_occurrence_order_is_doc_then_pos(spark):
    shared = "x y z w v"
    rows = [
        (10, f"late doc {shared}"),
        (2, f"{shared} early doc"),
    ]
    got = _run(spark, rows, k=5)
    assert shared in got[2][0]
    assert shared not in got[10][0]


def test_randomized_replay_parity(spark):
    rng = random.Random(1234)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for d in range(40):
        n = rng.randint(0, 25)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    for k in (2, 3, 5):
        _run(spark, rows, k)


def test_duplicated_spans_relation(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e"), (3, "z z a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dups = {(r["_id"], r["i"]) for r in duplicated_spans(df, k=3).collect()}
    # doc2 repeats every doc1 window; doc3 repeats "a b c" at start 2
    assert dups == {(2, 0), (2, 1), (2, 2), (3, 2)}
    n_windows = span_windows(df, k=3).count()
    assert n_windows == 3 + 3 + 3


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_dedup(df, k=0)


def test_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} body text here") for i in range(5)],
        "doc_id long, text string",
    )
    plan = span_dedup(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_span_dedup(spark, tmp_path):
    """Streaming twin: union of per-batch outputs (doc_id-ordered
    arrival) == batch span_dedup over the accumulated corpus; docs
    below k tokens still emit verbatim."""
    import os

    from wrds_data_pipeline_spark.streaming.corpus_stream import (
        streaming_span_dedup,
    )

    shared = "a long shared passage of many repeated tokens here"
    batches = [
        [(1, f"first doc {shared} unique tail one"), (2, "tiny doc")],
        [(3, f"other intro {shared} other tail"), (4, "tiny doc")],
        [(5, f"{shared} {shared}")],
    ]
    schema = "doc_id long, text string"
    stage = os.path.join(str(tmp_path), "span_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    idx = os.path.join(str(tmp_path), "span_index")
    got = streaming_span_dedup(
        spark, stage, spark.createDataFrame([], schema).schema, idx,
        k=5, max_files_per_trigger=1,
    )
    all_rows = [r for b in batches for r in b]
    want = span_dedup(
        spark.createDataFrame(all_rows, schema), k=5
    ).toPandas()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert g[["doc_id", "text", "n_tok_in", "n_tok_removed"]].equals(
        w[["doc_id", "text", "n_tok_in", "n_tok_removed"]]
    )
    # the shared passage survives exactly once, in the first arrival
    texts = dict(zip(g["doc_id"], g["text"]))
    assert shared in texts[1]
    assert shared not in texts[3] and shared not in texts[5]
    # sub-k docs pass through verbatim even though they repeat
    assert texts[2] == "tiny doc" and texts[4] == "tiny doc"


def test_leading_nonspace_whitespace_no_phantom_token(spark):
    """A doc leading with tab/newline must not grow an empty first
    token (F.trim strips spaces only): window positions would shift
    and dedup would silently miss real duplicate spans."""
    shared = "p q r s t u"
    rows = [
        (1, f"\n\t{shared} one tail"),
        (2, f"other start {shared} other end"),
    ]
    got = _run(spark, rows, k=6)
    assert shared in got[1][0]
    assert shared not in got[2][0]
    assert got[1][1] == 8  # no phantom token in the count


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_default_scope_leaves_no_cache(spark):
    """Default-path span_dedup persists the window relation internally
    and frees it before returning; the only pinned storage it may add
    is the localCheckpoint of the (duplicated-mass-sized) cut arrays,
    freed by the ContextCleaner with the DataFrame (the
    test_caching convention)."""
    before = _persistent_ids(spark)
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_dedup(df, k=3)
    assert len(_persistent_ids(spark) - before) <= 1
    assert out.count() == 2  # still collectable after release


def test_caller_scope_stays_lazy_and_releases(spark):
    from wrds_data_pipeline_spark.caching import PersistScope

    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # compare ID SETS, not counts: an earlier test's async
    # unpersist(blocking=False) (connected_components' per-round
    # snapshots) may retire ITS RDDs between our two reads, which a
    # count-equality assert misreads as this scope leaking
    base = _persistent_ids(spark)
    with PersistScope() as scope:
        out = span_dedup(df, k=3, scope=scope)
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got[1] == "a b c d e f" and got[2] == ""
    assert _persistent_ids(spark) - base == set()


def test_span_windows_multi_equals_per_width_scans(spark):
    """The fused multi-width scan (round 8, scrub short-item coverage)
    must emit EXACTLY the union of per-width span_windows relations,
    keyed by width — including docs shorter than a width, empty/null
    text, and width 1."""
    from wrds_data_pipeline_spark.operators.spans import span_windows_multi

    rows = [
        (1, "Alpha beta gamma DELTA epsilon"),
        (2, "one two"),
        (3, "solo"),
        (4, ""),
        (5, None),
        (6, "  padded\t with   odd\nwhitespace  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    widths = [1, 3, 5]
    fused = {
        (r._id, r.t, r.i, r.h)
        for r in span_windows_multi(df, "doc_id", "text", widths).collect()
    }
    want = set()
    for t in widths:
        for r in span_windows(df, "doc_id", "text", t).collect():
            want.add((r._id, t, r.i, r.h))
    assert fused == want and len(want) > 0

    with pytest.raises(ValueError):
        span_windows_multi(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        span_windows_multi(df, "doc_id", "text", [0, 3])
