"""Pure-Python mirror of the engine's shingle/MinHash arithmetic, for
building ADVERSARIAL LSH fixtures (tests + scale rehearsals).

The popular-min-shingle regime — one shared shingle whose hash is
minimal under a band's hash functions for every short doc containing
it — cannot be sampled from random text at test scale; the fixture
must be ENGINEERED by rejection-sampling docs against the exact hash
arithmetic Spark will apply.  That mirror used to live in two hand
copies (tests/test_lsh_bucket_bound.py and tools/scale_rehearsal.py),
each restating MINHASH_MOD / MINHASH_AB and the md5 scheme; a drift in
``operators/dedup.py`` updated in only one copy would silently cost
that copy its hot bucket and let it pass vacuously.  This module is
the single mirror: the constants are IMPORTED from the production
operator, and the md5 scheme is asserted against it by the premise
guards in the consuming tests (which fail loudly — never vacuously —
if the mirror drifts from ``shingle_hash``/``minhash_signatures``).

Driver-side only, tiny inputs — never runs on executors.
"""

from __future__ import annotations

import hashlib
import itertools

from wrds_data_pipeline_spark.operators.dedup import MINHASH_AB, MINHASH_MOD


def py_shingle_hash(s: str) -> int:
    """Mirror of ``dedup.shingle_hash`` (md5 first-15-hex → int64 %
    MINHASH_MOD) for a single shingle string."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_MOD


def hash_rows(h: int, n: int) -> list[int]:
    """(A_i·h + B_i) % M for the first ``n`` MinHash functions."""
    return [(a * h + b) % MINHASH_MOD for a, b in MINHASH_AB[:n]]


def shingles_of(text: str, k: int = 3) -> list[str]:
    """Distinct k-gram shingles in first-seen order — the set
    ``_shingled`` emits for one doc."""
    toks = text.split()
    return list(
        dict.fromkeys(
            " ".join(toks[j : j + k]) for j in range(len(toks) - (k - 1))
        )
    )


def signature(text: str, n_hashes: int = 12, k: int = 3) -> list[int]:
    """MinHash signature of one doc under the production hash family —
    mirror of ``minhash_signatures``."""
    hs = [py_shingle_hash(s) for s in shingles_of(text, k)]
    return [
        min((a * h + b) % MINHASH_MOD for h in hs)
        for a, b in MINHASH_AB[:n_hashes]
    ]


def find_hot_phrase(rows_per_band: int = 3) -> str:
    """A 3-token phrase whose hash is in the LOW tail under every
    band-0 hash function — a candidate popular-min-shingle (low rows
    make the rejection sampling below converge fast)."""
    return next(
        p
        for p in (f"hotphrase{t} viral boiler" for t in itertools.count())
        if all(
            v < MINHASH_MOD // 20
            for v in hash_rows(py_shingle_hash(p), rows_per_band)
        )
    )


def demoted_cluster_docs(
    c: int,
    start_id: int = 0,
    rows_per_band: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
) -> list[tuple[int, str]]:
    """``c`` pairwise-SIMILAR docs engineered to hide inside the
    degenerate hot bucket while sharing NO band other than the
    polluted one — the exact residual-recall class of the demoted-
    bucket fate (VERDICT r8): the bucket demotes (its dissimilar
    majority fails the gate), the cluster's pairs are not star edges
    (none of them is the hub when degenerate ids precede
    ``start_id``), and by construction no OTHER band collides, so
    without salvage the cluster connects to nothing.

    Construction: one base text (the hot phrase + common filler,
    rejection-sampled so the hot phrase is the band-0 minimum and the
    cluster's own shingles own every later row's minimum) plus two
    member-unique trailing tokens per doc, rejection-sampled so each
    member's minimum DIPS BELOW the base minimum on exactly the last
    row of every band 1..band-1 (pairwise-distinct dips break every
    such band) while every other row keeps the shared base minimum
    (the salvage sub-bucket that recovers the cluster).  Pairwise
    jaccard is ~11/15 (two differing trailing tokens on a ~13-token
    doc) — assert it against the consuming test's threshold as a
    premise guard."""
    rpb = rows_per_band
    hot = find_hot_phrase(rpb)
    unique_rows = {band * rpb + (rpb - 1) for band in range(1, bands)}
    shared_rows = [
        r for r in range(rpb, n_hashes) if r not in unique_rows
    ]
    # base: hot phrase minimal on band 0, and the base's own minimum
    # strictly below the hot phrase's value on every later row (keeps
    # degenerate members — whose only shared shingle is the hot
    # phrase — out of the cluster's salvage sub-buckets)
    hot_full = hash_rows(py_shingle_hash(hot), n_hashes)
    base = None
    for t in itertools.count():
        cand = f"{hot} " + " ".join(f"cm{t}w{j}" for j in range(10))
        sig = signature(cand, n_hashes)
        if sig[:rpb] == hot_full[:rpb] and all(
            sig[r] < hot_full[r] for r in range(rpb, n_hashes)
        ):
            base = cand
            base_sig = sig
            break
    out: list[tuple[int, str]] = []
    dips: set[tuple[int, ...]] = set()
    seq = 0
    while len(out) < c:
        text = f"{base} xq{seq}a xq{seq}b"
        seq += 1
        sig = signature(text, n_hashes)
        if sig[:rpb] != hot_full[:rpb]:
            continue
        if any(sig[r] != base_sig[r] for r in shared_rows):
            continue
        if any(sig[r] >= base_sig[r] for r in unique_rows):
            continue
        dip = tuple(sig[r] for r in sorted(unique_rows))
        if dip in dips:  # pairwise-distinct dips break every band
            continue
        dips.add(dip)
        out.append((start_id + len(out), text))
    return out


def degenerate_hot_docs(
    m: int, start_id: int = 0, rows_per_band: int = 3
) -> list[tuple[int, str]]:
    """``m`` pairwise-DISSIMILAR 6-token docs engineered so one shared
    3-gram is the band-0 minimum for every member: each doc = the hot
    phrase + three unique tokens (pairwise jaccard 1/7, far under any
    sane threshold), rejection-sampled until the hot phrase's hash is
    the band-0 minimum over ALL the doc's shingles.  The classic LSH
    false-positive regime — a hot bucket of genuinely dissimilar docs —
    as (doc_id, text) rows."""
    hot = find_hot_phrase(rows_per_band)
    hot_rows = hash_rows(py_shingle_hash(hot), rows_per_band)
    out: list[tuple[int, str]] = []
    seq = 0
    while len(out) < m:
        u = f"u{seq}a u{seq}b u{seq}c"
        seq += 1
        text = f"{hot} {u}"
        hs = [py_shingle_hash(s) for s in shingles_of(text)]
        if all(
            min((a * h + b) % MINHASH_MOD for h in hs) == hot_rows[i]
            for i, (a, b) in enumerate(MINHASH_AB[:rows_per_band])
        ):
            out.append((start_id + len(out), text))
    return out
