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
