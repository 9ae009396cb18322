"""Product quantization (PQ) for embedding columns: the memory rung
of the ANN ladder.

``similarity.py`` answers "which vectors are near" with exact scan
(brute force), candidate pruning (LSH buckets / IVF cells), and
scalar compression (``quantize_int8``, 4×).  PQ is the next
compression step and the standard design for billion-vector ANN
(IVF-PQ): split each unit vector into ``m`` subvectors, replace each
subvector with the id of its nearest codeword from a per-subspace
codebook of ``k`` entries, and score queries against the CODES with
an m-entry table lookup per row (asymmetric distance computation,
ADC) instead of a dim-element dot product.

Storage: dim float32 → m uint8-ish codes.  dim=64, m=8 is 32×
smaller than the raw vectors — at 100 TB of embeddings, the PQ code
table fits where the raw vectors never could, and the ADC scan reads
m bytes + does m lookups per row instead of 256 bytes + 64 multiplies.

Division of labor (the same split as the IVF family):
- codebook TRAINING is driver-side numpy over a deterministic
  hash-sample — codebooks are m·k·(dim/m) = dim·k doubles (KBs),
  exactly the "quantizer is driver-resident by construction" regime
  of ``ivf_build``; the corpus is never collected.
- ENCODING and SCORING are pure JVM expressions over single-parse
  literals (``_lit_double_cube`` / ``_lit_double_matrix``), with the
  row norm folded ONCE via ``aggregate``'s finish lambda (the
  ivf_assign shape — an inline norm would re-fold per codeword).

No reference-repo counterpart (the reference's similarity surface is
pandas ``DataFrame.corr``, ``correlation_matrix_exporter.py``); this
extends the LLM-data layer alongside LSH/IVF/SemDeDup.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .similarity import (
    _lit_double_matrix,
    brute_force_topk,
)


def _lit_double_cube(cube: list[list[list[float]]]) -> Column:
    """array<array<array<double>>> literal in ONE py4j round-trip
    (see ``similarity._lit_doubles`` for why: ``F.lit`` recursion
    costs one gateway call per element — an 8×16×8 codebook cube
    would be ~1000 calls ≈ plan-build seconds)."""
    if not cube or not all(cube) or not all(all(r) for r in cube):
        raise ValueError("_lit_double_cube needs non-empty rows")
    if not all(math.isfinite(x) for m_ in cube for r in m_ for x in r):
        raise ValueError("_lit_double_cube needs finite values")
    mats = ",".join(
        "array("
        + ",".join("array(" + ",".join(f"{x!r}D" for x in r) + ")" for r in m_)
        + ")"
        for m_ in cube
    )
    return F.expr(f"array({mats})")


@dataclass(frozen=True)
class PQCodebooks:
    """Trained product-quantizer: ``books[j]`` is the k×dsub codebook
    for subspace j (unit-vector space — train and encode normalize
    rows first, so ADC sums approximate cosine directly).

    ``sigma[j]`` is the per-subspace RMS quantization residual
    measured on the training sample — the calibration that lets the
    search path size its rerank pool from the data instead of a
    hand-tuned factor (``adc_error_bound``).  None on artifacts
    trained before round 7 (auto-rerank then refuses rather than
    guessing)."""

    dim: int
    m: int
    k: int
    books: tuple  # m × k × dsub, tuples for hashability
    sigma: tuple | None = None  # m per-subspace RMS residuals

    @property
    def dsub(self) -> int:
        return self.dim // self.m


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 2048,
    n_iter: int = 8,
) -> PQCodebooks:
    """Train per-subspace codebooks on a deterministic sample.

    Sample = the ``sample_cap`` corpus rows with the smallest
    (xxhash64(id), id) — hash-random so it is decorrelated from
    insertion order, reproducible, and planned as
    TakeOrderedAndProject (per-partition top-k + driver merge; no
    global sort, no full collect).  Rows are L2-normalized; zero
    vectors are dropped from training (they carry no direction).
    Per subspace: Lloyd's k-means (L2) with evenly-strided seeds from
    the hash-ordered sample and empty-cluster carry-over — fully
    deterministic, numpy-only, O(sample_cap · k · dim) flops on the
    driver per iteration.
    """
    import numpy as np

    if m <= 0 or k <= 1:
        raise ValueError(f"need m >= 1 subspaces and k >= 2 codes, got m={m} k={k}")
    rows = (
        embeddings.select(
            F.xxhash64(F.col(id_col)).alias("_h"),
            F.col(id_col).alias("_i"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy("_h", "_i")
        .limit(sample_cap)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty embeddings input")
    dim = len(rows[0]["_v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    X = X[norms > 0] / norms[norms > 0, None]
    n = len(X)
    if n < k:
        raise ValueError(f"pq_train: only {n} non-zero sample rows for k={k} codes")
    dsub = dim // m
    books = []
    sigmas = []
    seed_idx = [(t * n) // k for t in range(k)]
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[seed_idx].copy()
        for _ in range(n_iter):
            # ||s - c||² = ||s||² - 2 s·c + ||c||²; ||s||² constant per argmin
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        # calibration: RMS residual of the FINAL assignment — what an
        # ADC score can be off by, per subspace (adc_error_bound)
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
        assign = d2.argmin(axis=1)
        resid = S - C[assign]
        sigmas.append(float(np.sqrt((resid * resid).sum(axis=1).mean())))
        books.append(tuple(tuple(float(x) for x in c) for c in C))
    return PQCodebooks(
        dim=dim, m=m, k=k, books=tuple(books), sigma=tuple(sigmas)
    )


def adc_error_bound(
    cb: PQCodebooks, query_vec: list[float], z: float = 1.0
) -> float:
    """How far an ADC score plausibly sits from the true cosine for
    THIS query: ε = z · sqrt(Σ_j ‖q̂_j‖² σ_j²).

    ADC(q, x) = Σ_j q̂_j·c_j(x) = cos(q, x) − Σ_j q̂_j·r_j where r_j
    is x's subspace quantization residual; the σ_j are the measured
    RMS residuals, so the RSS of the per-subspace scales is the
    natural error scale (residual directions are independent across
    subspaces).  This is a CALIBRATED EXPECTED-CASE heuristic, not a
    worst-case bound: σ is an RMS estimate (individual residuals
    exceed it), and a band of kth_adc − 1ε is one-sided — the k-th
    candidate's ADC can overestimate by ~ε while a true neighbor's
    underestimates by ~ε, so the two-sided worst case needs 2ε.
    z=1 measures recall@10 = 1.00 on the 32k clustered rehearsal
    (vs 0.30 at the old fixed factor); callers needing stronger
    guarantees pass z=2 for the two-sided band at ~2× pool mass."""
    import math as _math

    if cb.sigma is None:
        raise ValueError(
            "codebooks carry no sigma calibration (artifact predates "
            "auto-rerank); retrain with pq_train or pass an explicit "
            "rerank_factor"
        )
    q = [float(x) for x in query_vec]
    nq = _math.sqrt(sum(x * x for x in q))
    if nq == 0:
        raise ValueError("zero query vector")
    q = [x / nq for x in q]
    dsub = cb.dsub
    acc = 0.0
    for j in range(cb.m):
        qj2 = sum(x * x for x in q[j * dsub : (j + 1) * dsub])
        acc += qj2 * cb.sigma[j] ** 2
    return z * _math.sqrt(acc)


def pq_encode_col(cb: PQCodebooks, vec: Column) -> Column:
    """Expression: array<tinyint/smallint> of length m — per subspace,
    the argmin-L2 codeword id for the UNIT vector's subvector.

    argmin_c ||v̂_sub - c||² ≡ argmax_c (dot(v_sub, c)/‖v‖ - ‖c‖²/2),
    so the row norm appears as one scalar per codeword: the
    sum-of-squares folds ONCE via ``aggregate``'s finish lambda and
    binds as a lambda variable (the ivf_assign shape — a withColumn
    "hoist" would be CollapseProject-inlined back into the lambda and
    re-fold per codeword).  The codebook cube and the ‖c‖²/2 matrix
    ship as single-parse literals; subvector slices are evaluated
    once per (subspace, codeword) HOF invocation — a constant factor
    on the m·k·dsub multiply work the argmin needs anyway.  Ties pick
    the earliest codeword (struct max on (score, -code)).  All-zero
    vectors have no direction: a guarded branch assigns them code 0
    in every subspace without evaluating the 1/‖v‖ score (ANSI mode
    makes 0/0 an error, not NaN).
    """
    dsub = cb.dsub
    cube = _lit_double_cube([[list(c) for c in book] for book in cb.books])
    halfn = _lit_double_matrix(
        [[sum(x * x for x in c) / 2.0 for c in book] for book in cb.books]
    )
    v = vec.cast("array<double>")
    code_t = "tinyint" if cb.k <= 127 else "smallint"
    zero_codes = F.expr(
        "array(" + ",".join(["0"] * cb.m) + ")"
    ).cast(f"array<{code_t}>")

    def sub_dot(j: Column, c: Column) -> Column:
        return F.aggregate(
            F.zip_with(F.slice(v, j * dsub + 1, dsub), c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.aggregate(
        F.transform(v, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
        lambda ss: F.when(ss == 0, zero_codes).otherwise(
            F.transform(
                cube,
                lambda book, j: (
                    -F.array_max(
                        F.transform(
                            book,
                            lambda c, i: F.struct(
                                (
                                    sub_dot(j, c) / F.sqrt(ss)
                                    - F.element_at(
                                        F.element_at(halfn, j + 1), i + 1
                                    )
                                ).alias("score"),
                                (-i).alias("neg_code"),
                            ),
                        )
                    )["neg_code"]
                ).cast(code_t),
            )
        ),
    )


def pq_encode(
    df: DataFrame,
    cb: PQCodebooks,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the PQ code column.  At scale this runs once at ingest
    and the code table is what gets stored/scanned — dim float32 →
    m bytes per row (32× at dim=64, m=8)."""
    return df.withColumn(out_col, pq_encode_col(cb, F.col(vec_col)))


def pq_adc_scores(
    cb: PQCodebooks, query_vec: list[float], code_col: Column
) -> Column:
    """ADC score expression: approximate cosine(query, v) as
    Σ_j LUT[j][code_j] where LUT[j][i] = dot(q̂_sub_j, book[j][i]) is
    computed driver-side (m·k·dsub = dim·k flops) and shipped as one
    matrix literal.  Per corpus row: m element_at lookups + m adds —
    no dim-element arithmetic touches the scan."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if qn == 0:
        raise ValueError("pq_adc_scores: zero query vector")
    q = [float(x) / qn for x in query_vec]
    dsub = cb.dsub
    if len(q) != cb.dim:
        raise ValueError(f"query dim {len(q)} != codebook dim {cb.dim}")
    lut = _lit_double_matrix(
        [
            [
                sum(q[j * dsub + t] * c[t] for t in range(dsub))
                for c in cb.books[j]
            ]
            for j in range(cb.m)
        ]
    )
    return F.aggregate(
        F.transform(
            code_col,
            lambda c, j: F.element_at(
                F.element_at(lut, j + 1), c.cast("int") + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_adc_topk(
    encoded: DataFrame,
    cb: PQCodebooks,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Top-k by ADC score over a PQ-coded table: one scan of the code
    column, TakeOrderedAndProject (per-partition top-k + k-row driver
    merge — no global sort).  Ranking uses the 6dp-rounded score with
    id tie-break, the ``brute_force_topk`` determinism contract; the
    rank window reuses its constant-partition key so WindowExec stays
    partitioned over the surviving ≤k rows."""
    scored = encoded.select(
        F.col(id_col),
        F.round(pq_adc_scores(cb, query_vec, F.col(code_col)), 6).alias("adc_sim"),
    )
    topk = scored.orderBy(F.desc("adc_sim"), F.asc(id_col)).limit(k)
    w = W.partitionBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(1))).orderBy(
        F.desc("adc_sim"), F.asc(id_col)
    )
    return topk.withColumn("rank", F.row_number().over(w))


def pq_topk(
    embeddings: DataFrame,
    cb: PQCodebooks,
    query_vec: list[float],
    k: int = 10,
    rerank_factor: int | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """The full IVF-PQ-rerank search path, composed from the ladder:

    1. (optional) IVF prune: keep only the ``n_probe`` cells nearest
       the query — uses a precomputed ``cell`` column when present
       (the stored-index layout; partition pruning at 100 TB),
       otherwise assigns on the fly via ``exact_assigner``.
    2. ADC scan for the rerank pool — reuses a precomputed
       ``code_col`` when present (the stored PQ table), otherwise
       encodes inline.
    3. exact re-rank: the candidate ids broadcast back against the
       raw vectors (the big side never shuffles) and the final top-k
       is exact cosine among them.

    Pool sizing (``rerank_factor``):
    - None (default, round 7 — VERDICT r6 next #7): the ERROR-BAND
      rule — every row whose ADC score is within ``adc_error_bound``
      of the k-th best ADC score joins the pool.  The pool therefore
      auto-scales with the number of ADC-indistinguishable
      candidates (≈ the query's tied cluster size), which is exactly
      the regime where a fixed factor collapsed (r6 rehearsal: 0.30
      recall@10 on a 32k clustered fixture at factor 8; the band
      rule needs no per-corpus tuning).  On well-spread corpora the
      band is thin and the pool stays ~k.  Costs a second pass over
      the coded relation (k-th score, then band filter) — both
      code-column-only scans.
    - an int: the classical fixed pool ``k·rerank_factor`` (one
      scan; right when the corpus is known well-spread).

    Output schema/determinism matches ``brute_force_topk``
    (id, cos_sim, rank); approximation enters only through which
    candidates survive steps 1–2.
    """
    base = embeddings
    if centroids is not None:
        if "cell" not in base.columns:
            # the ivf_build auto rule: exhaustive while the quantizer is
            # small, two-level routing beyond (assignment is n·c dots —
            # the hidden quadratic once cells scale with the corpus)
            from .similarity import exact_assigner, hierarchical_assigner

            make = (
                hierarchical_assigner
                if len(centroids) > 128
                else exact_assigner
            )
            base = make(centroids, vec_col)(base)

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb) if na and nb else 0.0

        ranked = sorted(centroids, key=lambda c: -cos(c[1], query_vec))
        base = base.filter(
            F.col("cell").isin([c[0] for c in ranked[:n_probe]])
        )
    coded = (
        base
        if code_col in base.columns
        else pq_encode(base, cb, vec_col, code_col)
    )
    if rerank_factor is not None:
        cand = pq_adc_topk(
            coded, cb, query_vec, k * rerank_factor, id_col, code_col
        ).select(id_col)
    else:
        eps = adc_error_bound(cb, query_vec)
        kth_rows = pq_adc_topk(coded, cb, query_vec, k, id_col, code_col).collect()
        if not kth_rows:
            return brute_force_topk(
                embeddings.limit(0), query_vec, k, id_col, vec_col
            )
        kth_score = min(r["adc_sim"] for r in kth_rows)
        # rounded on BOTH sides of the band comparison (the k-th score
        # comes from the 6dp ranking precision; the batch path does the
        # same) — the band is ~5 orders above the rounding either way
        cand = coded.select(
            F.col(id_col),
            F.round(
                pq_adc_scores(cb, query_vec, F.col(code_col)), 6
            ).alias("_adc"),
        ).filter(F.col("_adc") >= F.lit(float(kth_score) - eps)).select(id_col)
    # fixed pools are k·factor rows — always broadcastable; the error
    # band deliberately auto-scales with the query's ADC-tied cluster
    # (potentially millions of near-identical rows), so there the hint
    # is left to AQE, which broadcasts small pools at runtime and
    # shuffle-joins oversized ones instead of OOMing the driver
    if rerank_factor is not None:
        cand = F.broadcast(cand)
    survivors = embeddings.join(cand, id_col)
    return brute_force_topk(survivors, query_vec, k, id_col, vec_col)


def _query_luts(
    queries: DataFrame,
    cb: PQCodebooks,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, _lut): per-query m×k ADC lookup table, built
    JVM-side — LUT[j][i] = dot(q̂_sub_j, book[j][i]) with the query
    norm folded once via ``aggregate``'s finish lambda.  Null LUT for
    zero-norm queries (no direction)."""
    dsub = cb.dsub
    cube = _lit_double_cube([[list(c) for c in book] for book in cb.books])
    qv = F.col(query_vec_col).cast("array<double>")

    def sub_dot(j: Column, c: Column) -> Column:
        return F.aggregate(
            F.zip_with(F.slice(qv, j * dsub + 1, dsub), c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    lut = F.aggregate(
        F.transform(qv, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
        lambda ss: F.when(
            ss > 0,
            F.transform(
                cube,
                lambda book, j: F.transform(
                    book, lambda c: sub_dot(j, c) / F.sqrt(ss)
                ),
            ),
        ),
    )
    return queries.select(
        F.col(query_id_col).alias("query_id"), lut.alias("_lut")
    )


def _adc_from_lut(code_col: str = "pq_code") -> Column:
    """ADC score expression over a relation carrying both ``code_col``
    and a per-row ``_lut`` (from ``_query_luts``): m lookups + m adds,
    rounded to the ranking precision."""
    return F.round(
        F.aggregate(
            F.transform(
                F.col(code_col),
                lambda c, j: F.element_at(
                    F.element_at(F.col("_lut"), j + 1), c.cast("int") + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _batch_adc_scored(
    queries: DataFrame,
    coded: DataFrame,
    cb: PQCodebooks,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """(query_id, id, adc_sim) for every (query, corpus-row) pair —
    the shared scan under ``pq_adc_topk_batch`` (fixed top-k cut) and
    ``pq_topk_batch`` (calibrated error-band pool).  Per-query m×k
    LUT built JVM-side on the broadcast query relation; see
    ``pq_adc_topk_batch`` for the full contract."""
    q = _query_luts(queries, cb, query_id_col, query_vec_col)
    return coded.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        _adc_from_lut(code_col).alias("adc_sim"),
    )


def pq_adc_topk_batch(
    queries: DataFrame,
    coded: DataFrame,
    cb: PQCodebooks,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    partial_parallelism: int = 32,
) -> DataFrame:
    """ADC top-k for MANY query vectors in one code-table scan: the
    PQ twin of ``similarity.brute_force_topk_batch``.

    Each query's m×k lookup table is built JVM-side as a COLUMN of
    the broadcast query relation (LUT[j][i] = dot(q_sub_j, book[j][i])
    / ‖q‖, with the query norm folded once via ``aggregate``'s finish
    lambda — the join is a collapse barrier, so the LUT evaluates
    once per query, never per scored pair).  Per (query, corpus-row)
    pair the scan then does m lookups + m adds — no dim-element
    arithmetic — followed by the partial/final per-query top-k split
    (both windows partitioned; no task sorts the corpus).

    All-zero query vectors have no direction: their LUT is null, their
    scores sort last (desc_nulls_last), and their ranks are
    meaningless — filter such queries upstream.

    Returns (query_id, id, adc_sim, rank), rank 1..k per query, ties
    by id.  Scores match the single-query ``pq_adc_scores`` at the
    6dp rounding used for ranking (the two normalize in a different
    order, so raw doubles may differ in the last ulp).
    """
    scored = _batch_adc_scored(
        queries, coded, cb, query_id_col, query_vec_col, id_col, code_col
    )
    slice_key = F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_parallelism))
    w_partial = W.partitionBy(F.col("query_id"), slice_key).orderBy(
        F.desc("adc_sim"), F.asc(id_col)
    )
    survivors = scored.withColumn("_pr", F.row_number().over(w_partial)).filter(
        F.col("_pr") <= k
    )
    w_final = W.partitionBy("query_id").orderBy(F.desc("adc_sim"), F.asc(id_col))
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "adc_sim", "rank")
    )


def adc_error_bound_col(cb: PQCodebooks, query_vec: Column, z: float = 1.0) -> Column:
    """Expression twin of ``adc_error_bound`` — the per-query ADC
    error band ε = z·sqrt(Σ_j ‖q̂_j‖²σ_j²) as a COLUMN over a query
    relation, so a batch of queries gets its calibration in the same
    broadcast pass that builds the LUTs (no driver loop).  Null for
    zero-norm queries (no direction → no meaningful band)."""
    import math as _math

    if cb.sigma is None:
        raise ValueError(
            "codebooks carry no sigma calibration (artifact predates "
            "auto-rerank); retrain with pq_train or pass an explicit "
            "rerank_factor"
        )
    dsub = cb.dsub
    sig2 = F.expr(
        "array(" + ",".join(f"{(s * s)!r}D" for s in cb.sigma) + ")"
    )
    qv = query_vec.cast("array<double>")
    per_sub = F.transform(
        F.sequence(F.lit(0), F.lit(cb.m - 1)),
        lambda j: F.aggregate(
            F.transform(F.slice(qv, j * dsub + 1, dsub), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.element_at(sig2, j + 1),
    )
    # ss folded once; ε = z·sqrt(Σ per_sub / ss)
    return F.aggregate(
        F.transform(qv, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
        lambda ss: F.when(
            ss > 0,
            F.lit(float(z))
            * F.sqrt(
                F.aggregate(per_sub, F.lit(0.0), lambda acc, x: acc + x) / ss
            ),
        ),
    )


def _batch_pool(
    scored: DataFrame,
    queries: DataFrame,
    cb: PQCodebooks,
    k: int,
    rerank_factor: int | None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    partial_parallelism: int = 32,
) -> DataFrame:
    """Per-query ADC rerank pool over a (query_id, id, adc_sim)
    relation — THE one copy of the pool algorithm for the batch
    family (``pq_topk_batch`` and ``vector_index_topk_batch``): a
    fixed ``k·rerank_factor`` cut, or (``rerank_factor=None``) the
    calibrated error band — every row within ``adc_error_bound_col``
    of that query's k-th best ADC score, thresholds computed in one
    broadcast pass.  Returns (query_id, id)."""
    w_p = W.partitionBy(
        "query_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_parallelism))
    ).orderBy(F.desc_nulls_last("adc_sim"), F.asc(id_col))
    w_f = W.partitionBy("query_id").orderBy(
        F.desc_nulls_last("adc_sim"), F.asc(id_col)
    )

    def topn(n: int) -> DataFrame:
        return (
            scored.withColumn("_pr", F.row_number().over(w_p))
            .filter(F.col("_pr") <= n)
            .withColumn("_r", F.row_number().over(w_f))
            .filter(F.col("_r") <= n)
        )

    if rerank_factor is not None:
        return topn(k * rerank_factor).select("query_id", id_col)
    kth = topn(k).groupBy("query_id").agg(F.min("adc_sim").alias("_kth"))
    eps = queries.select(
        F.col(query_id_col).alias("query_id"),
        adc_error_bound_col(cb, F.col(query_vec_col)).alias("_eps"),
    )
    th = kth.join(eps, "query_id").select(
        "query_id", (F.col("_kth") - F.col("_eps")).alias("_th")
    )
    return (
        scored.join(F.broadcast(th), "query_id")
        .filter(F.col("adc_sim") >= F.col("_th"))
        .select("query_id", id_col)
    )


def _batch_exact_topk(
    pool: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partial_parallelism: int = 32,
) -> DataFrame:
    """Exact-cosine per-query top-k of a (query_id, id) ``pool``
    against an (id, vec) ``vectors`` relation — the one copy of the
    rerank/final stage for the batch family.  The corpus norm is
    computed on the pool∩vectors join keyed by id BEFORE the
    per-query fan-out — one dim-element fold per DISTINCT pooled id,
    not per (query, id) pair (a row pooled by P queries would
    otherwise fold its norm P times).  Zero-norm QUERIES are dropped
    (no direction), while zero-norm CORPUS vectors keep the per-query
    paths' semantics — null cos_sim, ranked last
    (``desc_nulls_last``), exactly like ``brute_force_topk``'s
    orderBy.  Returns (query_id, id, cos_sim, rank), rank 1..k."""
    from .similarity import l2_norm

    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).cast("array<double>").alias("_qv"),
        )
        .withColumn("_qn", l2_norm(F.col("_qv")))
        .filter(F.col("_qn") > 0)
    )
    vn = (
        vectors.join(pool.select(id_col).distinct(), id_col)
        .select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_cn", l2_norm(F.col("_v")))
    )
    scored = (
        pool.join(vn, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                F.when(
                    F.col("_cn") > 0,
                    F.aggregate(
                        F.zip_with(F.col("_qv"), F.col("_v"), lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / (F.col("_qn") * F.col("_cn")),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    slice_key = F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_parallelism))
    w_partial = W.partitionBy("query_id", slice_key).orderBy(
        F.desc_nulls_last("cos_sim"), F.asc(id_col)
    )
    survivors = scored.withColumn(
        "_pr", F.row_number().over(w_partial)
    ).filter(F.col("_pr") <= k)
    w_final = W.partitionBy("query_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc(id_col)
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )


def pq_topk_batch(
    queries: DataFrame,
    embeddings: DataFrame,
    cb: PQCodebooks,
    k: int = 10,
    rerank_factor: int | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Batch PQ search with exact rerank: the bulk-retrieval shape of
    ``pq_topk`` — N queries against one stored code table in one scan
    per stage, never a per-query driver loop.

    1. ADC pool per query: ``rerank_factor=None`` (default) uses the
       calibrated error-band rule — each query's pool is every row
       whose ADC score is within ``adc_error_bound_col`` of that
       query's k-th best ADC score (per-query thresholds computed in
       one broadcast pass, pools auto-scale to each query's tied
       set); an int pins the classical fixed ``k·factor`` cut.
    2. Exact rerank: pooled (query, id) pairs join the raw vectors on
       id and the broadcast query relation on query_id; final top-k
       is exact cosine with the ``brute_force_topk_batch`` window
       discipline (ties by id).

    Returns (query_id, id, cos_sim, rank), rank 1..k per query.
    Zero-norm queries have no direction and are dropped from the
    output (their ADC LUT and error band are null); zero-norm corpus
    vectors rank last with null cos_sim (the per-query contract)."""
    coded = (
        embeddings
        if code_col in embeddings.columns
        else pq_encode(embeddings, cb, vec_col, code_col)
    )
    scored = _batch_adc_scored(
        queries, coded, cb, query_id_col, query_vec_col, id_col, code_col
    )
    pool = _batch_pool(
        scored, queries, cb, k, rerank_factor,
        query_id_col, query_vec_col, id_col,
    )
    return _batch_exact_topk(
        pool, embeddings.select(F.col(id_col), F.col(vec_col)),
        queries, k, query_id_col, query_vec_col, id_col, vec_col,
    )
