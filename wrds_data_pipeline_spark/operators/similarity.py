"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus two scale paths:

- LSH (random-hyperplane sign buckets) — deterministic pseudo-random
  hyperplanes derived from md5 so results are reproducible and
  oracle-checkable.
- IVF (inverted file): k-means-lite coarse quantizer (sampled
  centroids, one assignment pass), probe nearest cells only.

All vector math uses built-in higher-order functions
(``zip_with``/``aggregate``) — JVM-side, no Python in the loop.  At
very high dimensionality a Pandas-UDF (BLAS) path wins; noted on each
function.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint strings
# (PEP 563 via `from __future__ import annotations`) are resolved
# against module globals, so a lazy in-function import would break
# arrow_assigner's eval-type inference
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _lit_doubles(vals: list[float]) -> Column:
    """array<double> literal built in ONE py4j round-trip.

    ``F.lit(list)`` recursively lits every element through the py4j
    gateway — a 16×64 centroid matrix costs ~1000 gateway calls
    (~0.8s of plan-build time per invocation, measured).  Shipping the
    whole array as SQL text parses JVM-side in one call.  ``repr``
    doubles round-trip exactly (shortest-repr → Double.parseDouble),
    so the literal values are bit-identical to the F.lit form.

    Finite, non-empty input only: ``inf``/``nan`` have no SQL double
    literal spelling and an empty ``array()`` types as array<void> —
    both would surface as a baffling parse/analysis error downstream,
    so fail here with the real reason."""
    import math

    if not vals:
        raise ValueError("_lit_doubles needs a non-empty vector")
    if not all(math.isfinite(x) for x in vals):
        raise ValueError("_lit_doubles needs finite values (got inf/nan)")
    return F.expr("array(" + ",".join(f"{x!r}D" for x in vals) + ")")


def _lit_double_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal in one py4j round-trip (see
    ``_lit_doubles`` — same finite/non-empty contract per row)."""
    import math

    if not rows or not all(rows):
        raise ValueError("_lit_double_matrix needs non-empty rows")
    if not all(math.isfinite(x) for r in rows for x in r):
        raise ValueError("_lit_double_matrix needs finite values")
    inner = ",".join(
        "array(" + ",".join(f"{x!r}D" for x in r) + ")" for r in rows
    )
    return F.expr(f"array({inner})")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_static_cols(a_name: str, b_name: str, dim: int) -> Column:
    """``dot`` over two NAMED array columns for a statically-known
    dimension, as one flat codegen-able expression: ``0.0D +
    a[0]*b[0] + a[1]*b[1] + …`` — SQL ``+`` parses left-associative,
    so the fold order (and therefore every IEEE rounding step,
    including the leading 0.0 seed) is IDENTICAL to ``aggregate``
    over ``zip_with``; results are bit-equal doubles (pinned by
    tests/test_similarity_scale.py::test_dot_static_bit_parity).

    Why this exists: higher-order-function lambdas always run
    INTERPRETED — one boxed lambda frame per element — and on the
    quadratic pair stages (embedding_dup_pairs, semantic_dup_pairs)
    that tax is paid |pairs|·dim times: measured at sf0.1, the q36
    pair stage spent 1.4s of its 2.1s exec in the fold alone (guide
    §4.1: prefer expressions codegen can see).  An earlier attempt
    (reverted) built the unrolled tree with ~3·dim py4j Column calls
    plus a ``when``-guard per use — the round-trips alone cost
    0.5–1s of plan-build per query.  Building the whole chain as ONE
    ``F.expr`` string is a single py4j call and a millisecond parse.

    Rows whose arrays are not exactly ``dim`` long fall back to the
    HOF fold (a subscript past the end would NULL the sum where
    ``zip_with`` truncates to the shorter input) — the guard keeps
    semantics identical for EVERY input; the fast path covers the
    homogeneous-dimension corpora the operators are built for.
    CASE/WHEN evaluates branches lazily, so the guarded subscripts
    never fire out-of-bounds under ANSI mode."""
    if dim <= 0:  # degenerate caller: nothing to unroll
        return dot(F.col(a_name), F.col(b_name))
    chain = "0.0D + " + " + ".join(
        f"{a_name}[{i}]*{b_name}[{i}]" for i in range(dim)
    )
    return F.when(
        (F.size(F.col(a_name)) == dim) & (F.size(F.col(b_name)) == dim),
        F.expr(chain),
    ).otherwise(dot(F.col(a_name), F.col(b_name)))


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector: one scan, one
    TakeOrderedAndProject — no shuffle of the embedding column.
    Ranking uses the 6dp-rounded similarity with id tie-break so the
    cut is deterministic across engines/partitionings."""
    import math

    q = _lit_doubles([float(x) for x in query_vec])
    # the query norm is a constant: fold it driver-side (same
    # left-to-right IEEE sum + sqrt as l2_norm ⇒ identical double)
    # instead of re-folding the query literal once per corpus row
    qn = F.lit(math.sqrt(sum(float(x) * float(x) for x in query_vec)))
    v = F.col(vec_col).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        F.round(dot(v, q) / (l2_norm(v) * qn), 6).alias("cos_sim"),
    )
    # orderBy().limit(k) plans as TakeOrderedAndProject: per-partition
    # top-k, then a k-row merge on the driver — no global sort, no
    # single-partition window.  Rank is attached afterwards over the
    # surviving ≤k rows only.  The partition key is a column-referencing
    # constant (pmod(xxhash64(id), 1) = 0 for every row): a bare
    # literal would be constant-folded out of the window spec,
    # re-triggering the unpartitioned-window path; this keeps
    # WindowExec partitioned while its input is k rows regardless of
    # data size.
    topk = scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
    w = W.partitionBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(1))).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return topk.withColumn("rank", F.row_number().over(w))


def brute_force_topk_batch(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partial_parallelism: int = 32,
) -> DataFrame:
    """Exact cosine top-k for MANY query vectors in one plan: one
    corpus scan serves every query.

    Shape: broadcast the (small) query table, score each (query,
    corpus-row) pair JVM-side, then take each query's top k in two
    stages — a partial top-k per (query, corpus hash-slice) window
    followed by a final top-k over the ≤ k × partial_parallelism
    survivors per query.  Both windows are partitioned (slice
    partitions are |corpus|/P rows, final partitions ≤ k·P rows), so
    no task ever sorts the whole corpus per query — the per-query
    generalization of TakeOrderedAndProject's partial/final split.

    Returns (query_id, id, cos_sim, rank), rank 1..k per query, ties
    broken by id (deterministic across partitionings)."""
    # norms hoisted to each SIDE of the join (the join is a collapse
    # barrier, so these really do evaluate once per query / corpus
    # row): an inline cosine() re-folds BOTH norms per scored
    # (query × corpus-row) pair — a q× redundancy for the corpus norm
    # and an n× redundancy for each query norm.  Same multiply order
    # as cosine(), so values are bit-identical.
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", l2_norm(F.col("_qv")))
    v = F.col(vec_col).cast("array<double>")
    scored = (
        corpus.withColumn("_cn", l2_norm(v))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                dot(v, F.col("_qv")) / (F.col("_cn") * F.col("_qn")), 6
            ).alias("cos_sim"),
        )
    )
    slice_key = F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_parallelism))
    w_partial = W.partitionBy(F.col("query_id"), slice_key).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    survivors = scored.withColumn("_pr", F.row_number().over(w_partial)).filter(
        F.col("_pr") <= k
    )
    w_final = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j
    of plane p = (md5-derived integer in [-8,8)) — reproducible
    anywhere md5 exists."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}|{j}".encode()).hexdigest()
        out.append(float(int(h[:4], 16) % 16 - 8) + 0.5)
    return out


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH: bit p =
    sign(v · plane_p).  Vectors in the same bucket are near in angle
    with high probability.

    Built as ONE ``transform`` over the plane-matrix literal plus one
    fold (the ivf_assign shape): expression size stays linear in the
    plane count with a single lambda, where the per-plane
    when-chain it replaces grew one full dot subtree per plane —
    auto_n_planes legitimately asks for 10+ planes at large corpora,
    and plan-build/analysis cost should not grow with the corpus.
    Bit values are identical (sum of 2^p over non-negative dots)."""
    if not planes:
        # degenerate baseline: zero planes = one bucket holding every
        # vector (lsh_topk(n_planes=0) degrades to an exact full scan)
        return F.lit(0).cast("int")
    v = vec.cast("array<double>")
    mat = _lit_double_matrix([[float(x) for x in p] for p in planes])
    bits = F.transform(
        mat,
        # 2^j via pow (exact in doubles for j < 53; bucket ids cap at
        # int anyway) — shiftleft's bit-count arg is Python-int-only
        lambda c, j: F.when(
            dot(v, c) >= 0, F.pow(F.lit(2.0), j.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, x: acc + x
    ).cast("int")


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming_probe: int = 0,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket(s).
    Approximate (vectors in unprobed buckets are unseen) — the scale
    path: with b planes the scan cost drops ~2^b×.

    ``hamming_probe`` enables multi-probe: additionally scan every
    bucket within that Hamming distance of the query's sign pattern
    (distance 1 → the n_planes buckets that differ by one flipped
    hyperplane — the buckets a near-boundary neighbor most likely
    fell into).  This decouples recall from the 2^n_planes bucket
    coarseness: probing 1+b of 2^b buckets costs (1+b)/2^b of the
    scan instead of halving the plane count (which would double every
    bucket's population).  The probed set is a driver-side constant
    ⇒ an IN-list filter that prunes on a bucketed/partitioned layout
    exactly like the single-probe path."""
    import itertools

    dim = len(query_vec)
    planes = [_hyperplane(dim, p) for p in range(n_planes)]

    # compute the query's bucket driver-side with the same arithmetic
    qb = 0
    for p, plane in enumerate(planes):
        d = sum(x * y for x, y in zip(query_vec, plane))
        if d >= 0:
            qb += 2 ** p
    probe = {qb}
    for r in range(1, min(hamming_probe, n_planes) + 1):
        for flips in itertools.combinations(range(n_planes), r):
            b = qb
            for p in flips:
                b ^= 2 ** p
            probe.add(b)
    in_bucket = embeddings.filter(
        lsh_bucket(F.col(vec_col), planes).isin(sorted(probe))
    )
    return brute_force_topk(in_bucket, query_vec, k, id_col, vec_col)


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    planes: list[list[float]] | None = None,
    hamming_probe: int = 0,
    scope=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim)
    with rounded cosine ≥ threshold and id_a < id_b.

    ``n_planes=0`` (and no ``planes``) compares all pairs — exact but
    quadratic (BroadcastNestedLoopJoin): a debugging baseline for
    ≤10^4 vectors, banned from registered plans by the registry
    audit.  With ``n_planes>0`` (md5-derived hyperplanes) or an
    explicit ``planes`` list (caller-pinned, e.g. drawn from the data
    — the oracle-checkable path, like q44's pinned centroids),
    comparisons are restricted to vectors sharing an LSH sign-bucket:
    the self-join becomes a bucket equi-join — near-linear, the
    100 TB path (near-duplicates almost surely share the bucket since
    their angle is tiny).

    ``hamming_probe=r`` additionally compares pairs whose buckets
    differ in at most ``r`` sign bits (multi-probe): side a explodes
    each vector to its bucket plus every bucket within Hamming
    distance r, side b keeps the exact bucket — still an equi-join,
    with a sum_{i<=r} C(n_planes, i) fan-out factor on one side.
    Probing distance 1 roughly triples recall at threshold-grade
    angles without touching the join shape (a near-boundary neighbor
    most likely differs by exactly one flipped hyperplane)."""
    import itertools

    if hamming_probe > 0 and not planes and n_planes <= 0:
        # silently falling through to the all-pairs crossJoin would
        # hand a caller who asked for multi-probe the quadratic plan
        raise ValueError(
            "hamming_probe > 0 requires LSH buckets: pass planes= or "
            "n_planes > 0 (without buckets the plan is the all-pairs "
            "baseline and there is nothing to probe)"
        )
    # per-side norm columns — see semantic_dup_pairs: same arithmetic
    # as cosine() in the same order, folded once per row instead of
    # once per candidate pair
    v = F.col(vec_col).cast("array<double>")
    sided = embeddings.select(
        F.col(id_col).alias("_id"), v.alias("_v")
    ).withColumn("_n", l2_norm(F.col("_v")))
    if planes is None and n_planes > 0:
        dim = len(embeddings.select(vec_col).first()[0])
        planes = [_hyperplane(dim, p) for p in range(n_planes)]
    if planes:
        # the bucket is computed ONCE on the shared side relation (both
        # join branches and the probe fan-out read the same column) —
        # the per-row sign expression is an interpreted HOF, so every
        # avoided re-evaluation matters; with a caller scope the sided
        # relation is persisted, which also stops the optimizer's
        # inferred isnotnull(join key) from re-deriving the full bucket
        # expression inside the scan filter (it tests the STORED value)
        sided = sided.withColumn("_b0", lsh_bucket(F.col("_v"), planes))
        if scope is not None:
            sided = scope.persist(sided)
        a = sided.select(
            F.col("_id").alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
            F.col("_b0"),
        )
        b = sided.select(
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
            F.col("_b0").alias("_bucket"),
        )
        if hamming_probe > 0:
            flips = [0]  # XOR masks: identity + every <=r-bit flip
            for r in range(1, min(hamming_probe, len(planes)) + 1):
                for combo in itertools.combinations(range(len(planes)), r):
                    flips.append(sum(2 ** p for p in combo))
            probe = F.explode(
                F.array(*[F.col("_b0").bitwiseXOR(F.lit(m)) for m in flips])
            )
            # distinct XOR masks => distinct probe values per vector
            # => each (id_a, id_b) pair joins at most once (no dedup
            # needed); Hamming distance is symmetric, so probing only
            # the a side finds every pair within distance r.
            a = a.withColumn("_bucket", probe).drop("_b0")
        else:
            a = a.withColumnRenamed("_b0", "_bucket")
        pairs = a.join(b, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = sided.select(
            F.col("_id").alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
        )
        b = sided.select(
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
        )
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # the pair stage is the quadratic part: with planes the dimension
    # is statically known, so the per-pair dot unrolls to one
    # codegen-able expr (bit-identical fold order — see
    # dot_static_cols; measured 1.4s of q36's 2.1s exec was the
    # interpreted fold).  The plane-less all-pairs baseline keeps the
    # HOF fold (dimension unknown without an extra action).
    pair_dot = (
        dot_static_cols("_va", "_vb", len(planes[0]))
        if planes
        else dot(F.col("_va"), F.col("_vb"))
    )
    return (
        pairs.withColumn(
            "cos_sim",
            F.round(pair_dot / (F.col("_na") * F.col("_nb")), 6),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def auto_n_planes(
    n_vectors: int,
    target_bucket_size: int = 1024,
    min_planes: int = 4,
) -> int:
    """Hyperplane count that keeps LSH sign-bucket populations bounded
    as the corpus grows: 2^planes buckets ≈ n / target ⇒ planes =
    ceil(log2(n / target)), floored at ``min_planes``.

    The pair-generation analogue of ``auto_n_cells``: with FIXED
    planes, ``embedding_dup_pairs``' within-bucket candidate set grows
    quadratically in the corpus; one extra plane per doubling keeps
    the expected bucket (and so the per-bucket pair work) constant.
    Each extra plane lowers per-pair recall ~linearly in the angle, so
    pair callers at high plane counts should also probe (hamming_probe)
    or band multiple plane sets — same recall calculus as MinHash-LSH
    bands."""
    import math

    if n_vectors <= target_bucket_size:
        return min_planes
    return max(min_planes, math.ceil(math.log2(n_vectors / target_bucket_size)))


def auto_n_cells(
    n_vectors: int,
    target_cell_size: int = 1024,
    min_cells: int = 16,
) -> int:
    """Cell count that keeps IVF/SemDeDup cell populations BOUNDED as
    the corpus grows: ``max(min_cells, ceil(n / target_cell_size))``.

    Why this matters: SemDeDup's within-cell comparison is quadratic
    in the cell population — with a FIXED n_cells, 100× the corpus
    means 100× the average cell and 10,000× the per-cell pair work.
    Growing n_cells linearly pins the expected population at
    ``target_cell_size``, so total pair work grows linearly with the
    corpus (n/T cells × T² pairs = n·T).  Probe-style ANN readers can
    instead choose target ~ sqrt(n) to balance the n·c assignment
    cost against the n²/c scan cost; for dedup the bounded-population
    rule is the one the SemDeDup recipe assumes."""
    import math

    if n_vectors <= 0:
        return min_cells
    return max(min_cells, math.ceil(n_vectors / target_cell_size))


def ivf_build(
    embeddings: DataFrame,
    n_cells: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    target_cell_size: int = 1024,
    assign: str = "auto",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse index: centroids = a deterministic hash-bucket
    sample of the data (one vector per xxhash64(id) % n_cells bucket
    — reproducible, one distributed hash-aggregate, no count() action
    and no global sort), one assignment pass mapping each vector to
    its nearest centroid.  Within a bucket the representative is the
    min by (xxhash64(id), id) — hash-random, so centroid choice is
    decorrelated from insertion order (raw min-id would bias all
    centroids toward early ids, hurting recall when ids correlate
    with content, e.g. time-ordered inserts).  Empty hash buckets
    yield no centroid, so up to ``n_cells`` centroids are returned.
    ``refine_iters`` optionally polishes the seeds with that many
    distributed spherical-k-means rounds (``ivf_refine``).
    ``n_cells=None`` auto-sizes via ``auto_n_cells`` (one count job):
    cells grow with the corpus so cell populations stay near
    ``target_cell_size`` instead of growing without bound — the
    property SemDeDup's within-cell quadratic step depends on.

    ``assign``: ``"exact"`` (argmax over every centroid — n·c dots,
    the hidden quadratic once auto-sizing grows c with the corpus),
    ``"hierarchical"`` (``ivf_assign_hierarchical``: ~2·sqrt(c) dots
    per row, slightly approximate at super-cell boundaries),
    ``"arrow"`` (``arrow_assigner``: vectorized BLAS matmul per Arrow
    batch — ~27× the hierarchical path at 32k/500 cells, but puts a
    Python stage in the plan), or ``"auto"`` (default): exact while
    the quantizer is small (≤128 cells — exhaustive is both cheap and
    exactly reproducible there), hierarchical beyond (the fastest
    PURE-JVM path; auto never adds Python to a plan uninvited —
    opt into "arrow" explicitly).
    Returns (assigned_df with `cell` column, centroids list)."""
    if assign not in ("auto", "exact", "hierarchical", "arrow"):
        raise ValueError(
            f"assign must be auto|exact|hierarchical|arrow, got {assign!r}"
        )
    if n_cells is None:
        n_cells = auto_n_cells(embeddings.count(), target_cell_size)
    cents = (
        embeddings.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_cells)).alias("_b"),
            F.col(id_col),
            F.col(vec_col),
        )
        .groupBy("_b")
        .agg(
            F.min_by(
                F.struct(id_col, vec_col),
                F.struct(F.xxhash64(F.col(id_col)), F.col(id_col)),
            ).alias("_r")
        )
        .orderBy("_b")
        .select(F.col(f"_r.{id_col}").alias(id_col), F.col(f"_r.{vec_col}").alias(vec_col))
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(cents)]
    # resolve the routing BEFORE refinement: every Lloyd round pays a
    # full assignment, so the choice must apply there too, not just to
    # the final pass (the centroid count is fixed by the seed step, so
    # the auto rule can be decided here)
    if assign == "auto":
        assign = "hierarchical" if len(centroids) > 128 else "exact"
    if refine_iters > 0:  # optional spherical-k-means polish
        centroids = ivf_refine(
            embeddings, centroids, n_iter=refine_iters,
            id_col=id_col, vec_col=vec_col, assign=assign,
        )
    if assign == "arrow":
        return arrow_assigner(centroids, vec_col)(embeddings), centroids
    assign_fn = ivf_assign_hierarchical if assign == "hierarchical" else ivf_assign
    return assign_fn(embeddings, centroids, vec_col=vec_col), centroids


def ivf_refine(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
) -> list[tuple[int, list[float]]]:
    """Spherical-k-means (Lloyd) refinement of the IVF coarse
    quantizer: ``n_iter`` rounds of (assign to argmax-cosine cell,
    centroid := mean of the cell's *normalized* vectors).

    Normalizing before the mean makes each round non-decreasing in the
    mean-cosine objective (the spherical k-means update; cosine is
    scale-invariant in the centroid, so no re-normalization needed).
    Each round is one assignment expression plus one (cell, dim) hash
    aggregate (posexplode → avg) — fully distributed; only the
    n_cells × dim centroid table (KBs) ever reaches the driver.
    Cells that lose every member keep their previous centroid, so the
    cell count and ids are stable.  Deterministic given the seeds.

    ``assign="hierarchical"`` runs each round's assignment through
    ``ivf_assign_hierarchical`` (approximate k-means — the standard
    move once the quantizer is large enough that exact assignment's
    n·c dots dominate; each Lloyd round pays it); ``"arrow"`` uses
    the vectorized BLAS assigner (fastest, Python in the plan)."""
    if assign not in ("exact", "hierarchical", "arrow"):
        raise ValueError(
            f"assign must be exact|hierarchical|arrow, got {assign!r}"
        )

    def assign_fn(df, cents, vec_col=vec_col):
        if assign == "arrow":
            return arrow_assigner(cents, vec_col)(df)
        if assign == "hierarchical":
            return ivf_assign_hierarchical(df, cents, vec_col=vec_col)
        return ivf_assign(df, cents, vec_col=vec_col)

    for _ in range(n_iter):
        assigned = assign_fn(embeddings, centroids, vec_col=vec_col)
        v = F.col(vec_col).cast("array<double>")
        # hoist the norm: an inline l2_norm inside the transform lambda
        # re-folds the array per ELEMENT (O(d²) per row, interpreted)
        unit = F.transform(v, lambda x: x / F.col("_ivf_rn"))
        rows = (
            assigned.withColumn("_ivf_rn", l2_norm(v))
            .select("cell", F.posexplode(unit).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select("cell", F.transform("_pm", lambda s: s["m"]).alias("cvec"))
            .collect()
        )
        means = {r["cell"]: [float(x) for x in r["cvec"]] for r in rows}
        centroids = [(i, means.get(i, vec)) for i, vec in centroids]
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine, ties
    → earliest cell).  Exposed separately from ``ivf_build`` so a
    caller can inject fixed centroids — which makes the probe stage
    deterministic and SQL-oracle-checkable.

    One array_max over (sim, -cell) structs built by a SINGLE
    ``transform`` over the centroid matrix literal: linear expression
    size with one lambda (a per-centroid expression copy costs
    n_cells× the plan-build/analysis time — measured ~2.4s of
    fixed per-job overhead at 16 cells — and a chained when/otherwise
    argmax is exponential).  -cell makes ties pick the earliest
    centroid, matching a first-wins scan.

    Norm handling, all bit-identical to the inline ``cosine()`` form:
    the row's sum-of-squares folds ONCE via ``aggregate``'s finish
    lambda, which binds the folded value as a lambda VARIABLE before
    the per-centroid transform runs — a ``withColumn`` hoist is not
    safe here because CollapseProject inlines a once-referenced alias
    into the consuming lambda, where it would re-fold the norm per
    centroid (verified in the optimized plan; ~2× assignment work).
    ``sqrt(ss)`` inside the inner lambda is one scalar op per
    centroid and yields the identical double to ``l2_norm``; the
    centroid norms are computed driver-side (same left-to-right IEEE
    fold + correctly-rounded sqrt ⇒ identical doubles) and shipped as
    a literal array."""
    return exact_assigner(centroids, vec_col)(embeddings)


def _cell_score_array(
    centroids: list[tuple[int, list[float]]], vec_col: str
) -> Column:
    """The per-row array<struct<sim, neg_cell>> of cosine scores
    against every centroid — the ONE copy of the assignment scoring
    expression (``exact_assigner``'s argmax and the multi-probe
    top-k variant both consume it; a re-rolled copy would be the
    norm-handling drift class the module docstrings warn about).

    One ``transform`` over the centroid matrix literal: linear
    expression size with one lambda.  The row's sum-of-squares folds
    ONCE via ``aggregate``'s finish lambda (a withColumn hoist is
    unsafe: CollapseProject would inline it per centroid).  -cell in
    the struct makes max-ties pick the earliest centroid."""
    import math

    v = F.col(vec_col).cast("array<double>")
    cell_ids = F.expr(
        "array(" + ",".join(str(int(i)) for i, _ in centroids) + ")"
    )
    mat = _lit_double_matrix([[float(x) for x in c] for _, c in centroids])
    norms = _lit_doubles(
        [math.sqrt(sum(float(x) * float(x) for x in c)) for _, c in centroids]
    )
    return F.aggregate(
        F.transform(v, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
        # zero-norm guard (ADVICE r6): a zero vector (or zero
        # centroid) would make every sim 0/0 = NULL — argmax order
        # undefined, and in cluster_prune's ascending keep='far'
        # ranking nulls sort FIRST, retaining zero vectors regardless
        # of keep_frac.  sim=0.0 instead: deterministic assignment
        # (ties → earliest cell), honest "no similarity" score.
        lambda ss: F.transform(
            mat,
            lambda c, j: F.struct(
                F.when(
                    (ss > F.lit(0.0)) & (F.element_at(norms, j + 1) > F.lit(0.0)),
                    dot(v, c) / (F.sqrt(ss) * F.element_at(norms, j + 1)),
                )
                .otherwise(F.lit(0.0))
                .alias("sim"),
                (-F.element_at(cell_ids, j + 1)).alias("neg_cell"),
            ),
        ),
    )


def topk_cells_expr(
    centroids: list[tuple[int, list[float]]], vec_col: str, k: int
) -> Column:
    """array<int> of the row's ``k`` nearest cells, best first (ties
    → earliest cell, matching ``exact_assigner``'s argmax — element 1
    of this array IS the assigned cell).  Shares the scoring
    expression with ``exact_assigner``; used by the multi-probe
    semantic-ingest path to widen the PROBE side past the SemDeDup
    same-cell convention."""
    scored = _cell_score_array(centroids, vec_col)
    top = F.slice(F.reverse(F.array_sort(scored)), 1, k)
    return F.transform(top, lambda s: (-s["neg_cell"]).cast("int"))


def exact_assigner(
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    with_sim: bool = False,
):
    """Factory form of ``ivf_assign``: builds the centroid literals
    and the assignment expression ONCE and returns a ``df -> df``
    closure.  For repeated application — a streaming sink assigning
    every micro-batch against pinned centroids — this avoids
    re-serializing and re-analyzing the c×dim literal per batch.

    ``with_sim=True`` additionally emits ``proto_sim``, the cosine to
    the assigned centroid — already computed inside the argmax struct,
    so exposing it is free (``cluster_prune`` consumes it)."""
    scored = _cell_score_array(centroids, vec_col)
    best = F.array_max(scored)
    cell = (-best["neg_cell"]).cast("int")

    if with_sim:
        # one best-struct column, fields projected from it — NOT two
        # independent array_max copies of the scored expression
        def apply(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("_best", best)
                .withColumn("cell", (-F.col("_best.neg_cell")).cast("int"))
                .withColumn("proto_sim", F.col("_best.sim"))
                .drop("_best")
            )

        return apply

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn("cell", cell)

    return apply


def ivf_assign_hierarchical(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    n_super: int | None = None,
    n_probe_super: int = 2,
) -> DataFrame:
    """Two-level (coarse → fine) cell assignment: route each vector to
    its nearest of ~sqrt(c) SUPER-cells, then argmax-cosine over only
    that super-cell's member centroids.  Same output schema as
    ``ivf_assign`` (input + `cell`).

    WHY THIS EXISTS: exact ``ivf_assign`` costs c dots per row, and
    the bounded-population rule (``auto_n_cells``) grows c linearly
    with the corpus — so exact assignment is the HIDDEN quadratic of
    SemDeDup at scale, O(n²/target) total dots (measured: 8k vectors /
    125 cells assign+pair ≈ 21s where 2k/32 ≈ 4s; 32k/500 did not
    finish a bench window).  Two-level routing costs n_super +
    max-members dots per row ≈ 2·sqrt(c): at a million cells that is
    ~2·10³ dots/row instead of 10⁶ — total work O(n·sqrt(n)), the
    standard IVF/IMI answer.

    APPROXIMATE by design: a vector whose true nearest centroid sits
    outside its ``n_probe_super`` nearest super-cells is routed to the
    best member of those probed groups instead (the same boundary
    tradeoff as IVF probing itself).  Probing the top-2 supers
    (default) is the IMI-style recall fix — near-boundary vectors
    check both adjacent groups for ~one extra member-group of dots —
    and pins agreement with exact assignment ≥95% on clustered data
    in tests.  Use exact ``ivf_assign`` when c is small (the
    oracle-checked registered rows do) or when exactness matters more
    than the n² term.

    Construction is deterministic: super-cells come from a driver-side
    spherical k-means over the CENTROID table (c·n_super numpy flops
    per iteration — the centroid table is driver-resident by
    construction, and at a million cells this is ~a second of driver
    work), seeded by every ceil(c/n_super)-th centroid.  K-means
    supers matter: a raw stratified subset has no geometric structure
    over an unclustered centroid set, and routing through it can miss
    the true centroid's group entirely (observed 0.93-vs-0.30 cosine
    blunders); cluster centers of the centroid set bound the miss to
    genuine boundary cases.  The expression is one transform per
    level over single-parse literals of UNIT vectors (cosine argmax ≡
    dot argmax, so no norm arrays ship at all), with the sorted
    level-1 ranking as the only hoisted column — see the in-body
    comment for why the member scan must only touch its own struct
    element (CollapseProject inlines once-referenced aliases INTO HOF
    lambdas, turning a 'hoist' into per-element re-evaluation)."""
    return hierarchical_assigner(centroids, vec_col, n_super, n_probe_super)(
        embeddings
    )


def _super_layout(
    centroids: list[tuple[int, list[float]]],
    n_super: int | None = None,
) -> tuple[list[list[float]], list[list[tuple[int, list[float]]]]]:
    """Driver-side two-level layout shared by ``hierarchical_assigner``
    and the hierarchical ``probe_cells`` route: spherical-k-means the
    UNIT centroids into ~sqrt(c) super-cells (deterministic stratified
    seeds, 4 polish rounds) and return (unit super vectors, member
    groups of (cell_id, unit_vec)); empty supers drop out."""
    import math

    import numpy as np

    if not centroids:
        raise ValueError("hierarchical layout needs centroids")
    c = len(centroids)
    if n_super is None:
        n_super = max(1, round(math.sqrt(c)))
    step = math.ceil(c / n_super)

    cmat = np.asarray([vec for _, vec in centroids], dtype=np.float64)
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cunit = cmat / norms
    smat_np = cunit[::step].copy()  # deterministic stratified seeds
    for _ in range(4):  # spherical k-means polish of the super level
        sn = np.linalg.norm(smat_np, axis=1, keepdims=True)
        sn[sn == 0] = 1.0
        asg = (cunit @ (smat_np / sn).T).argmax(axis=1)  # ties → first
        for s in range(len(smat_np)):
            grp = cunit[asg == s]
            if len(grp):
                smat_np[s] = grp.mean(axis=0)
    sn = np.linalg.norm(smat_np, axis=1, keepdims=True)
    sn[sn == 0] = 1.0
    asg = (cunit @ (smat_np / sn).T).argmax(axis=1)

    members: list[list[tuple[int, list[float]]]] = []
    super_unit: list[list[float]] = []
    for s in range(len(smat_np)):
        grp = [
            (centroids[i][0], [float(x) for x in cunit[i]])
            for i in range(c)
            if asg[i] == s
        ]
        if grp:  # empty supers (all members claimed elsewhere) drop out
            members.append(grp)
            u = smat_np[s] / (np.linalg.norm(smat_np[s]) or 1.0)
            super_unit.append([float(x) for x in u])
    return super_unit, members


def _member_structs_literal(
    members: list[list[tuple[int, list[float]]]],
):
    """array<array<struct<cid:int, uvec:array<double>>>> literal in
    one parse (see _lit_doubles for why literals, not F.lit)."""
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                f"named_struct('cid', {int(cid)}, 'uvec', array("
                + ",".join(f"{x!r}D" for x in uvec)
                + "))"
                for cid, uvec in g
            )
            + ")"
            for g in members
        )
        + ")"
    )


def hierarchical_assigner(
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    n_super: int | None = None,
    n_probe_super: int = 2,
    with_sim: bool = False,
):
    """Factory form of ``ivf_assign_hierarchical``: runs the
    driver-side super-cell k-means and builds the two-level expression
    ONCE, returning a ``df -> df`` closure.  A streaming sink applying
    the same pinned quantizer to every micro-batch must not pay the
    k-means plus the c×dim literal serialization/analysis per batch."""
    if not centroids:
        raise ValueError("ivf_assign_hierarchical needs centroids")
    super_unit, members = _super_layout(centroids, n_super)

    # UNIT member/super vectors, zipped with their ids into structs.
    # Two hard-won expression rules (the naive hoist-into-withColumn
    # version of this function ran 25× SLOWER than exact assignment):
    # 1. argmax over cosine == argmax over dot with UNIT vectors — the
    #    row norm and the centroid norms divide out of the ordering,
    #    so normalize driver-side and ship NO norm arrays at all;
    # 2. a hoisted column referenced ONCE is inlined by
    #    CollapseProject, and if that reference sits inside a HOF
    #    lambda the inlined expression re-evaluates PER ELEMENT —
    #    so the member scan must only touch its OWN element (a
    #    struct carrying {cid, uvec}), never index an outer array
    #    through a "hoisted" alias.

    v = F.col(vec_col).cast("array<double>")
    smat = _lit_double_matrix(super_unit)
    mstructs = _member_structs_literal(members)

    probe = min(max(1, n_probe_super), len(members))
    # level 1: dot against UNIT supers (cosine argmax ≡ dot argmax) —
    # sorted ascending by (sim, neg_s), so element_at(-k) is the k-th
    # best super with ties preferring the earlier one
    lvl1 = F.array_sort(
        F.transform(
            smat,
            lambda s, j: F.struct(dot(v, s).alias("sim"), (-j).alias("neg_s")),
        )
    )
    picks = [
        (-F.element_at(F.col("_l1"), -k)["neg_s"] + 1) for k in range(1, probe + 1)
    ]
    # the transform INPUT is evaluated once per row (only the lambda
    # body runs per element), so the concat of the probed member
    # groups is safe to inline here
    msub = F.concat(*[F.element_at(mstructs, p) for p in picks])
    lvl2 = F.transform(
        msub,
        lambda m: F.struct(
            dot(v, m["uvec"]).alias("sim"),
            (-m["cid"]).alias("neg_cell"),
        ),
    )
    best = F.array_max(lvl2)
    cell = (-best["neg_cell"]).cast("int")

    if with_sim:
        # lvl2 sims are dots against UNIT centroids, so the cosine to
        # the chosen cell is best.sim / ||v|| — row norm folded once
        # (aggregate-finish); _best is referenced twice, so
        # CollapseProject keeps it (the exact_assigner shape)
        def apply(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("_l1", lvl1)
                .withColumn("_best", best)
                .withColumn("cell", (-F.col("_best.neg_cell")).cast("int"))
                .withColumn(
                    "proto_sim",
                    F.aggregate(
                        F.transform(v, lambda x: x * x),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                        # zero-norm guard (ADVICE r6): 0/0 → NULL
                        # would sort FIRST in cluster_prune's
                        # ascending keep='far' ranking; 0.0 is the
                        # honest no-similarity score
                        lambda ss: F.when(
                            ss > F.lit(0.0), F.col("_best.sim") / F.sqrt(ss)
                        ).otherwise(F.lit(0.0)),
                    ),
                )
                .drop("_l1", "_best")
            )

        return apply

    def apply(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_l1", lvl1)
            .withColumn("cell", cell)
            .drop("_l1")
        )

    return apply


def arrow_assigner(
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
):
    """Vectorized (Arrow/BLAS) cell assignment: a ``pandas_udf`` that
    matmuls each record batch against the captured unit-centroid
    matrix — the third rung of the assignment ladder:

    - ``exact_assigner``: JVM expression, bit-reproducible, c dots per
      row interpreted — right for small quantizers (the oracle-checked
      registered rows; ivf_build keeps it to ≤128 cells).
    - ``hierarchical_assigner``: ~2·sqrt(c) dots per row — kills the
      n·c quadratic once ``auto_n_cells`` grows c with the corpus.
    - this: one ``V @ C.T`` per Arrow batch (SIMD BLAS, ~100× the
      per-dot throughput of interpreted HOFs) — right when Python in
      the plan is acceptable and c·dim outgrows what expression
      literals should carry (the c×dim matrix rides along with the
      serialized udf: fine to ~10⁵×10³; beyond that, broadcast it
      explicitly).  NOT used by any registered plan — the §2.9
      zero-Python-UDF audit stays intact; this is the operator-level
      scale path, like the multimodal Arrow decode.

    Semantics match ``ivf_assign``: argmax cosine (dot against UNIT
    centroids — scale-invariant), ties to the earliest cell
    (np.argmax returns the first maximum and the matrix is in cell-id
    order).  BLAS pairwise summation can differ from the sequential
    JVM fold in the last ulp, so exact-tie rows MAY route differently
    — the same class of boundary approximation as the hierarchical
    path, and why registered rows keep the exact assigner."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray([vec for _, vec in centroids], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    ids = np.asarray([int(i) for i, _ in centroids], dtype=np.int64)

    @pandas_udf("int")
    def _assign(batch: pd.Series) -> pd.Series:
        if not len(batch):
            return pd.Series([], dtype="int32")
        v = np.stack(batch.to_numpy()).astype(np.float64)
        sims = v @ unit.T
        return pd.Series(ids[np.argmax(sims, axis=1)]).astype("int32")

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn("cell", _assign(F.col(vec_col)))

    return apply


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells to the query, exact-score
    within them.  Partition the assigned table by `cell` on write and
    the probe becomes partition pruning at 100 TB."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    ranked = sorted(centroids, key=lambda c: -cos(c[1], query_vec))
    probe = [c[0] for c in ranked[:n_probe]]
    return brute_force_topk(
        assigned.filter(F.col("cell").isin(probe)), query_vec, k, id_col, vec_col
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: (scale float, q
    array<tinyint>) with q_i = round(x_i / scale), scale =
    max|x| / 127.  4× smaller embedding storage — at 100 TB of
    vectors that is the difference between one copy and four — at
    <1% cosine-similarity error for typical embedding distributions
    (recall preservation tested).  Pure array expressions; all-zero
    vectors quantize to scale=0 / all-zero q.

    The abs-max fold runs ONCE via ``aggregate``'s finish lambda (the
    truncate_normalize/ivf_assign shape): embedding the ``absmax``
    expression inside the quantizing transform would re-run the fold
    per ELEMENT — O(d²) per row, interpreted.  Same arithmetic
    (``x / (am/127)``), so outputs are bit-identical."""
    return F.aggregate(
        F.transform(vec, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
        lambda am: F.struct(
            (am / F.lit(127.0)).cast("float").alias("scale"),
            F.when(
                am > 0,
                F.transform(
                    vec,
                    lambda x: F.round(x / (am / F.lit(127.0))).cast("tinyint"),
                ),
            )
            .otherwise(F.transform(vec, lambda x: F.lit(0).cast("tinyint")))
            .alias("q"),
        ),
    )


def dequantize_int8(qstruct: Column) -> Column:
    """Inverse of quantize_int8: array<float> ≈ the original vector.

    Pass a MATERIALIZED struct column (the stored quantized vector),
    not a nested ``quantize_int8(...)`` expression: the lambda reads
    ``qstruct["scale"]`` per element, which is O(1) on a column but
    would re-run the whole quantization per element on an inline
    expression (the HOF re-evaluation rule in SCALE.md)."""
    return F.transform(
        qstruct["q"], lambda x: (x.cast("float") * qstruct["scale"]).cast("float")
    )


def semantic_dup_pairs(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hierarchical_assign: bool = False,
    assigner=None,
    scope=None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023, public): cluster embeddings with the IVF coarse quantizer,
    then compare cosine WITHIN each cluster only — (id_a, id_b, cell,
    cos_sim) for rounded cosine ≥ threshold, id_a < id_b.

    Scale: the quadratic all-pairs step is bounded per cell (the
    SemDeDup tradeoff — n_cells grows with the corpus, cell
    populations stay bounded), the self-join is an equi-join on
    ``cell`` so Spark buckets it, and the cross-cell pairs SemDeDup
    deliberately ignores are exactly the ones the clustering deems
    unrelated.  With injected (pinned) centroids the whole pipeline
    is deterministic and SQL-oracle-checkable like q44's IVF probe.

    ``hierarchical_assign=True`` routes assignment through
    ``ivf_assign_hierarchical`` — the O(n·sqrt(c)) two-level path for
    corpora where ``auto_n_cells`` makes the cell count itself large
    (exact assignment is n·c dots, the hidden quadratic; see that
    function's docstring).  Slightly approximate at super-cell
    boundaries, so the oracle-checked registered row keeps the exact
    default."""
    if assigner is not None:
        # caller-supplied df -> df assignment closure — e.g.
        # arrow_assigner(centroids) for the BLAS path, or a
        # pre-built exact/hierarchical assigner reused across calls
        assigned = assigner(embeddings)
    else:
        assign = ivf_assign_hierarchical if hierarchical_assign else ivf_assign
        assigned = assign(embeddings, centroids, vec_col=vec_col)
    # per-SIDE norm columns: the pair stage is the quadratic part, and
    # cosine()'s inline norms would re-fold both arrays for every pair
    # (interpreted HOFs — no codegen subexpression elimination).
    # dot/( _na * _nb ) is the same arithmetic in the same order as
    # cosine(), so results (and the 6dp oracle hash) are bit-identical;
    # the norms are just computed n times instead of n²/cells times.
    v = F.col(vec_col).cast("array<double>")
    # repartition on the join key BEFORE branching the self-join: the
    # assignment expression is evaluated going INTO the exchange
    # (instead of once per join branch), the join inherits the
    # co-location, and AQE picks the strategy unhinted (broadcast at
    # test scale, shuffled-hash at corpus scale) — measured ~2x on the
    # q56 pipeline
    sided = (
        assigned.select("cell", F.col(id_col).alias("_id"), v.alias("_v"))
        .withColumn("_n", l2_norm(F.col("_v")))
        .repartition(F.col("cell"))
    )
    if scope is not None:
        # caller-owned persist of the assigned relation (the
        # materialized cluster-assignment table of the SemDeDup
        # recipe): both join branches read one copy, and the
        # optimizer's inferred isnotnull(cell) join-key filter tests
        # the STORED cell instead of re-deriving the full argmax
        # assignment expression inside the scan filter (measured: one
        # extra interpreted n_cells×dim HOF pass per row per side at
        # sf0.1 — ~0.4s of q56's exec)
        sided = scope.persist(sided)
    a = sided.select(
        "cell",
        F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = sided.select(
        "cell",
        F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    # statically-known dimension (from the centroids) routes the
    # per-pair dot through the codegen-able unrolled form — the
    # within-cell pair stage is the quadratic part (see
    # dot_static_cols; bit-identical fold order)
    dim = len(centroids[0][1]) if centroids else 0
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                dot_static_cols("_va", "_vb", dim)
                / (F.col("_na") * F.col("_nb")),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cell", "cos_sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hierarchical_assign: bool = False,
) -> DataFrame:
    """Rows of ``embeddings`` surviving semantic dedup: within-cell
    cosine-near groups resolved to connected components (the pair
    relation is not transitive; component resolution keeps exactly
    one representative per chained near-set) and only each group's
    minimum id kept.  Vectors in no near-pair survive untouched."""
    from wrds_data_pipeline_spark.operators.components import (
        dedup_keep_canonical,
    )

    pairs = semantic_dup_pairs(
        embeddings, centroids, threshold, id_col, vec_col,
        hierarchical_assign=hierarchical_assign,
    )
    return dedup_keep_canonical(embeddings, pairs, id_col=id_col)


def truncate_normalize(vec: Column, dim: int) -> Column:
    """Matryoshka-style truncation: first ``dim`` components,
    re-normalized to unit L2 (public MRL usage: nested prefixes of a
    trained embedding remain usable at lower cost).  Pure array
    expressions — row-local; all-zero prefixes come back all-zero
    instead of NaN.

    Shape: the sum-of-squares fold runs ONCE via ``aggregate``'s
    finish lambda, which binds the folded value as a lambda variable
    before the inner ``transform`` iterates — an inline ``l2_norm``
    in the transform body would re-fold the prefix per ELEMENT
    (O(dim²) per row, interpreted: HOFs get no codegen subexpression
    elimination).  Same left-to-right IEEE fold + sqrt as ``l2_norm``,
    so outputs are bit-identical to the previous form."""
    t = F.slice(vec.cast("array<double>"), 1, dim)
    return F.aggregate(
        t,
        F.lit(0.0),
        lambda acc, x: acc + x * x,
        lambda ss: F.when(
            ss > 0, F.transform(t, lambda x: x / F.sqrt(ss))
        ).otherwise(t),
    )


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(group, embedding, n_members): per-group mean of embedding
    vectors — the chunk→document pooling step when long documents are
    embedded chunk-wise (chunk_documents → encode → pool).

    Scale: posexplode → (group, pos) hash-aggregate with map-side
    combine — one shuffle of (group × dim) scalar rows, state bounded
    by dim; the re-assembly collect_list is per (group), bounded by
    dim elements.  Same shape as ivf_refine's centroid update."""
    v = F.col(vec_col).cast("array<double>")
    rows = (
        df.select(F.col(group_col).alias("_g"), F.posexplode(v).alias("pos", "x"))
        .groupBy("_g", "pos")
        .agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("_n"))
    )
    pooled = (
        rows.groupBy("_g")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"),
            # max, not first: with ragged member lengths (caller bug)
            # per-position counts differ and first() would be
            # nondeterministic — max reports the true member count
            # (the count at position 0, which every member has)
            F.max("_n").alias("n_members"),
        )
        .select(
            F.col("_g").alias(group_col),
            F.transform("_pm", lambda s: s["m"]).alias(vec_col),
            "n_members",
        )
    )
    if normalize:
        vv = F.col(vec_col)
        pooled = (
            pooled.withColumn("_pool_n", l2_norm(vv))
            .withColumn(
                vec_col,
                F.when(
                    F.col("_pool_n") > 0,
                    F.transform(vv, lambda x: x / F.col("_pool_n")),
                ).otherwise(vv),
            )
            .drop("_pool_n")
        )
    return pooled


def cluster_prune(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    keep_frac: float = 0.5,
    keep: str = "far",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "auto",
) -> DataFrame:
    """Prototype-based diversity pruning (the D4 / SSL-prototypes
    recipe, both public: rank each cluster's members by cosine to
    their prototype and drop the redundant end): keep ``ceil(
    keep_frac * |cell|)`` members per IVF cell.

    ``keep="far"`` keeps the members FARTHEST from the prototype —
    prototypical near-center points are semantic redundancy once
    SemDeDup has removed true near-dups; ``keep="near"`` keeps the
    closest — outlier pruning for noisy corpora.  Ties and exact
    duplicates break on id, so the result is deterministic.

    Scale: assignment follows ``ivf_build``'s routing rule —
    ``assign="auto"`` uses the exact expression up to 128 cells and
    the two-level hierarchical expression beyond (``auto_n_cells``
    grows the cell count with the corpus, so a pinned exact assigner
    would reintroduce the n·c quadratic this family already killed
    twice); the ranking window partitions by ``cell``, whose
    population ``auto_n_cells`` keeps bounded (~64), and the per-cell
    quota comes from a count over the SAME partition — one corpus
    shuffle total, no second aggregate-join round trip."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near': {keep!r}")
    if assign not in ("auto", "exact", "hierarchical"):
        raise ValueError(f"unknown assign: {assign!r}")
    use_hier = assign == "hierarchical" or (
        assign == "auto" and len(centroids) > 128
    )
    assigner = (
        hierarchical_assigner(centroids, vec_col, with_sim=True)
        if use_hier
        else exact_assigner(centroids, vec_col, with_sim=True)
    )
    scored = assigner(embeddings)
    order = (
        [F.asc("proto_sim"), F.asc(id_col)]
        if keep == "far"
        else [F.desc("proto_sim"), F.asc(id_col)]
    )
    w = W.partitionBy("cell").orderBy(*order)
    wc = W.partitionBy("cell")
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rank") <= F.ceil(F.col("_n") * F.lit(keep_frac)))
        .drop("_rank", "_n")
    )


def probe_cells(
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    n_probe: int = 4,
    route: str = "auto",
) -> Column:
    """array<int>: the ``n_probe`` cells nearest the row's vector by
    cosine, best first (ties → earlier cell id) — the PROBE-SET
    expression, so a batch of queries computes its IVF probe map
    distributed (explode this) instead of ranking centroids per query
    in a driver loop.

    ``route``: ``"flat"`` ranks every centroid (exact; ordering
    matches the driver-side ``sorted(cents, key=-cos)`` convention
    exactly — dot/‖c‖ is cosine ordering for a fixed row, the
    (sim, -cell) struct sort prefers the earlier cell on ties, and
    the all-zero-vector row gets the lowest cell ids like the stable
    driver sort).  ``"hier"`` routes through ~sqrt(c) super-cells
    first (the ``hierarchical_assigner`` layout: rank supers, rank
    only the probed supers' members) — approximate like hierarchical
    assignment, but ~2·sqrt(c) dots per row instead of c, which is
    the difference between linear and quadratic total probe work once
    ``auto_n_cells`` grows the quantizer with the corpus.  ``"auto"``
    (default) follows the assignment ladder's rule: flat ≤ 128 cells,
    hierarchical beyond."""
    import math

    if route not in ("auto", "flat", "hier"):
        raise ValueError(f"probe_cells route must be auto/flat/hier: {route}")
    if route == "auto":
        route = "hier" if len(centroids) > 128 else "flat"
    n_probe = min(max(1, n_probe), len(centroids))
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")

    if route == "hier":
        super_unit, members = _super_layout(centroids)
        smat = _lit_double_matrix(super_unit)
        mstructs = _member_structs_literal(members)
        # probe enough supers that the member pool comfortably holds
        # n_probe cells (supers hold ~sqrt(c) members each)
        min_members = min(len(g) for g in members)
        n_super_probe = 2
        while (
            n_super_probe < len(members)
            and n_super_probe * min_members < n_probe
        ):
            n_super_probe += 1
        lvl1 = F.array_sort(
            F.transform(
                smat,
                lambda s, j: F.struct(
                    dot(v, s).alias("sim"), (-j).alias("neg_s")
                ),
            )
        )
        picks = [
            (-F.element_at(lvl1, -k)["neg_s"] + 1)
            for k in range(1, n_super_probe + 1)
        ]
        msub = F.concat(*[F.element_at(mstructs, p) for p in picks])
        ranked = F.array_sort(
            F.transform(
                msub,
                lambda m: F.struct(
                    dot(v, m["uvec"]).alias("sim"),
                    (-m["cid"]).alias("neg_cell"),
                ),
            )
        )
        # best at the END of the ascending sort; slice past the array
        # length just returns what exists
        return F.transform(
            F.slice(F.reverse(ranked), 1, n_probe),
            lambda m: (-m["neg_cell"]).cast("int"),
        )

    mat = _lit_double_matrix([[float(x) for x in c] for _, c in centroids])
    cell_ids = F.expr(
        "array(" + ",".join(str(int(i)) for i, _ in centroids) + ")"
    )
    norms = _lit_doubles(
        [math.sqrt(sum(float(x) * float(x) for x in c)) for _, c in centroids]
    )
    ranked = F.array_sort(
        F.transform(
            mat,
            lambda c, j: F.struct(
                F.when(
                    F.element_at(norms, j + 1) > 0,
                    dot(v, c) / F.element_at(norms, j + 1),
                )
                .otherwise(F.lit(0.0))
                .alias("sim"),
                (-F.element_at(cell_ids, j + 1)).alias("neg_cell"),
            ),
        )
    )
    # ascending sort ⇒ best sits at the END; equal sims put the larger
    # neg_cell (smaller cell id) later, so element_at(-k) prefers the
    # earlier cell on ties — the stable-sort convention
    return F.transform(
        F.sequence(F.lit(1), F.lit(n_probe)),
        lambda k: (-F.element_at(ranked, -k)["neg_cell"]).cast("int"),
    )
