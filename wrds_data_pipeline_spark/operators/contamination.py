"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark corpus by shared word n-grams.

The standard hygiene step before training on web-scale corpora (the
GPT-3 / Gopher / Llama reports all describe n-gram-overlap filters,
all public): any training document containing a long-enough n-gram
that also appears in a held-out benchmark is flagged (and usually
dropped) so eval numbers aren't inflated by memorized test items.

Scale design:
- Benchmark side first collapses to a DISTINCT int64 n-gram hash set
  — benchmarks are tiny relative to the corpus (thousands of items vs
  billions of docs), so this relation is broadcast-joined; the 100 TB
  training side is never shuffled.
- Training side explodes to (doc, hash) pairs, map-side-combines the
  per-doc distinct count, and left-joins the broadcast benchmark set.
  One wide scan, zero corpus shuffles beyond the per-doc aggregate.
- Hashing is the 60-bit md5-prefix form (dedup.shingle_hash_wide):
  membership here is EXACT, so the mod-1e9+7 MinHash space would
  false-hit clean documents at corpus scale.  Still has an exact
  DuckDB twin (no modulus, same 15-hex-char cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.text import word_shingles
from wrds_data_pipeline_spark.operators.dedup import (
    _shingled,
    shingle_hash_wide,
)


def benchmark_ngram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct hashed n-grams of the benchmark corpus: one column
    ``h`` (int64).  Small by construction — broadcast it."""
    return (
        benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("shingle")
        )
        .select(shingle_hash_wide(F.col("shingle")).alias("h"))
        .distinct()
    )


def auto_bloom_params(
    n_ref: int, bits_per_key: int = 12, max_bits: int = 1 << 26
) -> tuple[int, int]:
    """(m_bits, n_hashes) for a reference set of ``n_ref`` keys.

    ``m`` is the next power of two ≥ n_ref × bits_per_key (power of
    two ⇒ the mod is a bitmask and double hashing with an odd step
    has full period); ``n_hashes`` is the fpp-optimal ln2·m/n,
    clamped to [1, 8].  12 bits/key ⇒ ~0.3% fpp at the optimum.
    Beyond ``max_bits`` (default 2^26 = 8 MB of bitset) the honest
    answer is ``strategy='shuffle'`` — fail loudly rather than build
    a bloom whose fpp silently degrades."""
    if n_ref < 1:
        raise ValueError("auto_bloom_params needs n_ref >= 1")
    m = 64
    while m < n_ref * bits_per_key:
        m <<= 1
    if m > max_bits:
        raise ValueError(
            f"bloom bitset would need {m} bits for {n_ref} reference "
            f"n-grams (> max_bits={max_bits}); use strategy='shuffle' "
            "for reference sets this large"
        )
    k = max(1, min(8, round(0.6931 * m / n_ref)))
    return m, k


# fixed, arbitrary seeds for the two independent bloom probe hashes
_BLOOM_SEED1 = -6_700_417
_BLOOM_SEED2 = 9_176_271


def _bloom_positions(h: F.Column, m_bits: int, n_hashes: int) -> F.Column:
    """array<bigint> of the k probe bit-positions of ``h``:
    Kirsch-Mitzenmacher double hashing, position_j = h1 + j·h2 (mod
    m).  h2 is forced odd so the walk has full period over the
    power-of-two bitset.  The two xxhash64 evaluations are bound ONCE
    via the aggregate-finish shape — referenced from inside the
    per-j lambda they would re-evaluate per probe (SCALE.md's
    CollapseProject/HOF trap; 2 hashes per gram, not 2k)."""
    mask = F.lit(m_bits - 1).cast("long")
    # reduce mod m BEFORE combining: (h1 + j·h2) mod m is identical
    # computed from the masked halves (m is a power of two), and the
    # masked arithmetic fits in 31 bits — no wrap, so the expression
    # is ANSI-safe without try_add's null-on-overflow semantics
    h1 = F.xxhash64(F.lit(_BLOOM_SEED1).cast("long"), h).bitwiseAND(mask)
    h2 = (
        F.xxhash64(F.lit(_BLOOM_SEED2).cast("long"), h)
        .bitwiseOR(F.lit(1).cast("long"))
        .bitwiseAND(mask)
    )
    return F.aggregate(
        F.array(F.struct(h1.alias("a"), h2.alias("b"))),
        F.array().cast("array<bigint>"),
        lambda _, s: F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda j: (s["a"] + j.cast("long") * s["b"]).bitwiseAND(mask),
        ),
    )


def bloom_reference_bits(
    reference_hashes: DataFrame, m_bits: int, n_hashes: int
) -> DataFrame:
    """ONE row holding the dense bloom bitset (``_bits``:
    array<bigint>, length m_bits/64) for the ``h`` column of
    ``reference_hashes``.

    Built without any driver round-trip: explode the k probe
    positions, bit_or per 64-bit word (map-side combined), then
    assemble the dense array by LEFT-JOINING a ``range(m/64)`` word
    spine (missing words → 0) and collecting the sorted (word, bits)
    structs in one final aggregate.  NOT a map lookup per element:
    Spark's MapData has no hash index — ``element_at(map, k)`` is a
    linear scan, so a map-based gap-fill is O((m/64)²) and measured
    to hang outright at 2^23 bits."""
    if m_bits % 64 != 0 or m_bits < 64 or (m_bits & (m_bits - 1)) != 0:
        raise ValueError(f"m_bits must be a power of two >= 64: {m_bits}")
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1, 16]: {n_hashes}")
    pos = reference_hashes.select(
        F.explode(
            _bloom_positions(F.col("h"), m_bits, n_hashes)
        ).alias("_pos")
    )
    words = pos.select(
        F.shiftrightunsigned(F.col("_pos"), 6).alias("_w"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.col("_pos").bitwiseAND(F.lit(63).cast("long")).cast("int"),
        ).alias("_b"),
    ).groupBy("_w").agg(F.bit_or("_b").alias("_bits"))
    spine = reference_hashes.sparkSession.range(m_bits // 64).select(
        F.col("id").alias("_w")
    )
    # broadcast the sparse side: both relations are bitset-sized
    # (≤ m/64 rows ⇒ ≤ 16 MB at the 2^26-bit cap), and the hint keeps
    # even the BUILD plan free of shuffle joins
    return (
        spine.join(F.broadcast(words), "_w", "left")
        .select(
            "_w",
            F.coalesce(F.col("_bits"), F.lit(0).cast("long")).alias("_bits"),
        )
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_w", "_bits"))),
                lambda s: s["_bits"],
            ).alias("_bits")
        )
    )


def _lit_longs(vals: list[int]) -> F.Column:
    """array<bigint> literal in ONE py4j round-trip (the
    similarity._lit_doubles pattern: F.lit(list) round-trips the
    gateway per element)."""
    if not vals:
        raise ValueError("_lit_longs needs a non-empty list")
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def _bloom_might_contain(
    h: F.Column, bits: F.Column, m_bits: int, n_hashes: int
) -> F.Column:
    """True iff all k probe bits of ``h`` are set in ``bits`` (the
    dense array<bigint> bitset).  May be true for absent keys (the
    bloom fpp); never false for present ones.

    ``bits`` must be a LITERAL array, not a joined/broadcast column:
    higher-order functions are codegen-fallback, and an array
    ATTRIBUTE referenced from inside the probe lambda re-materializes
    per row — measured ~100µs/row at a 1 MB bitset (~50× the whole
    probe) against ~2µs/row with the literal, which binds once in
    the expression tree (tools/scale_rehearsal.py --bloom exposed
    this; the same class as SCALE.md's CollapseProject/HOF trap but
    for join-produced attributes)."""
    return F.forall(
        _bloom_positions(h, m_bits, n_hashes),
        lambda pos: F.element_at(
            bits, (F.shiftrightunsigned(pos, 6) + 1).cast("int")
        ).bitwiseAND(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                pos.bitwiseAND(F.lit(63).cast("long")).cast("int"),
            )
        )
        != 0,
    )


def short_benchmark_item_hashes(
    benchmark: DataFrame, bench_text_col: str = "text", n: int = 8
) -> DataFrame:
    """(t, h): whole-item hashes of benchmark items SHORTER than the
    ``n``-token window, t = the item's token count — the signature
    relation for the sub-window coverage pass.

    An item under ``n`` tokens has no ``n``-gram at all, so inside a
    longer document it is invisible to every mode at width ``n`` (many
    benchmark answers are 2–5 tokens).  The precise remedy is NOT a
    globally smaller ``n`` (which would flag every doc sharing a
    common bigram with any long item): a leak of a short item is the
    FULL item appearing verbatim, i.e. a width-t window equal to the
    whole item — so each short item contributes exactly one signature
    at its own width.  Tiny by construction — broadcast it."""
    from wrds_data_pipeline_spark.functions.text import normalize

    nt = benchmark.select(normalize(bench_text_col).alias("_nt")).filter(
        F.col("_nt").isNotNull() & (F.col("_nt") != "")
    )
    return (
        nt.select(
            F.size(F.split("_nt", " ")).alias("t"),
            shingle_hash_wide(F.col("_nt")).alias("h"),
        )
        .filter(F.col("t") < n)
        .distinct()
    )


def _doc_windows_at_widths(
    docs: DataFrame, id_col: str, text_col: str, widths: list[int]
) -> DataFrame:
    """(_id, t, h): md5-wide hashes of every t-token window of every
    doc, for each t in ``widths`` — ONE tokenize pass for all widths
    (the token array is bound once; an unbound reference inside the
    per-width lambdas would re-tokenize per width — the
    CollapseProject/HOF trap).

    Deliberately parallel to ``spans.span_windows_multi`` (the scrub
    side's fused scan), NOT shared with it: drop mode must hash with
    ``normalize`` + ``shingle_hash_wide`` (md5) to join the same
    signature family as ``decontaminate``'s n-gram relation, while the
    scrub side hashes xxhash64 over raw lowered token slices and needs
    window POSITIONS for the cut arrays.  Unifying them would force
    one mode through the other's hash family and break its oracle."""
    from wrds_data_pipeline_spark.functions.text import _bound, tokens

    w_struct = "array<struct<t:int,s:string>>"

    def windows(tk):
        # width captured via a factory: a two-arg transform lambda
        # would make PySpark bind the second parameter to the ARRAY
        # INDEX, silently shadowing the width default
        def one_width(t):
            return lambda i: F.struct(
                F.lit(t).alias("t"),
                F.concat_ws(" ", F.slice(tk, i, t)).alias("s"),
            )

        return F.flatten(
            F.array(
                *[
                    F.when(
                        F.size(tk) >= t,
                        F.transform(
                            F.sequence(F.lit(1), F.size(tk) - (t - 1)),
                            one_width(t),
                        ),
                    ).otherwise(F.array().cast(w_struct))
                    for t in widths
                ]
            )
        )

    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(par, F.col(id_col))
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                _bound(tokens(text_col), F.array().cast(w_struct), windows)
            ).alias("_w"),
        )
        .select(
            "_id",
            F.col("_w.t").alias("t"),
            shingle_hash_wide(F.col("_w.s")).alias("h"),
        )
    )


def short_item_hit_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame | None:
    """Distinct ids of docs containing ANY whole sub-window benchmark
    item (see ``short_benchmark_item_hashes``) — the drop-mode side of
    short-item coverage.  Returns None when the benchmark has no
    short items (determined by one plan-build job over the tiny
    benchmark — the pinned-centroid precedent), so the common all-
    items-long case adds NOTHING to the corpus plan."""
    short = short_benchmark_item_hashes(benchmark, bench_text_col, n)
    widths = sorted(r["t"] for r in short.select("t").distinct().collect())
    if not widths:
        return None
    grams = _doc_windows_at_widths(docs, id_col, text_col, widths)
    return (
        grams.join(F.broadcast(short), ["t", "h"], "left_semi")
        .select("_id")
        .distinct()
    )


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    strategy: str = "broadcast",
    bloom_bits_per_key: int = 12,
) -> DataFrame:
    """Per-document contamination against ``benchmark``:
    (id, n_ngrams, n_contaminated, contamination_ratio).

    Documents shorter than ``n`` words contribute their whole text as
    one shingle (word_shingles' short-doc rule), so every doc gets a
    row — n_ngrams >= 1.

    ``strategy``: "broadcast" (default) pins the benchmark n-gram set
    to a broadcast join — the corpus side is never shuffled; right for
    eval suites (thousands of items).  "shuffle" drops the hint for
    reference sets too large for executor memory (decontaminating one
    corpus against ANOTHER corpus): the (doc, hash) relation then
    shuffles on the hash — two corpus-mass exchanges instead of zero,
    the honest price of an oversized right side.  AQE still downgrades
    to broadcast at runtime if the set turns out small.  "bloom" is
    the middle rung: the reference collapses to a compact bloom
    bitset (``bloom_bits_per_key`` bits per distinct n-gram, ~0.3%
    fpp at the default 12) broadcast as ONE array row, and membership
    is a pure JVM bit-probe expression — no join at all on the corpus
    side, for reference sets whose exact hash relation is too big to
    broadcast but whose bitset still fits (the GPT-3-report regime:
    ~10^7 reference n-grams ⇒ ~16 MB exact vs ~2 MB bloom).  Bloom
    counts OVER-approximate: a false positive inflates
    ``n_contaminated`` (never deflates) — acceptable for hygiene
    filters that drop on any hit, wrong for exact audits.  Sizing the
    bitset needs the reference's distinct-gram count, so this
    strategy runs one small plan-build job over the reference (the
    pinned-centroid precedent).
    """
    if strategy not in ("broadcast", "shuffle", "bloom"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    bench = benchmark_ngram_set(benchmark, bench_text_col, n)
    doc_grams = _shingled(docs, id_col, text_col, n, hash_fn=shingle_hash_wide)
    if strategy == "bloom":
        n_ref = bench.count()
        if n_ref == 0:
            flagged = doc_grams.withColumn(
                "_hit", F.lit(None).cast("int")
            )
        else:
            m_bits, n_hashes = auto_bloom_params(n_ref, bloom_bits_per_key)
            # the bitset is collected ONCE driver-side (≤ 8 MB at the
            # size cap; same plan-build-job class as the n_ref count
            # above) and shipped as a one-parse literal — NOT carried
            # as a broadcast-joined column, which the probe HOF
            # re-materializes per corpus gram (see _bloom_might_contain)
            bits = list(
                bloom_reference_bits(bench, m_bits, n_hashes).first()[
                    "_bits"
                ]
            )
            flagged = doc_grams.select(
                "_id",
                F.when(
                    _bloom_might_contain(
                        F.col("h"), _lit_longs(bits), m_bits, n_hashes
                    ),
                    F.lit(1),
                ).alias("_hit"),
            )
    else:
        if strategy == "broadcast":
            bench = F.broadcast(bench)
        flagged = doc_grams.join(
            bench.withColumn("_hit", F.lit(1)), "h", "left"
        )
    return (
        flagged.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_ngrams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6).alias(
                "contamination_ratio"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_ratio: float = 0.0,
    strategy: str = "broadcast",
    bloom_bits_per_key: int = 12,
    cover_short_items: bool = False,
) -> DataFrame:
    """Drop documents whose contamination_ratio exceeds ``max_ratio``
    (default: any benchmark n-gram hit drops the doc).  Returns the
    surviving rows of ``docs`` unchanged.  ``strategy`` as in
    ``contamination_scores`` — with "bloom", false positives may
    additionally drop ~fpp of clean documents (never keep a dirty
    one).

    ``cover_short_items``: also drop docs containing a WHOLE
    benchmark item shorter than ``n`` tokens (see
    ``short_benchmark_item_hashes`` — such items have no n-gram
    signature and are otherwise invisible inside longer documents).
    An embedded full item is a total leak of that item, so the drop
    is on ANY hit regardless of ``max_ratio`` (a ratio over width-t
    windows would not be commensurable with the n-gram ratio).
    Free when the benchmark has no short items."""
    scores = contamination_scores(
        docs,
        benchmark,
        id_col,
        text_col,
        bench_text_col,
        n,
        strategy,
        bloom_bits_per_key,
    )
    # filter on the UNROUNDED ratio: the display column rounds to 6dp,
    # so a multi-million-gram doc with one genuine hit would round to
    # 0.0 and slip past a max_ratio=0.0 cut
    dirty = scores.filter(
        F.col("n_contaminated") / F.col("n_ngrams") > F.lit(max_ratio)
    ).select(id_col)
    if cover_short_items:
        short_hits = short_item_hit_docs(
            docs, benchmark, id_col, text_col, bench_text_col, n
        )
        if short_hits is not None:
            dirty = dirty.unionByName(
                short_hits.select(F.col("_id").alias(id_col))
            ).distinct()
    return docs.join(dirty, id_col, "left_anti")


def scrub_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    cover_short_items: bool = False,
) -> DataFrame:
    """SURGICAL decontamination: cut every n-token window that appears
    in the benchmark, keep the rest of the document — the span-level
    alternative to ``decontaminate``'s drop-the-doc policy (the Llama
    / FLAN-style reports describe both; dropping whole documents
    forfeits all their clean tokens when one sentence leaked).

    Returns (id, text, n_tok_in, n_tok_removed): affected documents
    are rebuilt from surviving tokens (single-space joined, the
    span_dedup contract), untouched documents pass through VERBATIM.

    Matching is WINDOW-exact at width ``n``: benchmark items shorter
    than ``n`` tokens produce no grams and therefore scrub nothing at
    that width.  ``cover_short_items=True`` restores their coverage:
    each short item contributes its WHOLE token sequence as a
    signature at its own width t, and the width-n grams plus every
    short width are scanned in ONE fused corpus pass
    (``span_windows_multi`` — the token array is bound once; when the
    benchmark has no short items the plan is identical to the plain
    single-width scan) — hit windows of every width merge into one
    per-doc cut array.  The rebuild can also
    SPLICE a new benchmark n-gram across a cut boundary (doc =
    S[:j] + leak + S[j:] — cutting the leak joins the halves into
    S), so a zero-residual guarantee needs a follow-up
    ``decontaminate`` over the scrubbed text (the corpus CLI's
    ``--bench-scrub-strict``).

    Shape: the spans-module window relation (token array bound once)
    left-semi-joined against the BROADCAST benchmark gram-hash set —
    the corpus is never shuffled to find the hits; only hit windows
    (benchmark-overlap-sized) explode to covered positions and
    collapse to per-doc cut arrays, and the rebuild is the row-local
    gap-complement slice.  Matching is on the lowercased-window
    xxhash64, consistent on both sides."""
    from wrds_data_pipeline_spark.operators.spans import (
        _gram_hashes,
        _raw_tokens,
        apply_span_cuts,
        span_cuts,
        span_windows,
        span_windows_multi,
    )

    bench_grams = (
        benchmark.select(
            F.explode(
                _gram_hashes(_raw_tokens(bench_text_col), n)
            ).alias("h")
        )
        .distinct()
    )
    widths: list[int] = []
    if cover_short_items:
        # spans hash on xxhash64 of the lowered token-array slice, so
        # the short-item signature is the xxhash64 of the item's FULL
        # lowered token array (width = its own token count)
        short = (
            benchmark.select(
                F.transform(
                    _raw_tokens(bench_text_col), F.lower
                ).alias("_lt")
            )
            .filter((F.size("_lt") >= 1) & (F.size("_lt") < n))
            .select(
                F.size("_lt").alias("t"), F.xxhash64("_lt").alias("h")
            )
            .distinct()
        )
        widths = sorted(
            r["t"] for r in short.select("t").distinct().collect()
        )
    if not widths:
        hits = span_windows(docs, id_col, text_col, n).join(
            F.broadcast(bench_grams), "h", "left_semi"
        ).select("_id", "i")
        cuts = span_cuts(hits, n)
    else:
        # ONE corpus scan for the width-n grams AND every short width
        # (span_windows per width would re-tokenize the corpus once per
        # width): the signature set is keyed (t, h) so a short item
        # only matches windows of its own width
        sigs = bench_grams.select(F.lit(n).alias("t"), "h").unionByName(short)
        hits = (
            span_windows_multi(docs, id_col, text_col, [n] + widths)
            .join(F.broadcast(sigs), ["t", "h"], "left_semi")
            .select("_id", "i", F.col("t").alias("_w"))
        )
        # variable-width span_cuts: each hit covers [i, i+w)
        cuts = (
            hits.select(
                "_id",
                F.explode(
                    F.sequence("i", F.col("i") + F.col("_w") - 1)
                ).alias("p"),
            )
            .groupBy("_id")
            .agg(F.sort_array(F.collect_set("p")).alias("_cut"))
        )
    return apply_span_cuts(docs, cuts, id_col, text_col)


def benchmark_leak_report(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "qid",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The reverse view of ``contamination_scores``: per BENCHMARK
    item, how widely it leaked — (bench_id, n_grams, n_leaked_grams,
    n_docs_hit).  This is what an eval-integrity review reads ("which
    test items are compromised, and are they compromised everywhere
    or in one mirror?"); the per-document view says what to drop,
    this says which eval numbers to distrust.

    Shape: the benchmark side keeps its item ids (NOT the distinct
    gram set) and is still broadcast — the corpus side explodes once
    and inner-joins the broadcast (hash → qid) relation, so a gram
    shared by many items fans out only by the benchmark's own
    multiplicity.  One corpus scan, aggregates keyed by the (small)
    benchmark: the group-by state is benchmark-sized, never
    corpus-sized."""
    bench_grams = (
        benchmark.select(
            F.col(bench_id_col).alias("_qid"),
            F.explode(word_shingles(bench_text_col, n)).alias("shingle"),
        )
        .select("_qid", shingle_hash_wide(F.col("shingle")).alias("h"))
        .distinct()  # per-item distinct grams; items stay separate
    )
    doc_grams = _shingled(docs, id_col, text_col, n, hash_fn=shingle_hash_wide)
    hits = doc_grams.join(F.broadcast(bench_grams), "h").select(
        "_qid", "h", "_id"
    )
    per_item_hits = hits.groupBy("_qid").agg(
        F.count_distinct("h").alias("n_leaked_grams"),
        F.count_distinct("_id").alias("n_docs_hit"),
    )
    totals = bench_grams.groupBy("_qid").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return (
        totals.join(per_item_hits, "_qid", "left")
        .select(
            F.col("_qid").alias(bench_id_col),
            "n_grams",
            F.coalesce("n_leaked_grams", F.lit(0)).alias("n_leaked_grams"),
            F.coalesce("n_docs_hit", F.lit(0)).alias("n_docs_hit"),
        )
    )
