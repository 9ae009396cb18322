"""Corpus curation: the end-to-end training-data cleaning pipeline.

Composes the engine's text/dedup operators into the standard
LLM-pretraining data flow.  The scalar stages are lazily planned so
Catalyst fuses them into one pass over the corpus; the near-dedup
stage is lazy when the caller passes a ``caching.PersistScope`` and
otherwise materializes its (pairs-sized) relation eagerly at
``curate()`` call time so its shingle/band caches can be released
(see ``curate``'s docstring).  The flow:

1. exact dedup (content fingerprint, keep canonical id),
2. near-dedup (MinHash-LSH candidates → Jaccard verification →
   drop the higher id of each confirmed pair),
3. language filter (stopword-argmax lang id),
4. quality filter (length / punctuation / stopword heuristics),
5. token accounting (whitespace + BPE-ish sub-word estimate).

Everything is partition-parallel; the only shuffles are the dedup
aggregations/joins (see SCALE.md).  Returns (kept_docs, audit) where
``audit`` has one row per input doc with its fate — at 100 TB the
audit trail is what makes a curation run debuggable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions import text as X
from wrds_data_pipeline_spark.operators.dedup import DEFAULT_MAX_BUCKET


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.85,
    min_tokens: int = 5,
    group_dedup: bool = False,
    scope=None,
    near_dup_max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation flow.  Returns (kept, audit).

    ``scope`` (caching.PersistScope): caller-owned lifecycle for the
    near-dedup stage's shingle/band caches — everything stays lazy and
    the caller releases.  Without it the (pairs-sized) near-dup
    relation is materialized eagerly, its intermediate caches freed
    before returning, and kept/audit stay lazy on top of it.

    ``group_dedup=False`` (default, oracle-checked by q43) drops the
    higher id of each verified near-dup *pair*.  That under-drops when
    a duplicate cluster's minimum doc isn't directly paired with every
    member (A~C, B~C keeps both A and B).  ``group_dedup=True``
    resolves the verified pairs into connected components and keeps
    exactly the min-id doc per component — the semantics large-scale
    dedup pipelines use.  Group mode runs the iterative component
    algorithm eagerly (checkpointed joins), so the plan is no longer a
    single lazy expression tree; everything else is unchanged."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        X.detect_lang(text_col).alias("lang_detected"),
        F.round(X.quality_score(text_col), 6).alias("quality"),
        X.token_count(text_col).alias("ws_tokens"),
        X.bpe_ish_token_count(text_col).alias("bpe_tokens"),
        X.fingerprint(text_col).alias("fingerprint"),
    )

    # 1. exact dedup: keep each group's canonical (min) id.  A window
    # min over the fingerprint partition — NOT a join against an
    # exact_duplicates() relation: that relation has one row per
    # distinct fingerprint (~one per document), so broadcasting it is
    # a corpus-sized broadcast (executor/driver OOM at 100 TB) and
    # joining it shuffles the corpus twice.  The window shuffles the
    # corpus once on fingerprint, with partition state bounded by the
    # largest duplicate group.
    from pyspark.sql.window import Window as W

    # NULL-fingerprint rows (null-text docs) get a per-doc sentinel
    # key: Window.partitionBy groups NULLs into ONE partition (unlike
    # the previous join formulation, where NULL keys never matched), so
    # without the sentinel two null-text docs would alias each other
    # and all but one be mis-tagged exact_dup.  With it each null-text
    # doc is its own group and falls through to the content gates —
    # pinned by tests/test_corpus.py::test_curate_null_text_docs_do_not_alias.
    dedup_key = F.coalesce(
        F.col("fingerprint"), F.concat(F.lit("\x00null:"), F.col("doc_id"))
    )
    tagged = base.withColumn(
        "canonical_id",
        F.min("doc_id").over(W.partitionBy(dedup_key)),
    ).withColumn("exact_dup", F.col("doc_id") != F.col("canonical_id"))

    # 2. near-dedup among exact-canonical survivors: LSH candidates →
    # verified Jaccard → drop the higher id of each pair.  Null-text
    # docs are excluded: they have no shingleable content — their
    # degenerate shingle set (concat_ws over a NULL token array → [""])
    # would J=1-match every other contentless doc, mis-tagging them
    # near_dup instead of letting the content gates judge them.
    canon_ids = (
        tagged.filter(~F.col("exact_dup") & F.col("text").isNotNull())
        .select(F.col("doc_id").alias("_canon_id"))
    )
    survivors = docs.join(
        canon_ids, docs[id_col] == F.col("_canon_id"), "left_semi"
    )
    # LSH candidates + candidate-driven verification over ONE shared
    # shingle pass — delegate to the canonical composition rather
    # than re-inlining it (one place owns the persist discipline)
    from wrds_data_pipeline_spark.operators.dedup import near_dup_pairs

    near = near_dup_pairs(
        survivors, id_col, text_col, threshold=near_dup_threshold,
        scope=scope, max_bucket=near_dup_max_bucket,
    )
    if group_dedup:
        from wrds_data_pipeline_spark.operators.components import (
            connected_components,
        )

        cc = connected_components(near)
        near_losers = cc.filter(F.col("id") != F.col("group_id")).select(
            F.col("id").alias("doc_id")
        )
    else:
        near_losers = near.select(F.col("id_b").alias("doc_id")).distinct()
    tagged = tagged.join(
        near_losers.withColumn("near_dup", F.lit(True)), "doc_id", "left"
    ).withColumn("near_dup", F.coalesce("near_dup", F.lit(False)))

    # 3-5. filters
    audit = tagged.withColumn(
        "fate",
        F.when(F.col("exact_dup"), "exact_dup")
        .when(F.col("near_dup"), "near_dup")
        .when(~F.col("lang_detected").isin(*allowed_langs), "lang")
        .when(F.col("ws_tokens") < min_tokens, "too_short")
        .when(F.col("quality") < min_quality, "low_quality")
        .otherwise("kept"),
    ).select(
        "doc_id", "fate", "lang_detected", "quality",
        "ws_tokens", "bpe_tokens", "fingerprint",
    )
    if scope is not None:
        # caller-owned persist of the NARROW audit relation (text is
        # already projected away — the r14 `tagged` persist failed
        # exactly because it cached the corpus text and defeated
        # per-branch column pruning; this row is ~7 scalar columns).
        # Both consumers (kept's semi-join and the report aggregate)
        # read one copy, and the scalar suite + fingerprint window +
        # near-loser join are evaluated once instead of per action.
        # At 100 TB this is the materialized audit-trail table the
        # module docstring says a curation run keeps anyway.
        audit = scope.persist(audit)

    kept_ids = (
        audit.filter(F.col("fate") == "kept")
        .select(F.col("doc_id").alias("_kept_id"))
    )
    kept = docs.join(kept_ids, docs[id_col] == F.col("_kept_id"), "left_semi")
    return kept, audit


def curation_report(audit: DataFrame) -> DataFrame:
    """Fate histogram + token budget of the kept set."""
    return audit.groupBy("fate").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_tokens").alias("bpe_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


def select_to_token_budget(
    scored: DataFrame,
    budget_tokens: int,
    strata_cols: list[str] | str = "lang_detected",
    quality_col: str = "quality",
    token_col: str = "bpe_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget selection: within each stratum (language, domain,
    ...), take documents best-quality-first while the running token
    sum stays within ``budget_tokens``.

    One window (cumulative sum over quality-descending order, id
    tie-break) + one filter — a single shuffle on the strata.  The
    greedy-by-quality rule is the standard budget filler; swapping the
    ordering column swaps the policy without touching the plan.
    """
    from pyspark.sql.window import Window as W

    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    w = (
        W.partitionBy(*strata_cols)
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        scored.withColumn("running_tokens", F.sum(token_col).over(w))
        .filter(F.col("running_tokens") <= budget_tokens)
    )


def _seeded_rank_key(id_col: str, seed: int, method: str) -> F.Column:
    """The seeded per-row ranking/draw key shared by the samplers AND
    ``hash_split`` (one copy of the portable scheme — both derive
    their draws from this column): ``xxhash64`` (Spark-native,
    fastest; a signed int64) or ``md5`` (portable — any engine can
    recompute ``md5(str(id) + ":" + str(seed))`` and reproduce the
    exact ranking hex, so a sample/split is auditable outside the
    Spark job).

    Non-null-id precondition for the REPLAY contract: ``md5(NULL)``
    is NULL, which Spark's ascending sort places FIRST while DuckDB's
    ORDER BY places last — rows with a NULL id rank differently
    across engines (and degenerately under xxhash64, which collapses
    them all to the seed's hash).  Ensure ids are non-null upstream
    when the external replay matters."""
    if method == "xxhash64":
        return F.xxhash64(F.col(id_col), F.lit(seed))
    if method == "md5":
        return F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(":"), F.lit(str(int(seed)))
            )
        )
    raise ValueError(f"unknown sampling hash method: {method!r}")


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str] | str,
    n_per_stratum: int | dict,
    id_col: str = "doc_id",
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic fixed-size sample per stratum (the domain-mixing
    primitive: "exactly N documents from each source/language").

    Rows are ranked inside each stratum by a seeded hash of their id
    (uniform, reproducible, data-independent) and the top
    ``n_per_stratum`` kept — unlike ``df.sampleBy`` (Bernoulli:
    approximate counts, partitioning-sensitive), the result is exact
    and identical on every run/cluster.  One window over the stratum
    shuffle; per-partition state is one stratum.  ``n_per_stratum``
    may be a dict keyed by stratum value (single strata column) for
    mixture weights.  ``method="md5"`` ranks by the portable hex
    draw instead of Spark's xxhash64 (see ``_seeded_rank_key``) —
    the selected id set is then replayable by any engine.
    """
    from pyspark.sql.window import Window as W

    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    order = _seeded_rank_key(id_col, seed, method)
    w = W.partitionBy(*strata_cols).orderBy(order, F.col(id_col))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    if isinstance(n_per_stratum, dict):
        if len(strata_cols) != 1:
            raise ValueError("dict n_per_stratum needs exactly one strata column")
        cap = F.coalesce(
            F.create_map(
                *[F.lit(x) for kv in n_per_stratum.items() for x in kv]
            )[F.col(strata_cols[0])],
            F.lit(0),
        )
    else:
        cap = F.lit(int(n_per_stratum))
    return ranked.filter(F.col("_rk") <= cap).drop("_rk")


def quality_quantile_filter(
    docs: DataFrame,
    keep_frac: float,
    stratum_col: str | None = None,
    quality_col: str | None = None,
    text_col: str = "text",
    accuracy: int = 10_000,
    keep_low: bool = False,
) -> DataFrame:
    """Keep (approximately) the top ``keep_frac`` of documents by
    quality — per stratum when ``stratum_col`` is given, else
    corpus-wide.  "Top 30% of each domain" beats a fixed threshold
    when quality distributions differ by source.

    ``keep_low=True`` keeps the BOTTOM fraction instead — the right
    direction for loss-like signals (cross_entropy / perplexity from
    ``doc_cross_entropy``: CCNet keeps the LEAST surprising docs).

    The cutoff is ``percentile_approx`` (Greenwald-Khanna sketch:
    single aggregation, bounded memory, mergeable across partitions —
    the 100 TB-safe quantile).  The per-stratum cutoff relation has
    one row per stratum and is broadcast back; the corpus side is
    scanned once and never shuffled.  Adds ``_q_cut`` alongside the
    input columns.
    """
    if not 0 < keep_frac <= 1:
        raise ValueError("keep_frac must be in (0, 1]")
    q = F.col(quality_col) if quality_col else X.quality_score(text_col)
    scored = docs.withColumn("_q", F.round(q, 6))
    cut_q = keep_frac if keep_low else 1.0 - keep_frac
    pct = F.percentile_approx("_q", F.lit(cut_q), F.lit(accuracy))
    if stratum_col:
        cuts = scored.groupBy(stratum_col).agg(pct.alias("_q_cut"))
        out = scored.join(F.broadcast(cuts), stratum_col)
    else:
        out = scored.crossJoin(F.broadcast(scored.agg(pct.alias("_q_cut"))))
    keep = (
        F.col("_q") <= F.col("_q_cut")
        if keep_low
        else F.col("_q") >= F.col("_q_cut")
    )
    return out.filter(keep).drop("_q")


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to one of the named
    splits (default ``{"train": .98, "val": .01, "test": .01}``) by
    seeded hash of the id — the standard deterministic train/val/test
    partition.  Properties the ML workflow depends on: every row lands
    in exactly one split; the assignment is a pure function of
    (id, seed) — stable across re-runs, repartitioning, insertion
    order, and cluster size; and fractions converge to the weights by
    the law of large numbers.  No shuffle, no sampling pass, no state.

    ``weights`` must sum to 1 (±1e-6).  Iteration order of the dict
    fixes the cut order, so the same dict always yields the same
    assignment.

    ``method`` picks the hash family:

    - ``"xxhash64"`` (default): Spark's native seeded hash — fastest,
      but the split is reproducible only by engines that implement
      Spark's xxhash64 variant.
    - ``"md5"``: the uniform draw is the first 8 hex digits of
      ``md5(str(id) + ":" + str(seed))`` over 2^32 — every SQL engine
      and every language has md5, so the SAME rows land in the SAME
      split when the assignment is recomputed in DuckDB, pandas, or a
      warehouse (the property teams need when the split must be
      auditable outside the Spark job).  Cut comparisons use the
      Python-float cumulative weights verbatim; a replaying engine
      must use the same accumulated values (repr precision) for
      bit-identical boundaries.

    Both are single JVM-native expressions — no UDF, no shuffle.
    """
    weights = (
        {"train": 0.98, "val": 0.01, "test": 0.01}
        if weights is None
        else weights
    )
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    key = _seeded_rank_key(id_col, seed, method)  # shared scheme
    if method == "xxhash64":
        # uniform draw in [0, 1): non-negative 20-bit slice of the
        # seeded 64-bit hash (xxhash64 is signed — mask, don't pmod,
        # so the draw is exactly uniform over the slice)
        u = F.shiftrightunsigned(key, 44).cast("double") / F.lit(
            float(1 << 20)
        )
    else:  # md5 — _seeded_rank_key already validated the method
        # portable draw: 32-bit prefix of the md5 hex / 2^32 (the key
        # is the id's STRING form so any engine can rebuild it without
        # knowing Spark's binary hash encoding)
        u = (
            F.conv(F.substring(key, 1, 8), 16, 10)
            .cast("long")
            .cast("double")
            / F.lit(float(1 << 32))
        )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)


def shuffle_for_training(
    docs: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global pseudo-random re-order — the "shuffle the
    corpus once before sharding" step of training-data prep.  Sorts by
    the seeded hash of the id (ties broken by id, so the order is
    total and reproducible for a given seed; a new seed is a fresh
    permutation).

    Scale: plans as RangePartitioning over the hash + per-partition
    sort — the distributed total order (sampled range boundaries, no
    single-partition stage).  Downstream ``.write`` emits one file per
    range partition, giving globally shuffled, deterministically
    ordered shards.
    """
    return docs.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))


def temperature_weights(
    df: DataFrame,
    stratum_col: str = "lang",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based sampling weights for multilingual/multi-source
    training mixes (the p_l^alpha re-weighting of the public
    mBERT/XLM-R/mT5 recipes): per stratum, (n_docs, p = share of
    corpus, q = p^alpha renormalized, upsample = q/p).  alpha=1 keeps
    natural proportions, alpha=0 is uniform over strata, alpha in
    (0,1) lifts low-resource strata.

    Scale: one hash-aggregate over the corpus; everything after runs
    on the strata relation (one row per language/source — trivially
    small), where the two unpartitioned windows are harmless.
    """
    from pyspark.sql.window import Window as W

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    everything = W.partitionBy()
    p = F.col("n_docs") / F.sum("n_docs").over(everything)
    out = counts.withColumn("p", p)
    unnorm = F.pow(F.col("p"), F.lit(float(alpha)))
    out = out.withColumn("_u", unnorm).withColumn(
        "q", F.col("_u") / F.sum("_u").over(everything)
    )
    return out.select(
        stratum_col,
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round(F.col("q") / F.col("p"), 6).alias("upsample"),
    )


def temperature_sample(
    df: DataFrame,
    n_total: int,
    stratum_col: str = "lang",
    alpha: float = 0.3,
    id_col: str = "doc_id",
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic sample of ~``n_total`` rows realizing the
    temperature-``alpha`` mix: per-stratum targets = round(q_l ×
    n_total) capped at the stratum's population (no replacement —
    upsampling beyond 1× is the training loader's job, this operator
    fixes the downsampling side of the mix), drawn with the seeded-
    hash ranking of ``stratified_sample_exact`` (exact counts,
    repartition-invariant, reproducible).

    Driver state: one row per stratum (the weights relation) — KBs.
    Rows with a NULL stratum are dropped (they cannot key the target
    map; route or fill them upstream if they should participate).
    """
    rows = temperature_weights(df, stratum_col, alpha).collect()
    # recompute q from the EXACT counts: the weights relation's q
    # column is display-rounded to 6dp, and round(q * n_total) would
    # amplify that rounding by n_total (the same display-vs-decision
    # trap contamination.decontaminate documents)
    counts = {
        r[stratum_col]: int(r["n_docs"])
        for r in rows
        if r[stratum_col] is not None
    }
    total = sum(counts.values())
    un = {k: (n / total) ** alpha for k, n in counts.items()}
    z = sum(un.values())
    targets = {
        k: min(int(round(un[k] / z * n_total)), counts[k]) for k in counts
    }
    return stratified_sample_exact(
        df, stratum_col, targets, id_col=id_col, seed=seed, method=method
    )
