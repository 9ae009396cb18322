"""Exact duplicated-span removal (token-level dedup, the ExactSubstr
rung): cut every RE-occurrence of any k-token window that appears
more than once corpus-wide, keeping the first occurrence.

This is the finest rung of the dedup ladder — below document-level
(``dedup.exact_duplicates`` / MinHash) and paragraph-level
(``boilerplate.paragraph_dedup``): it reaches duplicated passages that
are embedded mid-paragraph with different surroundings, the case
"Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022) shows matters for memorization.  The reference
pipeline has no corpus layer (this is the beyond-reference
training-data surface, like dedup.py/similarity.py).

Semantics (deterministic, replayable):
- tokens = ``\\s+`` split of the trimmed text; k-grams are matched on
  the LOWERCASED token window (the repo's normalize casing), hashed
  with xxhash64 over the token slice (see ``_gram_hashes``).
- a k-gram instance (doc, start) is *duplicated* iff another instance
  of the same gram precedes it in (doc_id, start) order — within-doc
  repeats count.
- removed positions = union of all duplicated instances' windows;
  overlapping windows merge naturally.  The first instance's tokens
  are never covered by its own gram, but MAY be cut by a different
  gram's duplicate window overlapping them (span cuts are positional,
  exactly as in the suffix-array formulation) — so "some copy
  survives" holds for passages, not for every individual k-gram.
- documents with no duplicated instance (including docs shorter than
  k tokens and null/empty text) return their text VERBATIM; affected
  documents are rebuilt from the surviving tokens joined by single
  spaces.

Scale design (100 TB):
- The gram relation is one doc-local pass (token array bound once —
  ``functions.text._bound``; an inlined re-tokenize per window is the
  O(n²) CollapseProject/HOF trap, see SCALE.md).  Keep-first is an
  aggregate of per-gram firsts (map-side-combined min+count, filtered
  to repeated grams) equi-joined back onto the window relation —
  corpus-token-mass exchanges, the same mass every MinHash pass
  already moves, and skew-safe: hot k-grams (ubiquitous boilerplate
  sentences, 10⁸⁺ occurrences) combine map-side in the aggregate and
  are AQE-skew-split in the join, where a ``partitionBy(h)`` window
  would pin the whole key to one task.
- Duplicate instances explode to covered positions (×k, duplicated
  mass only) and collapse to one sorted cut-array per AFFECTED doc —
  the join back to documents carries only affected docs (AQE
  broadcasts it when duplication is sparse).
- Reassembly is row-local and O(n): the cut array's complement is
  materialized as gap intervals (zip_with over the sorted cuts) and
  the survivors are bulk ``slice`` copies per gap — never a per-token
  membership probe against the cut list (that shape is
  O(n_tok × n_cuts)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from wrds_data_pipeline_spark.functions.text import _bound


def _raw_tokens(text_col) -> F.Column:
    """Whitespace tokens of the ORIGINAL (un-lowered) text — what
    reassembly re-joins.  Null/blank text → empty array.  Matching
    lowers per window; boundaries are identical either way.

    Trim must strip the SAME class the split uses (ASCII ``\\s``):
    ``F.trim`` removes spaces only, so a doc leading with a tab or
    newline would grow a spurious empty first token and shift every
    window position."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(
        c.isNotNull() & (t != ""), F.split(t, r"\s+")
    ).otherwise(F.array().cast("array<string>"))


def _gram_hashes(toks: F.Column, k: int) -> F.Column:
    """array<bigint>: hash of the lowercased k-token window at each
    start 0..n-k (empty when n < k).

    The hash is ``xxhash64`` of the SLICED lowered-token array —
    array equality ⟺ joined-string equality here (tokens cannot
    contain whitespace), and hashing the slice directly skips the
    per-window concat_ws + md5 + hex-conv of ``shingle_hash_wide``
    (~3× the whole gram pass; spans have no DuckDB twin to keep
    md5-compatible, the oracle is a python replay).  64-bit exact
    membership: at 10^13 corpus grams expect ~10^6 colliding pairs
    (birthday m²/2N), each wrongly cutting k tokens — the same
    accepted-rarity class as the 60-bit band/boilerplate hashes.
    The lowered array is bound once; tokens lower once each, not
    once per covering window."""
    return _bound(
        F.transform(toks, F.lower),
        F.array().cast("array<bigint>"),
        lambda lt: F.when(
            F.size(lt) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(lt) - k),
                lambda i: F.xxhash64(F.slice(lt, i + 1, k)),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )


def span_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(_id, i, h): every k-token window instance in the corpus —
    0-based start ``i`` and the xxhash64 of its lowercased form."""
    if k < 1:
        raise ValueError(f"span window k must be >= 1, got {k}")
    return (
        docs.select(
            F.col(id_col).alias("_id"),
            _gram_hashes(_raw_tokens(text_col), k).alias("_g"),
        )
        .select("_id", F.posexplode("_g").alias("i", "h"))
    )


def span_windows_multi(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ks: list[int],
) -> DataFrame:
    """(_id, i, t, h): every t-token window instance for EACH width t
    in ``ks`` — one tokenize/lower pass for all widths (the token
    array is bound once; calling ``span_windows`` per width re-scans
    and re-tokenizes the corpus once per width).  Same hashing scheme
    as ``span_windows`` (xxhash64 of the lowered token slice), so the
    two relations join against the same signature sets."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"span window widths must be >= 1, got {ks}")
    sch = "array<struct<t:int,i:int,h:bigint>>"

    def multi(lt):
        # width captured via a factory: a two-arg transform lambda
        # would make PySpark bind the second parameter to the ARRAY
        # INDEX, silently shadowing the width (the HOF trap noted in
        # contamination._doc_windows_at_widths)
        def one_width(t):
            return lambda i: F.struct(
                F.lit(t).alias("t"),
                i.alias("i"),
                F.xxhash64(F.slice(lt, i + 1, t)).alias("h"),
            )

        return F.flatten(
            F.array(
                *[
                    F.when(
                        F.size(lt) >= t,
                        F.transform(
                            F.sequence(F.lit(0), F.size(lt) - t),
                            one_width(t),
                        ),
                    ).otherwise(F.array().cast(sch))
                    for t in sorted(set(ks))
                ]
            )
        )

    return (
        docs.select(
            F.col(id_col).alias("_id"),
            _bound(
                F.transform(_raw_tokens(text_col), F.lower),
                F.array().cast("array<struct<t:int,i:int,h:bigint>>"),
                multi,
            ).alias("_w"),
        )
        .select("_id", F.explode("_w").alias("_e"))
        .select(
            "_id",
            F.col("_e.i").alias("i"),
            F.col("_e.t").alias("t"),
            F.col("_e.h").alias("h"),
        )
    )


def non_first_windows(windows: DataFrame) -> DataFrame:
    """(_id, i): the NON-FIRST rows of a (_id, i, h) window relation.
    First = min (doc, start) struct per gram hash.

    Shape: aggregate the firsts (map-side-combined min + count,
    filtered to count>1 — singleton grams, the vast majority, never
    leave the aggregate) and equi-join back, NOT a window over
    ``partitionBy(h)``.  A window puts every instance of one gram in
    a single task, and hot k-grams are GUARANTEED at corpus scale —
    ubiquitous boilerplate sentences reach 10⁸⁺ occurrences, which is
    one task holding the whole key.  The aggregate is skew-immune
    (partial min/count combine map-side) and the join's hot keys are
    exactly what AQE skew-join splitting handles; a window gets no
    such mitigation."""
    firsts = (
        windows.groupBy("h")
        .agg(
            F.min(F.struct(F.col("_id"), F.col("i"))).alias("_first"),
            F.count(F.lit(1)).alias("_c"),
        )
        .filter(F.col("_c") > 1)
        .select("h", "_first")
    )
    # shuffle_hash hint, REQUIRED for scale: Catalyst's size estimate
    # for Generate (the window posexplode) is its child's, ~1/100 of
    # the true window mass, so the planner "broadcasts" the CORPUS
    # side of this join (measured: 1 GiB broadcast of 12M window rows
    # at a 128k-doc rehearsal — an executor OOM at any real scale).
    # The hint pins a shuffled hash join on h: build side is `firsts`
    # (one row per repeated gram — h is unique there, so no build-side
    # hot key), the corpus-sized window stream needs no sort, and a
    # hot gram's stream partition is exactly what AQE skew-join
    # splitting redistributes (rehearsed: tools/scale_rehearsal.py
    # --spans-skew).
    return (
        windows.join(firsts.hint("shuffle_hash"), "h")
        .filter(
            (F.col("_first._id") != F.col("_id"))
            | (F.col("_first.i") != F.col("i"))
        )
        .select("_id", "i")
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    scope: "PersistScope | None" = None,
) -> DataFrame:
    """(_id, i): every NON-FIRST instance of a repeated k-gram.

    The window relation is read twice (firsts aggregate + join back),
    so it is persisted under ``scope`` — pass a caller-owned
    ``caching.PersistScope`` to control the cache lifetime (the
    jaccard_pairs convention); without one the cache is left to the
    composing operator / session."""
    windows = span_windows(docs, id_col, text_col, k)
    if scope is not None:
        windows = scope.persist(windows)
    return non_first_windows(windows)


def _kept_text(toks, n, cut) -> F.Column:
    """Rebuild the survivor text from the sorted cut-position array:
    complement gaps via zip_with over (-1) ++ cut ++ (n), then bulk
    slice per gap — O(n) row-local, no per-token membership test."""
    cut2 = F.concat(F.array(F.lit(-1)), cut, F.array(n))
    gaps = F.filter(
        F.zip_with(
            F.slice(cut2, 1, F.size(cut2) - 1),
            F.slice(cut2, 2, F.size(cut2) - 1),
            lambda a, b: F.struct((a + 1).alias("lo"), b.alias("hi")),
        ),
        lambda g: g["hi"] > g["lo"],
    )
    return F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                gaps, lambda g: F.slice(toks, g["lo"] + 1, g["hi"] - g["lo"])
            )
        ),
    )


def span_cuts(dups: DataFrame, k: int) -> DataFrame:
    """(_id, _cut): one sorted array of covered token positions per
    affected doc, from a (_id, i) duplicate-instance relation."""
    return (
        dups.select(
            "_id", F.explode(F.sequence("i", F.col("i") + (k - 1))).alias("p")
        )
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("p")).alias("_cut"))
    )


def apply_span_cuts(
    docs: DataFrame,
    cuts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Left-join the cut arrays onto the documents and rebuild:
    (id, text, n_tok_in, n_tok_removed); unmatched docs verbatim."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        _raw_tokens(text_col).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    return base.join(cuts, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.when(F.col("_cut").isNull(), F.col("_text"))
        .otherwise(_kept_text(F.col("_toks"), F.col("_n"), F.col("_cut")))
        .alias(text_col),
        F.col("_n").alias("n_tok_in"),
        F.coalesce(F.size("_cut"), F.lit(0)).alias("n_tok_removed"),
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    scope: "PersistScope | None" = None,
) -> DataFrame:
    """Corpus-wide duplicated-span removal: (id, text, n_tok_in,
    n_tok_removed).  See module docstring for exact semantics.

    ``scope``: caller-owned cache lifecycle for the twice-read window
    relation; without one only the (duplicated-mass-sized) CUT arrays
    are materialized eagerly and the window cache is freed before
    returning — the corpus-sized result itself stays lazy either way
    (contrast near_dup_pairs, whose default path can afford to
    checkpoint its pairs-sized output)."""
    from wrds_data_pipeline_spark.caching import (
        PersistScope,
        materialize_release,
    )

    if k < 1:
        raise ValueError(f"span window k must be >= 1, got {k}")
    own = scope is None
    scope = scope or PersistScope()
    cuts = span_cuts(duplicated_spans(docs, id_col, text_col, k, scope), k)
    if own:
        cuts = materialize_release(cuts, scope)
    return apply_span_cuts(docs, cuts, id_col, text_col)
