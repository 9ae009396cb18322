"""Cross-document boilerplate removal: drop lines that repeat across
many documents (navigation, cookie banners, footers), keeping each
surviving document's remaining lines in order.

This is the line-level dedup step of the public CCNet / RefinedWeb
recipes: a line is boilerplate when it occurs in >= ``min_docs``
distinct documents (measured on the normalized form — lower, trim,
collapsed whitespace), and every occurrence of a boilerplate line is
removed from every document.

Scale design:
- One posexplode pass → (doc, pos, line_hash).  Distinct-doc counts
  per line are a single hash aggregate with map-side combine.
- The boilerplate relation holds only lines over the threshold —
  typically a tiny fraction of distinct lines — and is joined back by
  left_anti on the int64 hash; AQE broadcasts it when it fits.
- Document reassembly is a per-doc collect_list of (pos, line)
  structs: state is bounded by document length, never by corpus size,
  and the groupBy reuses the exploded relation's doc partitioning.
- Everything is built-in expressions; line identity is the 60-bit
  md5-prefix hash (dedup.shingle_hash_wide) — membership here is
  exact, and the mod-1e9+7 MinHash space would collide rare lines
  into boilerplate at corpus scale (10^8 distinct lines → millions
  of expected 2^30 collisions, ~none at 2^60).  Normalization is the
  repo-canonical functions/text.normalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.text import normalize as _norm_line
from wrds_data_pipeline_spark.operators.dedup import shingle_hash_wide


def doc_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(_id, pos, line, h): newline-split lines with position and the
    normalized-line hash.  Blank lines are kept (position matters for
    reassembly) but never counted as boilerplate."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("h", shingle_hash_wide(_norm_line(F.col("line"))))


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Distinct normalized-line hashes occurring in >= ``min_docs``
    documents: (h, n_docs).  Blank lines excluded."""
    return (
        doc_lines(docs, id_col, text_col)
        .filter(_norm_line(F.col("line")) != "")
        .groupBy("h")
        .agg(F.count_distinct("_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Documents with boilerplate lines removed: (id, text,
    n_lines_in, n_lines_removed).  Line order is preserved; documents
    whose every line was boilerplate come back with empty text (the
    caller's quality/length filters will drop them)."""
    lines = doc_lines(docs, id_col, text_col)
    bp = boilerplate_lines(docs, id_col, text_col, min_docs).select("h")
    kept = lines.join(bp, "h", "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("n_lines_in"))
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            "n_lines_in",
            (
                F.col("n_lines_in") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).alias("n_lines_removed"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """Cross-corpus exact paragraph dedup: every paragraph keeps only
    its FIRST occurrence (smallest (doc_id, pos)) corpus-wide; later
    copies are cut out of their documents and the survivors are
    re-joined in order.  This is the paragraph-level exact-substring
    dedup of the public training-data curation recipes — quoted blocks,
    syndicated passages, and license headers that full-document dedup
    cannot touch because the surrounding text differs.

    Complements ``remove_boilerplate``: that drops a line EVERYWHERE
    once it repeats across ``min_docs`` documents (navigation chrome);
    this keeps exactly one copy of every paragraph regardless of how
    often it repeats (content you want once, not zero times).

    Semantics:
    - paragraphs = ``\\n{2,}``-separated blocks; matching is on the
      normalized form (lower/trim/collapse-ws, the repo-canonical
      ``functions/text.normalize``) via the 60-bit exact-membership
      hash; the ORIGINAL paragraph text is what survives.
    - paragraphs whose normalized form is shorter than ``min_chars``
      (blank separators by default) bypass dedup and are always kept.
    - null-text documents pass through unchanged (no paragraphs).

    Scale design: one posexplode pass; keep-first is a window MIN of
    (doc_id, pos) partitioned by paragraph hash — one shuffle of the
    paragraph relation, the same shape as ``plans/corpus.curate``'s
    fingerprint window (no corpus-sized broadcast, no join back).
    Bypass rows get a synthetic per-row partition key (flag +
    xxhash64(doc, pos)) so the hash-of-empty-string partition cannot
    become a corpus-sized hot key — blank paragraphs are a constant
    fraction of every document, the one guaranteed-skewed key at
    100 TB.  Reassembly state is bounded by document length.
    """
    pars = paragraph_relation(docs, id_col, text_col, min_chars)
    return _rebuild_paragraph_docs(
        docs, pars, _keep_first_paragraphs(pars), id_col, text_col
    )


def paragraph_relation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """(_id, pos, par, _bypass, _h): the exploded paragraph relation.
    ``_h`` is the dedup key — the normalized-paragraph hash for
    dedupable rows, a synthetic per-row xxhash64 for bypass rows (so
    the empty-paragraph hash can never become a corpus hot key)."""
    pars = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), r"\n{2,}")).alias("pos", "par"),
    ).withColumn("_bypass", F.length(_norm_line(F.col("par"))) < min_chars)
    return pars.withColumn(
        "_h",
        F.when(
            F.col("_bypass"), F.xxhash64(F.col("_id"), F.col("pos"))
        ).otherwise(shingle_hash_wide(_norm_line(F.col("par")))),
    )


def _keep_first_paragraphs(
    pars: DataFrame, seen: DataFrame | None = None
) -> DataFrame:
    """Keep-first filter over a paragraph relation: bypass rows always
    survive; dedupable rows survive iff (a) their hash is not in the
    optional ``seen`` relation (single column ``h`` — previously-seen
    hashes, the streaming index) and (b) they are the min (doc, pos)
    occurrence of their hash within ``pars``."""
    from pyspark.sql.window import Window

    if seen is not None:
        # condition-scoped anti join: bypass rows can never match (their
        # synthetic key must not collide a row away)
        pars = pars.alias("p").join(
            seen.alias("s"),
            (F.col("p._h") == F.col("s.h")) & (~F.col("p._bypass")),
            "left_anti",
        )
    w = Window.partitionBy(F.col("_bypass"), F.col("_h"))
    first = F.min(F.struct(F.col("_id"), F.col("pos"))).over(w)
    return (
        pars.withColumn("_first", first)
        .filter(
            F.col("_bypass")
            | (
                (F.col("_first._id") == F.col("_id"))
                & (F.col("_first.pos") == F.col("pos"))
            )
        )
        .drop("_first")
    )


def _rebuild_paragraph_docs(
    docs: DataFrame,
    pars: DataFrame,
    kept: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Reassemble (id, text, n_paragraphs, n_dropped) from the full
    paragraph relation and its surviving subset."""
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "par"))),
                lambda s: s["par"],
            ),
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_n_kept"),
        F.count_if(~F.col("_bypass")).alias("_n_kept_dedupable"),
    )
    totals = pars.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.count_if(~F.col("_bypass")).alias("_n_dedupable"),
    )
    base = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_orig")
    )
    return (
        base.join(totals, "_id", "left")
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_orig").isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("_new_text"), F.lit("")))
            .alias(text_col),
            F.coalesce(F.col("n_paragraphs"), F.lit(0)).alias("n_paragraphs"),
            (
                F.coalesce(F.col("_n_dedupable"), F.lit(0))
                - F.coalesce(F.col("_n_kept_dedupable"), F.lit(0))
            ).alias("n_dropped"),
        )
    )
