"""Boilerplate line removal + quality-quantile filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.boilerplate import (
    boilerplate_lines,
    remove_boilerplate,
)
from wrds_data_pipeline_spark.plans.corpus import quality_quantile_filter

FOOTER = "Subscribe to our newsletter for updates"
NAV = "home | about | contact"


def _docs(spark):
    rows = [
        (1, f"unique article one body text\n{FOOTER}\n{NAV}"),
        (2, f"{NAV}\nsecond article with its own words\n{FOOTER}"),
        (3, f"third piece of content entirely\n  {FOOTER.upper()}  "),
        (4, "a document with no shared lines at all"),
        (5, f"{FOOTER}\n{NAV}"),  # all boilerplate
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_lines_detected_normalized(spark):
    # FOOTER appears in docs 1,2,3,5 (doc 3 upper+padded:
    # normalization must unify); NAV in 1,2,5
    bp = boilerplate_lines(_docs(spark), min_docs=3).collect()
    assert len(bp) == 2
    assert sorted(r.n_docs for r in bp) == [3, 4]


def test_remove_boilerplate_preserves_order(spark):
    out = {
        r.doc_id: r
        for r in remove_boilerplate(_docs(spark), min_docs=3).collect()
    }
    assert out[1].text == "unique article one body text"
    assert out[2].text == "second article with its own words"
    assert out[3].text == "third piece of content entirely"
    assert out[4].text == "a document with no shared lines at all"
    assert out[5].text == ""  # fully boilerplate -> empty, not dropped
    assert out[5].n_lines_removed == 2 and out[5].n_lines_in == 2
    assert out[1].n_lines_removed == 2 and out[1].n_lines_in == 3
    assert out[4].n_lines_removed == 0


def test_remove_boilerplate_multiline_order(spark):
    docs = spark.createDataFrame(
        [
            (1, f"alpha\n{FOOTER}\nbravo\ncharlie"),
            (2, f"{FOOTER}\nx"),
            (3, f"{FOOTER}\ny"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text
        for r in remove_boilerplate(docs, min_docs=3).collect()
    }
    assert out[1] == "alpha\nbravo\ncharlie"


def test_quality_quantile_filter_per_stratum(spark):
    # two strata with disjoint quality ranges: a global threshold
    # would wipe out the low stratum; per-stratum keeps ~30% of each
    rows = [(i, "a", float(i)) for i in range(100)] + [
        (1000 + i, "b", 1000.0 + i) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "stratum", "q"])
    kept = quality_quantile_filter(
        docs, keep_frac=0.3, stratum_col="stratum", quality_col="q"
    )
    by = {
        r.stratum: r.n
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert 25 <= by["a"] <= 35
    assert 25 <= by["b"] <= 35
    # and the kept docs are the top of each stratum
    assert kept.filter((F.col("stratum") == "a") & (F.col("doc_id") < 60)).count() == 0


def test_quality_quantile_filter_global_from_text(spark, driver_tables):
    docs = driver_tables["documents"]
    n = docs.count()
    kept = quality_quantile_filter(docs, keep_frac=0.5).count()
    # the >= cutoff keeps the whole tie mass at the median quality
    # value, so the kept fraction can exceed keep_frac by the tie width
    assert 0.5 * n <= kept < n


# --- paragraph-level keep-first dedup --------------------------------------

QUOTE = "To be, or not to be, that is the question."
LICENSE = "Licensed under the Apache License, Version 2.0"


def _par_docs(spark):
    rows = [
        (1, f"intro paragraph one\n\n{QUOTE}\n\nclosing thoughts"),
        (2, f"{QUOTE}\n\nanother take on the same quote"),  # later copy dropped
        (3, f"{LICENSE}\n\n\n\nbody after a long separator\n\n{LICENSE}"),
        (4, f"  {QUOTE.upper()}  \n\nnormalization unifies case+pad"),
        (5, ""),          # single empty paragraph, bypasses dedup
        (6, None),        # null text passes through
        (7, f"fresh content only\n\n{LICENSE}"),  # later copy dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_keep_first(spark):
    from wrds_data_pipeline_spark.operators.boilerplate import paragraph_dedup

    out = {r.doc_id: r for r in paragraph_dedup(_par_docs(spark)).collect()}
    # first occurrence (doc 1) keeps the quote; doc 2 and doc 4 lose it
    assert QUOTE in out[1].text and out[1].n_dropped == 0
    assert out[2].text == "another take on the same quote" and out[2].n_dropped == 1
    assert out[4].text == "normalization unifies case+pad" and out[4].n_dropped == 1
    # within-doc repeat also collapses: doc 3 keeps one LICENSE copy
    assert out[3].text.count(LICENSE) == 1 and out[3].n_dropped == 1
    assert out[3].text == f"{LICENSE}\n\nbody after a long separator"
    assert out[7].text == "fresh content only" and out[7].n_dropped == 1
    # empty + null docs pass through
    assert out[5].text == "" and out[5].n_dropped == 0
    assert out[6].text is None and out[6].n_paragraphs == 0
    # ordering within each doc preserved
    assert out[1].text == f"intro paragraph one\n\n{QUOTE}\n\nclosing thoughts"


def test_paragraph_dedup_matches_duckdb(spark):
    """Oracle twin: DuckDB replay of keep-first paragraph dedup on the
    raw paragraph strings (no hash — agreement shows the 60-bit hash
    path is collision-free here and the window semantics match)."""
    import duckdb

    from wrds_data_pipeline_spark.operators.boilerplate import paragraph_dedup

    pdf = _par_docs(spark).toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = {
        (r[0], r[1], r[2], r[3])
        for r in con.sql(
            r"""
            WITH split AS (
              SELECT doc_id, regexp_split_to_array(text, '\n{2,}') AS arr
              FROM docs WHERE text IS NOT NULL
            ), pars0 AS (  -- lockstep unnest = posexplode
              SELECT doc_id, unnest(range(len(arr))) AS pos,
                     unnest(arr) AS par
              FROM split
            ), pars AS (
              SELECT doc_id, pos, par,
                     regexp_replace(lower(trim(par)), '\s+', ' ', 'g') AS np
              FROM pars0
            ), kept AS (
              SELECT * FROM (
                SELECT doc_id, pos, par, np,
                       CASE WHEN length(np) < 1 THEN 1
                            ELSE row_number() OVER
                                 (PARTITION BY np ORDER BY doc_id, pos)
                       END AS rn,
                       length(np) >= 1 AS dedupable
                FROM pars)
              WHERE rn = 1
            )
            SELECT p.doc_id,
                   coalesce(string_agg(k.par, e'\n\n' ORDER BY k.pos), '') AS text,
                   count(p.pos) AS n_paragraphs,
                   count(p.pos) FILTER (p.dedupable)
                     - count(k.pos) FILTER (k.dedupable) AS n_dropped
            FROM (SELECT *, length(np) >= 1 AS dedupable FROM pars) p
            LEFT JOIN kept k USING (doc_id, pos)
            GROUP BY p.doc_id
            """
        ).fetchall()
    }
    got = {
        (r.doc_id, r.text, r.n_paragraphs, r.n_dropped)
        for r in paragraph_dedup(_par_docs(spark)).collect()
        if r.text is not None  # null-text rows have no DuckDB twin rows
    }
    assert got == want


def test_paragraph_dedup_properties(spark):
    """Property-style invariants on generated corpora: (1) every
    distinct normalized paragraph survives exactly once corpus-wide,
    (2) surviving paragraphs are a subset of the doc's originals in
    original order, (3) idempotence — a deduped corpus is a fixed
    point."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from wrds_data_pipeline_spark.operators.boilerplate import paragraph_dedup

    par = st.sampled_from(
        ["alpha", "beta beta", "Gamma  ray", "gamma ray", "", "  ", "delta"]
    )
    doc = st.lists(par, min_size=0, max_size=5).map(lambda ps: "\n\n".join(ps))

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=1, max_size=6))
    def check(texts):
        import re

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = paragraph_dedup(docs).toPandas().sort_values("doc_id")
        norm = lambda s: re.sub(r"\s+", " ", s.strip().lower())

        # (1) each distinct normalized non-blank paragraph survives once
        survived = [
            norm(p)
            for t in out["text"]
            for p in t.split("\n\n")
            if norm(p) != ""
        ]
        assert len(survived) == len(set(survived))
        want = {
            norm(p) for t in texts for p in t.split("\n\n") if norm(p) != ""
        }
        assert set(survived) == want

        # (2) per-doc: kept paragraphs are an ordered subsequence
        for did, t in zip(out["doc_id"], out["text"]):
            orig = texts[did].split("\n\n")
            kept = t.split("\n\n") if t != "" else []
            it = iter(orig)
            assert all(any(p == o for o in it) for p in kept), (orig, kept)

        # (3) idempotence on the deduped corpus
        again = (
            paragraph_dedup(
                spark.createDataFrame(
                    list(zip(out["doc_id"], out["text"])),
                    "doc_id long, text string",
                )
            )
            .toPandas()
            .sort_values("doc_id")
        )
        assert again["text"].tolist() == out["text"].tolist()
        assert (again["n_dropped"] == 0).all()

    check()


def test_quantile_filter_keep_low_for_loss_signals(spark):
    """keep_low=True keeps the BOTTOM fraction — the perplexity
    direction (CCNet keeps the least-surprising docs); top and bottom
    halves partition the corpus on a distinct-valued signal."""
    docs = spark.createDataFrame(
        [(i, "txt", float(i)) for i in range(100)],
        ["doc_id", "text", "ce"],
    )
    low = quality_quantile_filter(
        docs, keep_frac=0.5, quality_col="ce", keep_low=True
    )
    high = quality_quantile_filter(docs, keep_frac=0.5, quality_col="ce")
    low_ids = {r["doc_id"] for r in low.collect()}
    high_ids = {r["doc_id"] for r in high.collect()}
    assert max(low_ids) < min(high_ids) or (
        low_ids | high_ids == set(range(100))
    )
    assert all(i < 55 for i in low_ids) and all(i > 45 for i in high_ids)
    assert len(low_ids) >= 45 and len(high_ids) >= 45


def test_paragraph_dedup_duckdb_twin(spark):
    """q63's oracle, preserved verbatim after its round-11 rotation
    out of the registry (slot now checks the gate/salvage composition,
    q66): cross-corpus keep-first paragraph dedup on 50 synthetic
    multi-paragraph documents built from the driver documents table,
    bracketed by a shared header/footer planted in every group, vs
    DuckDB replaying the split -> normalize -> keep-first window ->
    lockstep rebuild on the raw paragraph STRINGS (no hash), so
    agreement also re-checks the 60-bit hash path's collision-freedom
    on this corpus."""
    import duckdb

    from wrds_data_pipeline_spark.operators.boilerplate import (
        paragraph_dedup,
    )

    header = "shared license header reproduced at the top of every page"
    footer = "standard site footer with contact links and copyright"
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    body = F.concat_ws(
        "\n\n",
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s["text"],
        ),
    )
    g = (
        docs.filter(F.col("text").isNotNull())
        .groupBy((F.col("doc_id") % 50).alias("gid"))
        .agg(
            F.concat_ws(
                "\n\n", F.lit(header), body, F.lit(footer)
            ).alias("text")
        )
    )
    got = sorted(
        (r["gid"], r["text"], r["n_paragraphs"], r["n_dropped"])
        for r in paragraph_dedup(g, id_col="gid").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            rf"""
    WITH gdocs AS (
      SELECT doc_id % 50 AS gid,
             '{header}' || e'\n\n'
               || string_agg(text, e'\n\n' ORDER BY doc_id)
               || e'\n\n' || '{footer}' AS text
      FROM documents WHERE text IS NOT NULL
      GROUP BY doc_id % 50
    ), split AS (
      SELECT gid, regexp_split_to_array(text, '\n{{2,}}') AS arr FROM gdocs
    ), pars0 AS (
      SELECT gid, unnest(range(len(arr))) AS pos, unnest(arr) AS par
      FROM split
    ), flagged AS (
      SELECT gid, pos, par,
             regexp_replace(lower(trim(par)), '\s+', ' ', 'g') AS np,
             length(regexp_replace(lower(trim(par)), '\s+', ' ', 'g')) >= 1
               AS dedupable
      FROM pars0
    ), kept AS (
      SELECT * FROM (
        SELECT gid, pos, par, dedupable,
               CASE WHEN NOT dedupable THEN 1
                    ELSE row_number() OVER
                         (PARTITION BY np ORDER BY gid, pos)
               END AS rn
        FROM flagged)
      WHERE rn = 1
    )
    SELECT f.gid AS gid,
           coalesce(string_agg(k.par, e'\n\n' ORDER BY k.pos), '') AS text,
           count(f.pos) AS n_paragraphs,
           count(f.pos) FILTER (f.dedupable)
             - count(k.pos) FILTER (k.dedupable) AS n_dropped
    FROM flagged f
    LEFT JOIN kept k USING (gid, pos)
    GROUP BY f.gid
    """
        ).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
