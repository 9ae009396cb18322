"""Universe builder: the sp500ccm table.

Re-expresses ``cloud_TAQ/sp500ccm_generator.py:1-50`` (and its
near-identical copies at ``TAQpipeline/correlation_matrix_exporter.py:12-53``
and ``graph_code/pyg_graphs.py:99-142``) as one declarative plan:

1. index membership ⋈ daily stock file with interval containment
   (J1: ``a.permno = b.permno AND b.date BETWEEN a.start AND a.ending``),
2. + security-name history with name-validity containment (J2),
3. + CRSP↔Compustat link table filtered to primary live links
   (``SUBSTR(linktype,1,1)='L' AND linkprim IN ('C','P')``,
   sp500ccm_generator.py:35-36) with link-validity containment (J2),
   open-ended links pinned to an explicit ``as_of`` date (the
   reference fills with *today*, sp500ccm_generator.py:40 — we pin
   for determinism),
4. drop the interval bookkeeping columns (P4,
   sp500ccm_generator.py:47).

The reference's merge+query is effectively an *inner* interval join
(the post-filter drops unmatched rows; SURVEY.md J2), which is what we
reproduce by default; ``how='left'`` gives the intent-preserving
variant.

Scale: dsf is the fact side (billions of rows at full scale); the
three dimension tables are small → broadcast them, so the whole
universe build is one scan of dsf with three broadcast hash joins and
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.functions.scalars import pin_open_end
from wrds_data_pipeline_spark.operators.intervals import interval_join


def build_universe(
    dsp500list: DataFrame,
    dsf: DataFrame,
    msenames: DataFrame,
    ccmxpf_linktable: DataFrame,
    as_of,
    how: str = "inner",
) -> DataFrame:
    """sp500ccm: S&P-membership daily returns enriched with names and
    Compustat links, point-in-time correct at every date."""
    # J1: membership ⋈ daily facts (interval containment on date)
    member_days = interval_join(
        dsf, dsp500list,
        keys="permno", point_col="date",
        start_col="start", end_col="ending",
        how="inner",
    )

    # J2: + name history valid at date
    named = interval_join(
        member_days, msenames,
        keys="permno", point_col="date",
        start_col="namedt", end_col="nameendt",
        how=how,
    )

    # link table: primary live links only, open ends pinned to as_of
    links = (
        ccmxpf_linktable
        .filter(F.substring("linktype", 1, 1) == "L")
        .filter(F.col("linkprim").isin("C", "P"))
        .withColumn("linkenddt", pin_open_end("linkenddt", as_of))
    )

    # J2: + link valid at date
    linked = interval_join(
        named, links,
        keys="permno", point_col="date",
        start_col="linkdt", end_col="linkenddt",
        how=how,
    )

    # P4: drop interval bookkeeping (sp500ccm_generator.py:47 drops
    # namedt/nameendt/linktype/linkprim/linkdt/linkenddt)
    return linked.drop(
        "start", "ending", "namedt", "nameendt",
        "linktype", "linkprim", "linkdt", "linkenddt",
    )
