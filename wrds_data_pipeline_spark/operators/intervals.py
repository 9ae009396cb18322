"""Interval (validity-range / point-in-time) joins.

The reference's central join shape: an equi-key join plus a
containment predicate on a validity interval —

- index membership:  ``crsp.dsp500list a JOIN crsp.dsf b ON
  a.permno = b.permno AND b.date BETWEEN a.start AND a.ending``
  (``cloud_TAQ/sp500ccm_generator.py:7-13``; SURVEY.md J1)
- SCD-2 dimension enrichment: pandas ``merge(how='left')`` followed by
  ``.query('date >= namedt and date <= nameendt')``
  (``cloud_TAQ/sp500ccm_generator.py:24-28,43-47``; SURVEY.md J2).
  NB: the reference's post-filter silently drops unmatched left rows,
  so the *effective* semantics are an inner interval join; we put the
  interval predicate in the join condition so both inner and a true
  left variant are expressible.

Scale notes: with an equi key present, Catalyst plans a hash/sort-merge
join on the key with the range as a residual filter — the right plan;
AQE handles key skew.  Dimension sides (membership lists, name
histories, link tables) are O(10^5) rows ≪ fact sides, so we hint
``broadcast`` to remove the shuffle entirely at 100 TB fact scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str] | str,
    point_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
    broadcast_dim: bool = True,
    closed: str = "both",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equal keys + point-in-interval.

    ``closed`` ∈ {'both','left','right','neither'} controls interval
    endpoint inclusivity (the reference always uses BETWEEN = 'both').
    A NULL ``end_col`` is treated as an open interval (still valid) —
    callers wanting the reference's fill-with-as-of behavior should
    ``coalesce`` first (see functions.scalars.pin_open_end).
    """
    if isinstance(keys, str):
        keys = [keys]
    d = F.broadcast(dim) if broadcast_dim else dim

    point = fact[point_col]
    lo, hi = d[start_col], d[end_col]
    ge: Column = point >= lo if closed in ("both", "left") else point > lo
    le: Column = point <= hi if closed in ("both", "right") else point < hi
    cond = ge & (le | hi.isNull())
    for k in keys:
        cond = (fact[k] == d[k]) & cond

    joined = fact.join(d, cond, how)
    # drop the duplicated key columns from the dim side
    for k in keys:
        joined = joined.drop(d[k])
    return joined


def point_in_time_filter(
    df: DataFrame, as_of, start_col: str, end_col: str
) -> DataFrame:
    """Membership snapshot at one instant (SURVEY.md P15):
    ``start <= as_of <= ending`` — the per-day universe filter of
    ``cloud_TAQ/taq_chunks.py:122``.  NULL end = still open."""
    lit = F.lit(as_of)
    return df.filter(
        (F.col(start_col) <= lit)
        & ((F.col(end_col) >= lit) | F.col(end_col).isNull())
    )


def interval_join_bucketed(
    fact: DataFrame,
    dim: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    granularity_days: int = 30,
    keys: list[str] | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Range join for interval joins with **no (or weak) equi key** —
    the case Catalyst would plan as a cartesian product + filter
    (SURVEY §4 item 3).

    Standard bucketed-interval technique: each dim interval is
    exploded into the coarse ``granularity_days`` buckets it spans,
    each fact point maps to exactly one bucket, and the join becomes
    an equi join on bucket (+ any ``keys``) with the exact
    containment predicate as a residual condition.  A (fact, dim)
    match can only occur in the fact's single bucket, so no dedup is
    needed and ``how='left'`` works unchanged.

    Cost model: shuffle ∝ |fact| + Σ(interval_span / granularity);
    pick granularity near the median interval span so typical
    intervals explode into ~1-2 buckets.  Long-tail intervals fan out
    — that is the intended trade (bounded, linear) versus the
    cartesian plan (quadratic).  Open-ended intervals must be pinned
    first (functions.scalars.pin_open_end): an unbounded span has no
    finite bucket list.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = keys or []

    g = int(granularity_days)
    fb = F.floor(F.unix_date(F.col(point_col).cast("date")) / g)
    lo_b = F.floor(F.unix_date(F.col(start_col).cast("date")) / g)
    hi_b = F.floor(F.unix_date(F.col(end_col).cast("date")) / g)

    d = dim.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    f = fact.withColumn("_bucket", fb)

    cond = f["_bucket"] == d["_bucket"]
    for k in keys:
        cond = cond & (f[k] == d[k])
    cond = (
        cond
        & (f[point_col] >= d[start_col])
        & (f[point_col] <= d[end_col])
    )
    joined = f.join(d, cond, how).drop(d["_bucket"]).drop("_bucket")
    for k in keys:
        joined = joined.drop(d[k])
    return joined
