"""Property-based checks for the join operators' edge semantics:
asof_join vs a per-key pandas replay; interval_join vs a filter-based
reference (open intervals, equal timestamps, re-entry)."""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime.date(2020, 1, 1)

# small day offsets so collisions (equal dates) actually happen
day = st.integers(min_value=0, max_value=20)

left_rows = st.lists(st.tuples(st.integers(1, 3), day), min_size=1, max_size=12)
right_rows = st.lists(
    st.tuples(st.integers(1, 3), day, st.floats(0, 100, allow_nan=False)),
    min_size=0, max_size=12,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_property(spark, lrows, rrows):
    from wrds_data_pipeline_spark.operators.asof import asof_join

    # dedupe right rows on (key, ts): equal publish instants make
    # "the latest row" ill-defined in any engine
    rmap = {}
    for k, d, v in rrows:
        rmap[(k, d)] = v
    left = spark.createDataFrame(
        [(k, BASE + datetime.timedelta(days=d)) for k, d in set(lrows)],
        "key int, ts date",
    )
    right = spark.createDataFrame(
        [(k, BASE + datetime.timedelta(days=d), v) for (k, d), v in rmap.items()],
        "key int, rts date, val double",
    )
    got = asof_join(
        left, right, key_cols="key", left_ts="ts", right_ts="rts",
        value_cols=["val"], tolerance_expr="INTERVAL 5 DAYS",
    ).toPandas()

    for row in got.itertuples():
        k, t = row.key, row.ts
        cands = [
            (d, v) for (kk, d), v in rmap.items()
            if kk == k and BASE + datetime.timedelta(days=d) <= t
            and BASE + datetime.timedelta(days=d) >= t - datetime.timedelta(days=5)
        ]
        if not cands:
            assert pd.isna(row.val), (k, t)
        else:
            want_d, want_v = max(cands)
            assert row.val == want_v, (k, t)
            assert row.asof_ts == BASE + datetime.timedelta(days=want_d)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    facts=st.lists(st.tuples(st.integers(1, 3), day), min_size=1, max_size=15),
    dims=st.lists(
        st.tuples(st.integers(1, 3), day, day, st.booleans()),
        min_size=0, max_size=8,
    ),
)
def test_interval_join_property(spark, facts, dims):
    from wrds_data_pipeline_spark.operators.intervals import interval_join

    fact = spark.createDataFrame(
        [(k, BASE + datetime.timedelta(days=d)) for k, d in facts],
        "key int, point date",
    )
    dim_rows = []
    for i, (k, lo, hi, open_end) in enumerate(dims):
        lo, hi = min(lo, hi), max(lo, hi)
        dim_rows.append((
            k,
            BASE + datetime.timedelta(days=lo),
            None if open_end else BASE + datetime.timedelta(days=hi),
            i,
        ))
    dim = spark.createDataFrame(
        dim_rows, "key int, lo date, hi date, dim_id int"
    )

    got = interval_join(
        fact, dim, keys="key", point_col="point",
        start_col="lo", end_col="hi", how="inner",
    ).toPandas()

    want = 0
    for k, d in facts:
        p = BASE + datetime.timedelta(days=d)
        for (kk, lo, hi, dim_id) in dim_rows:
            if kk == k and lo <= p and (hi is None or p <= hi):
                want += 1
    assert len(got) == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    facts=st.lists(st.tuples(st.integers(1, 999), day), min_size=1, max_size=15),
    dims=st.lists(st.tuples(day, day), min_size=0, max_size=8),
    gran=st.sampled_from([1, 3, 7, 30]),
)
def test_interval_join_bucketed_property(spark, facts, dims, gran):
    """No-equi-key bucketed range join == cross-join + filter, for any
    bucket granularity (incl. buckets larger than every interval)."""
    from wrds_data_pipeline_spark.operators.intervals import interval_join_bucketed

    fact = spark.createDataFrame(
        [(i, BASE + datetime.timedelta(days=d)) for i, (_, d) in enumerate(facts)],
        "fid int, point date",
    )
    dim = spark.createDataFrame(
        [
            (j, BASE + datetime.timedelta(days=min(lo, hi)),
             BASE + datetime.timedelta(days=max(lo, hi)))
            for j, (lo, hi) in enumerate(dims)
        ],
        "did int, lo date, hi date",
    )
    got = sorted(
        (r.fid, r.did)
        for r in interval_join_bucketed(
            fact, dim, "point", "lo", "hi", granularity_days=gran
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (_, d) in enumerate(facts)
        for j, (lo, hi) in enumerate(dims)
        if min(lo, hi) <= d <= max(lo, hi)
    )
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    facts=st.lists(st.tuples(st.integers(1, 3), day), min_size=1, max_size=12),
    dims=st.lists(
        st.tuples(st.integers(1, 3), day, day, st.booleans()),
        min_size=0, max_size=6,
    ),
)
def test_interval_join_left_property(spark, facts, dims):
    """Left interval join: every fact row survives; matched rows
    carry the dim, unmatched carry NULLs — the 'true left' variant
    the reference's merge-then-filter could not express."""
    from wrds_data_pipeline_spark.operators.intervals import interval_join

    fact = spark.createDataFrame(
        [(i, k, BASE + datetime.timedelta(days=d)) for i, (k, d) in enumerate(facts)],
        "fid int, key int, point date",
    )
    dim_rows = []
    for i, (k, lo, hi, open_end) in enumerate(dims):
        lo, hi = min(lo, hi), max(lo, hi)
        dim_rows.append((
            k,
            BASE + datetime.timedelta(days=lo),
            None if open_end else BASE + datetime.timedelta(days=hi),
            i,
        ))
    dim = spark.createDataFrame(dim_rows, "key int, lo date, hi date, dim_id int")

    got = interval_join(
        fact, dim, keys="key", point_col="point",
        start_col="lo", end_col="hi", how="left",
    ).toPandas()

    want = {}
    for i, (k, d) in enumerate(facts):
        p = BASE + datetime.timedelta(days=d)
        matches = [
            dim_id for (kk, lo, hi, dim_id) in dim_rows
            if kk == k and lo <= p and (hi is None or p <= hi)
        ]
        want[i] = sorted(matches)

    import pandas as pd
    got_by_fid = {
        fid: sorted(int(x) for x in g["dim_id"].dropna())
        for fid, g in got.groupby("fid")
    }
    for fid, matches in want.items():
        assert fid in got_by_fid, fid                       # fact survives
        assert got_by_fid[fid] == matches, fid
        if not matches:  # exactly one all-NULL row
            assert len(got[got["fid"] == fid]) == 1
            assert pd.isna(got[got["fid"] == fid]["dim_id"]).all()
