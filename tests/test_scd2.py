"""SCD-2 apply: close/open/carry semantics + round-trip with the
interval join (the consumer side)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.intervals import interval_join
from wrds_data_pipeline_spark.operators.scd2 import scd2_apply

D = datetime.date


def test_scd2_apply(spark):
    history = spark.createDataFrame(
        [
            # closed row (untouched)
            (1, "AAA", D(2020, 1, 1), D(2020, 6, 30)),
            # open, unchanged in snapshot
            (1, "AAB", D(2020, 7, 1), None),
            # open, changed in snapshot → close + reopen
            (2, "BBB", D(2020, 1, 1), None),
            # open, key absent from snapshot → close
            (3, "CCC", D(2020, 1, 1), None),
        ],
        ["permno", "ticker", "valid_from", "valid_to"],
    )
    snapshot = spark.createDataFrame(
        [
            (1, "AAB"),     # unchanged
            (2, "BBX"),     # changed
            (4, "DDD"),     # brand new
        ],
        ["permno", "ticker"],
    )
    as_of = D(2021, 1, 1)
    out = scd2_apply(history, snapshot, "permno", ["ticker"], as_of)
    rows = {(r.permno, r.ticker): (r.valid_from, r.valid_to) for r in out.collect()}

    assert len(rows) == 6
    assert rows[(1, "AAA")] == (D(2020, 1, 1), D(2020, 6, 30))      # closed kept
    assert rows[(1, "AAB")] == (D(2020, 7, 1), None)                # open kept
    assert rows[(2, "BBB")] == (D(2020, 1, 1), D(2020, 12, 31))     # closed at as_of-1
    assert rows[(2, "BBX")] == (as_of, None)                        # reopened
    assert rows[(3, "CCC")] == (D(2020, 1, 1), D(2020, 12, 31))     # disappeared → closed
    assert rows[(4, "DDD")] == (as_of, None)                        # new key


def test_scd2_idempotent(spark):
    """Applying the same snapshot twice changes nothing."""
    history = spark.createDataFrame(
        [(1, "AAA", D(2020, 1, 1), None)],
        "permno int, ticker string, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame([(1, "AAB")], ["permno", "ticker"])
    once = scd2_apply(history, snap, "permno", ["ticker"], D(2021, 1, 1))
    twice = scd2_apply(once, snap, "permno", ["ticker"], D(2021, 1, 1))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_feeds_interval_join(spark):
    """The maintained history answers point-in-time queries correctly
    (the consumer path, plans/universe-style)."""
    history = spark.createDataFrame(
        [(1, "OLD", D(2020, 1, 1), None)],
        "permno int, ticker string, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame([(1, "NEW")], ["permno", "ticker"])
    hist2 = scd2_apply(history, snap, "permno", ["ticker"], D(2021, 1, 1))

    facts = spark.createDataFrame(
        [(1, D(2020, 6, 1)), (1, D(2021, 6, 1))], ["permno", "date"]
    )
    joined = interval_join(
        facts, hist2, keys="permno", point_col="date",
        start_col="valid_from", end_col="valid_to",
    ).select("date", "ticker").collect()
    got = {str(r.date): r.ticker for r in joined}
    assert got == {"2020-06-01": "OLD", "2021-06-01": "NEW"}


def test_scd2_apply_property(spark):
    """Randomized snapshots vs a pure-python SCD-2 replay."""
    import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    BASE = datetime.date(2020, 1, 1)
    attr = st.one_of(st.none(), st.integers(0, 3))

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        open_rows=st.dictionaries(st.integers(1, 4), attr, max_size=4),
        snap=st.dictionaries(st.integers(1, 4), attr, max_size=4),
    )
    def check(open_rows, snap):
        from wrds_data_pipeline_spark.operators.scd2 import scd2_apply

        as_of = BASE + datetime.timedelta(days=5)
        history = spark.createDataFrame(
            [(k, v, BASE, None) for k, v in open_rows.items()],
            "key int, attr int, valid_from date, valid_to date",
        )
        snapshot = spark.createDataFrame(
            [(k, v) for k, v in snap.items()], "key int, attr int"
        )
        def _key(t):
            return tuple((x is None, repr(x)) for x in t)

        got = sorted(
            (
                (r.key, r.attr, r.valid_from, r.valid_to)
                for r in scd2_apply(
                    history, snapshot, "key", ["attr"], as_of
                ).collect()
            ),
            key=_key,
        )

        want = []
        for k, v in open_rows.items():
            if k in snap and snap[k] == v:
                want.append((k, v, BASE, None))          # unchanged, stays open
            else:
                want.append((k, v, BASE, as_of - datetime.timedelta(days=1)))
        for k, v in snap.items():
            if k not in open_rows or open_rows[k] != v:
                want.append((k, v, as_of, None))          # new or changed
        assert got == sorted(want, key=_key)

    check()
