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


# --- Hypothesis: scd2_apply vs a pure-python oracle -------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

AS_OF = D(2021, 6, 15)
VALS = st.sampled_from(["A", "B", "C", None])  # None exercises <=> compare

history_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # key
        VALS,                                           # attribute
        st.integers(min_value=0, max_value=300),        # start offset
        st.one_of(st.none(), st.integers(min_value=301, max_value=400)),
    ),
    max_size=12,
)
snapshot_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=6), VALS, max_size=6
)


def _scd2_oracle(history, snapshot):
    out = []
    open_rows = set()
    for k, v, s, e in history:
        if e is not None:
            out.append((k, v, s, e))            # closed: untouched
        elif k in snapshot and snapshot[k] == v:
            out.append((k, v, s, None))         # unchanged: stays open
            open_rows.add((k, v))
        else:
            out.append((k, v, s, "closed"))     # changed/gone: close
    for k, v in snapshot.items():
        if (k, v) not in open_rows:
            out.append((k, v, "as_of", None))   # new/changed: open
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(history=history_strategy, snapshot=snapshot_strategy)
def test_scd2_apply_property(spark, history, snapshot):
    # the operator contract assumes ≤1 open row per key (an SCD-2
    # invariant); drop extra opens deterministically
    seen_open, hist = set(), []
    for k, v, s, e in history:
        if e is None:
            if k in seen_open:
                continue
            seen_open.add(k)
        hist.append((k, v, s, e))
    if not hist and not snapshot:
        return

    base = D(2020, 1, 1)
    hrows = [
        (k, v, base + datetime.timedelta(days=s),
         None if e is None else base + datetime.timedelta(days=e))
        for k, v, s, e in hist
    ]
    hdf = spark.createDataFrame(
        hrows, "permno int, ticker string, valid_from date, valid_to date"
    )
    sdf = spark.createDataFrame(
        list(snapshot.items()) or [(None, None)], "permno int, ticker string"
    )
    if not snapshot:
        sdf = sdf.filter("permno IS NOT NULL")

    out = scd2_apply(hdf, sdf, "permno", ["ticker"], AS_OF)
    got = sorted(
        (
            (r.permno, r.ticker,
             "as_of" if r.valid_from == AS_OF else (r.valid_from - base).days,
             "closed" if r.valid_to == AS_OF - datetime.timedelta(days=1)
             else (None if r.valid_to is None else (r.valid_to - base).days))
            for r in out.collect()
        ),
        key=lambda r: tuple(str(x) for x in r),
    )
    want = _scd2_oracle(hist, snapshot)
    assert got == want

    # idempotence: re-applying the same snapshot is a no-op
    again = scd2_apply(out, sdf, "permno", ["ticker"], AS_OF)
    skey = lambda r: tuple(str(x) for x in r)  # noqa: E731  (None-safe sort)
    assert sorted(map(tuple, out.collect()), key=skey) == sorted(
        map(tuple, again.collect()), key=skey
    )
