"""The bench output contract the driver's tail capture depends on
(VERDICT r11 missing #4): the stream ends [verbose aux] [compact aux]
[headline] in ascending priority, the final line is the parseable
headline, and the compact spread's arrays align 1:1 with the headline
"queries" key order while fitting comfortably inside the ~2000-byte
tail beside the headline."""

from __future__ import annotations

import json
import time


def test_bench_emits_three_aligned_json_lines(spark, monkeypatch, capsys):
    import bench
    from wrds_data_pipeline_spark import driver_queries

    def q_fast(s, sf_dir):
        return s.range(3)

    def q_slow(s, sf_dir):
        time.sleep(0.01)
        return s.range(5)

    monkeypatch.setattr(bench, "HEADLINE", ["qA_fast", "qB_slow"])
    monkeypatch.setitem(driver_queries.QUERIES, "qA_fast", q_fast)
    monkeypatch.setitem(driver_queries.QUERIES, "qB_slow", q_slow)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "2")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # bench builds its own session via get_spark — the shared test
    # session satisfies it (getOrCreate)
    capsys.readouterr()
    bench.main()
    out_lines = [
        l for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    assert len(out_lines) == 3
    verbose, compact, head = (json.loads(l) for l in out_lines)

    assert head["metric"] == "headline_query_wall_seconds"
    assert list(head["queries"]) == ["qA_fast", "qB_slow"]
    assert abs(sum(head["queries"].values()) - head["value"]) < 0.01

    assert verbose["aux"] == "bench_diagnostics"
    assert set(verbose["query_spread_min_headline"]) == set(head["queries"])
    for name, (mn, sel) in verbose["query_spread_min_headline"].items():
        assert mn <= sel == head["queries"][name]
    # the steal-robust protocol self-describes (VERDICT r12 missing
    # #2): bound, per-query extra budget, and the selection rule are
    # in the stored record, so a cross-round reader needs no forensics
    proto = verbose["protocol"]
    assert proto["stat"] == "median_of_calm_repeats_else_min_steal_sample"
    assert proto["steal_bound_pct"] > 0
    assert proto["max_extra_repeats_per_query"] >= 0
    assert proto["extra_repeats_run"] >= 0

    assert compact["aux"] == "spread"
    assert compact["order"] == "headline_queries_keys"
    # stormy = #queries whose headline sample itself rode steal above
    # the bound; pinned to the sel_steal array it summarizes (the box
    # running this test may genuinely be stormy — that's the point)
    assert compact["stormy"] == sum(
        1
        for s in compact["sel_steal"]
        if s is not None and s > proto["steal_bound_pct"]
    )
    assert len(compact["mins"]) == len(compact["steal_pct"]) == 2
    # sel_steal: the steal stamped on the sample(s) the headline used
    # — on a calm box every entry is None or <= the bound
    assert len(compact["sel_steal"]) == 2
    for s in compact["sel_steal"]:
        assert s is None or isinstance(s, (int, float))
    # 1:1 alignment with the headline key order
    for i, name in enumerate(head["queries"]):
        assert (
            compact["mins"][i]
            == verbose["query_spread_min_headline"][name][0]
        )
    # the tail-capture budget: compact spread + headline must fit the
    # driver's ~2000-byte window together
    assert len(out_lines[1]) + len(out_lines[2]) < 1900


def test_bench_headline_excludes_stolen_repeats(spark, monkeypatch, capsys):
    """A repeat that rode a steal burst must not move the headline:
    fake the tick counter so repeat #2 of the query sees huge steal,
    and make that repeat artificially slow — the headline must come
    out of the calm repeats only."""
    import bench
    from wrds_data_pipeline_spark import driver_queries

    calls = {"n": 0}

    def q(s, sf_dir):
        calls["n"] += 1
        # warm pass is call 1; timed repeats are calls 2..4 — make the
        # repeat whose window we'll mark stolen also the slow one.
        # 3.0s (not 0.5s): the calm repeats' wall is real wall-clock,
        # and a loaded box can push a trivial count() past 0.5s — the
        # margin must dwarf ambient contention, not just the idle case.
        if calls["n"] == 3:
            time.sleep(3.0)
        return s.range(2)

    # tick stream: each _one_timed_run reads ticks before/after.  Mark
    # the second timed repeat's window as 50%-steal, everything else
    # calm.  Layout of _cpu_ticks() calls in main(): 1 window-start,
    # then per repeat (before, after), then 1 per-query window end,
    # then 1 bench-window end.
    seq = iter(
        [
            (0, 1000),          # cpu_start (bench window)
            (0, 1000),          # per-query window start (q_ticks0)
            (0, 1000),          # repeat 1 start
            (0, 2000),          # repeat 1 end: steal 0%
            (0, 2000),          # repeat 2 start
            (600, 3200),        # repeat 2 end: 600/1200 = 50% steal
            (600, 3200),        # repeat 3 start
            (600, 4200),        # repeat 3 end: 0% steal
            (600, 4200),        # per-query window end
            (600, 4300),        # bench window end
        ]
    )
    monkeypatch.setattr(bench, "_cpu_ticks", lambda: next(seq, (600, 5000)))
    monkeypatch.setattr(bench, "HEADLINE", ["qS_stolen"])
    monkeypatch.setitem(driver_queries.QUERIES, "qS_stolen", q)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    capsys.readouterr()
    bench.main()
    out_lines = [
        l for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    verbose, compact, head = (json.loads(l) for l in out_lines)
    # the 3.0s-slow stolen repeat is excluded: headline well under it
    assert head["queries"]["qS_stolen"] < 3.0
    assert compact["sel_steal"][0] is None or compact["sel_steal"][0] <= 10
    # and no extra repeats were needed (calm samples existed)
    assert verbose["protocol"]["extra_repeats_run"] == 0


def test_bench_end_of_run_retry_rescues_stormy_query(
    spark, monkeypatch, capsys
):
    """VERDICT r13 missing #2: a query whose inline repeats (base +
    extras) ALL rode a steal storm must be re-queued at the END of
    the run, where a calm window rescues its headline — the record
    closes at stormy: 0 instead of stamping the storm."""
    import bench
    from wrds_data_pipeline_spark import driver_queries

    calls = {"n": 0}

    def q(s, sf_dir):
        calls["n"] += 1
        # call 1 = warm; calls 2-3 = stolen inline repeats (slow);
        # call 4 = the end-of-run retry (fast, calm).  3.0s (not
        # 0.5s): the calm retry's wall is real wall-clock, and a
        # loaded box can push a trivial count() past 0.5s — the
        # margin must dwarf ambient contention, not just the idle
        # case (same fix as test_bench_headline_excludes_stolen_repeats).
        if calls["n"] in (2, 3):
            time.sleep(3.0)
        return s.range(2)

    seq = iter(
        [
            (0, 1000),        # cpu_start (bench window)
            (0, 1000),        # per-query window start
            (0, 1000),        # inline repeat 1 start
            (600, 2200),      # repeat 1 end: 600/1200 = 50% steal
            (600, 2200),      # inline extra start
            (1200, 3400),     # extra end: 50% steal
            (1200, 3400),     # per-query window end
            (1200, 3400),     # end-of-run retry start
            (1200, 4400),     # retry end: 0% steal — CALM
            (1200, 4500),     # bench window end
        ]
    )
    monkeypatch.setattr(bench, "_cpu_ticks", lambda: next(seq, (1200, 5000)))
    monkeypatch.setattr(bench, "HEADLINE", ["qR_rescued"])
    monkeypatch.setitem(driver_queries.QUERIES, "qR_rescued", q)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_EXTRA", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_EXTRA_WALL", "60")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    capsys.readouterr()
    bench.main()
    out_lines = [
        l for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    verbose, compact, head = (json.loads(l) for l in out_lines)
    # the retry's calm sample headlines: well under the 3.0s storms
    assert head["queries"]["qR_rescued"] < 3.0
    assert compact["stormy"] == 0
    assert compact["retry"] == 1
    assert compact["sel_steal"][0] is None or compact["sel_steal"][0] <= 10
    assert verbose["protocol"]["retry_repeats_run"] == 1
    assert verbose["protocol"]["retry_wall_cap_s"] == 60.0


def test_bench_retry_wall_cap_exhaustion_keeps_stormy_stamp(
    spark, monkeypatch, capsys
):
    """The truly-unlucky case stays honest: with a zero retry wall
    cap (a fully-stormy host in miniature), the headline is the
    least-stolen sample and the record still says stormy."""
    import bench
    from wrds_data_pipeline_spark import driver_queries

    def q(s, sf_dir):
        return s.range(2)

    seq = iter(
        [
            (0, 1000),        # cpu_start
            (0, 1000),        # per-query window start
            (0, 1000),        # repeat 1 start
            (600, 2200),      # repeat 1 end: 50% steal
            (600, 2200),      # inline extra start
            (1140, 3400),     # extra end: 540/1200 = 45% steal
            (1140, 3400),     # per-query window end
            (1140, 3500),     # bench window end (no retry calls: cap 0)
        ]
    )
    monkeypatch.setattr(bench, "_cpu_ticks", lambda: next(seq, (1140, 5000)))
    monkeypatch.setattr(bench, "HEADLINE", ["qX_stormy"])
    monkeypatch.setitem(driver_queries.QUERIES, "qX_stormy", q)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_EXTRA", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_EXTRA_WALL", "0")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    capsys.readouterr()
    bench.main()
    out_lines = [
        l for l in capsys.readouterr().out.splitlines() if l.strip()
    ]
    verbose, compact, head = (json.loads(l) for l in out_lines)
    assert compact["stormy"] == 1
    assert compact["retry"] == 0
    # least-stolen sample selected: the 45% extra, its steal stamped
    assert compact["sel_steal"][0] == 45.0


def test_bench_headline_set_unchanged():
    """The driver compares rounds by these keys; an accidental edit
    here silently breaks round-over-round tracking."""
    import bench

    assert len(bench.HEADLINE) == 31  # +q67_media_near_dup in r14
    assert bench.HEADLINE[0] == "q01_pricing_summary"
    assert bench.HEADLINE[-1] == "q67_media_near_dup"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
