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
    assert set(verbose["query_spread_min_median"]) == set(head["queries"])
    for name, (mn, med) in verbose["query_spread_min_median"].items():
        assert mn <= med == head["queries"][name]

    assert compact["aux"] == "spread"
    assert compact["order"] == "headline_queries_keys"
    assert len(compact["mins"]) == len(compact["steal_pct"]) == 2
    # 1:1 alignment with the headline key order
    for i, name in enumerate(head["queries"]):
        assert compact["mins"][i] == verbose["query_spread_min_median"][name][0]
    # the tail-capture budget: compact spread + headline must fit the
    # driver's ~2000-byte window together
    assert len(out_lines[1]) + len(out_lines[2]) < 1900


def test_bench_headline_set_unchanged():
    """The driver compares rounds by these keys; an accidental edit
    here silently breaks round-over-round tracking."""
    import bench

    assert len(bench.HEADLINE) == 30
    assert bench.HEADLINE[0] == "q01_pricing_summary"
    assert bench.HEADLINE[-1] == "q66_gated_near_dup"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
