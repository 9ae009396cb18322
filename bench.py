"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints THREE JSON lines, ascending priority for a tail-truncating
capture (the driver keeps ~2000 bytes and parses the FINAL line):
  {"aux": "bench_diagnostics", ...}   verbose named spreads (sacrificial)
  {"aux": "spread", "mins": [...], "steal_pct": [...], "sel_steal":
      [...]}  compact, aligned 1:1 with the headline "queries" key order
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline defends itself against host CPU steal (VERDICT r12
missing #2): every repeat's /proc/stat steal window is measured,
contended repeats (> SPARK_GRAFT_BENCH_STEAL_BOUND %, default 10) are
excluded and re-run (up to SPARK_GRAFT_BENCH_MAX_EXTRA extras per
query), and the stored number is the median of CALM repeats — so a
round-over-round delta means the tree changed, not the weather.

Headline set: one query per engine subsystem — aggregation, joins
(broadcast + interval), window/as-of, resample+ffill, pivot,
correlation, dedup (exact + LSH), text stats, embedding top-k —
i.e. the paths whose scaling actually matters at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_broadcast_dims",
    "q04_interval_join",
    "q07_topk_per_group",
    "q09_asof_join",
    "q10_tumbling_window",
    "q13_resample_ffill",
    "q14_pivot_panel",
    "q15_corr_pairs",
    "q23_exact_dedup",
    "q26_jaccard_pairs",
    "q27_minhash_lsh",
    "q28_simhash",
    "q29_embedding_topk",
    # LLM-corpus family (round 4): make round-over-round regressions
    # in the curation stages visible in BENCH itself, not just notes —
    # end-to-end curation, dup-group resolution (connected
    # components), sequence packing, contamination + boilerplate.
    "q43_curation_report",
    "q52_dup_groups",
    "q53_pack_sequences",
    "q54_corpus_hygiene",
    # round 5: the rest of the corpus family tracked round-over-round
    # (VERDICT r4 #8) — chunking, semantic dedup (IVF cells), TF-IDF,
    # unigram-LM cross-entropy — plus the new text-signals composite.
    "q55_chunk_documents",
    "q56_semantic_dedup",
    "q57_tfidf_keywords",
    "q58_cross_entropy",
    "q59_text_signals",
    # round 6: the ANN family tracked round-over-round (VERDICT r5 #2)
    # — auto-scaled LSH near-dup pairs and the IVF probe top-k.
    "q36_embedding_dups",
    "q44_ann_ivf_topk",
    # round 6 (late): token-level duplicated-span removal — the
    # heaviest dedup rung (corpus-token-mass keep-first aggregate),
    # registered as q61 this round — and the continuous-ingest probe
    # (increment vs stored band table), the production path whose
    # regression matters most for streaming deployments.
    "q61_span_dedup",
    "q60_incremental_lsh",
    # round 7: shingle containment (the subset/quote detector),
    # registered as q62 by rotating q11.
    "q62_containment_pairs",
    # round 9: winnowing fingerprints, re-registered as q65 by
    # rotating q47 — completes round-over-round tracking of the whole
    # dedup family.
    "q65_winnowing",
    # round 11: the gate/salvage hot path on a derived hot-bucket
    # corpus (q66, rotated in for q63 — whose paragraph-dedup oracle
    # lives on as a DuckDB-twin pytest): the one dedup configuration
    # BENCH never exercised, since the sf0.1 documents table has no
    # naturally hot LSH buckets (census max 16 vs bound 256).
    "q66_gated_near_dup",
    # round 14: perceptual-hash media near-dup (decode-boundary dhash
    # → banded Hamming join) tracked round-over-round from birth.
    "q67_media_near_dup",
]




def _cpu_ticks():
    """(steal, busy) tick totals from /proc/stat line 1, or None when
    unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        vals = [int(x) for x in f[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        steal = vals[7] if len(vals) > 7 else 0
        busy = sum(vals) - idle
        return steal, busy
    except (OSError, ValueError, IndexError):
        return None


def _steal_share_pct(start, end):
    if start is None or end is None:
        return None
    dsteal = end[0] - start[0]
    dbusy = end[1] - start[1]
    if dbusy <= 0:
        return None
    return round(100.0 * dsteal / dbusy, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from wrds_data_pipeline_spark import driver_queries
    from wrds_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm pass: run every headline query once, untimed — parquet
    # footers, codegen, Arrow workers, and broadcast machinery all
    # first-touch here, so the timed pass measures steady-state plans
    # (round-2 showed ±18% cold-start jitter on sub-second queries,
    # large enough to mask real plan regressions).
    for name in HEADLINE:
        driver_queries.QUERIES[name](spark, sf_dir).count()

    # Noise protocol (round 7, VERDICT r6 next #8): the shared box's
    # ambient load inflated late-session readings ~40% in r6, making
    # round-over-round deltas ambiguous.  Three timed repeats per
    # query, report the MEDIAN (best-of hides sustained contention;
    # the median is robust to one descheduled run either way), and
    # stamp the 1-minute load average before/after so BENCH_rNN
    # records the conditions it ran under.
    load_start = os.getloadavg()[0]
    cpu_start = _cpu_ticks()
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # Steal-robust headline (round 13, VERDICT r12 missing #2): two
    # rounds running, the stored medians measured the HOST's noisy
    # neighbors, not the tree (r12: 32.9% window steal, every
    # comparable median +1.0-4.5x, rank-correlated with per-query
    # steal).  Fix the HEADLINE, not just the audit trail: measure
    # steal per REPEAT; a repeat that rode a steal burst above
    # STEAL_BOUND_PCT is disqualified from the headline; when ALL
    # base repeats are contended, re-run (up to MAX_EXTRA more) until
    # a calm sample appears.  Headline = median over CALM samples
    # (median within calm keeps the one-deschedule robustness the old
    # protocol had); if no calm window ever appears, the
    # minimum-steal sample, with its steal stamped so the round
    # record says so.
    steal_bound = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_BOUND", "10"))
    max_extra = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "3")))
    # Calm-seeking completion (round 14, VERDICT r13 missing #2): the
    # r13 inline-extras defense saturated on 6/30 queries — steal
    # BURSTS on this host last minutes, so re-running immediately just
    # re-measures the same storm.  Queries whose inline repeats were
    # all stolen are RE-QUEUED AT THE END of the run (minutes later;
    # storms rotate) and cycled round-robin under a total wall cap
    # until each sees one calm window or the cap exhausts.
    retry_wall_cap = float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA_WALL", "240")
    )
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    q_steal: dict[str, float | None] = {}
    sel_steal: dict[str, float | None] = {}
    all_samples: dict[str, list[tuple[float, float | None]]] = {}
    rows_seen: dict[str, int] = {}
    extra_runs = 0
    retry_runs = 0

    def _calm(s):
        # unmeasurable steal (non-Linux) counts as calm: there is
        # nothing to defend against that we can see
        return s[1] is None or s[1] <= steal_bound

    def _one_timed_run(name):
        fn = driver_queries.QUERIES[name]
        r_ticks0 = _cpu_ticks()
        t0 = time.time()
        rows_seen[name] = fn(spark, sf_dir).count()
        wall = time.time() - t0
        all_samples[name].append(
            (wall, _steal_share_pct(r_ticks0, _cpu_ticks()))
        )

    def _finalize(name):
        """Headline + stamps for one query from its current samples
        (re-run after the end-of-run retry phase adds samples)."""
        samples = all_samples[name]
        calm = sorted(w for w, st in samples if _calm((w, st)))
        if calm:
            # true median over calm samples (middle-two mean for even
            # counts — the upper-middle sample would bias it upward)
            mid = len(calm) // 2
            med = (
                calm[mid]
                if len(calm) % 2
                else (calm[mid - 1] + calm[mid]) / 2
            )
            times[name] = round(med, 3)
            sel_steal[name] = max(
                (
                    st
                    for w, st in samples
                    if _calm((w, st)) and st is not None
                ),
                default=None,
            )
        else:
            # every window was stolen: headline the least-stolen
            # sample and stamp its steal — the record self-describes
            # as contended instead of silently inflating
            w, st = min(samples, key=lambda s: (s[1], s[0]))
            times[name] = round(w, 3)
            sel_steal[name] = st
        walls = sorted(w for w, _ in samples)
        spread[name] = [round(walls[0], 3), times[name]]

    for name in HEADLINE:
        all_samples[name] = []
        q_ticks0 = _cpu_ticks()
        for _ in range(repeats):
            _one_timed_run(name)

        q_extra = 0  # the re-run budget is per query, not per bench
        while (
            not any(_calm(s) for s in all_samples[name])
            and q_extra < max_extra
        ):
            q_extra += 1
            extra_runs += 1
            _one_timed_run(name)

        # per-query steal share over the whole repeat window —
        # pinpoints WHICH queries ran under a contention burst
        q_steal[name] = _steal_share_pct(q_ticks0, _cpu_ticks())
        _finalize(name)
        print(
            f"# {name}: {times[name]}s headline of "
            f"{[(round(w, 3), st) for w, st in all_samples[name]]} "
            f"({rows_seen[name]} rows)",
            file=sys.stderr,
        )

    # end-of-run retry phase: by now, minutes have passed since the
    # early queries' storms — cycle the still-stormy queries until
    # each catches one calm window or the wall cap runs out
    stormy_queue = [
        n for n in HEADLINE if not any(_calm(s) for s in all_samples[n])
    ]
    retry_t0 = time.time()
    while stormy_queue and (time.time() - retry_t0) < retry_wall_cap:
        for name in list(stormy_queue):
            if (time.time() - retry_t0) >= retry_wall_cap:
                break
            _one_timed_run(name)
            retry_runs += 1
            if _calm(all_samples[name][-1]):
                stormy_queue.remove(name)
                _finalize(name)
                w, st = all_samples[name][-1]
                print(
                    f"# {name}: end-of-run retry caught a calm window "
                    f"({round(w, 3)}s at {st}% steal) — headline now "
                    f"{times[name]}s",
                    file=sys.stderr,
                )
    for name in stormy_queue:
        _finalize(name)  # cap exhausted: least-stolen sample, stamped
        print(
            f"# {name}: retry wall cap ({retry_wall_cap}s) exhausted "
            "without a calm window — headline stays the least-stolen "
            f"sample at {sel_steal[name]}% steal",
            file=sys.stderr,
        )
    total = sum(times[name] for name in HEADLINE)
    load_end = os.getloadavg()[0]
    steal_pct = _steal_share_pct(cpu_start, _cpu_ticks())

    # Diagnostics layout (VERDICT r11 missing #4): the driver keeps
    # only the LAST ~2000 bytes of stdout and parses the FINAL line,
    # so the stream ends with [verbose aux] [compact aux] [headline]
    # in ascending priority.  The r11 capture truncated the single
    # ~1800-byte named-spread line mid-way, losing exactly the early
    # queries' spreads; the compact line below carries ALL spreads as
    # arrays in headline-queries key order (~400 bytes), guaranteed
    # to fit beside the ~1100-byte headline.  The verbose named line
    # goes FIRST — sacrificial, and fully mirrored to stderr anyway.
    print(json.dumps({
        "aux": "bench_diagnostics",
        "query_spread_min_headline": spread,
        "protocol": {
            "repeats": repeats,
            # headline per query = median over the repeats whose OWN
            # window steal <= steal_bound_pct (per-repeat /proc/stat
            # measurement; contended repeats are re-run up to
            # max_extra_repeats more times); only when every window
            # was stolen does the least-stolen single sample headline,
            # with its steal stamped in the compact line's sel_steal.
            "stat": "median_of_calm_repeats_else_min_steal_sample",
            "steal_bound_pct": steal_bound,
            "max_extra_repeats_per_query": max_extra,
            "extra_repeats_run": extra_runs,
            # end-of-run calm-seeking (r14): still-stormy queries are
            # re-queued once the whole suite has run (storm bursts on
            # this host rotate on minutes timescales) and cycled under
            # this wall cap until each catches one calm window
            "retry_wall_cap_s": retry_wall_cap,
            "retry_repeats_run": retry_runs,
            "load_avg_1m_start": round(load_start, 2),
            "load_avg_1m_end": round(load_end, 2),
            # host CPU withheld from this VM during the bench window,
            # as % of non-idle guest+steal time — the contention the
            # guest's own loadavg CANNOT see (measured 56%-of-user
            # cumulative steal on this box; same-day same-tree runs
            # swung ~2.5x with it).  The headline now defends itself
            # per repeat; this window-wide figure stays for
            # cross-round context.
            "cpu_steal_pct_bench_window": steal_pct,
        },
    }))
    # compact spread: arrays align 1:1 with the headline "queries"
    # dict's key order (json preserves insertion order; both are
    # built in HEADLINE order) — per-query minimum wall, per-query
    # repeat-window steal share, and sel_steal = the steal stamped on
    # the sample(s) the headline actually used (<= bound unless every
    # window was stolen, which is the round record saying "this
    # query's headline is still weather").
    # stormy = queries whose HEADLINE sample itself rode steal above
    # the bound (no calm window ever appeared, even with extras) —
    # the one number that says whether this round's totals are
    # comparable at a glance (0 = fully defended run)
    stormy = sum(
        1
        for n in HEADLINE
        if sel_steal[n] is not None and sel_steal[n] > steal_bound
    )
    if stormy:
        print(
            f"# WARNING: {stormy}/{len(HEADLINE)} queries never saw a "
            f"window under {steal_bound}% steal — their headline "
            "numbers measure the host's neighbors; compare rounds on "
            "the mins/sel_steal arrays",
            file=sys.stderr,
        )
    print(json.dumps({
        "aux": "spread",
        "order": "headline_queries_keys",
        "mins": [spread[n][0] for n in HEADLINE],
        "steal_pct": [q_steal[n] for n in HEADLINE],
        "sel_steal": [sel_steal[n] for n in HEADLINE],
        "repeats": repeats,
        "extra": extra_runs,
        "retry": retry_runs,
        "stormy": stormy,
    }))
    # the 1-min load rides in the HEADLINE too (not just the aux
    # diagnostics line), so a timing regression can neither hide
    # behind nor be mis-blamed on ambient load without the stored
    # record saying which (VERDICT r9 next #8); note Spark itself
    # contributes to the reading — local[32] runs ~32 threads hot
    load_1m = round(load_end, 2)
    if load_1m > 2:
        print(
            f"# WARNING: 1-min load {load_1m} > 2 at bench end — "
            "ambient contention may inflate these medians; prefer the "
            "per-query [min, median] spread on the aux line when "
            "comparing rounds",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "headline_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load_1m": load_1m,
    }))


if __name__ == "__main__":
    main()
