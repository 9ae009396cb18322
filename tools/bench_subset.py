"""Run bench.py's exact protocol on a subset of headline queries.

Usage: python tools/bench_subset.py q26_jaccard_pairs q66_gated_near_dup
Prints the same JSON lines as bench.py, restricted to the subset —
for A/B-ing one optimization without paying the full 31-query run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    subset = sys.argv[1:]
    if not subset:
        raise SystemExit("usage: bench_subset.py <query> [query ...]")
    unknown = [q for q in subset if q not in bench.HEADLINE]
    if unknown:
        raise SystemExit(f"not headline queries: {unknown}")
    bench.HEADLINE = subset
    bench.main()


if __name__ == "__main__":
    main()
