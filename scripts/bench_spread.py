"""5-run timing spread for individual queries (VERDICT r7 items 2/7:
pin a variance note for dedup_simhash / stats_exact_moments instead of
chasing noise). Run with NOTHING else on the machine — concurrent Spark
sessions inflate totals ~10% (round-6 measurement).

Usage: python scripts/bench_spread.py query [query ...] [--sf DIR]
Prints one JSON line per query: cold, then 5 warm timings, best/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simplemapreduceframework_spark import get_spark, registry


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explicit = None
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            explicit = a.split("=", 1)[1]
    registry.load_all()
    spark = get_spark("bench-spread")
    if explicit is not None:
        sf_dir = explicit
    else:
        # Default to the bench layout: the raw sf0.1 dir has too few
        # row groups to feed 32 cores on the binary decode tier, so
        # spreads there come out ~5x the in-set numbers (a layout
        # artifact that mis-dispositions movers — see PLANS.md
        # round-12 entry). ensure_bench_layout validates the
        # _LAYOUT_DONE fixture-mtime stamp and rebuilds a stale or
        # partial cached layout rather than silently measuring it.
        from bench import ensure_bench_layout

        sf_dir = ensure_bench_layout(spark, "/root/testdata/sf0.1")
    for name in args:
        fn = registry.QUERIES[name]
        times = []
        for _ in range(6):  # first run = cold (plan + cache build)
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            times.append(round(time.monotonic() - t0, 3))
        warm = times[1:]
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "cold": times[0],
                    "warm": warm,
                    "best": min(warm),
                    "median": round(statistics.median(warm), 3),
                    "spread": round(max(warm) - min(warm), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
