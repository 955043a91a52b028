"""One-off 10x scaling bench (VERDICT r7 item 4): time the most
expensive headline queries at sf0.1 and at the synthetic sf1 produced
by scripts/make_sf_scaled.py, and report the observed scaling exponent
per query — the empirical check that no super-linear blowup (candidate
pair growth, recursion depth, window skew) hides behind the plan-shape
arguments in PLANS.md.

exponent = log(t_sf1 / t_sf0.1) / log(10): 1.0 is linear, ~1.1 is
n log n territory, 2.0 is quadratic. Local-mode caveat: constant
per-query overhead (session, planning, Python driver) inflates the
sf0.1 denominator, so small exponents UNDERSTATE how close to linear
the heavy lifting is; exponents are an upper-bound smell test, not a
cluster measurement.

Each query runs 3x per scale on a fresh-per-scale session (memoized
shared frames persist per (session, sf_dir); best-of-3 keeps the
steady-state number the way bench.py does).

Usage: python scripts/bench_scaling.py [sf1_dir]
Writes .bench_cache/scaling_sf1.json and prints a markdown table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simplemapreduceframework_spark import get_spark, registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q47_reorder_streaks",
    "basket_rules",
    "graph_pagerank",
    "entity_golden_records",
    "simjoin_prefix_filter",
    "dedup_substring",
    "dedup_substring_hashed",
    "privacy_t_closeness",
    "doc_similarity_sparse",
    "graph_triangles",
    "bpe_encode_gate",
]

RUNS = 3


def time_queries(sf_dir: str) -> dict[str, float]:
    registry.load_all()
    spark = get_spark(f"scaling-{os.path.basename(sf_dir)}")
    best: dict[str, float] = {}
    for _ in range(RUNS):
        for name in QUERIES:
            t0 = time.monotonic()
            df = registry.QUERIES[name](spark, sf_dir)
            n = df.count()
            dt = time.monotonic() - t0
            # first run = cold: includes building every memoized/
            # persisted shared frame — the number that scales with the
            # full work; warm best measures the recomputed portion only
            best.setdefault(f"{name}__cold", dt)
            if name not in best or dt < best[name]:
                best[name] = dt
            best.setdefault(f"{name}__rows", float(n))
    spark.stop()
    return best


def main() -> None:
    sf1 = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".bench_cache", "sf1")
    )
    if not os.path.isdir(sf1):
        raise SystemExit(f"{sf1} missing — run scripts/make_sf_scaled.py first")
    t_small = time_queries("/root/testdata/sf0.1")
    t_big = time_queries(sf1)
    rows = []
    for name in QUERIES:
        a, b = t_small[name], t_big[name]
        ca, cb = t_small[f"{name}__cold"], t_big[f"{name}__cold"]
        rows.append(
            {
                "query": name,
                "sf0.1_sec": round(a, 3),
                "sf1_sec": round(b, 3),
                "sf0.1_cold": round(ca, 3),
                "sf1_cold": round(cb, 3),
                "rows_sf0.1": int(t_small[f"{name}__rows"]),
                "rows_sf1": int(t_big[f"{name}__rows"]),
                "exponent": round(math.log(b / a) / math.log(10), 2),
                "exponent_cold": round(math.log(cb / ca) / math.log(10), 2),
            }
        )
    out = os.path.join(REPO, ".bench_cache", "scaling_sf1.json")
    with open(out, "w") as f:
        json.dump({"runs": RUNS, "results": rows}, f, indent=1)
        f.write("\n")
    print(f"[bench_scaling] -> {out}", file=sys.stderr)
    print(
        "| query | sf0.1 warm | sf1 warm | exp | sf0.1 cold | sf1 cold "
        "| exp (cold) | rows sf0.1 -> sf1 |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['sf0.1_sec']} | {r['sf1_sec']} "
            f"| {r['exponent']} | {r['sf0.1_cold']} | {r['sf1_cold']} "
            f"| {r['exponent_cold']} "
            f"| {r['rows_sf0.1']} -> {r['rows_sf1']} |"
        )


if __name__ == "__main__":
    main()
