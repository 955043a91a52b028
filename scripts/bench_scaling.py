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

Usage: python scripts/bench_scaling.py [sf1_dir] [--base=DIR]
                 [--factor=N] [--queries=a,b,c] [--out=NAME]
                 [--driver-memory=SIZE]
Defaults: base=/root/testdata/sf0.1, factor=10 (exponent denominator),
out=scaling_sf1, driver-memory=$SPARK_GRAFT_DRIVER_MEM or 8g (the
stock JVM every scale claim assumes unless the output JSON's
"driver_memory" field says otherwise — the bigmem control profile is
--driver-memory=24g --out=scaling_sf10_bigmem). Writes
.bench_cache/<out>.json and prints a markdown table. A second-decade check (sf1 -> sf10) is
  python scripts/make_sf_scaled.py 100 /root/testdata/sf0.1 .bench_cache/sf10
  python scripts/bench_scaling.py .bench_cache/sf10 \
      --base=.bench_cache/sf1 --out=scaling_sf10
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
    for run in range(RUNS):
        for name in QUERIES:
            t0 = time.monotonic()
            df = registry.QUERIES[name](spark, sf_dir)
            n = df.count()
            dt = time.monotonic() - t0
            # first run = cold: includes building every memoized/
            # persisted shared frame — the number that scales with the
            # full work; warm best measures the recomputed portion
            # only, so it is min over runs 2..RUNS and EXCLUDES the
            # cold first run (ADVICE r8: the cold time previously
            # seeded the warm min too)
            best.setdefault(f"{name}__cold", dt)
            if run > 0 and (name not in best or dt < best[name]):
                best[name] = dt
            best.setdefault(f"{name}__rows", float(n))
    for name in QUERIES:  # RUNS=1 degenerate case: warm = cold
        best.setdefault(name, best[f"{name}__cold"])
    spark.stop()
    return best


def main() -> None:
    global QUERIES
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    sf1 = pos[0] if pos else os.path.join(REPO, ".bench_cache", "sf1")
    base = opts.get("base", "/root/testdata/sf0.1")
    factor = float(opts.get("factor", "10"))
    out_name = opts.get("out", "scaling_sf1")
    if "driver-memory" in opts:
        # get_spark reads this env at builder time; set before any session
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = opts["driver-memory"]
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if "queries" in opts:
        QUERIES = opts["queries"].split(",")
    if not os.path.isdir(sf1):
        raise SystemExit(f"{sf1} missing — run scripts/make_sf_scaled.py first")
    t_small = time_queries(base)
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
                "exponent": round(math.log(b / a) / math.log(factor), 2),
                "exponent_cold": round(
                    math.log(cb / ca) / math.log(factor), 2
                ),
            }
        )
    out = os.path.join(REPO, ".bench_cache", f"{out_name}.json")
    with open(out, "w") as f:
        json.dump(
            {"runs": RUNS, "base": base, "scaled": sf1, "factor": factor,
             "driver_memory": driver_mem, "results": rows},
            f,
            indent=1,
        )
        f.write("\n")
    print(f"[bench_scaling] -> {out}", file=sys.stderr)
    print(
        "| query | base warm | scaled warm | exp | base cold | scaled cold "
        "| exp (cold) | rows base -> scaled |"
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
