"""Run EVERY registered query against a (scaled) data directory and
record which ones fail or stall — the whole-registry version of the
scaling bench's spot checks. The point is not timing: it is flushing
out the failure class the round-8 sf10 run caught on
simjoin_prefix_filter (a corpus-sized frame chosen as a broadcast
build side off a bad static estimate -> driver OOM), plus overflow
valves (q47's recursion row limit) and anything else that only
manifests past the test scale factor.

Each query gets a wall-clock budget; on timeout the audit cancels all
running Spark jobs and moves on, recording TIMEOUT (slow is reported,
not failed — quadratic-by-design baselines are expected to blow the
budget at 100x and say so in their docstrings).

Usage: python scripts/audit_at_scale.py [sf_dir] [--budget=SECONDS]
                 [--skip=a,b,c] [--only=a,b,c] [--isolate]
Defaults: sf_dir=.bench_cache/sf10, budget=240. --isolate drops every
cached frame and the session memo after each query — without it, the
~190 persisted shared frames accumulated across the registry evict
each other in one local JVM and the tail of the run times out on GC
pressure rather than on anything the query did.
Writes .bench_cache/audit_<basename>.json and prints one line per
query; exits non-zero if any query ERRORED (timeouts don't fail it).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simplemapreduceframework_spark import get_spark, registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1)
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    )
    sf_dir = pos[0] if pos else os.path.join(REPO, ".bench_cache", "sf10")
    budget = float(opts.get("budget", "240"))
    skip = set(opts.get("skip", "").split(",")) - {""}
    only = set(opts.get("only", "").split(",")) - {""}

    registry.load_all()
    spark = get_spark(f"scale-audit-{os.path.basename(sf_dir)}")
    sc = spark.sparkContext
    results: dict[str, dict] = {}
    names = [
        n
        for n in registry.all_queries()
        if n not in skip and (not only or n in only)
    ]
    for idx, name in enumerate(names):
        fn = registry.QUERIES[name]
        out: dict = {}

        def run() -> None:
            try:
                t0 = time.monotonic()
                n_rows = fn(spark, sf_dir).count()
                out["sec"] = round(time.monotonic() - t0, 1)
                out["rows"] = n_rows
                out["status"] = "ok"
            except Exception as e:  # noqa: BLE001 — audit records, not raises
                first = str(e).strip().splitlines()
                out["status"] = "ERROR"
                out["error"] = (first[1] if first[0].startswith("An error occurred") and len(first) > 1 else first[0])[:300]

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(budget)
        if th.is_alive():
            sc.cancelAllJobs()
            th.join(30)
            out.setdefault("status", "TIMEOUT")
            if out["status"] == "ERROR" and "cancelled" in out.get("error", "").lower():
                out = {"status": "TIMEOUT"}
        if "--isolate" in sys.argv:
            from simplemapreduceframework_spark.session_memo import (
                session_memo,
            )

            spark.catalog.clearCache()
            session_memo(spark).clear()
            # clearCache only drops SQL-cached relations: localCheckpoint
            # / RDD blocks from iterative queries (pagerank, curriculum)
            # survive it and accumulate in the one local JVM until a
            # later query's aggregation starves (caught by the round-9
            # forced-fallback marathon: graph_pagerank died
            # AGGREGATE_OUT_OF_MEMORY at query 192-minus-handful but
            # passes solo). Unpersist leftover RDDs and nudge the
            # ContextCleaner so broadcast blocks actually free.
            for rdd in list(sc._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
            sc._jvm.System.gc()
        results[name] = out
        print(
            f"[{idx + 1}/{len(names)}] {name}: {out['status']}"
            + (f" rows={out.get('rows')} sec={out.get('sec')}" if out["status"] == "ok" else "")
            + (f" — {out.get('error', '')}" if out["status"] == "ERROR" else ""),
            flush=True,
        )
    dst = os.path.join(
        REPO, ".bench_cache", f"audit_{os.path.basename(sf_dir)}.json"
    )
    with open(dst, "w") as f:
        json.dump({"sf_dir": sf_dir, "budget": budget, "results": results}, f, indent=1)
        f.write("\n")
    n_err = sum(1 for r in results.values() if r["status"] == "ERROR")
    n_to = sum(1 for r in results.values() if r["status"] == "TIMEOUT")
    print(f"AUDIT: {len(results)} queries, {n_err} errors, {n_to} timeouts -> {dst}")
    sys.exit(1 if n_err else 0)


if __name__ == "__main__":
    main()
