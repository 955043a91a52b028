"""Regenerate tests/PLAN_BASELINE.json: the per-query physical-plan
fingerprints (shuffles / broadcasts / scans) of every bench headline
query at sf0.001.

Run after an INTENTIONAL plan change; tests/test_plans.py fails when a
query's fingerprint grows past this baseline, which is how an
accidental extra shuffle / lost broadcast surfaces as a deterministic
integer diff instead of a noisy bench second.

Usage: python scripts/gen_plan_baseline.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    CACHE_DEPENDENT,
    HEADLINE,
    MEMO_FAMILIES,
    family_plan_fingerprints,
    plan_fingerprint,
)
from simplemapreduceframework_spark import get_spark, registry

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "PLAN_BASELINE.json",
)
OUT_FAMILIES = os.path.join(os.path.dirname(OUT), "PLAN_BASELINE_FAMILIES.json")


def main() -> None:
    spark = get_spark("plan-baseline")
    queries = registry.all_queries()
    # cache-dependent queries are omitted entirely: their fingerprints
    # vary with which session-memoized frame materialized first, so a
    # recorded number would be from an arbitrary memo state (this is
    # also why the no-growth test skips them)
    out = {
        name: plan_fingerprint(queries[name](spark, SF_DIR))
        for name in HEADLINE
        if name not in CACHE_DEPENDENT
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} fingerprints to {OUT}")
    # the CACHE_DEPENDENT queries are excluded above, but each memo
    # family's controlled-memo-state protocol is deterministic — record
    # every shared frame's own plan plus each consumer's post-cache
    # plan so the whole cache-dependent set keeps a regression canary
    # (r13 ADVICE built the hygiene instance; r14 ADVICE generalized)
    fams = {
        family: family_plan_fingerprints(spark, SF_DIR, family)
        for family in sorted(MEMO_FAMILIES)
    }
    with open(OUT_FAMILIES, "w") as f:
        json.dump(fams, f, indent=1, sort_keys=True)
        f.write("\n")
    n = sum(len(v) for v in fams.values())
    print(f"wrote {n} fingerprints ({len(fams)} families) to {OUT_FAMILIES}")


if __name__ == "__main__":
    main()
