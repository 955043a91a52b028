"""Round-17 optimization measurement: dump `.explain("formatted")` for
every headline query into plans/r18/<query>_<tag>.txt.

Usage: python scripts/r18_capture_plans.py <tag> [query ...]
  tag: "before" / "after"; with no query names, dumps the whole
  HEADLINE set. Uses the bench's relaid layout (ensure_bench_layout)
  so plans match what bench.py actually measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, ensure_bench_layout
from simplemapreduceframework_spark import get_spark, registry
from simplemapreduceframework_spark.plans import explain_str


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r18",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r18-plan-capture")
    sf_dir = ensure_bench_layout(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df).strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
