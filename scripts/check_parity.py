"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale dir, compares row count, column names, and an
order-insensitive value fingerprint. Exit code 1 on any mismatch.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from simplemapreduceframework_spark import get_spark, registry
from simplemapreduceframework_spark.testing import compare_query, duckdb_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("parity-check")
    con = duckdb_connection(sf_dir)
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    failures = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            problems = compare_query(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"]
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            kind = "match" if name in oracles else "rows-only ok"
            print(f"ok    {name}: {kind} ({dt:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
