"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale dir, compares row count, column names, and an
order-insensitive value hash (values normalized to strings, rows
sorted). Exit code 1 on any mismatch.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from simplemapreduceframework_spark import get_spark, registry
from simplemapreduceframework_spark.sources import TABLES


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_fingerprint(rows, cols) -> list[str]:
    return sorted(",".join(norm_cell(r[c]) for c in cols) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = registry.all_queries()
    oracles = registry.all_oracles()
    failures = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            orc = con.execute(oracles[name])
            ocols = [d[0] for d in orc.description]
            orows = [dict(zip(ocols, row)) for row in orc.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"cols spark={scols} duck={ocols}")
        elif len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        else:
            cols = sorted(scols)
            sfp = table_fingerprint(srows, cols)
            ofp = table_fingerprint(orows, cols)
            if sfp != ofp:
                diffs = [
                    (a, b) for a, b in zip(sfp, ofp) if a != b
                ][:3]
                status.append(f"values differ, e.g. {diffs}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
