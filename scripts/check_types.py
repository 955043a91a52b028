"""Sweep every oracled query for engine type divergence.

The driver's hash gate compares typed (Arrow) values; a DuckDB column
promoted to HUGEINT (SUM over BIGINT) or a widened DECIMAL hashes
differently from Spark's BIGINT / decimal(p,s) even when the values are
equal — the round-5 `graph_pagerank` / `events_resample_ffill` failure
mode. This script runs each oracle on DuckDB and the query on Spark at a
small SF and reports any column whose numeric types differ between the
engines, so promotions are caught locally before the driver sees them.

Usage: python scripts/check_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from simplemapreduceframework_spark import get_spark, registry
from simplemapreduceframework_spark.testing import duckdb_connection


def _canon_spark(dt: str) -> str:
    dt = dt.lower()
    aliases = {
        "long": "bigint",
        "int": "int",
        "integer": "int",
        "short": "smallint",
        "byte": "tinyint",
        "string": "varchar",
        "float": "float",
        "double": "double",
        "boolean": "bool",
        "binary": "blob",
        "date": "date",
        "timestamp": "timestamp",
        "timestamp_ntz": "timestamp",
    }
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith(("array", "map", "struct")):
        return "nested"
    return aliases.get(dt, dt)


def _canon_duck(dt: str) -> str:
    dt = dt.lower()
    aliases = {
        "bigint": "bigint",
        "int64": "bigint",
        "integer": "int",
        "int32": "int",
        "smallint": "smallint",
        "tinyint": "tinyint",
        "hugeint": "hugeint",  # int128: Spark has no equivalent -> always flag
        "int128": "hugeint",
        "varchar": "varchar",
        "float": "float",
        "real": "float",
        "double": "double",
        "float64": "double",
        "boolean": "bool",
        "bool": "bool",
        "blob": "blob",
        "date": "date",
    }
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith(("struct", "map", "list")) or dt.endswith("[]"):
        return "nested"
    return aliases.get(dt, dt)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("type-check")
    con = duckdb_connection(sf_dir)
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    bad = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = {c: _canon_spark(t) for c, t in sdf.dtypes}
            rel = con.sql(sql)
            otypes = {
                c: _canon_duck(str(t))
                for c, t in zip(rel.columns, rel.types)
            }
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            bad.append(name)
            continue
        diffs = [
            f"{c}: spark={stypes[c]} duckdb={otypes[c]}"
            for c in stypes
            if c in otypes and stypes[c] != otypes[c]
        ]
        if diffs:
            print(f"TYPEDIFF {name}: {'; '.join(diffs)}")
            bad.append(name)
        else:
            print(f"ok       {name}")
    print(f"\n{len(bad)} with type divergence" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
