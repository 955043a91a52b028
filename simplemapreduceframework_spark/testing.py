"""Oracle-comparison harness shared by scripts/check_parity.py and the
pytest suite — a local replica of the driver's correctness gate
(row count + column names + order-insensitive value fingerprint).
"""

from __future__ import annotations

from decimal import Decimal

import duckdb

from pyspark.sql import SparkSession

from .sources import TABLES


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        # Render exactly (full scale), NOT via float: the driver's
        # hasher sees typed decimal values, and a lossy float render
        # here would make local parity SOFTER than the driver — the
        # r5/r6 hash-red class of bug would stay invisible locally.
        # (Registered queries may no longer emit DecimalType at all —
        # compare_query enforces that — so this path only fires for
        # ad-hoc harness use.)
        return str(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def fingerprint(rows: list[dict], cols: list[str]) -> list[str]:
    """Order-insensitive table fingerprint: rows rendered with columns
    sorted by name, then sorted."""
    return sorted(",".join(norm_cell(r[c]) for c in cols) for r in rows)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are directories of part files; the
        # driver fixtures are single files. Glob the former.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def type_pin_problems(sdf, con, oracle: str | None) -> list[str]:
    """Registry-wide output-type invariant (the proven rule from six
    rounds of driver data): no registered query may emit a DecimalType
    column from Spark, and no oracle may emit a DECIMAL- or
    HUGEINT-typed result column from DuckDB. Integer and string
    outputs hash-match across engines; decimals never have (the
    driver hashes typed values, and the two engines render/serialize
    decimals differently regardless of pinned scale — VERDICT r6), and
    DuckDB silently widens integer SUMs to HUGEINT (the r5 pagerank
    red). Decimal stays fine INTERNALLY for order-independent
    exactness; the final projection must pin to BIGINT / string /
    double on both engines."""
    from pyspark.sql.types import DecimalType

    problems = [
        f"Spark output column {f.name!r} is {f.dataType.simpleString()}: "
        "DecimalType outputs never driver-hash-match; cast the final "
        "projection to string/bigint/double on both engines"
        for f in sdf.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    if oracle is not None:
        rel = con.sql(oracle)
        problems += [
            f"oracle result column {c!r} is {t}: pin it (VARCHAR/"
            "BIGINT/DOUBLE) to match the engine-side projection"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if str(t).startswith("DECIMAL") or str(t) == "HUGEINT"
        ]
    return problems


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    fn,
    oracle: str | None,
    sf_dir: str,
) -> list[str]:
    """Run one query on Spark (and its oracle on DuckDB if given);
    return a list of mismatch descriptions (empty = pass)."""
    sdf = fn(spark, sf_dir)
    problems = type_pin_problems(sdf, con, oracle)
    if problems:
        return problems
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    if oracle is None:
        return []  # rows-only query: success = it ran
    orc = con.execute(oracle)
    ocols = [d[0] for d in orc.description]
    orows = [dict(zip(ocols, row)) for row in orc.fetchall()]
    if sorted(scols) != sorted(ocols):
        return [f"columns differ: spark={sorted(scols)} duckdb={sorted(ocols)}"]
    if len(srows) != len(orows):
        return [f"row counts differ: spark={len(srows)} duckdb={len(orows)}"]
    cols = sorted(scols)
    sfp = fingerprint(srows, cols)
    ofp = fingerprint(orows, cols)
    if sfp != ofp:
        diffs = [(a, b) for a, b in zip(sfp, ofp) if a != b][:3]
        return [f"values differ, e.g. {diffs}"]
    return []
