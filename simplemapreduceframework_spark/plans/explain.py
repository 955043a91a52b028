"""Physical-plan inspection helpers.

The reference has no optimizer and no plan IR (SURVEY.md section 4);
here the plan IS the product, so tests assert plan properties the way
the reference asserted result values: filters reached the parquet scan,
small dims broadcast, shuffle counts are what the operator design
claims. Used by tests/test_plans.py and by bench.py's --explain mode.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema — verifies pruning."""
    text = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan (broadcast
    exchanges excluded) — the scale-limiting resource."""
    text = explain_str(df)
    # formatted mode prints shuffle nodes as "(N) Exchange" and
    # broadcasts as "(N) BroadcastExchange"
    return len(re.findall(r"\(\d+\) Exchange\b", text))
