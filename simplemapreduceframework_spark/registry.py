"""Query registry: the single source of truth for the declared surface.

Every operator from SURVEY.md section 2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports these
dicts to the driver, and tests iterate them for local oracle parity.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Queries intentionally registered without an oracle (non-SQL-expressible
# or approximate); the driver records a rows-only check for these.
ROWS_ONLY: set[str] = set()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            ROWS_ONLY.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        dedup,
        multimodal,
        referenceq,
        relational,
        relational2,
        similarity,
        streamingq,
        textanalysis,
        udfs,
    )
    from .compat import compatq  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def describe() -> dict[str, Any]:
    load_all()
    return {
        "n_queries": len(QUERIES),
        "n_oracled": len(ORACLES),
        "rows_only": sorted(ROWS_ONLY),
    }
