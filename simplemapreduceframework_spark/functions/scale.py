"""Scale guards for join-strategy choices.

Round-8 lesson (scripts/audit_at_scale.py at the synthetic 100x
point): an UNCONDITIONAL ``F.broadcast(dim)`` is a latent OOM — in
TPC-H scaling, customer / part / supplier grow linearly with SF, so a
"dimension" that broadcasts beautifully at validation scale is
billions of rows on a 100 TB deployment, and a forced hint removes
Catalyst's escape hatch. The guarded form keeps the forced broadcast
(it IS the right plan, and auto-broadcast can miss it when the dim
sits under a cached fragment whose static estimate is off) while the
row count stays inside an executor-safe budget, and silently falls
back to Catalyst's default strategy choice beyond it.

Counts come from ``table_rows`` — one parquet-metadata job per
(session, dir, table), memoized — so the guard costs nothing
measurable. For frames DERIVED from a scaled table (per-part support
counts, degree tables), pass the base table's count: cardinality of a
per-key aggregate is bounded by its key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session_memo import session_memo

# ~150 MB of narrow dim rows; far inside the default 8 GB driver and
# any sane executor broadcast budget, far above every validation SF
# (sf10 customer = 1.5M rows) so test-scale plans are bit-identical.
BROADCAST_ROW_LIMIT = 5_000_000


def table_rows(spark: SparkSession, sf_dir: str, table: str) -> int:
    """Row count of a base table — one parquet-metadata count job,
    memoized per (session, dir, table)."""
    from ..sources import load_table

    memo = session_memo(spark)
    key = ("table_rows", sf_dir, table)
    if key not in memo:
        memo[key] = load_table(spark, sf_dir, table).count()
    return memo[key]


def broadcast_dim(
    df: DataFrame, n_rows: int, limit: int = BROADCAST_ROW_LIMIT
) -> DataFrame:
    """``F.broadcast(df)`` while ``n_rows`` fits the broadcast budget;
    the unhinted frame (Catalyst chooses) beyond it. ``n_rows`` is the
    frame's row count or any upper bound for it (the base table's
    count for per-key aggregates derived from it)."""
    return F.broadcast(df) if n_rows <= limit else df
