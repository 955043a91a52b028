"""TPC-H "hard shape" queries: the decorrelation patterns a real user
hits next (reference ROADMAP #7) — correlated scalar MIN (Q2), HAVING
against a global scalar aggregate (Q11), and multi-EXISTS / NOT EXISTS
(Q21). The synthetic schema has no partsupp or commit/receipt dates, so
each shape is re-anchored on lineitem with the same subquery structure.

All three run as *portable SQL text* through spark.sql() with the same
text as the DuckDB oracle — proving Catalyst's subquery decorrelation
(scalar-subquery -> aggregate+join, EXISTS -> semi join, NOT EXISTS ->
anti join) yields exactly the ANSI semantics. Numeric policy per
functions/columns.py: money sums in exact decimals, doubles only at the
output/comparison step, divisions of identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources import register_views

# Q2 shape: for each large part, the supplier(s) selling it at the
# minimum observed unit price — a correlated scalar MIN subquery.
# Catalyst decorrelates to: per-part min aggregate + two joins (no
# per-row subquery execution); at 100 TB the aggregate is a partial/
# final hash agg on l_partkey and the equality join broadcasts
# part/supplier/nation dimensions.
_Q30_SQL = """
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
       l.l_extendedprice / l.l_quantity AS unit_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size >= 48
  AND l.l_extendedprice / l.l_quantity = (
      SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey)
"""

# Q11 shape: per-part stock value filtered against a *global* scalar
# aggregate (HAVING sum > fraction-of-total). The inner CTE is shared
# by the group rows and the scalar; the value sums are exact decimals
# (integer-cent-safe), cast to double only for the output and the
# threshold comparison, so both engines compare identical doubles.
_Q31_SQL = """
WITH pv AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS v
    FROM lineitem
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(v AS DOUBLE) AS stock_value
FROM pv
WHERE CAST(v AS DOUBLE) > CAST(0.0002 AS DOUBLE)
      * (SELECT CAST(SUM(v) AS DOUBLE) FROM pv)
"""

# Q21 shape: suppliers who were the sole "failing" supplier on a
# multi-supplier order — one EXISTS (another supplier participated)
# plus one NOT EXISTS (no other supplier failed). Catalyst plans the
# EXISTS as a left-semi and the NOT EXISTS as a left-anti join on
# l_orderkey; counts only, so the result is engine-exact.
_Q32_SQL = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@query("q30_min_cost_supplier", oracle=_Q30_SQL)
def q30_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery, decorrelated by
    Catalyst into a per-part min aggregate joined back to the probe."""
    register_views(spark, sf_dir)
    return spark.sql(_Q30_SQL)


@query("q31_important_stock", oracle=_Q31_SQL)
def q31_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group rows filtered against a global scalar
    subquery over the same aggregate (fraction-of-total HAVING)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q31_SQL)


@query("q32_suppliers_who_kept_waiting", oracle=_Q32_SQL)
def q32_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact table
    (semi join + anti join on the order key), top-20 by count."""
    register_views(spark, sf_dir)
    return spark.sql(_Q32_SQL)
