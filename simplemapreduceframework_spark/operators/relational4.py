"""TPC-H decorrelation shapes, batch 2 (complements relational3.py's
Q2/Q11/Q21/Q22): national market share with FILTER-clause conditional
sums (Q8), the left-join-with-ON-predicate order-count distribution
(Q13), the correlated-AVG small-quantity filter (Q17), and the
nested-IN-with-HAVING supplier selection (Q20).

All four run as *portable SQL text* through spark.sql() with the same
text as the DuckDB oracle. Numeric policy per functions/columns.py:
money sums in exact decimals, the share ratio divides identical
decimals cast to double; l_quantity is integral (pinned by the probe in
round 6), so double AVG/SUM over it is order-independent and
engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources import register_views

# Q8 shape: for each order year, the share of ASIA customers' rod
# revenue supplied by NATION_7. Revenue is exact decimal; the nation
# slice uses the standard FILTER clause (both engines); share divides
# the same decimal pair as doubles.
_Q43_SQL = """
WITH rev AS (
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           sn.n_name AS supp_nation,
           CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - CAST(l.l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))
             AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = cn.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_name LIKE '%rod%'
)
SELECT o_year,
       CAST(COALESCE(SUM(volume) FILTER (WHERE supp_nation = 'NATION_7'),
                     0) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE) AS total_volume,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM rev
GROUP BY o_year
"""


@query("q43_market_share", oracle=_Q43_SQL)
def q43_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share inside a region-scoped,
    part-filtered revenue stream, by order year — the
    conditional-slice-over-total ratio pattern (FILTER clause on both
    engines, numerator and denominator summed from the SAME decimal
    column so the double division is engine-exact).

    Shape at scale: part/supplier/customer/nation/region all broadcast
    (the LIKE filter prunes part before its build); the only
    fact-scale exchange is orders<->lineitem, then one partial-agg
    groupBy on the year."""
    register_views(spark, sf_dir)
    return spark.sql(_Q43_SQL)


# Q13 shape: distribution of per-customer order counts INCLUDING
# zero-order customers — the ON-clause predicate (filter the join, not
# the customers) is the semantic point: a WHERE would drop the zeros.
_Q44_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey
     AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@query("q44_order_count_distribution", oracle=_Q44_SQL)
def q44_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer-order-count histogram with the
    filter in the LEFT JOIN's ON clause, so customers with no
    qualifying orders survive as the c_count = 0 bucket (a WHERE would
    silently drop them — the classic outer-join-predicate-placement
    trap). COUNT(o.o_orderkey) counts matched rows only, never the
    null-extended row. Pure integer counts, engine-exact.

    Shape at scale: one exchange on the customer key for the join +
    first groupBy (AQE reuses the partitioning), then a tiny histogram
    aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_Q44_SQL)


# Q17 shape: revenue lost to small-quantity orders of one brand — the
# correlated scalar AVG subquery, decorrelated by Catalyst into a
# per-part aggregate joined back. l_quantity is integral, so the double
# AVG is an exact-sum / count — order-independent on both engines.
_Q45_SQL = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                 AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
"""


# Engine-side text (r17): Catalyst decorrelates the scalar AVG into a
# per-part aggregate over the WHOLE fact table — the optimizer cannot
# see that only Brand#13 parts ever consume a threshold (guide §8:
# problem knowledge the optimizer does not have). Joining the filtered
# part dimension into the aggregate side first (a broadcast, so no
# extra fact exchange) cuts the avg-side groupBy's input and shuffle
# to the brand's fraction of the table. INNER join to the aggregate is
# exact: every probe row's part has at least one lineitem (itself), so
# the per-part threshold row always exists; AVG over that part's
# lineitems is over the identical row set (the brand filter prunes
# PARTS, never a part's lineitems) and the threshold expression is
# textually the oracle's.
_Q45_ENGINE_SQL = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                 AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l2.l_partkey, 0.2 * AVG(l2.l_quantity) AS thr
    FROM lineitem l2
    JOIN part p2 ON p2.p_partkey = l2.l_partkey
    WHERE p2.p_brand = 'Brand#13'
    GROUP BY l2.l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < a.thr
"""


@query("q45_small_quantity_revenue", oracle=_Q45_SQL)
def q45_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery (orders whose
    quantity is under 20% of the part's average), decorrelated into a
    per-part aggregate + join. Revenue sums in exact decimal; the
    threshold compares an exact integral-sum average.

    Shape at scale: the brand filter prunes the probe side before its
    join AND (engine text, r17) the aggregate side before the per-part
    AVG's groupBy — the avg-side shuffle carries the brand's fraction
    of the fact table instead of every part's rows (see
    _Q45_ENGINE_SQL; the oracle keeps the correlated-subquery form and
    results hash-match)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q45_ENGINE_SQL)


# Q20 shape: suppliers who shipped a large aggregate quantity of any
# widget part — nested IN subquery whose inner query is itself a
# grouped HAVING aggregate. Quantity sums in decimal for exactness.
_Q46_SQL = """
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 100
)
ORDER BY s.s_suppkey
"""


@query("q46_bulk_widget_suppliers", oracle=_Q46_SQL)
def q46_bulk_widget_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery (suppliers
    who moved >100 units of some widget part) — Catalyst plans the IN
    as a left-semi join against the aggregated subquery, never a
    per-row re-execution. Decimal quantity sums, integer keys —
    engine-exact.

    Shape at scale: the LIKE filter prunes part before its broadcast;
    the inner aggregate is one partial-agg groupBy on (suppkey,
    partkey); the outer semi join is supplier-dimension sized."""
    register_views(spark, sf_dir)
    return spark.sql(_Q46_SQL)


# Recursive CTE (Spark 4 WITH RECURSIVE): the reorder-streak walk — a
# linear successor traversal whose depth is data-dependent (the longest
# streak), which no fixed window/unroll can express. Spark 4 supports
# UNION ALL recursion only (UNION-dedup cycle-safe recursion is not in
# yet), so the relation walked must be acyclic — the per-customer
# next-order linked list is. o_orderkey is unique (expectation-suite
# adjacent fact), so the recursive join steps to exactly one row.
_Q47_ORD_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate) OVER w AS prev_date,
           LEAD(o_orderkey) OVER w AS next_key,
           LEAD(o_orderdate) OVER w AS next_date
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

_Q47_BODY = """
chain(o_custkey, cur_key, cur_date, next_key, next_date, len) AS (
    SELECT o_custkey, o_orderkey, o_orderdate, next_key, next_date, 1
    FROM ord
    WHERE prev_date IS NULL OR o_orderdate > prev_date + INTERVAL 90 DAY
    UNION ALL
    SELECT c.o_custkey, o.o_orderkey, o.o_orderdate, o.next_key,
           o.next_date, c.len + 1
    FROM chain c JOIN ord o ON o.o_orderkey = c.next_key
    WHERE c.next_date <= c.cur_date + INTERVAL 90 DAY
)
SELECT o_custkey,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(CASE WHEN len = 1 THEN 1 END) AS BIGINT) AS n_streaks,
       CAST(COUNT(*) AS BIGINT) AS n_chain_rows
FROM chain
GROUP BY o_custkey
"""

# the one oracle text: ord inline as a plain CTE (DuckDB materializes
# CTEs once, so no re-execution concern there)
_Q47_SQL = (
    "WITH RECURSIVE ord AS (" + _Q47_ORD_SQL + "),\n" + _Q47_BODY
)

# Engine-side non-recursive formulation (r17 optimization): the
# recursion's continuation condition (next order within 90 days of the
# current one) is the exact complement of its anchor condition (an
# order more than 90 days after its predecessor starts a streak), so
# every filtered order lands in `chain` exactly once and its `len` is
# its 1-based position inside its streak. That position is pure window
# arithmetic: mark streak starts, carry the start's row number forward
# with a running MAX, and len = rn - cur_start + 1. Both window layers
# share one partition key and ORDER — one exchange, one sort — and the
# final groupBy reuses the window partitioning, so the whole query is
# a single shuffle (the recursive plan paid the window exchange + a
# persisted successor table + one frontier join PER recursion level,
# ~10 levels at sf0.1: 3.1s -> ~0.4s measured). All-integer streak
# statistics -> engine-exact vs the unchanged recursive oracle.
_Q47_FLAT_SQL = """
WITH ord AS (
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate) OVER w AS prev_date,
           ROW_NUMBER() OVER w AS rn
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
    SELECT o_custkey, rn,
           MAX(CASE WHEN prev_date IS NULL
                         OR o_orderdate > prev_date + INTERVAL 90 DAY
                    THEN rn END)
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS cur_start
    FROM ord
)
SELECT o_custkey,
       CAST(MAX(rn - cur_start + 1) AS BIGINT) AS longest_streak,
       CAST(COUNT(CASE WHEN rn = cur_start THEN 1 END) AS BIGINT) AS n_streaks,
       CAST(COUNT(*) AS BIGINT) AS n_chain_rows
FROM runs
GROUP BY o_custkey
"""


@query("q47_reorder_streaks", oracle=_Q47_SQL)
def q47_reorder_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer reorder streaks: a streak starts at an order with
    no predecessor within 90 days and extends while each next order
    follows within 90 days of the current one. The DuckDB oracle keeps
    the recursive-CTE successor walk (the capability this query
    declares); the engine computes the identical per-order streak
    positions in ONE window pass (see _Q47_FLAT_SQL) — the r8-r16
    recursive engine plan re-joined a persisted successor list once
    per recursion level (depth = the longest streak) and needed the
    cteRecursionRowLimit valve sized to |orders|; the window form has
    neither concern and carries one exchange total.

    Shape at scale: one hash exchange on o_custkey feeds two stacked
    window layers sharing the same sort, and the final aggregate
    reuses the window partitioning (no second exchange). Streak
    statistics are pure integers — engine-exact.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q47_FLAT_SQL)
