"""Relational operator surface (SURVEY.md section 2.4).

The reference has no relational library — projection/filter live inside
user mappers (reference README.md:32-33), joins exist only as manual
metadata FK loops (reference jobtracker.py:321-335), and aggregation is
the combiner/reducer pair (reference tasktracker.py:209-271). Here each
capability class is one declarative DataFrame pipeline; Catalyst handles
pushdown, pruning, join strategy, and partial/final aggregation.

Scale notes (100 TB stance), per query in its docstring. Common themes:
- filters/projections sit directly on the parquet scan (PushedFilters);
- dimension tables are broadcast (no shuffle of the fact table);
- fact-fact joins shuffle on the join key once, and AQE handles skew;
- aggregates are hash-based with map-side partial aggregation, which is
  exactly the reference's combiner (tasktracker.py:209-226) done by the
  engine.

Numeric policy: see functions/columns.py — double math with fixed
parenthesization, one cast to DECIMAL(18,2) per row, exact decimal sums,
final outputs as DOUBLE/BIGINT/strings so the DuckDB oracle agrees
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec2, money, one_minus_rate, one_plus_rate, rate
from ..functions.scale import broadcast_dim, table_rows
from ..registry import query
from ..sources import load_table


def _disc_price() -> F.Column:
    # extendedprice * (1 - discount), all-decimal and exact (see
    # functions/columns.py numeric policy): DECIMAL(12,2) * DECIMAL(3,2)
    # -> DECIMAL(16,4), no rounding in either engine.
    return money("l_extendedprice") * one_minus_rate("l_discount")


# The oracle-side twin of _disc_price(); keep in lockstep.
_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))"
)
_CHARGE_SQL = (
    f"({_DISC_PRICE_SQL}) * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(3,2))"
)


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_CHARGE_SQL}) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial/final agg.

    This is the generalized form of the reference's grouped-AVG recipe
    (reference README.md:25-36): Catalyst emits a partial hash aggregate
    before the exchange (the combiner, tasktracker.py:209-226) and a
    final one after — only 6 groups ever cross the shuffle regardless of
    fact-table size, so it scales to 100 TB trivially. The shipdate
    filter is pushed to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    charge = _disc_price() * one_plus_rate("l_tax")
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec2("l_quantity")).alias("sq"),
        F.sum(dec2("l_extendedprice")).alias("sbp"),
        F.sum(_disc_price()).alias("sdp"),
        F.sum(charge).alias("sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sbp").cast("double").alias("sum_base_price"),
        F.col("sdp").cast("double").alias("sum_disc_price"),
        F.col("sc").cast("double").alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("count_order")).alias("avg_qty"),
        "count_order",
    )


@query(
    "q2_filter_project",
    oracle="""
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity >= 48 AND l_discount <= 0.02
""",
)
def q2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive filter (reference mapper-side column
    indexing, README.md:32-33; metadata-plane GETROWS filter,
    file_system.py:846-862).

    Both predicates and the 5-column projection reach the parquet
    reader: `.explain` shows PushedFilters [GreaterThanOrEqual, ...] and
    a ReadSchema of exactly these columns — at 100 TB this reads a
    fraction of the row groups and none of the other columns.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 48) & (F.col("l_discount") <= 0.02))
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@query(
    "q3_top_revenue_orders",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k (TPC-H Q3 shape).

    customer is filtered then broadcast (no shuffle of orders);
    orders joins lineitem shuffling on the orderkey once; the final
    top-10 is TakeOrderedAndProject — per-partition heaps, only k rows
    to the driver, no global sort. Deterministic tie-break on
    l_orderkey so the LIMIT selects the same rows in any engine.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        # bound = FULL customer count though cust is segment-filtered
        # (~1/5): deliberately conservative — drops the forced hint a
        # few SF early, never late, and below the budget the plan is
        # identical; past it the scan's accurate stats still let
        # Catalyst auto-broadcast while the filtered side fits (r8
        # ADVICE disposition)
        broadcast_dim(cust, table_rows(spark, sf_dir, "customer"))
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_disc_price()).alias("rev")
    )
    return (
        agg.orderBy(F.col("rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@query(
    "q4_order_priority_semijoin",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
)
def q4_order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (TPC-H Q4 shape).

    The semi join never materializes lineitem columns — Spark's
    left_semi stops at the first match per key, and with AQE the
    filtered orders side can flip to broadcast. The reference could only
    express this as a hand-written two-job pipeline.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    big_items = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(big_items, orders.o_orderkey == big_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_region_revenue",
    oracle=f"""
SELECT n_name,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join (TPC-H Q5 shape) — the flagship query.

    Dimension tables (region, nation, supplier, customer) are broadcast:
    the 100 TB fact table (lineitem) is scanned once and never shuffled
    for the dimension joins; the only exchange is orders<->lineitem on
    orderkey. Catalyst reorders the dimension joins; the region filter
    prunes nations before the broadcast is even built.
    """
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    dims = (
        F.broadcast(region)
        .join(F.broadcast(nation), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    joined = (
        orders.join(
            broadcast_dim(dims, table_rows(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast_dim(supp, table_rows(spark, sf_dir, "supplier")),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )


@query(
    "q6_selective_agg",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_selective_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective scan-and-sum (TPC-H Q6 shape).

    Every predicate is a parquet pushdown; ReadSchema is 4 columns. At
    100 TB this is the query where row-group statistics skip most of the
    file — no shuffle at all beyond the single-row final agg.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(money("l_extendedprice") * rate("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q7_anti_join",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
)
def q7_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no 400k+ order.

    The orders side is pre-filtered before the anti join, so the
    build side is small; with AQE it broadcasts and the customer scan
    streams through without a shuffle.
    """
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q8_window_topn_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
""",
)
def q8_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ROW_NUMBER (window functions —
    absent in the reference, SURVEY section 2.4).

    One shuffle on o_custkey; Spark's WindowGroupLimit pushes the rn<=3
    limit into the sort so each partition keeps only 3 rows per key.
    Deterministic tie-break on o_orderkey.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q9_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate NULLS LAST, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey % 10 = 0
""",
)
def q9_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer (window frame ROWS UNBOUNDED PRECEDING).

    Decimal accumulation makes the running sum exact, so the
    left-to-right fold matches any engine. Single shuffle on o_custkey.
    """
    from pyspark.sql.window import Window

    # explicit NULLS LAST: Spark sorts NULL dates FIRST, DuckDB LAST —
    # a NULL o_orderdate would otherwise shift every running total in
    # its partition (caught by the NULL-orders fixture)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
    )


@query(
    "q10_rollup",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (multi-level agg, absent in reference).

    Spark expands the grouping sets before the exchange; still one
    shuffle, group count multiplied by the rollup depth only.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q11_cube",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 2^2 grouping sets in one pass."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("o_totalprice")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


@query(
    "q12_setops",
    oracle="""
WITH big_spenders AS (
    SELECT o_custkey AS k FROM orders GROUP BY o_custkey
    HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000
), building AS (
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT 'intersect' AS op, k FROM (SELECT k FROM big_spenders INTERSECT SELECT k FROM building)
UNION ALL
SELECT 'except' AS op, k FROM (SELECT k FROM big_spenders EXCEPT SELECT k FROM building)
UNION ALL
SELECT 'union' AS op, k FROM (SELECT k FROM big_spenders UNION SELECT k FROM building)
""",
)
def q12_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (reference only has UNION ALL as
    result-list concatenation, jobtracker.py:384-390; DISTINCT via a
    hand reducer, word_set_functions.py:9-13)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.sum(dec2("o_totalprice")).alias("t"))
        .filter(F.col("t") > 1500000)
        .select(F.col("o_custkey").alias("k"))
    )
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    return (
        big.intersect(bld).select(F.lit("intersect").alias("op"), "k")
        .unionAll(big.exceptAll(bld).distinct().select(F.lit("except").alias("op"), "k"))
        .unionAll(big.union(bld).distinct().select(F.lit("union").alias("op"), "k"))
    )


@query(
    "q13_distinct_agg",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q13_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT per group (reference expresses distinct only
    via the word-set reducer). Spark expands to a two-phase agg; for the
    approximate scale path see `approx_distinct` (rows-only)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q14_scalar_gauntlet",
    oracle="""
SELECT o_orderkey,
       UPPER(o_orderpriority) AS pri_upper,
       SUBSTR(o_orderpriority, 1, 1) AS pri_code,
       CAST(LENGTH(o_orderpriority) AS BIGINT) AS pri_len,
       CONCAT_WS('-', o_orderstatus, CAST(o_orderkey % 7 AS VARCHAR)) AS tag,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
       STRFTIME(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
       ABS((o_orderkey % 13) - 6) AS wobble,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price2
FROM orders
WHERE o_orderkey % 4 = 0
""",
)
def q14_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function coverage: string / date / math / conditional
    (reference: arbitrary Python inside mappers, count_functions.py:2,
    fernan/functions.py:5 — here all JVM-side, whole-stage codegen)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderpriority").cast("bigint").alias("pri_len"),
        F.concat_ws(
            "-", F.col("o_orderstatus"), (F.col("o_orderkey") % 7).cast("string")
        ).alias("tag"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.abs((F.col("o_orderkey") % 13) - 6).alias("wobble"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        dec2("o_totalprice").cast("double").alias("price2"),
    )


@query(
    "q15_conditional_agg",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
       CAST(COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS DOUBLE) / COUNT(*) AS big_share,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                              THEN {_DISC_PRICE_SQL} END), 0) AS DOUBLE) AS finished_revenue
FROM lineitem
GROUP BY l_returnflag
""",
)
def q15_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE inside agg) + ratio output."""
    li = load_table(spark, sf_dir, "lineitem")
    n_big = F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        n_big,
        (
            F.count(F.when(F.col("l_quantity") > 25, 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("big_share"),
        F.coalesce(
            F.sum(F.when(F.col("l_linestatus") == "F", _disc_price())), F.lit(0)
        )
        .cast("double")
        .alias("finished_revenue"),
    )


@query(
    "q16_having",
    oracle="""
SELECT c_custkey, c_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
HAVING COUNT(*) >= 15
""",
)
def q16_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + group + HAVING. customer broadcasts; one shuffle on the
    grouping key (which is also the join key, so AQE can reuse the
    exchange)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        broadcast_dim(cust, table_rows(spark, sf_dir, "customer"))
        .join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec2("o_totalprice")).cast("double").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q17_multisort_limit",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem
ORDER BY l_returnflag ASC NULLS LAST, l_quantity DESC,
         l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST
LIMIT 100
""",
)
def q17_multisort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ORDER BY + LIMIT. Spark plans TakeOrderedAndProject:
    no global sort, per-partition top-k heaps (reference has no sort at
    all — results carry dict order, tasktracker.py:273-278)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        # ASC keys pin NULLS LAST: Spark's ASC default is NULLS FIRST
        # while DuckDB's is NULLS LAST, so an unpinned NULL returnflag
        # would enter Spark's top-100 but not DuckDB's (DESC already
        # agrees — both engines default NULLS LAST there)
        .orderBy(
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_quantity").desc(),
            F.col("l_orderkey").asc_nulls_last(),
            F.col("l_linenumber").asc_nulls_last(),
        )
        .limit(100)
    )


@query(
    "q18_outer_join",
    oracle="""
WITH cust_per_nation AS (
    SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
), supp_per_nation AS (
    SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM cust_per_nation c FULL OUTER JOIN supp_per_nation s ON c.nk = s.nk
""",
)
def q18_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nation coverage from the
    customer vs supplier side)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk2"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk2, "full_outer").select(
        F.coalesce(F.col("nk"), F.col("nk2")).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "q19_cross_join",
    oracle="""
SELECT r_name, status
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
""",
)
def q19_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny relations (broadcast nested loop)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    status = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    return region.crossJoin(F.broadcast(status))


@query(
    "grouped_avg",
    oracle="""
SELECT l_returnflag AS grp,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def grouped_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's documented SQL recipe: SELECT key, AVG(x) GROUP BY
    key, hand-compiled there as mapper (key,(x,1)) + combiner partial
    sums + reducer sum/count (reference README.md:25-36). Catalyst's
    partial/final hash agg is that exact decomposition, engine-side.
    Computed as exact decimal sum / count to stay oracle-identical.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query("approx_distinct")
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB alternative to q13's exact
    distinct (HyperLogLog++ sketch, constant memory per group). Rows-only
    check: approximation differs across engines by design; a unit test
    asserts relative error vs the exact count. Quantiles come out as
    scalar columns (not an array) so the driver's canonicalizer can
    sort/hash the result.
    """
    q = F.percentile_approx("l_quantity", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            q.alias("_qq"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            F.element_at("_qq", 1).alias("qty_p50"),
            F.element_at("_qq", 2).alias("qty_p90"),
            F.element_at("_qq", 3).alias("qty_p99"),
        )
    )


@query(
    "approx_distinct_gate",
    oracle="""
SELECT l_returnflag, TRUE AS parts_ok,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible gate for the approximate aggregates: sketch
    estimates can't hash-match another engine, so the checkable claim
    is the ERROR BOUND — each group emits booleans asserting the HLL++
    distinct estimate is within 3x its configured rsd (0.05) and each
    approx percentile is within one quantity unit of the exact one.
    The oracle is the same booleans derived exactly (all TRUE), so an
    out-of-bound sketch breaks the hash. Exact counterparts are
    computed here only to check the bound; `approx_distinct` is the
    production path.
    """
    aq = F.percentile_approx(
        "l_quantity", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    eq = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    g = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.05).alias("_ap"),
            F.countDistinct("l_partkey").alias("_ep"),
            aq.alias("_aq"),
            eq.alias("_eq"),
        )
    )

    def _q_ok(i: int) -> F.Column:
        return (
            F.abs(F.element_at("_aq", i) - F.element_at("_eq", i)) <= F.lit(1.0)
        )

    return g.select(
        "l_returnflag",
        (F.abs(F.col("_ap") - F.col("_ep")) / F.col("_ep") <= F.lit(0.15)).alias(
            "parts_ok"
        ),
        _q_ok(1).alias("p50_ok"),
        _q_ok(2).alias("p90_ok"),
        _q_ok(3).alias("p99_ok"),
    )
