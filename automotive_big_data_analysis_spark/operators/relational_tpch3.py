"""Third TPC-H-shaped suite (Q7/Q10/Q21/Q22 adaptations for the corpus
schema): cross-nation trade volume, returned-item revenue ranking,
sole-supplier order detection (EXISTS + NOT EXISTS on a self-join), and
idle high-balance customers (scalar-average subquery + anti-join).

The reference has no joins (SURVEY §2.3); these complete the standard
correlated/anti/self-join shapes alongside relational_tpch{,2}. Scale
theme unchanged: dimensions broadcast, facts pre-aggregate before any
wide shuffle, EXISTS/NOT EXISTS become semi/anti joins on pre-shrunk key
sets rather than per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.functions import exact as ex

TRADE_NATION_A = "NATION_3"  # Q7-style nation pair
TRADE_NATION_B = "NATION_8"
RETURNED_QUARTER_START = "1995-10-01"  # Q10-style quarter
RETURNED_QUARTER_END = "1996-01-01"
TOP_RETURNED_CUSTOMERS = 20


def cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year, both
    directions (supplier nation ≠ customer nation).

    supplier→nation and customer→nation are broadcast maps; the nation
    pair filter rides INSIDE the join output before aggregation, and the
    two fact joins (lineitem⋈orders) are the only shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == TRADE_NATION_A)
        & (F.col("cust_nation") == TRADE_NATION_B)
    ) | (
        (F.col("supp_nation") == TRADE_NATION_B)
        & (F.col("cust_nation") == TRADE_NATION_A)
    )
    return (
        li.join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cust_n, F.col("o_custkey") == cust_n.c_custkey)
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("ship_year"),
        )
        .agg(
            ex.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            )
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns in one
    quarter. Orders pre-filter to the quarter (partition-prunable at
    scale); lineitem filters to returnflag R before the join; the
    customer dimension broadcasts into the aggregated result."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(RETURNED_QUARTER_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RETURNED_QUARTER_END).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust_n = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
    per_cust = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            ex.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    return (
        per_cust.join(cust_n, per_cust.o_custkey == cust_n.c_custkey)
        .select("c_custkey", "c_name", "nation", "c_acctbal", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(TOP_RETURNED_CUSTOMERS)
    )


def sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted — the corpus lacks commit/receipt dates):
    per supplier, how many multi-line orders the supplier served ALONE.

    EXISTS(another line) and NOT EXISTS(line from another supplier)
    collapse into one per-order aggregate — count lines and count
    distinct suppliers per order — so the self-join disappears entirely;
    the 'correlated subqueries' become a groupBy the facts already
    needed. One shuffle on l_orderkey, one on l_suppkey."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.min("l_suppkey").alias("any_suppkey"),
    )
    sole = per_order.where(
        (F.col("n_lines") > 1) & (F.col("n_suppliers") == 1)
    )
    return (
        sole.groupBy("any_suppkey")
        .agg(F.count("*").alias("n_sole_orders"))
        .join(supp, F.col("any_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "n_sole_orders")
        .orderBy(F.col("n_sole_orders").desc(), "s_suppkey")
        .limit(20)
    )


IDLE_CUTOFF = "2000-01-01"  # Q22-style "no recent orders" horizon


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    NO orders since the cutoff, counted per market segment. The global
    average is a one-row broadcast; NOT EXISTS is a left-anti join
    against the distinct recent-order customer keys (the date filter
    shrinks orders BEFORE the distinct, so the anti-join side is small
    and partition-prunable at scale)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # exact average: the result gates a > comparison on every customer,
    # so an order-dependent double sum could flip boundary memberships
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(ex.dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "avg_bal"
        )
    )
    with_orders = (
        orders.where(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            with_orders, cust.c_custkey == with_orders.o_custkey, "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            ex.dsum("c_acctbal").alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


FORECAST_YEAR = 1996
FORECAST_DISC_LO, FORECAST_DISC_HI = 0.05, 0.07
FORECAST_MAX_QTY = 24


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue that would have been gained by
    eliminating small discounts on low-quantity items in one year — a
    pure scan-side scalar aggregate whose THREE predicates must all push
    into the parquet scan (the plan test asserts it).

    Exactness + speed: ``l_extendedprice * l_discount`` is an exact
    scaled-integer product (both are 2-decimal values; cf.
    ``exact.money4``) summed long per input partition and widened to
    DECIMAL only across the |partitions|-row intermediate — order-free
    at any scale with the per-row hot loop primitive."""
    li = load_table(spark, sf_dir, "lineitem")
    c4 = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        F.col("l_discount") * 100
    ).cast("long")
    filtered = li.where(
        (F.col("l_shipdate") >= f"{FORECAST_YEAR}-01-01")
        & (F.col("l_shipdate") < f"{FORECAST_YEAR + 1}-01-01")
        & (F.col("l_discount") >= FORECAST_DISC_LO)
        & (F.col("l_discount") <= FORECAST_DISC_HI)
        & (F.col("l_quantity") < FORECAST_MAX_QTY)
    )
    partials = filtered.groupBy(F.spark_partition_id().alias("_pid")).agg(
        F.sum(c4).alias("c4"), F.count("*").alias("n")
    )
    return partials.agg(
        F.round(F.sum(ex.dec("c4")).cast("double") / 10000, 2).alias(
            "revenue_effect"
        ),
        F.sum("n").cast("long").alias("n_items"),
    )


ORACLE: dict[str, str] = {
    "forecast_revenue_change": f"""
        SELECT ROUND(CAST(SUM(CAST(
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(ROUND(l_discount * 100) AS BIGINT)
               AS {ex.SQL_DEC})) AS DOUBLE) / 10000, 2) AS revenue_effect,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{FORECAST_YEAR}-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '{FORECAST_YEAR + 1}-01-01 00:00:00'
          AND l_discount >= {FORECAST_DISC_LO}
          AND l_discount <= {FORECAST_DISC_HI}
          AND l_quantity < {FORECAST_MAX_QTY}
    """,
    "cross_nation_volume": f"""
        SELECT sn.supp_nation, cn.cust_nation,
               CAST(YEAR(o_orderdate) AS INTEGER) AS ship_year,
               {ex.dsum_sql("l_extendedprice * (1 - l_discount)")}
                   AS volume
        FROM lineitem
        JOIN (SELECT s_suppkey, n_name AS supp_nation
              FROM supplier JOIN nation ON s_nationkey = n_nationkey) sn
          ON l_suppkey = sn.s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT c_custkey, n_name AS cust_nation
              FROM customer JOIN nation ON c_nationkey = n_nationkey) cn
          ON o_custkey = cn.c_custkey
        WHERE (supp_nation = '{TRADE_NATION_A}' AND cust_nation = '{TRADE_NATION_B}')
           OR (supp_nation = '{TRADE_NATION_B}' AND cust_nation = '{TRADE_NATION_A}')
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "returned_item_revenue": f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   {ex.dsum_sql("l_extendedprice * (1 - l_discount)")}
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '{RETURNED_QUARTER_START} 00:00:00'
              AND o_orderdate < TIMESTAMP '{RETURNED_QUARTER_END} 00:00:00'
            GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, n_name AS nation, c_acctbal, revenue
        FROM per_cust
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
        LIMIT {TOP_RETURNED_CUSTOMERS}
    """,
    "sole_supplier_orders": """
        WITH per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_lines,
                   COUNT(DISTINCT l_suppkey) AS n_suppliers,
                   MIN(l_suppkey) AS any_suppkey
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT s_suppkey, s_name, COUNT(*) AS n_sole_orders
        FROM per_order JOIN supplier ON any_suppkey = s_suppkey
        WHERE n_lines > 1 AND n_suppliers = 1
        GROUP BY s_suppkey, s_name
        ORDER BY n_sole_orders DESC, s_suppkey
        LIMIT 20
    """,
    "idle_rich_customers": f"""
        SELECT c_mktsegment, COUNT(*) AS n_customers,
               {ex.dsum_sql("c_acctbal")} AS total_balance
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS {ex.SQL_DEC}))
                                       AS DOUBLE) / COUNT(c_acctbal)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF} 00:00:00')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
}

QUERIES = {
    "forecast_revenue_change": forecast_revenue_change,
    "cross_nation_volume": cross_nation_volume,
    "returned_item_revenue": returned_item_revenue,
    "sole_supplier_orders": sole_supplier_orders,
    "idle_rich_customers": idle_rich_customers,
}
