"""Fourth TPC-H-shaped suite (Q2/Q9/Q20 adaptations for the corpus
schema): minimum-cost supplier selection per region, product-type profit
accounting, and dominant-share supplier detection.

The reference has no joins (SURVEY §2.3); these close the last three
classic TPC-H shapes the engine lacked. The corpus has no ``partsupp``
table, so the supply-cost axis is DERIVED from the facts — unit cost
observed on lineitem (Q2), a retail-price cost basis (Q9), shipped
quantity share (Q20) — which keeps each query's JOIN/AGG shape faithful
while staying inside the published schema.

Scale theme unchanged: part/supplier slices are filtered BEFORE any fact
join (AQE picks broadcast vs SMJ by measured size — no hints on sides
that grow with SF), tiny dims (nation/region) broadcast explicitly,
argmin runs as a struct-MIN aggregate (map-side collapse, never a
ranked window over facts), and money sums use the two-level exact
scaled-integer pattern (`exact.money4`: long partials per input
partition, DECIMAL widening only across the tiny intermediate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.functions import exact as ex

# Q2-style slice: one type, every fifth size.
MIN_COST_TYPE = "PROMO"
MIN_COST_SIZE_MOD = 5
MIN_COST_TOP = 200

# Q9-style product family: part names ending in this token.
PROFIT_NAME_SUFFIX = " widget"
# Cost basis: 60% of retail, exact in scale-4 integer units
# (0.6 · cents · qty · 100 = 60 · cents · qty — never a fractional unit).
PROFIT_COST_PERMILLE_X10 = 60

# Q20-style dominance: one ship year, one part-name prefix.
DOMINANT_YEAR = 1997
DOMINANT_NAME_PREFIX = "small "


def _unit_cost_micro() -> F.Column:
    """Observed per-unit cost of a lineitem in integer MICRO-units:
    ``floor(l_extendedprice / l_quantity · 1e6 + 0.5)``. The division is
    one IEEE double op on identical operands in both engines and the
    floor(·1e6 + 0.5) quantization is the repo's shared rounding tree —
    no tie case exists, so Spark and DuckDB derive the same BIGINT."""
    return F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(1e6) + F.lit(0.5)
    ).cast("long")


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a type/size slice, the supplier
    offering the minimum observed unit cost within each region — the
    correlated-MIN-subquery shape, decorrelated.

    The corpus lacks ``partsupp``, so supply cost is the minimum unit
    price observed on lineitem per (part, supplier) — integer
    micro-units via the shared rounding tree (:func:`_unit_cost_micro`),
    so every comparison downstream is exact integer ordering.

    Scale shape: the part slice prunes the fact scan FIRST (the only
    fact-sized shuffle groups on (partkey, suppkey) with map-side
    partial MIN); supplier→nation→region is a broadcast-dim pipeline;
    the correlated subquery becomes a struct-MIN aggregate per
    (region, part) — (cost, suppkey) is a total order, so the pick is
    deterministic and collapses map-side instead of shuffling a ranked
    relation. Top-N by the unique (region, partkey) order keeps the
    output bounded (TakeOrdered, no global sort).

    Round-14 note: the r13 ``spread()`` on the fact scan is REVERTED —
    the r13 isolated A/B that justified it (2.17 s with vs 3.90 s
    without) did not reproduce (r13 driver in-suite 0.97 -> 1.67 s
    regression; r14 probe-bracketed 5-rep pins 1.30 s with vs 0.64 s
    without). The slice probe prunes the scan enough that the
    round-robin exchange of the full fact table costs more than the
    single-task work it parallelizes."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part_slice = part.where(
        (F.col("p_size") % MIN_COST_SIZE_MOD == 0)
        & (F.col("p_type") == MIN_COST_TYPE)
    ).select("p_partkey")
    # per (part, supplier): cheapest observed unit cost — the derived
    # "partsupp.ps_supplycost"; slice applied before the aggregate so the
    # one fact shuffle carries only sliced rows (AQE sizes the join)
    unit = (
        li.join(part_slice, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_unit_cost_micro()).alias("cost_micro"))
    )
    supp_geo = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )
    picked = (
        unit.join(supp_geo, unit.l_suppkey == supp_geo.s_suppkey)
        .groupBy("region", "l_partkey")
        .agg(
            F.min(
                F.struct(
                    "cost_micro", "l_suppkey", "s_name", "s_acctbal", "nation"
                )
            ).alias("best")
        )
    )
    return (
        picked.select(
            "region",
            F.col("l_partkey").alias("p_partkey"),
            F.col("best.cost_micro").alias("cost_micro"),
            (F.col("best.cost_micro") / F.lit(1e6)).alias("unit_cost"),
            F.col("best.l_suppkey").alias("s_suppkey"),
            F.col("best.s_name").alias("s_name"),
            F.col("best.s_acctbal").alias("s_acctbal"),
            F.col("best.nation").alias("nation"),
        )
        .orderBy("region", "p_partkey")
        .limit(MIN_COST_TOP)
    )


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over one
    product family — revenue minus a cost basis, all joins at once.

    Without ``partsupp.ps_supplycost`` the cost basis is 60% of the
    part's retail price per shipped unit. Every money term is an exact
    scale-4 integer: revenue via ``exact.money4``; cost =
    ``60 · retail_cents · qty`` (quantities are integral, so 0.6× of a
    cent value times 100 is the integer 60× — no fractional unit ever).

    Scale shape: the part family filters and projects to
    (partkey, retail_cents) before the fact join; supplier→nation
    broadcasts; the one fact×fact shuffle is lineitem⋈orders;
    profit partials accumulate as longs per (nation, year, input
    partition) — bounded far under 2⁶³ — then DECIMAL-widen across the
    tiny intermediate (the Q8 two-level pattern,
    ``relational_tpch.nation_market_share``)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    family = part.where(F.col("p_name").endswith(PROFIT_NAME_SUFFIX)).select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("retail_cents"),
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    rev4 = ex.money4("l_extendedprice", "l_discount")
    cost4 = (
        F.lit(PROFIT_COST_PERMILLE_X10)
        * F.col("retail_cents")
        * F.round(F.col("l_quantity")).cast("long")
    )
    partials = (
        li.join(family, li.l_partkey == F.col("p_partkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "nation",
            "o_year",
            (rev4 - cost4).alias("profit4"),
            F.spark_partition_id().alias("_pid"),
        )
        .groupBy("nation", "o_year", "_pid")
        .agg(F.sum("profit4").alias("p4"), F.count("*").alias("n"))
    )
    return (
        partials.groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(ex.dec("p4")).cast("double") / 10000, 2).alias(
                "profit"
            ),
            F.sum("n").cast("long").alias("n_lineitems"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    part's total shipped quantity in one year, over a part-name slice —
    the nested IN-subqueries-with-aggregate-threshold shape, collapsed
    to two aggregations over one pruned fact pass.

    Quantities are integral, so the 50% test is exact integer
    arithmetic (``2·qty > total``) — no float threshold to disagree on.

    Scale shape: year + name-prefix filters prune the fact scan before
    the single fact-sized shuffle (groupBy (partkey, suppkey)); the
    per-part total is a re-aggregation OF that aggregate co-partitioned
    on partkey (Catalyst reuses the exchange); everything after is
    dimension-sized. Suppliers decorate via one join against the
    supplier⋈nation broadcast pipeline."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    slice_parts = part.where(
        F.col("p_name").startswith(DOMINANT_NAME_PREFIX)
    ).select("p_partkey")
    ps = (
        li.where(
            (F.col("l_shipdate") >= f"{DOMINANT_YEAR}-01-01")
            & (F.col("l_shipdate") < f"{DOMINANT_YEAR + 1}-01-01")
        )
        .join(slice_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("qty"))
    )
    totals = ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dominant = ps.join(totals, "l_partkey").where(
        F.col("qty") * 2 > F.col("total_qty")
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    return (
        dominant.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_dominant_parts"),
            F.sum("qty").cast("long").alias("qty_dominated"),
        )
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", "nation", "n_dominant_parts", "qty_dominated"
        )
        .orderBy(
            F.col("n_dominant_parts").desc(),
            F.col("qty_dominated").desc(),
            "s_suppkey",
        )
    )


_UNIT_COST_SQL = (
    "CAST(FLOOR(l_extendedprice / l_quantity * 1e6 + 0.5) AS BIGINT)"
)

ORACLE: dict[str, str] = {
    "min_cost_supplier": f"""
        WITH slice AS (
            SELECT p_partkey FROM part
            WHERE p_size % {MIN_COST_SIZE_MOD} = 0
              AND p_type = '{MIN_COST_TYPE}'
        ),
        unit AS (
            SELECT l_partkey, l_suppkey, MIN({_UNIT_COST_SQL}) AS cost_micro
            FROM lineitem JOIN slice ON l_partkey = p_partkey
            GROUP BY 1, 2
        ),
        sn AS (
            SELECT s_suppkey, s_name, s_acctbal,
                   n_name AS nation, r_name AS region
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        ),
        sliced AS (
            SELECT region, l_partkey, cost_micro, l_suppkey
            FROM unit JOIN sn ON l_suppkey = s_suppkey
        ),
        best AS (
            SELECT region, l_partkey, MIN(cost_micro) AS best_micro
            FROM sliced GROUP BY 1, 2
        ),
        pick AS (
            SELECT s.region, s.l_partkey, s.cost_micro,
                   MIN(s.l_suppkey) AS s_suppkey
            FROM sliced s
            JOIN best b ON s.region = b.region AND s.l_partkey = b.l_partkey
                       AND s.cost_micro = b.best_micro
            GROUP BY 1, 2, 3
        )
        SELECT p.region, p.l_partkey AS p_partkey, p.cost_micro,
               p.cost_micro / 1e6 AS unit_cost,
               p.s_suppkey, sn.s_name, sn.s_acctbal, sn.nation
        FROM pick p JOIN sn ON p.s_suppkey = sn.s_suppkey
        ORDER BY p.region, p_partkey
        LIMIT {MIN_COST_TOP}
    """,
    "product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
               ROUND(CAST(SUM(CAST(
                   {ex.money4_sql("l_extendedprice", "l_discount")}
                   - {PROFIT_COST_PERMILLE_X10}
                     * CAST(ROUND(p_retailprice * 100) AS BIGINT)
                     * CAST(ROUND(l_quantity) AS BIGINT)
               AS {ex.SQL_DEC})) AS DOUBLE) / 10000, 2) AS profit,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
                 AND p_name LIKE '%{PROFIT_NAME_SUFFIX}'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    "dominant_part_suppliers": f"""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND p_name LIKE '{DOMINANT_NAME_PREFIX}%'
            WHERE l_shipdate >= TIMESTAMP '{DOMINANT_YEAR}-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '{DOMINANT_YEAR + 1}-01-01 00:00:00'
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT l_partkey, SUM(qty) AS total_qty FROM ps GROUP BY 1
        )
        SELECT s_suppkey, s_name, n_name AS nation,
               COUNT(*) AS n_dominant_parts,
               CAST(SUM(qty) AS BIGINT) AS qty_dominated
        FROM ps
        JOIN tot USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE 2 * qty > total_qty
        GROUP BY 1, 2, 3
        ORDER BY n_dominant_parts DESC, qty_dominated DESC, s_suppkey
    """,
}

QUERIES = {
    "min_cost_supplier": min_cost_supplier,
    "product_type_profit": product_type_profit,
    "dominant_part_suppliers": dominant_part_suppliers,
}
