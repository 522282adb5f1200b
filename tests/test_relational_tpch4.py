"""Semantics tests for the fourth TPC-H-shaped suite (Q2/Q9/Q20
adaptations): hand-computable fixtures for the argmin pick, the exact
profit arithmetic, and the strict >50% dominance threshold, plus slice
invariants at sf0.001."""

from __future__ import annotations

from datetime import datetime

from automotive_big_data_analysis_spark.operators import relational_tpch4 as rt4

SF_SMOKE = "/root/testdata/sf0.001"

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)
SUPP_SCHEMA = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)
NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
REGION_SCHEMA = "r_regionkey int, r_name string"
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _write(spark, path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}.parquet")


def _dims(spark, path):
    _write(
        spark,
        path,
        "nation",
        [(0, "NATION_0", 0), (1, "NATION_1", 1)],
        NATION_SCHEMA,
    )
    _write(spark, path, "region", [(0, "REGION_0"), (1, "REGION_1")], REGION_SCHEMA)


def test_min_cost_supplier_picks_cheapest_then_lowest_suppkey(
    spark, tmp_path_factory
):
    """Part 10 (in slice): supplier 7 sells a unit at 10.00, supplier 8
    at 5.00 → supplier 8 wins its region. Suppliers 7 and 9 tie at 10.00
    in the same region for part 20 → lower suppkey (7) wins. Part 30 is
    outside the slice (wrong type) and must not appear."""
    path = str(tmp_path_factory.mktemp("q2fix"))
    _dims(spark, path)
    _write(
        spark,
        path,
        "part",
        [
            (10, "red widget", "Brand#1", "PROMO", 5, 100.0),
            (20, "blue widget", "Brand#1", "PROMO", 10, 100.0),
            (30, "hot widget", "Brand#1", "ECONOMY", 5, 100.0),
        ],
        PART_SCHEMA,
    )
    _write(
        spark,
        path,
        "supplier",
        [
            (7, "Supplier#7", 0, 100.0),
            (8, "Supplier#8", 1, 200.0),
            (9, "Supplier#9", 0, 300.0),
        ],
        SUPP_SCHEMA,
    )
    d = datetime(1997, 6, 1)
    _write(
        spark,
        path,
        "lineitem",
        [
            # part 10: supp 7 at 10.00/unit, supp 8 at 5.00/unit
            (1, 10, 7, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", d),
            (2, 10, 8, 1, 4.0, 20.0, 0.0, 0.0, "N", "O", d),
            # part 20: supps 7 and 9 both at exactly 10.00/unit
            (3, 20, 7, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d),
            (4, 20, 9, 1, 3.0, 30.0, 0.0, 0.0, "N", "O", d),
            # part 30 (excluded by slice)
            (5, 30, 7, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        ],
        LI_SCHEMA,
    )
    rows = rt4.min_cost_supplier(spark, path).collect()
    got = {(r.region, r.p_partkey): (r.s_suppkey, r.unit_cost) for r in rows}
    assert got == {
        ("REGION_0", 10): (7, 10.0),  # supp 7 is region 0's best for part 10
        ("REGION_1", 10): (8, 5.0),  # supp 8 (region 1) undercuts globally
        ("REGION_0", 20): (7, 10.0),  # tie at 10.00 → lower suppkey
    }
    assert all(r.cost_micro == round(r.unit_cost * 1e6) for r in rows)


def test_product_type_profit_exact_arithmetic(spark, tmp_path_factory):
    """One widget lineitem: price 100.00, discount 0.10, qty 2, retail
    30.00 → revenue 90.00, cost 0.6·30·2 = 36.00, profit 54.00."""
    path = str(tmp_path_factory.mktemp("q9fix"))
    _dims(spark, path)
    _write(
        spark,
        path,
        "part",
        [(10, "red widget", "Brand#1", "PROMO", 5, 30.0)],
        PART_SCHEMA,
    )
    _write(spark, path, "supplier", [(7, "Supplier#7", 0, 100.0)], SUPP_SCHEMA)
    _write(
        spark,
        path,
        "orders",
        [(1, 1, "F", 100.0, datetime(1998, 3, 1), "1-URGENT")],
        ORDERS_SCHEMA,
    )
    _write(
        spark,
        path,
        "lineitem",
        [(1, 10, 7, 1, 2.0, 100.0, 0.10, 0.0, "N", "O", datetime(1998, 2, 1))],
        LI_SCHEMA,
    )
    rows = rt4.product_type_profit(spark, path).collect()
    assert [(r.nation, r.o_year, r.profit, r.n_lineitems) for r in rows] == [
        ("NATION_0", 1998, 54.0, 1)
    ]


def test_dominant_part_suppliers_strict_majority(spark, tmp_path_factory):
    """Part 10: supplier 7 ships 6 of 10 units → dominant. Part 20:
    suppliers split 5/5 → NOBODY dominates (strict >). A 1996 shipment
    of part 10 by supplier 8 is outside the year and must not count."""
    path = str(tmp_path_factory.mktemp("q20fix"))
    _dims(spark, path)
    _write(
        spark,
        path,
        "part",
        [
            (10, "small gear", "Brand#1", "PROMO", 5, 30.0),
            (20, "small bolt", "Brand#1", "PROMO", 6, 30.0),
        ],
        PART_SCHEMA,
    )
    _write(
        spark,
        path,
        "supplier",
        [(7, "Supplier#7", 0, 100.0), (8, "Supplier#8", 1, 200.0)],
        SUPP_SCHEMA,
    )
    d97 = datetime(rt4.DOMINANT_YEAR, 6, 1)
    _write(
        spark,
        path,
        "lineitem",
        [
            (1, 10, 7, 1, 6.0, 60.0, 0.0, 0.0, "N", "O", d97),
            (2, 10, 8, 1, 4.0, 40.0, 0.0, 0.0, "N", "O", d97),
            (3, 20, 7, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", d97),
            (4, 20, 8, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", d97),
            # out-of-year shipment: would flip part 10 to supplier 8
            (5, 10, 8, 1, 50.0, 500.0, 0.0, 0.0, "N", "O", datetime(1996, 6, 1)),
        ],
        LI_SCHEMA,
    )
    rows = rt4.dominant_part_suppliers(spark, path).collect()
    assert [
        (r.s_suppkey, r.nation, r.n_dominant_parts, r.qty_dominated)
        for r in rows
    ] == [(7, "NATION_0", 1, 6)]


def test_corpus_invariants(spark):
    """Slice membership and per-(region, part) uniqueness at sf0.001."""
    q2 = rt4.min_cost_supplier(spark, SF_SMOKE).collect()
    assert q2, "expected slice parts at sf0.001"
    keys = [(r.region, r.p_partkey) for r in q2]
    assert len(keys) == len(set(keys))
    assert all(r.unit_cost > 0 for r in q2)

    q9 = rt4.product_type_profit(spark, SF_SMOKE).collect()
    assert q9
    assert all(r.n_lineitems > 0 for r in q9)

    q20 = rt4.dominant_part_suppliers(spark, SF_SMOKE).collect()
    assert q20
    assert all(r.n_dominant_parts >= 1 for r in q20)
