"""Fifth breadth wave: the remaining classic decision-support shapes
(TPC-H Q11/Q13/Q16/Q17/Q20/Q21 adapted to the testdata schema — no
partsupp or commit/receipt dates, so those roles are played by lineitem
revenue and return flags).  Every entry is a (Spark builder, DuckDB
oracle) pair; monetary aggregates follow the round-3 integer-cents
contract (exact BIGINT unit sums, one IEEE division to dollars — see
plans/money.py and core.py's header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.plans.money import (
    SQL_REV_E4,
    rev_e4,
    sql_cents,
)
from aws_logs_to_parquet_converter_spark.plans.registry import query, register_views, t


@query(
    "q11_important_parts",
    oracle=f"""
    WITH grouped AS (
        SELECT l_partkey, CAST(SUM({SQL_REV_E4}) AS BIGINT) AS pv_e4
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(pv_e4 AS DOUBLE) / 10000.0 AS part_value
    FROM grouped
    WHERE 1000 * pv_e4 > (SELECT CAST(SUM(pv_e4) AS BIGINT) FROM grouped)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue share within one nation's suppliers exceeds a
    global fraction (TPC-H Q11 shape; partsupp value played by lineitem
    revenue).  HAVING against a scalar subquery over the SAME grouped
    relation — built once, reused for both the groups and the total, so
    the fact is scanned twice but the threshold join is a 1-row
    broadcast (no recompute tree, no second shuffle of the big side).

    Money contract (plans/money.py): the share threshold comparison is
    PURE INTEGER — 1000*part_e4 > total_e4 is exactly part > total*0.001
    with no fp threshold at all (the r02 decimal*0.001 threshold was the
    version-unstable construct here).

    Reference counterpart: none (SURVEY §2.4 'beyond reference').
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    base = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    grouped = base.groupBy("l_partkey").agg(F.sum(rev_e4()).alias("pv_e4"))
    total = grouped.agg(F.sum("pv_e4").alias("total_e4"))
    return (
        grouped.join(F.broadcast(total))
        .where(F.lit(1000) * F.col("pv_e4") > F.col("total_e4"))
        .select(
            "l_partkey",
            (F.col("pv_e4").cast("double") / F.lit(10000.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-customer order counts (TPC-H Q13): left outer
    join with an extra ON-clause predicate (customers with zero
    qualifying orders must survive as c_count=0), then a second
    aggregation over the first's output.  The second group-by is on the
    tiny distinct-count domain, so at scale the only real exchange is
    the join/agg on c_custkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per part attribute bucket, excluding a
    blacklist via NOT IN (TPC-H Q16).  The NOT IN subquery is
    null-safe-planned by Spark as a broadcast null-aware anti join;
    COUNT(DISTINCT) expands to a two-phase aggregate."""
    register_views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 14, 23, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@query(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS DOUBLE) / 700.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'SMALL'
      AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders (TPC-H Q17): correlated
    scalar AVG per part, decorrelated by Catalyst into an aggregate +
    join on l_partkey.  l_quantity is whole-valued so the DOUBLE
    average is exact and the threshold comparison is engine-stable.

    The /700.0 output divides the EXACT BIGINT cents sum (money
    contract, plans/money.py) by a constant — one IEEE operation on
    identical integers, bit-identical in both engines, no decimal cast
    and no rounding tie."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(ROUND((l_extendedprice)*100) AS BIGINT)) AS DOUBLE) / 700.0
               AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'SMALL'
          AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q20_promotable_suppliers",
    oracle="""
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
    ORDER BY s_name
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved real volume of a part family (TPC-H Q20
    shape): a semi join whose right side is itself an aggregated join
    with HAVING.  The inner aggregate shrinks the fact to one row per
    supplier before the semi join, so the outer side never shuffles."""
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    movers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q21_sole_blame_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returns in multi-supplier
    finished orders (TPC-H Q21 shape; returnflag stands in for the
    missing receipt-vs-commit lateness).  EXISTS + NOT EXISTS against
    the same fact become a left-semi and a left-anti join on
    l_orderkey — three scans of lineitem but every join keyed on the
    same column, so AQE can reuse one exchange partitioning."""
    register_views(spark, sf_dir, ["supplier", "lineitem", "orders"])
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name
        """
    )
