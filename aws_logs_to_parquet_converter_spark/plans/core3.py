"""Third breadth wave: multi-fact international-trade shapes (TPC-H
Q7/Q8/Q9/Q18/Q22 adapted to the testdata schema — no partsupp/shipmode
tables, so cost and country attributes are derived deterministically).
Every entry remains a (Spark builder, DuckDB oracle) pair."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.plans.money import (
    SQL_REV_E4,
    cents,
    rev_e4,
    sql_cents,
    sql_sum_dollars,
    units,
)
from aws_logs_to_parquet_converter_spark.plans.registry import query, register_views, t

# Money follows the round-3 integer-cents contract (plans/money.py):
# exact BIGINT unit sums, one IEEE division to dollars — no DECIMAL
# casts, no tie-capable ROUND (see core.py header).


@query(
    "q07_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           {sql_sum_dollars(SQL_REV_E4, 10000)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by year (TPC-H Q7):
    a symmetric OR predicate across two dimension aliases of the same
    table."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(rev_e4()).cast("double") / F.lit(10000.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q08_market_share",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               {SQL_REV_E4} AS volume_e4,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_e4 ELSE 0 END) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(volume_e4) AS BIGINT) AS DOUBLE) AS mkt_share
    FROM all_sales GROUP BY o_year ORDER BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share inside a region by year (TPC-H Q8):
    conditional-sum ratio over a 6-table join.  Both sums accumulate
    as exact e4-unit BIGINTs; the share is one IEEE division of exact
    integers — unrounded and engine-stable (money contract)."""
    register_views(
        spark, sf_dir, ["lineitem", "orders", "supplier", "customer", "nation", "region"]
    )
    return spark.sql(
        """
        WITH all_sales AS (
            SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND((l_extendedprice)*100) AS BIGINT)
                       * (100 - CAST(ROUND((l_discount)*100) AS BIGINT)) AS volume_e4,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_e4 ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(volume_e4) AS DOUBLE) AS mkt_share
        FROM all_sales GROUP BY o_year ORDER BY o_year
        """
    )


@query(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           {sql_sum_dollars(
               SQL_REV_E4
               + " - " + sql_cents('p_retailprice')
               + " * CAST(ROUND(l_quantity) AS BIGINT) * 60",
               10000,
           )} AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year for a part family (TPC-H Q9
    shape; supply cost derived as 60% of retail price — no partsupp
    table in the testdata).

    Money contract (plans/money.py): per-row profit in exact e4 units —
    revenue = price_cents*(100-disc_cents); cost = qty*retail*0.6, i.e.
    qty*retail_cents*60 in e4 units (qty is integer-valued, retail is
    2-decimal, so every factor is an exact BIGINT).  The r02 narrow-
    DECIMAL formulation was the driver's largest remaining hash-fail
    class; integer units cannot drift."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit_e4 = rev_e4() - cents("p_retailprice") * units("l_quantity") * F.lit(60)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit_e4).cast("double") / F.lit(10000.0)).alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18): IN-subquery with HAVING over an
    aggregate of the same fact table — planned as semi join against the
    re-aggregated fact."""
    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey,
               CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_custkey, o_orderkey
        ORDER BY total_qty DESC, o_orderkey
        """
    )


@query(
    "q22_idle_balances",
    oracle="""
    WITH eligible AS (
        SELECT SUBSTR(c_name, -1) AS tail_digit, c_acctbal, c_custkey
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    )
    SELECT tail_digit, COUNT(*) AS n_custs, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM eligible GROUP BY tail_digit ORDER BY tail_digit
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy-but-recently-inactive customers (TPC-H Q22 shape):
    scalar-average subquery + NOT EXISTS anti join + derived grouping
    key (name tail digit standing in for the country code)."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        WITH eligible AS (
            SELECT SUBSTR(c_name, -1) AS tail_digit, c_acctbal, c_custkey
            FROM customer
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        )
        SELECT tail_digit, COUNT(*) AS n_custs, ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM eligible GROUP BY tail_digit ORDER BY tail_digit
        """
    )
