"""Second breadth wave: subquery shapes, disjunctive predicates, pivot,
percentiles, semi-structured extraction, explode, grouping sets, and
skew-safe aggregation (SURVEY §2 widening — each still a (Spark
builder, DuckDB oracle) pair)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.plans.money import (
    SQL_REV_E4,
    cents,
    rev_e4,
    sql_cents,
    sql_sum_dollars,
)
from aws_logs_to_parquet_converter_spark.plans.registry import query, register_views, t

# Monetary aggregates follow the round-3 integer-cents contract
# (plans/money.py): exact BIGINT cents/e4-unit sums, at most one IEEE
# division back to double dollars — no DECIMAL casts, no tie-capable
# ROUND (both were driver-DuckDB-version-unstable; see core.py header).


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an inequality on both relations (TPC-H Q4
    shape, commitdate replaced by a ship-lag predicate since the
    testdata lineitem has no commit/receipt dates) — planned as a
    left-semi join on the correlation key."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "q06_forecast_revenue",
    headline=True,
    oracle=f"""
    SELECT {sql_sum_dollars(sql_cents('l_extendedprice') + " * " + sql_cents('l_discount'), 10000)}
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-aggregate (TPC-H Q6): every predicate pushes to
    parquet; no shuffle at all beyond the final single-group agg.
    price*discount accumulates as exact e4-unit BIGINTs (money
    contract, plans/money.py)."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double") / F.lit(10000.0))
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_sum_dollars(SQL_REV_E4, 10000)} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue ranking (TPC-H Q10 shape): fact-fact join
    shuffles on the key, dims broadcast, top-20 via TakeOrdered."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev_e4()).cast("double") / F.lit(10000.0)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS high_priority,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS low_priority
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum pivot over a join (TPC-H Q12 shape)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REV_E4} ELSE 0 END) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(SUM({SQL_REV_E4}) AS BIGINT) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): conditional aggregate
    ratio.  Numerator and denominator accumulate as exact e4-unit
    BIGINTs, so the emitted share is a fixed two-op IEEE sequence
    (divide, scale) on identical integers — no ROUND needed and no
    accumulation-order drift (money contract, plans/money.py)."""
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev_e4()).otherwise(F.lit(0))).cast("double")
                / F.sum(rev_e4()).cast("double")
            ).alias("promo_pct")
        )
    )


@query(
    "q19_disjunctive",
    oracle=f"""
    SELECT COUNT(*) AS n,
           {sql_sum_dollars(SQL_REV_E4, 10000)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-branch predicates across both join sides
    (TPC-H Q19 shape) — exercises CNF conversion / partial pushdown."""
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(p, p.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        F.count("*").alias("n"),
        (F.sum(rev_e4()).cast("double") / F.lit(10000.0)).alias("revenue"),
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderpriority
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries (semi/anti rewrite by the optimizer)."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE l_returnflag = 'A') AS flag_a,
           COUNT(*) FILTER (WHERE l_returnflag = 'N') AS flag_n,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS flag_r
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: wide conditional counts via the DataFrame pivot API
    (relational equivalent: FILTERed aggregates)."""
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return piv.select(
        "l_linestatus",
        F.col("A").alias("flag_a"),
        F.col("N").alias("flag_n"),
        F.col("R").alias("flag_r"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS median_price,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90_price,
           ROUND(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4)     AS q1_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (order statistics agree across
    engines bit-for-bit; only the interpolation arithmetic needs the
    round)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(TRY_CAST(NULLIF(regexp_extract(props, '"k":[ ]*(-?\\d+)', 1), '') AS INT)) AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the JSON props column (the
    engine's get_json_object path, oracled via regex for dialect
    neutrality)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("k_total"),
        F.count("*").alias("n"),
    )


@query(
    "q_explode_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word HAVING COUNT(*) > 10 ORDER BY n DESC, word
    """,
)
def q_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode -> frequency count (generator/lateral-view path)."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 10)
        .orderBy(F.desc("n"), "word")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)')  AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '(all)')  AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_union_by_name",
    oracle="""
    SELECT kind, key_id, label FROM (
        SELECT 'customer' AS kind, c_custkey AS key_id, c_name AS label FROM customer WHERE c_custkey <= 50
        UNION ALL
        SELECT 'supplier' AS kind, s_suppkey AS key_id, s_name AS label FROM supplier WHERE s_suppkey <= 50
    )
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union across heterogeneous sources (unionByName)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50).select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key_id"),
        F.col("c_name").alias("label"),
    )
    s = t(spark, sf_dir, "supplier").where(F.col("s_suppkey") <= 50).select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("key_id"),
        F.col("s_name").alias("label"),
    )
    return c.unionByName(s)


@query(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag AS k,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): salt the hot
    key into 16 subkeys, partial-agg, then final-agg — same result as a
    plain GROUP BY (the oracle), different shuffle shape.  l_returnflag
    has only 3 values, the worst-case skew for a naive shuffle."""
    from aws_logs_to_parquet_converter_spark.operators.skew import salted_aggregate

    li = t(spark, sf_dir, "lineitem")
    return salted_aggregate(
        li,
        key="l_returnflag",
        aggs={"total_qty": ("sum", "l_quantity"), "n": ("count", "*")},
        salt_buckets=16,
    ).select(F.col("k"), F.col("total_qty").cast("double"), F.col("n"))


@query(
    "q_join_full",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
          FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
          FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
      ON c.nk = s.nk
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two sparse aggregates (keys present on either
    side survive) — completes the outer-join family (SURVEY §2.3)."""
    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "q_correlated_scalar",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders o
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
          * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        > 2 * (SELECT CAST(SUM(CAST(ROUND(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (orders more than 2x their
    customer's average) — decorrelated by Catalyst into an aggregate +
    join rather than a per-row re-scan."""
    register_views(spark, sf_dir, ["orders"])
    # exact-cents threshold (money contract): price > 2*avg spelled as
    # cents*count > 2*sum_cents — integer arithmetic, so a price
    # sitting exactly on the doubled average cannot flip with the
    # engines' different double-accumulation orders
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM orders o
        WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
              * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
            > 2 * (SELECT SUM(CAST(ROUND(o2.o_totalprice * 100) AS BIGINT))
                   FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "q_bag_set_ops",
    oracle="""
    SELECT x FROM (
        SELECT l_suppkey AS x FROM lineitem WHERE l_orderkey <= 200
        INTERSECT ALL
        SELECT l_suppkey AS x FROM lineitem WHERE l_orderkey > 100 AND l_orderkey <= 300
    )
    """,
)
def q_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set op (INTERSECT ALL keeps multiplicity —
    min(count_a, count_b) copies per value)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_orderkey") <= 200).select(F.col("l_suppkey").alias("x"))
    b = li.where((F.col("l_orderkey") > 100) & (F.col("l_orderkey") <= 300)).select(
        F.col("l_suppkey").alias("x")
    )
    return a.intersectAll(b)


@query(
    "q_values_dim",
    oracle="""
    WITH status_dim(code, label) AS (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending'))
    SELECT label, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS volume
    FROM orders JOIN status_dim ON o_orderstatus = code
    GROUP BY label
    """,
)
def q_values_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension join (literal lookup tables without a
    stored dim — broadcast by construction)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT label, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS volume
        FROM orders
        JOIN (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending')) AS status_dim(code, label)
          ON o_orderstatus = code
        GROUP BY label
        """
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({SQL_REV_E4}) AS BIGINT) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_e4 = (SELECT MAX(rev_e4) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by derived revenue (TPC-H Q15 shape): a scalar
    subquery over the same derived aggregate — Catalyst evaluates the
    CTE once per consumer unless cached; the MAX side is a one-row
    broadcast.  The argmax comparison happens on exact BIGINT e4
    revenue (money contract): integer equality, no fp ties."""
    register_views(spark, sf_dir, ["lineitem", "supplier"])
    # the revenue expression interpolates money.SQL_REV_E4 — ONE
    # definition with the decorator oracle, so a money-contract change
    # cannot drift between the two sides
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({SQL_REV_E4}) AS BIGINT)
                       AS rev_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE rev_e4 = (SELECT MAX(rev_e4) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id,
           CAST(SUM(1) OVER (
               PARTITION BY user_id ORDER BY EPOCH_US(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_last_hour,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY EPOCH_US(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS value_last_hour
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame (trailing 1 hour per user) — frame
    membership by timestamp distance, not row count; the sliding-window
    analytics shape (rate limiting, rolling quotas) that ROWS frames
    cannot express."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        F.sum(F.lit(1)).over(w).alias("events_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )
