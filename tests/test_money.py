"""The integer-cents money contract (plans/money.py): the round-3
hash-fix rests on one claim — ROUND(col*100) on an exactly-2-decimal
double is tie-free and yields the same exact integer in Spark, DuckDB,
and exact decimal arithmetic.  This test checks the claim directly on
thousands of randomized on-grid values, including adversarial ones
whose float64 representation sits just below the true decimal."""

import random
from decimal import Decimal

import duckdb
from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.plans.money import cents, rev_e4, units


def _grid_values(n=5000, seed=7):
    rng = random.Random(seed)
    vals = [round(rng.uniform(-110000, 110000), 2) for _ in range(n)]
    # adversarial: values whose float64 is strictly below/above the
    # true decimal (classic cast-truncation victims), plus edges
    vals += [1234.56, 0.07, -0.07, 8.28, 104997.88, -999.99, 0.0, 0.01, -0.01]
    return vals


def test_cents_exact_vs_decimal_and_duckdb(spark):
    vals = _grid_values()
    want = [int(Decimal(str(v)) * 100) for v in vals]

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got_spark = [r.c for r in df.select(F.col("i"), cents("v").alias("c")).orderBy("i").collect()]
    assert got_spark == want, "Spark cents() drifted off the exact grid"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT CAST(ROUND((v)*100) AS BIGINT) FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_duck == want, "DuckDB cents spelling drifted off the exact grid"


def test_rev_e4_and_units_exactness(spark):
    rng = random.Random(11)
    rows = [
        (i, round(rng.uniform(900, 105000), 2), round(rng.uniform(0, 0.10), 2),
         float(rng.randint(1, 50)))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "i long, price double, disc double, qty double")
    got = {
        r.i: (r.rev, r.q)
        for r in df.select(
            "i", rev_e4("price", "disc").alias("rev"), units("qty").alias("q")
        ).collect()
    }
    for i, price, disc, qty in rows:
        want_rev = int(Decimal(str(price)) * 100) * (100 - int(Decimal(str(disc)) * 100))
        assert got[i] == (want_rev, int(qty))
