"""The driver's t2 gate in pytest form: every registered query with an
oracle must hash-match DuckDB at the test scale factor (SURVEY §5.2)."""

import os

import pytest

from aws_logs_to_parquet_converter_spark.plans import REGISTRY
from aws_logs_to_parquet_converter_spark.testing import compare_query, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(spark, duck, name):
    status, detail = compare_query(spark, duck, name, SF_DIR)
    assert status != "fail", detail
    if REGISTRY[name].oracle is not None:
        assert status == "ok"
