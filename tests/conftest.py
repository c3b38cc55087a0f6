import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        extra_conf={
            "spark.ui.enabled": "false",
            # keep catalog tables (bucketing tests) out of the repo tree
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
