from aws_logs_to_parquet_converter_spark.functions.presto_compat import (  # noqa: F401
    register_presto_compat,
    run_presto_sql,
    translate_presto_sql,
)
