from aws_logs_to_parquet_converter_spark.sources.parse import parse_lines, read_raw_logs  # noqa: F401
