"""Sources: readers for lake formats (CSV/gzip-CSV/Parquet/JSON/Delta) and
the fixture-table catalog used by the query layer."""

from aws_data_engineering_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from aws_data_engineering_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
    read_table,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_table",
]
