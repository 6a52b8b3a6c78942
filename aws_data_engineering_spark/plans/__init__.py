"""Plans: the named query registry the driver executes.

Each query is a (spark_fn, oracle_sql) pair: the Spark side is idiomatic
DataFrame code, the oracle side is ANSI SQL DuckDB runs over the same parquet.
Column names and float rounding are aligned on both sides so the driver's
order-insensitive value-hash matches.
"""

from aws_data_engineering_spark.plans.registry import QUERIES, Query, oracle_sql, queries

__all__ = ["QUERIES", "Query", "queries", "oracle_sql"]
