"""Readers — reference operators S3/S4/S5 done Spark-first.

The reference's v1 pipeline downloaded the gz file to the driver's local disk
and gunzipped it there (``generic_load_script.py:14-24,81-85``) — a
driver-side bottleneck that caps throughput at one node's disk. Spark reads
gzip-compressed CSV natively on executors, so the whole of S3 (gzip-CSV
source) collapses into the same ``spark.read.csv`` call as S4/S5; at 100 TB
the scan parallelizes across the cluster with no driver involvement.

S4 (inferred CSV, ``generic_load_script.py:113``) and S5 (explicit-schema CSV,
``FInal/load_script.py:187``) map 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    delimiter: str = ",",
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV / gzip-CSV scan. Gzip ('.gz') is decompressed natively by Spark —
    never downloaded through the driver. With an explicit ``schema`` this is
    reference S5; with ``infer_schema`` it is S4 (one extra pass over the
    data — avoid at scale, declare schemas instead)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Generic format dispatch (parquet/csv/json/delta/orc)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | None = None,
) -> DataFrame:
    """XML scan (Spark 4 built-in XML source — no external package).

    ``row_tag`` names the repeated element that becomes one row. Without a
    schema the source infers one (extra pass — declare schemas at scale,
    same rule as CSV).
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
