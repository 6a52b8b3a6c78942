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


def write_binary_objects(
    df: DataFrame, out_dir: str, id_col: str, data_col: str, suffix: str = ".bin"
) -> None:
    """Materialize one raw binary object per row as ``obj_<id><suffix>`` —
    the layout multimodal corpora actually ship in (one image/audio file per
    object in an object store). The write runs executor-side via
    ``foreachPartition`` so no blob ever transits the driver; on a cluster
    ``out_dir`` is a shared filesystem / object-store mount (here: local
    tmp, which local[*] shares across worker threads)."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    rows = df.select(
        df[id_col].alias("id"), df[data_col].cast("binary").alias("data")
    )

    def _write(it):
        import os as _os2

        for r in it:
            tmp = _os2.path.join(out_dir, f".obj_{r['id']}{suffix}.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["data"]))
            # atomic publish so a concurrent binaryFile scan never sees a
            # half-written object
            _os2.replace(tmp, _os2.path.join(out_dir, f"obj_{r['id']}{suffix}"))

    rows.foreachPartition(_write)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Spark's built-in ``binaryFile`` source: one row per object with
    (path, modificationTime, length, content). This is the ingestion front
    door for multimodal corpora at scale — the scan parallelizes across
    executors and ``pathGlobFilter`` prunes at file-listing time, before any
    byte is read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
