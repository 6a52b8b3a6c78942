"""Custom connector on the Python Data Source API (Spark 4).

The reference's only sources are S3 CSV files fetched by shell/boto3 glue
(``Script.sh:10-16``, ``FInal/load_script.py:187``); adding a new feed there
means writing a new wrapper script. This module shows the engine's extension
path instead: a first-class pluggable source —
``spark.dataSource.register(...)`` then ``spark.read.format("synthlog")`` —
with real partition planning, so scans parallelize across executors like any
built-in source.

``synthlog`` generates a deterministic synthetic log table (the stand-in for
"an external system Spark has no built-in reader for"): every row is a pure
function of its id via md5 — reproducible across runs, partition counts, and
engines, so the DuckDB oracle can regenerate the identical table from
``generate_series`` + the same md5 arithmetic (the trick
``operators/sampling.py`` uses for split assignment).

Scale notes: ``partitions()`` splits the id range into ``partitions`` equal
slices — each executor generates its slice independently, no driver
bottleneck, no shuffle. A real connector would put its per-shard query/scan
in ``read()`` the same way (one network session per input partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: severity thresholds over the 0..255 md5 bucket: ~10% ERROR, ~20% WARN.
_ERROR_HI = 26
_WARN_HI = 77


def _make_datasource_classes():
    """Build the DataSource classes inside a factory so cloudpickle ships
    them by value to Python workers (module-level classes break when the
    driver imports this package via sys.path — see operators/dedup.py)."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    @dataclass
    class _Slice(InputPartition):
        start: int
        end: int

    class SynthLogReader(DataSourceReader):
        def __init__(self, options):
            self._rows = int(options.get("rows", 1000))
            self._parts = int(options.get("partitions", 8))

        def partitions(self):
            per = max(1, -(-self._rows // self._parts))  # ceil division
            return [
                _Slice(lo, min(lo + per, self._rows))
                for lo in range(0, self._rows, per)
            ]

        def read(self, partition):
            import hashlib

            for i in range(partition.start, partition.end):
                h = hashlib.md5(str(i).encode()).hexdigest()
                bucket = int(h[:2], 16)
                if bucket < _ERROR_HI:
                    level = "ERROR"
                elif bucket < _WARN_HI:
                    level = "WARN"
                else:
                    level = "INFO"
                yield (i, level, bucket)

    class SynthLogDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthlog"

        def schema(self):
            return "id bigint, level string, bucket int"

        def reader(self, schema):
            return SynthLogReader(self.options)

    return SynthLogDataSource


def register_synthlog(spark: SparkSession) -> None:
    """Idempotently register the ``synthlog`` format on this session."""
    spark.dataSource.register(_make_datasource_classes())


def read_synthlog(spark: SparkSession, rows: int, partitions: int = 8) -> DataFrame:
    register_synthlog(spark)
    return (
        spark.read.format("synthlog")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )


def synthlog_oracle_sql(rows: int) -> str:
    """DuckDB SQL regenerating the identical table (md5 ascii arithmetic —
    same construction as :func:`operators.sampling.bucket_sql`)."""
    h = "md5(CAST(i AS VARCHAR))"

    def hexval(i: int) -> str:
        a = f"ascii(substr({h}, {i}, 1))"
        return f"({a} - 48 - CASE WHEN {a} >= 97 THEN 39 ELSE 0 END)"

    bucket = f"({hexval(1)} * 16 + {hexval(2)})"
    return f"""
    SELECT i AS id,
           CASE WHEN {bucket} < {_ERROR_HI} THEN 'ERROR'
                WHEN {bucket} < {_WARN_HI} THEN 'WARN'
                ELSE 'INFO' END AS level,
           CAST({bucket} AS INT) AS bucket
    FROM generate_series(0, {rows - 1}) t(i)
    """
