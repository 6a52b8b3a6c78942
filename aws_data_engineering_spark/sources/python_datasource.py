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

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

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

    def _gen_rows(lo: int, hi: int):
        import hashlib

        for i in range(lo, hi):
            h = hashlib.md5(str(i).encode()).hexdigest()
            bucket = int(h[:2], 16)
            if bucket < _ERROR_HI:
                level = "ERROR"
            elif bucket < _WARN_HI:
                level = "WARN"
            else:
                level = "INFO"
            yield (i, level, bucket)

    class SynthLogStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked micro-batch reader over the same synthetic table:
        each batch advances ``pos`` by ``batch`` ids until ``rows`` is
        exhausted. ``readBetweenOffsets`` regenerates any batch from its
        offset pair — the deterministic-replay contract exactly-once file
        sources rely on after failure."""

        def __init__(self, options):
            self._rows = int(options.get("rows", 1000))
            self._batch = int(options.get("batch", 256))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            lo = int(start["pos"])
            hi = min(lo + self._batch, self._rows)
            # iterator over a MATERIALIZED list: the prefetched batch is
            # pickled driver->executor, and generators don't pickle (list
            # iterators do). Bare lists also break the wrapper's
            # offset-did-not-advance probe — pyspark's
            # _SimpleStreamReaderWrapper.add_result_to_cache calls next(it)
            # on an exhausted-stream batch (end == start) and TypeErrors on
            # a list, killing the micro-batch thread after the last batch.
            return iter(list(_gen_rows(lo, hi))), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            return list(_gen_rows(int(start["pos"]), int(end["pos"])))

        def commit(self, end):
            pass

    class SynthLogDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthlog"

        def schema(self):
            return "id bigint, level string, bucket int"

        def reader(self, schema):
            return SynthLogReader(self.options)

        def simpleStreamReader(self, schema):
            return SynthLogStreamReader(self.options)

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


def read_synthlog_stream(
    spark: SparkSession, rows: int, batch: int = 256
) -> DataFrame:
    """``readStream`` over the synthlog connector (micro-batches of
    ``batch`` ids, offset-tracked by the simple stream reader)."""
    register_synthlog(spark)
    return (
        spark.readStream.format("synthlog")
        .option("rows", str(rows))
        .option("batch", str(batch))
        .load()
    )


def drain_stream_to_memory(
    df: DataFrame, name: str, expected_rows: int, timeout_s: float = 120.0
) -> DataFrame:
    """Run an unbounded custom-source stream until ``expected_rows`` arrive,
    then stop. ``availableNow`` can't bound a source with no end-of-input
    marker (the simple reader protocol prefetches exactly one batch), so the
    drain polls the sink — the pattern integration tests use for unbounded
    sources."""
    import time

    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    spark = df.sparkSession
    deadline = time.time() + timeout_s
    try:
        while time.time() < deadline:
            if spark.table(name).count() >= expected_rows:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(
                f"stream {name!r} drained fewer than {expected_rows} rows "
                f"in {timeout_s}s"
            )
    finally:
        q.stop()
    return spark.table(name)


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


# ---------------------------------------------------------------------------
# Custom SINK on the Python Data Source API: the write half of the
# connector surface (c01/st07 cover batch + streaming reads). ``pyjsonl``
# writes JSON-lines part files with a real two-phase commit: executors
# write .tmp files and return them as commit messages; the driver-side
# commit() atomically publishes them and drops a _SUCCESS manifest, and
# abort() removes the orphans — the same task-commit contract Spark's
# built-in file sinks implement, visible here in ~40 lines of Python.
# ---------------------------------------------------------------------------


def _make_writer_datasource():
    """Writer DataSource classes, built in a factory for by-value pickling
    (same rule as the reader classes above)."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _Part(WriterCommitMessage):
        tmp_path: str
        rows: int

    class JsonLinesWriter(DataSourceWriter):
        def __init__(self, options, field_names):
            self._dir = options["path"]
            self._names = field_names

        def write(self, iterator):
            # executor-side: one .tmp part file per task, never visible to
            # readers until commit publishes it
            import json
            import os
            import uuid as _uuid

            os.makedirs(self._dir, exist_ok=True)
            tmp = os.path.join(self._dir, f".part-{_uuid.uuid4().hex}.jsonl.tmp")
            n = 0
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    f.write(json.dumps(dict(zip(self._names, row))) + "\n")
                    n += 1
            return _Part(tmp_path=tmp, rows=n)

        def commit(self, messages):
            # driver-side: atomic publish + manifest. On a cluster this dir
            # is a shared filesystem/object store, same as the file sinks.
            import json
            import os

            finals = []
            for m in messages:
                final = m.tmp_path.replace(".jsonl.tmp", ".jsonl").replace(
                    "/.part-", "/part-"
                )
                os.replace(m.tmp_path, final)
                finals.append({"file": os.path.basename(final), "rows": m.rows})
            with open(os.path.join(self._dir, "_SUCCESS"), "w") as f:
                json.dump(finals, f)

        def abort(self, messages):
            import os

            for m in messages:
                try:
                    os.remove(m.tmp_path)
                except FileNotFoundError:
                    pass

    class JsonLinesDataSource(DataSource):
        @classmethod
        def name(cls):
            return "pyjsonl"

        def writer(self, schema, overwrite):
            if overwrite:
                raise NotImplementedError(
                    "pyjsonl supports append only; write to a fresh directory"
                )
            return JsonLinesWriter(self.options, [f.name for f in schema.fields])

    return JsonLinesDataSource


def register_pyjsonl(spark: SparkSession) -> None:
    """Idempotently register the ``pyjsonl`` sink format on this session."""
    spark.dataSource.register(_make_writer_datasource())


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write ``df`` as JSON-lines through the custom ``pyjsonl`` connector
    (distributed, two-phase task commit)."""
    register_pyjsonl(df.sparkSession)
    df.write.format("pyjsonl").option("path", path).mode("append").save()
