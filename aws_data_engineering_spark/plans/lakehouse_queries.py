"""Lakehouse source/sink/layout queries (the c family plus their streaming twins st12/st13): layout writes, pruning audits, manifests, format round-trips. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_data_engineering_spark.operators import dedup as DD
from aws_data_engineering_spark.operators import sampling as SAMP
from aws_data_engineering_spark.operators import similarity as SIM
from aws_data_engineering_spark.operators import sketch as SK
from aws_data_engineering_spark.operators import text as T
from aws_data_engineering_spark.plans.registry import register
from aws_data_engineering_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
from aws_data_engineering_spark.operators import multimodal as MM  # noqa: E402,F401
from aws_data_engineering_spark.operators.similarity import pq_oracle_sql as _pq_sql  # noqa: E402,F401
from aws_data_engineering_spark.operators.text import cdc_sql_cte as _cdc_cte  # noqa: E402,F401




# --------------------------------------------------------------------------
# c11 — incremental view maintenance for a join-aggregate: the monthly
# revenue view over orders⨝lineitem is maintained as base(o_orderdate <
# cutoff) plus delta(o_orderdate >= cutoff), then the two partial aggregates
# merge by month — the standard IVM decomposition (join distributes over
# union, SUM/COUNT re-aggregate losslessly). The oracle recomputes the view
# from scratch; a green hash is the proof the incremental plan equals full
# recomputation. Scale: the delta branch's o_orderdate >= cutoff predicate is
# sargable, so a partitioned lake only scans new partitions — the same
# high-water-mark shape as c04's rollup refresh.
# --------------------------------------------------------------------------
_C11_CUTOFF = "1997-01-01"


@register(
    "c11_incremental_view_maintenance",
    f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY order_month
    """,
    "incremental join-view maintenance: base(<cutoff) + delta(>=cutoff) "
    "partial aggregates merged by month; oracle recomputes from scratch, so "
    "the hash match proves incremental == full recompute",
)
def c11_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def partial(orders_slice: DataFrame) -> DataFrame:
        return (
            orders_slice.join(
                lineitem, F.col("o_orderkey") == F.col("l_orderkey")
            )
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(F.sum(rev).alias("rev_part"), F.count(F.lit(1)).alias("cnt_part"))
        )

    base = partial(orders.filter(F.col("o_orderdate") < F.lit(_C11_CUTOFF)))
    delta = partial(orders.filter(F.col("o_orderdate") >= F.lit(_C11_CUTOFF)))
    return (
        base.unionByName(delta)
        .groupBy("order_month")
        .agg(
            F.round(F.sum("rev_part"), 2).alias("revenue"),
            F.sum("cnt_part").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# c12 — partition-pruned read: events are written out partitioned by
# event_date (the reference's dt-partitioned lake layout), then read back
# with a date-range predicate that must prune at LISTING time — the scan
# touches only 3 of ~30 partition directories (asserted in-plan by
# tests/test_plans.py). This is the mechanism that turns a 100 TB lake scan
# into a 3-partition read; the oracle recomputes from the raw table.
# --------------------------------------------------------------------------
_C12_LO, _C12_HI = "2024-01-05", "2024-01-07"


@register(
    "c12_partition_pruned_read",
    f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{_C12_LO}' AND DATE '{_C12_HI}'
    GROUP BY event_date
    """,
    "dt-partitioned lake write + partition-pruned read-back: only the 3 "
    "predicate-covered partition directories are listed/scanned "
    "(plan-asserted); oracle recomputes from the raw table",
)
def c12_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    events = _t(spark, sf_dir, "events")
    path = f"{tempfile.gettempdir()}/c12_{uuid.uuid4().hex}"
    (
        events.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.filter(
            (F.col("event_date") >= F.lit(_C12_LO))
            & (F.col("event_date") <= F.lit(_C12_HI))
        )
        .groupBy(F.col("event_date").cast("string").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# c13 — CSV quoting round-trip: values containing the delimiter, quotes,
# and embedded newlines are written through the CSV sink and read back
# with multiLine parsing; the oracle reconstructs the same values straight
# from the source table, so the hash match proves the quote/escape cycle
# is lossless (the classic CSV corruption class the reference's
# CSV-centric pipeline would hit first). Escaping is RFC-4180 style
# (quote doubling) via the writer's escapeQuotes.
# --------------------------------------------------------------------------
@register(
    "c13_csv_quoting_roundtrip",
    """
    SELECT doc_id,
           'v,' || chr(34) || lang || chr(34) || chr(10) || source AS tricky,
           CAST(length('v,' || chr(34) || lang || chr(34) || chr(10) || source)
                AS BIGINT) AS n_chars
    FROM documents
    """,
    "CSV quote/escape round-trip: delimiter, quotes, and embedded newlines "
    "survive write->multiLine read byte-exactly (hash-proven against the "
    "source-derived values)",
)
def c13_csv_quoting_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    docs = _t(spark, sf_dir, "documents")
    tricky = F.concat(
        F.lit('v,"'), F.col("lang"), F.lit('"'), F.lit("\n"), F.col("source")
    )
    src = docs.select("doc_id", tricky.alias("tricky"))
    path = f"{tempfile.gettempdir()}/c13_{uuid.uuid4().hex}"
    src.write.mode("overwrite").option("header", "true").option(
        "escapeQuotes", "true"
    ).csv(path)
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .schema("doc_id long, tricky string")
        .csv(path)
    )
    return back.select(
        "doc_id", "tricky", F.length("tricky").cast("long").alias("n_chars")
    )


# --------------------------------------------------------------------------
# c14 — PERMISSIVE JSON-lines ingest with corrupt-record quarantine: the
# JSON twin of c08's CSV path. Malformed lines (a bare unquoted token where
# a number belongs) land whole in _corrupt_record with every typed field
# NULL; the audit recovers the key from the raw line by regex and proves
# nothing was dropped. Schema-on-read with a corrupt column stays a single
# map-stage scan at any scale.
# --------------------------------------------------------------------------
@register(
    "c14_json_corrupt_quarantine",
    """
    WITH feed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 3 THEN NULL
                  ELSE ROUND(o_totalprice, 2) END AS o_totalprice,
             o_orderkey % 7 = 3 AS is_corrupt
      FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT is_corrupt,
           COUNT(*) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           ROUND(SUM(COALESCE(o_totalprice, 0)), 2) AS parsed_total
    FROM feed GROUP BY is_corrupt
    """,
    "PERMISSIVE JSON-lines ingest with _corrupt_record quarantine (the "
    "JSON twin of c08): malformed lines kept whole, key recovered by regex "
    "from the raw line, audit proves nothing dropped",
)
def c14_json_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile as _tempfile
    import uuid as _uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    base = _os.path.join(
        _tempfile.gettempdir(), "spark_c14", _uuid.uuid4().hex[:8]
    )
    clean = F.to_json(
        F.struct(
            F.col("o_orderkey"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
    )
    corrupt = F.concat(
        F.lit('{"o_orderkey": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "o_totalprice": oops}'),
    )
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 1)
        .select(
            F.when(F.col("o_orderkey") % 7 == 3, corrupt)
            .otherwise(clean)
            .alias("value")
        )
    )
    src.write.mode("overwrite").text(base)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(base)
    )
    is_corrupt = F.col("_corrupt_record").isNotNull()
    key = F.when(
        is_corrupt,
        F.regexp_extract(
            F.col("_corrupt_record"), r'"o_orderkey": (\d+)', 1
        ).cast("bigint"),
    ).otherwise(F.col("o_orderkey"))
    return (
        parsed.select(
            is_corrupt.alias("is_corrupt"),
            key.alias("key"),
            F.col("o_totalprice"),
        )
        .groupBy("is_corrupt")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("key").cast("bigint").alias("min_key"),
            F.max("key").cast("bigint").alias("max_key"),
            F.round(
                F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2
            ).alias("parsed_total"),
        )
    )


# --------------------------------------------------------------------------
# c15 — ORC source/sink roundtrip (round-6): ORC was dispatch-supported and
# pytest-exercised but had no driver evidence. Write supplier to an ORC
# table (uuid scratch path — fixed paths race concurrent sessions), read
# it back through the format dispatch, aggregate; the oracle aggregates
# the parquet source, so any column lost, retyped, or value-shifted by
# the ORC writer/reader fails the hash. Money stays integer (floor cents)
# so the check is order-free exact.
# --------------------------------------------------------------------------
@register(
    "c15_orc_roundtrip",
    """
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(s_name) AS first_name
    FROM supplier GROUP BY s_nationkey
    """,
    "ORC sink+source roundtrip through the format dispatch: write "
    "supplier to ORC, read back, aggregate — the oracle aggregates the "
    "parquet source, so ORC data loss or retyping fails the hash",
)
def c15_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from aws_data_engineering_spark.sources.readers import read_table
    from aws_data_engineering_spark.sources.writers import write_append

    sup = _t(spark, sf_dir, "supplier")
    path = f"/tmp/spark_graft_c15_{uuid.uuid4().hex[:8]}"
    write_append(sup, path, partition_by=(), fmt="orc")
    back = read_table(spark, path, fmt="orc")
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.floor(F.col("s_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("s_name").alias("first_name"),
    )


# --------------------------------------------------------------------------
# st12 — STREAMING MinHash dedup: "is this newly-arriving doc a near-dup
# of anything already in the corpus?" — the continuous-ingestion question
# batch d04 can't answer without re-scanning the lake per increment. The
# corpus is fed as doc_id-ordered files with maxFilesPerTrigger=1, so a
# real multi-batch foreachBatch run (band-bucket state accumulated
# merge-on-read across batches) must converge to the batch-SQL fixpoint:
# kept(d) iff no smaller doc_id shares a band bucket. A dropped state row,
# a verdict computed after the state append, or a batch-boundary leak all
# flip verdicts and fail the hash.
# --------------------------------------------------------------------------
@register(
    "st12_stream_minhash_dedup",
    DD.minhash_first_seen_oracle_sql(num_hashes=32, num_bands=8),
    "streaming fuzzy dedup: per-micro-batch MinHash band buckets joined "
    "against merge-on-read first-seen state (append-only, min-folded) — "
    "first-seen-wins verdicts over a genuinely multi-batch availableNow "
    "run, oracle-checked against the batch first-seen rule",
)
def st12_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from aws_data_engineering_spark.streaming import (
        read_documents_stream,
        read_minhash_verdicts,
        stream_minhash_dedup_sink,
        write_bucketed_feed,
    )

    docs = _t(spark, sf_dir, "documents")
    base = os.path.join(tempfile.gettempdir(), "spark_st12", uuid.uuid4().hex[:8])
    in_dir = os.path.join(base, "in")
    # feed the corpus as doc_id-RANGE files (bucket = floor(doc_id/step),
    # identical composition to the sequential filter loop this replaces,
    # now built in ONE documents scan — write_bucketed_feed): the file
    # source processes oldest-modification-time first, so batch order ==
    # doc_id order and the streaming first-seen rule equals the oracle's
    # global min-id rule (any batch decomposition respecting that order
    # yields identical verdicts — see stream_minhash_dedup_sink). The
    # helper stamps mtimes in bucket order exactly as before.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    n_files = 4
    step = (int(max_id) + n_files) // n_files
    write_bucketed_feed(
        docs, F.floor(F.col("doc_id") / F.lit(step)), in_dir, n_files
    )
    stream = read_documents_stream(spark, in_dir, max_files_per_trigger=1)
    from aws_data_engineering_spark.streaming import scaled_stream_shuffle

    with scaled_stream_shuffle(spark, in_dir):
        q = stream_minhash_dedup_sink(
            stream,
            state_dir=os.path.join(base, "state"),
            out_dir=os.path.join(base, "out"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        q.awaitTermination()
    return read_minhash_verdicts(spark, os.path.join(base, "out"))


# --------------------------------------------------------------------------
# st13 — watermark late-data drop audit (round-6): the one watermark
# behavior no other streaming query pins — rows arriving AFTER their
# window closed are DROPPED, and the drop boundary is modeled exactly.
# The corpus is fed as three event_id%3 files (each spans the full time
# range, so later batches are massively late) with maxFilesPerTrigger=1.
# Empirically pinned semantics (Spark 4.1, probed at equality edges):
# the watermark batch b RUNS with is max-event-time over batches < b
# (ms-truncated) minus the delay, the LATE-DATA FILTER in batch b uses
# the watermark batch b-1 ran with (one further batch of lag), equality
# DROPS (window_end <= filter-wm), and the availableNow drain ends with
# an empty batch that advances the watermark to the global max, emitting
# every window with end <= final watermark. With three files the only
# drop-exposed batch is the third (filter-wm = max of file 0 - delay);
# the oracle reproduces the admitted set and the final emission set in
# closed form. 37-minute delay keeps watermarks off hour boundaries.
# --------------------------------------------------------------------------
@register(
    "st13_stream_late_data_audit",
    """
    WITH bat AS (
      -- pmod semantics (match the Spark feed splitter: DuckDB % keeps
      -- the dividend's sign, NULL -> bucket 0)
      SELECT *, ((COALESCE(event_id, 0) % 3) + 3) % 3 AS b FROM events
    ), m0 AS (
      SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL 37 MINUTE AS wm
      FROM bat WHERE b = 0
    ), mall AS (
      SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL 37 MINUTE AS wm
      FROM bat
    ), admitted AS (
      SELECT bat.* FROM bat, m0
      WHERE b <= 1 OR date_trunc('hour', ts) + INTERVAL 1 HOUR > m0.wm
    ), agg AS (
      SELECT date_trunc('hour', ts) AS ws, event_type,
             COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
      FROM admitted GROUP BY 1, 2
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, total_value
    FROM agg, mall
    WHERE ws + INTERVAL 1 HOUR <= mall.wm
    """,
    "watermark late-data drop audit: corpus fed as three full-time-range "
    "files so the third batch is massively late; append-mode tumbling agg "
    "under a 37-minute watermark — the oracle reproduces the empirically "
    "pinned drop rule (one-batch-lagged filter watermark, equality drops) "
    "and the final emission set exactly",
)
def st13_stream_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from aws_data_engineering_spark.streaming import (
        read_events_stream,
        run_to_memory_sink,
        stamp_feed_mtimes,
    )

    events = _t(spark, sf_dir, "events")
    base = os.path.join(tempfile.gettempdir(), "spark_st13", uuid.uuid4().hex[:8])
    in_dir = os.path.join(base, "in")
    # one file per event_id%3 class, written sequentially: the file source
    # processes oldest-modification-time first, so batch order == class
    # order (the st12 feed pattern; stamp_feed_mtimes pins it against
    # coarse-mtime tie luck). ts re-encoded as nanos bigint — the
    # EVENTS_DDL raw-INT64 contract (Spark's own timestamp writer emits
    # INT96, which the bigint stream schema refuses)
    feed = events.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    seen: set = set()
    for b in range(3):
        feed.filter(
            F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(3)) == b
        ).coalesce(1).write.mode("append").parquet(in_dir)
        seen = stamp_feed_mtimes(in_dir, seen, b)
    stream = read_events_stream(spark, in_dir, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "37 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = f"st13_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(agg, name, "append")


# --------------------------------------------------------------------------
# c16 — parquet zone-map (row-group skipping) audit (round-6): the
# physical-layout property a 100 TB scan lives or dies by. Lineitem is
# laid out the way a date-partitioned lake table would be — one file per
# ship-month, rows sorted by (shipdate, orderkey, linenumber), written
# EXECUTOR-SIDE by pyarrow with a fixed 512-row row-group size so the
# row-group boundaries are closed-form — then a footer-only second pass
# reads each file's REAL row-group statistics (min/max, counts; never the
# data pages) and decides, per row group, whether a Q1-1996 predicate
# could skip it (mid-range of the fixture's 1995-2001 shipdates: 159 of
# 165 row groups skip at sf0.01, 6 scan). The oracle recomputes every row group's extent from the
# sort order, so a writer that mis-sorts, mis-chunks, or drops statistics
# fails the hash. This is the min/max pruning contract Spark's own
# parquet reader, DuckDB, and every lakehouse format (Iceberg/Delta
# data-skipping stats) rely on, made auditable as a query.
#
# Round 7 (VERDICT r06 #7): months are SUB-PARTITIONED by a portable
# md5 hash bucket of (orderkey, linenumber), so the write stage has
# months × _C16_BUCKETS tasks instead of 84 single-task month files at
# every SF — the r06 100× measurement (60.5×) was entirely that stage's
# task-count ceiling, not a plan-shape problem. Each (month, bucket)
# file keeps the shipdate sort and fixed 512-row row groups; per-bucket
# min/max stay month-tight (the bucket is date-independent), so the
# Q1-1996 skippability contract is unchanged and the oracle recomputes
# every group's extent closed-form per (month, bucket).
# --------------------------------------------------------------------------
_C16_RG_ROWS = 512
_C16_LO, _C16_HI = "1996-01-01", "1996-03-31"
_C16_BUCKETS = 8


@register(
    "c16_parquet_zonemap_audit",
    f"""
    WITH r AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             -- portable sub-partition bucket: first md5 hex char of
             -- 'orderkey:linenumber' mod {_C16_BUCKETS} (the d05 '0x' cast
             -- pattern; Spark mirrors it with ascii arithmetic)
             CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                      CAST(l_linenumber AS VARCHAR)), 1, 1)
                  AS BIGINT) % {_C16_BUCKETS} AS bucket,
             CAST(l_shipdate AS DATE) AS d,
             l_orderkey, l_linenumber
      FROM lineitem
    ), rn AS (
      SELECT month, bucket, d,
             -- order by the DATE-cast column, matching the Spark writer's
             -- sort key d: a raw-timestamp order would diverge on
             -- intraday time components (fixture shipdates are midnight
             -- today, but a regenerated corpus need not be)
             ROW_NUMBER() OVER (
               PARTITION BY month, bucket
               ORDER BY d, l_orderkey, l_linenumber) - 1 AS rn
      FROM r
    ), g AS (
      SELECT month, bucket, rn // {_C16_RG_ROWS} AS rg_idx,
             COUNT(*) AS n_rows, MIN(d) AS min_date, MAX(d) AS max_date
      FROM rn GROUP BY 1, 2, 3
    )
    SELECT month, CAST(bucket AS INT) AS bucket, CAST(rg_idx AS INT) AS rg_idx,
           CAST(n_rows AS BIGINT) AS n_rows, min_date, max_date,
           (max_date < DATE '{_C16_LO}' OR min_date > DATE '{_C16_HI}')
             AS skippable
    FROM g
    """,
    "parquet zone-map audit: (month × hash-bucket)-partitioned, "
    "shipdate-sorted files written executor-side with fixed 512-row row "
    "groups (bucketing lifts the write stage past one-task-per-month); a "
    "footer-only pass reads the real row-group min/max statistics and "
    "decides Q1-1996 skippability per group — the data-skipping contract "
    "lakehouse scans rely on, hash-checked against the closed-form layout",
)
def c16_parquet_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    out_dir = os.path.join(
        tempfile.gettempdir(), "spark_c16", uuid.uuid4().hex[:8]
    )
    os.makedirs(out_dir, exist_ok=True)
    rg_rows, lo, hi = _C16_RG_ROWS, _C16_LO, _C16_HI

    from aws_data_engineering_spark.operators.sampling import _hexval

    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        (_hexval(F.substring(F.md5(key), 1, 1)) % _C16_BUCKETS).alias("bucket"),
        F.col("l_shipdate").cast("date").alias("d"),
        "l_orderkey",
        "l_linenumber",
    )

    def write_part(pdf):
        import os as os_w

        import pandas as pd_w
        import pyarrow as pa_w
        import pyarrow.parquet as pq_w

        pdf = pdf.sort_values(
            ["d", "l_orderkey", "l_linenumber"], kind="mergesort"
        ).reset_index(drop=True)
        month = str(pdf["month"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        path = os_w.path.join(out_dir, f"{month}-b{bucket}.parquet")
        # Array.from_pandas converts the date column in C — the
        # list()-per-element form dominated the 100× write stage
        tbl = pa_w.table(
            {"d": pa_w.Array.from_pandas(pdf["d"], type=pa_w.date32())}
        )
        pq_w.write_table(tbl, path, row_group_size=rg_rows)
        return pd_w.DataFrame(
            {"month": [month], "bucket": [bucket], "path": [path]}
        )

    files = li.groupBy("month", "bucket").applyInPandas(
        write_part, "month string, bucket int, path string"
    )

    def read_footers(batches):
        import datetime as dt_w

        import pandas as pd_w
        import pyarrow.parquet as pq_w

        lo_d = dt_w.date.fromisoformat(lo)
        hi_d = dt_w.date.fromisoformat(hi)
        cols = (
            "month", "bucket", "rg_idx", "n_rows",
            "min_date", "max_date", "skippable",
        )
        for pdf in batches:
            out = {c: [] for c in cols}
            for month, bucket, path in zip(
                pdf["month"], pdf["bucket"], pdf["path"]
            ):
                pf = pq_w.ParquetFile(path)
                for rg in range(pf.metadata.num_row_groups):
                    meta = pf.metadata.row_group(rg)
                    st = meta.column(0).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(f"{path} rg {rg}: missing statistics")
                    out["month"].append(month)
                    out["bucket"].append(int(bucket))
                    out["rg_idx"].append(rg)
                    out["n_rows"].append(meta.num_rows)
                    out["min_date"].append(st.min)
                    out["max_date"].append(st.max)
                    out["skippable"].append(st.max < lo_d or st.min > hi_d)
            yield pd_w.DataFrame(out)

    return files.mapInPandas(
        read_footers,
        "month string, bucket int, rg_idx int, n_rows bigint, "
        "min_date date, max_date date, skippable boolean",
    )


# --------------------------------------------------------------------------
# c17 — dynamic partition pruning (round-6c): the optimization that makes
# star-schema joins survive a 100 TB partitioned lake — the selective dim
# filter prunes FACT PARTITIONS AT RUNTIME through the join, so the scan
# reads 3 of 84 month directories instead of all of them. The fact table
# is written month-partitioned, a month→quarter dim is derived and
# filtered to one quarter, and the broadcast join's pruning subquery
# (SubqueryAdaptiveBroadcast … dynamicpruning#N) is plan-asserted in
# tests/test_plans.py. The oracle recomputes from the raw table, so a
# pruning bug that DROPS a partition fails the hash, not just the plan
# shape. Money stays integer cents.
# --------------------------------------------------------------------------
_C17_QUARTER = "1996Q2"


@register(
    "c17_dynamic_partition_pruned_join",
    f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    WHERE strftime(l_shipdate, '%Y') || 'Q' ||
          CAST((CAST(strftime(l_shipdate, '%m') AS INT) - 1) // 3 + 1 AS VARCHAR)
            = '{_C17_QUARTER}'
    GROUP BY 1
    """,
    "dynamic partition pruning: month-partitioned fact lake table joined "
    "to a quarter-filtered month dim — the runtime pruning subquery scans "
    "3 of 84 partition directories (plan-asserted); oracle recomputes "
    "from the raw table so a dropped partition fails the hash",
)
def c17_dynamic_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    li = _t(spark, sf_dir, "lineitem")
    path = os.path.join(
        tempfile.gettempdir(), "spark_c17", uuid.uuid4().hex[:8]
    )
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    dim = (
        back.select("ship_month")
        .distinct()
        .withColumn(
            "quarter",
            F.concat(
                F.substring("ship_month", 1, 4),
                F.lit("Q"),
                (
                    (F.substring("ship_month", 6, 2).cast("int") - 1) / 3 + 1
                ).cast("int"),
            ),
        )
    )
    joined = back.join(
        F.broadcast(dim.filter(F.col("quarter") == _C17_QUARTER)), "ship_month"
    )
    return joined.groupBy(
        F.col("ship_month").cast("string").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# c18 — manifest-based snapshot time travel (round 8): the lakehouse
# capability Delta/Iceberg provide, rebuilt on plain parquet + an explicit
# commit protocol — because delta-spark is provably uninstallable here
# (SURVEY §5) and the MECHANISM is what matters: data files are immutable,
# a commit is "write new files, then publish a manifest listing the full
# snapshot file set", and a reader pins a version by reading EXACTLY its
# manifest's files. v1 commits the pre-cutoff orders; v2 appends the
# post-cutoff delta INTO THE SAME DIRECTORY and publishes a superset
# manifest — yet the as-of-v1 read still returns exactly the v1 aggregate
# (snapshot isolation under concurrent appends). File listing happens
# once at commit time on a bounded just-written set (the same driver-side
# step every real table format's commit runs — writers.py:175 precedent);
# readers never list the directory, so dirty/uncommitted files are
# invisible by construction. At 100 TB: manifests are per-commit metadata
# (KB), data files never rewrite, and the as-of read plans exactly the
# pinned files — no full-directory listing anywhere.
# --------------------------------------------------------------------------
_C18_CUTOFF = "1997-01-01"
_C18_FILES_PER_COMMIT = 4


@register(
    "c18_manifest_time_travel",
    f"""
    WITH v1 AS (
      SELECT COUNT(*) AS n, SUM(o_totalprice) AS s FROM orders
      WHERE o_orderdate < DATE '{_C18_CUTOFF}'
    ), v2 AS (
      SELECT COUNT(*) AS n, SUM(o_totalprice) AS s FROM orders
    )
    SELECT 'v1' AS version, CAST(n AS BIGINT) AS n_rows,
           ROUND(s, 2) AS total_price,
           CAST({_C18_FILES_PER_COMMIT} AS INT) AS n_files
    FROM v1
    UNION ALL
    SELECT 'v2', CAST(n AS BIGINT), ROUND(s, 2),
           CAST({2 * _C18_FILES_PER_COMMIT} AS INT)
    FROM v2
    """,
    "snapshot time travel on plain parquet: immutable data files + "
    "versioned full-snapshot manifests; the as-of-v1 read returns exactly "
    "the v1 aggregate even though v2's delta was appended into the same "
    "directory (oracle recomputes both snapshots from the raw table)",
)
def c18_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile
    import uuid

    orders = _t(spark, sf_dir, "orders")
    root = f"{tempfile.gettempdir()}/c18_{uuid.uuid4().hex}"
    data_dir = f"{root}/data"
    manifest_dir = f"{root}/manifests"
    os.makedirs(manifest_dir, exist_ok=True)

    def _data_files() -> set[str]:
        return {
            f for f in os.listdir(data_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        }

    def _commit(version: int, files: set[str]) -> None:
        # manifest = the FULL snapshot file set; publish is an atomic
        # rename so a reader never sees a half-written manifest
        tmp = f"{manifest_dir}/.v{version}.json.tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": sorted(files)}, fh)
        os.replace(tmp, f"{manifest_dir}/v{version}.json")

    # commit 1: the pre-cutoff snapshot
    (
        orders.filter(F.col("o_orderdate") < F.lit(_C18_CUTOFF))
        .repartition(_C18_FILES_PER_COMMIT)
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    v1_files = _data_files()
    _commit(1, v1_files)

    # commit 2: append the post-cutoff delta into the SAME directory;
    # the new manifest is the superset (Iceberg append semantics)
    (
        orders.filter(F.col("o_orderdate") >= F.lit(_C18_CUTOFF))
        .repartition(_C18_FILES_PER_COMMIT)
        .write.mode("append")
        .parquet(data_dir)
    )
    _commit(2, _data_files())

    def _read_asof(version: int) -> DataFrame:
        with open(f"{manifest_dir}/v{version}.json") as fh:
            m = json.load(fh)
        paths = [f"{data_dir}/{f}" for f in m["files"]]
        df = spark.read.parquet(*paths)
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        ).select(
            F.lit(f"v{version}").alias("version"),
            "n_rows",
            "total_price",
            F.lit(len(paths)).cast("int").alias("n_files"),
        )

    return _read_asof(1).unionByName(_read_asof(2))


# --------------------------------------------------------------------------
# c19 — fixed-width text source round-trip (round 8): the mainframe-export
# format classic ETL still ingests — no delimiters, fields live at byte
# offsets. Spark has no fixed-width reader, so the scale-correct form IS
# this plan: spark.read.text (splittable, whole-stage codegen) + substring
# slicing + casts, which Catalyst keeps entirely JVM-side. The query
# formats orders into 60-byte records, writes real text files, reads them
# back cold, parses by offset, and aggregates — the census hash-matches
# the source table only if every field survives the byte round trip.
# --------------------------------------------------------------------------
@register(
    "c19_fixed_width_roundtrip",
    """
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           MIN(strftime(o_orderdate, '%Y-%m-%d')) AS min_date,
           MAX(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
    FROM orders
    GROUP BY 1, 2
    """,
    "fixed-width (mainframe-style) text source: format -> write text -> "
    "cold re-read -> parse by byte offset -> census; hash-proves the "
    "byte-offset round trip against the source table",
)
def c19_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    orders = _t(spark, sf_dir, "orders")
    # layout: orderkey 1-12, custkey 13-22, status 23, cents 24-35,
    # date 36-45, priority 46-60 (space right-padded)
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 10, "0"),
        F.col("o_orderstatus"),
        F.lpad(F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 12, "0"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.rpad(F.col("o_orderpriority"), 15, " "),
    )
    path = f"{tempfile.gettempdir()}/c19_{uuid.uuid4().hex}"
    orders.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path).select(
        F.substring("value", 23, 1).alias("status"),
        F.substring("value", 24, 12).cast("bigint").alias("cents"),
        F.substring("value", 36, 10).alias("order_date"),
        F.rtrim(F.substring("value", 46, 15)).alias("priority"),
    )
    return back.groupBy("status", "priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.min("order_date").alias("min_date"),
        F.max("order_date").alias("max_date"),
    )


# --------------------------------------------------------------------------
# c20 — Iceberg-style hidden partitioning + manifest transform pruning
# (round 8): the table declares a PARTITION TRANSFORM (month(o_orderdate))
# the way Iceberg does — the reader never touches directory names or even
# knows the layout; it derives the transform range from its row-level
# date predicate, consults the MANIFEST (file -> transform value), and
# reads only the matching files by explicit path, applying the original
# predicate as the residual filter. Complements c12 (directory-layout
# pruning), c17 (runtime DPP) and c18 (snapshot manifests): this is
# metadata-only pruning on a DERIVED value, the thing that makes Iceberg
# queries cheap without the user ever writing the partition column. One
# corpus-sized write (repartition by transform -> exactly one file per
# month), KB-sized manifest at any scale; the pruning audit (files +
# rows scanned vs total) is part of the oracle-checked output.
# --------------------------------------------------------------------------
_C20_FROM = "1996-02-10"
_C20_TO = "1996-08-20"


@register(
    "c20_hidden_partition_pruning",
    f"""
    WITH all_m AS (
      SELECT (EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate)) AS m, COUNT(*) AS n
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), pruned AS (
      SELECT m, n FROM all_m
      WHERE m BETWEEN 199602 AND 199608
    ), audit AS (
      SELECT (SELECT COUNT(*) FROM all_m) AS n_files_total,
             (SELECT COUNT(*) FROM pruned) AS n_files_scanned,
             (SELECT SUM(n) FROM pruned) AS rows_scanned
    )
    SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                + EXTRACT(month FROM o_orderdate) AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(audit.n_files_total AS INT) AS n_files_total,
           CAST(audit.n_files_scanned AS INT) AS n_files_scanned,
           CAST(audit.rows_scanned AS BIGINT) AS rows_scanned
    FROM orders CROSS JOIN audit
    WHERE o_orderdate BETWEEN DATE '{_C20_FROM}' AND DATE '{_C20_TO}'
    GROUP BY 1, 4, 5, 6
    """,
    "Iceberg-style hidden partitioning: month(o_orderdate) transform "
    "recorded in a manifest, reader prunes files from the manifest by the "
    "derived transform range and applies the date predicate as residual — "
    "per-month revenue plus the files/rows-scanned pruning audit",
)
def c20_hidden_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile
    import uuid

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    m_col = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("m")
    root = f"{tempfile.gettempdir()}/c20_{uuid.uuid4().hex}"
    data_dir = f"{root}/data"

    # The whole scratch lifecycle sits inside try/finally — a failure
    # DURING the corpus write or manifest build must also remove the
    # layout (code-review round 9: the first fix left the write outside
    # the try, leaking exactly the copy ADVICE r08 complained about).
    try:
        # ONE corpus write: repartition on the transform puts each month in
        # exactly one shuffle partition -> exactly one data file per
        # transform value; partitionBy only routes rows, the reader below
        # never relies on the directory names
        (
            orders.withColumn("m", m_col)
            .repartition(F.col("m"))
            .write.partitionBy("m")
            .parquet(data_dir)
        )

        # manifest: file path -> transform value (+ row count), the
        # KB-sized per-commit metadata Iceberg keeps; built from the
        # write's layout here, then treated as the ONLY source of truth
        # by the reader
        manifest = []
        for d in os.listdir(data_dir):
            if not d.startswith("m="):
                continue
            m_val = int(d.split("=", 1)[1])
            for f in os.listdir(f"{data_dir}/{d}"):
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    manifest.append({"path": f"{data_dir}/{d}/{f}", "m": m_val})
        with open(f"{root}/manifest.json", "w") as fh:
            json.dump(manifest, fh)

        # reader: derive the transform range from the ROW predicate (the
        # hidden-partitioning contract: the user only ever states the date
        # range), prune via the manifest, read surviving files by path.
        # The scratch layout is removed in `finally` — the tiny result is
        # eagerly localCheckpoint'ed first so the returned plan no longer
        # references the deleted files (ADVICE r08: repeated runs leaked
        # an orders-sized copy under /tmp per invocation).
        lo = int(_C20_FROM[:4]) * 100 + int(_C20_FROM[5:7])
        hi = int(_C20_TO[:4]) * 100 + int(_C20_TO[5:7])
        with open(f"{root}/manifest.json") as fh:
            entries = json.load(fh)
        scanned = [e["path"] for e in entries if lo <= e["m"] <= hi]
        out_schema = (
            "m int, n_orders bigint, revenue_cents bigint, "
            "n_files_total int, n_files_scanned int, rows_scanned bigint"
        )
        if not scanned:
            # manifest pruned every file: the oracle returns zero groups,
            # so return an empty frame with the output schema instead of
            # letting spark.read.parquet() raise on an empty path list
            return spark.createDataFrame([], out_schema)
        pruned_read = spark.read.parquet(*scanned)
        rows_scanned = pruned_read.count()
        result = (
            pruned_read.filter(
                F.col("o_orderdate").between(F.lit(_C20_FROM), F.lit(_C20_TO))
            )
            .groupBy(
                (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("int")
                .alias("m")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("revenue_cents"),
            )
            .withColumn("n_files_total", F.lit(len(entries)).cast("int"))
            .withColumn("n_files_scanned", F.lit(len(scanned)).cast("int"))
            .withColumn("rows_scanned", F.lit(rows_scanned).cast("bigint"))
        )
        # eager: materializes the (<=#months)-row result into block storage
        return result.localCheckpoint(eager=True)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# c21 — hash-filter semi-join reduction (round 8): the runtime-filter /
# semi-join reduction every distributed optimizer applies to a selective
# shuffle join (Spark's own runtime bloomFilter rewrite, Trino's dynamic
# filters): hash the SELECTIVE build side's join keys into a bounded
# position table, prune the probe side MAP-SIDE with one broadcast semi
# join before the exchange, then run the exact join — the filter has no
# false negatives, so the result is byte-identical to the unfiltered plan
# while the shuffle moves a fraction of the probe rows. The explicit form
# matters at 100 TB precisely when the build side is too big to
# broadcast AS KEYS: the position table is capped at min(n, m) INTEGER
# positions (m data-sized by the same rule production filters use), where
# the raw keys are unbounded-width strings.
#
# Why k=1 (a hashed-bitmap filter) and not a k>1 Bloom, and why conv():
# every alternative physical form was tried and measured before this one.
# Shipping packed bits as a LITERAL (Spark's own BloomFilterMightContain
# design) fails at DataFrame level: a 16k-long array literal
# re-materializes its ArrayData per evaluation (GCLocker churn, then OOM
# in the audit agg), a binary literal blows janino outright
# (InternalCompilerException on the 131 KB constant), and a hex-string
# literal pays O(index) per lookup because UTF8String.substring counts
# codepoints from the start. Probing k positions through k chained
# broadcast joins planned as clean BHJs but, combined with the d11-style
# ascii-arithmetic hash chains, re-evaluated the hash trees across every
# stage boundary (projection collapse) — three such forms measured
# 296-511 s per pass at 100× against ~25 s of actual hash work. The form
# that survives: ONE position per key (hash % m) via Spark's conv() on
# an md5 hex prefix (a single expression node, trivially codegen'd;
# DuckDB twins it as a '0x' || hex cast), ONE broadcast left-semi join,
# and m sized to the build side. The FP cost of k=1 is priced by the
# m-sizing rule (~n/m, ~10% at the 100× build side), is VISIBLE in the
# oracle-checked audit columns, and the exact join removes it. Measured
# at 100×: 60M probe rows -> 14.6M after the filter (24%: 14% true + 10%
# FP), whole plan 19.3 s best-of-2 on an idle local[32] (6.4x per 100x
# data).
# --------------------------------------------------------------------------
_C21_PRED_SQL = "o_orderpriority = '1-URGENT' AND o_totalprice >= 150000"
_C21_HEX_CHARS = 6  # raw hash range 16^6 = 2^24; positions are hash % m
_C21_M_SMALL = 1 << 20
_C21_M_LARGE = 1 << 24
_C21_SIZE_THRESHOLD = 100_000  # build keys above this -> the large filter


def _c21_m(n_build_keys: int) -> int:
    """Size the filter to its build side (what every production runtime
    filter does — Spark sizes by ndv estimate): at k=1 the false-positive
    rate is ~n/m, so m must grow with the build side or the filter
    silently degrades to a no-op. The position table stays <= min(n, m)
    int rows either way."""
    return _C21_M_SMALL if n_build_keys <= _C21_SIZE_THRESHOLD else _C21_M_LARGE


def _c21_hash(col: Column) -> Column:
    """24-bit hash of a key: first 6 hex chars of md5(key || '#b0'),
    parsed as hex via ONE conv() call. NOT the d11 _hexval ascii chain:
    that form generates ~6 nested substring/ascii/CASE trees whose
    whole-stage compilation measured 15-35 s PER UNIQUE STAGE here (the
    fact-table probe embeds the hash in several distinct stages, so a
    single invocation paid minutes of janino time; d11/t35 never noticed
    because their hash lives in one stable stage per session). DuckDB has
    no conv(), but parses '0x' || hex casts — the oracle twin."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit("#b0"))), 1, _C21_HEX_CHARS), 16, 10
    ).cast("bigint")


def _c21_oracle() -> str:
    def hash_expr() -> str:
        return (
            f"CAST(('0x' || substr(md5(k || '#b0'), 1, {_C21_HEX_CHARS}))"
            " AS BIGINT)"
        )

    # dynamic m via the msel scalar subquery — the oracle applies the same
    # build-count sizing rule as the Spark side; membership is a
    # row-preserving IN subquery (NOT an explode + grouped HAVING:
    # lineitem rows can be exact duplicates that a GROUP BY would collapse
    # while Spark's filter keeps each row)
    pos = f"(({hash_expr()}) % (SELECT m FROM msel))"

    return f"""
    WITH build AS (
      SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k FROM orders
      WHERE {_C21_PRED_SQL}
    ), msel AS (
      SELECT CASE WHEN COUNT(*) <= {_C21_SIZE_THRESHOLD} THEN {_C21_M_SMALL}
                  ELSE {_C21_M_LARGE} END AS m
      FROM build
    ), bits AS (
      SELECT DISTINCT {pos} AS pos FROM build
    ), probe AS (
      SELECT l_orderkey, l_returnflag, l_extendedprice, l_discount,
             CAST(l_orderkey AS VARCHAR) AS k
      FROM lineitem
    ), passed AS (
      SELECT l_orderkey, l_returnflag, l_extendedprice, l_discount
      FROM probe WHERE {pos} IN (SELECT pos FROM bits)
    ), audit AS (
      SELECT (SELECT COUNT(*) FROM probe) AS probe_rows_total,
             (SELECT COUNT(*) FROM passed) AS probe_rows_after_bloom,
             (SELECT COUNT(*) FROM build) AS n_build_keys
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(audit.probe_rows_total AS BIGINT) AS probe_rows_total,
           CAST(audit.probe_rows_after_bloom AS BIGINT) AS probe_rows_after_bloom,
           CAST(audit.n_build_keys AS BIGINT) AS n_build_keys
    FROM passed
    JOIN orders o ON passed.l_orderkey = o.o_orderkey AND {_C21_PRED_SQL}
    CROSS JOIN audit
    GROUP BY 1, 4, 5, 6
    """


@register(
    "c21_bloom_semijoin_reduction",
    _c21_oracle(),
    "runtime-filter semi-join reduction: a data-sized hash filter over "
    "the selective build side's keys prunes the probe map-side with one "
    "broadcast semi join before the shuffle join (position table bounded "
    "by min(n, m) ints even when the build keys cannot broadcast); the "
    "exact sort-merge join removes the false positives; before/after "
    "pruning audit in the output",
)
def c21_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    build = orders.filter(F.expr(_C21_PRED_SQL))
    bkeys = build.select(F.col("o_orderkey").cast("string").alias("k")).distinct()
    # ONE eager job up front: the build-key count sizes m (what Spark's
    # runtime filter does from its ndv estimate). Everything else stays a
    # single LAZY plan — an earlier draft eagerly localCheckpoint'd the
    # hashed build keys, and the fresh per-call RDD ids in the checkpoint
    # scan defeated the codegen cache on EVERY call (~50 s of repeated
    # janino compiles of the md5 stages per invocation; the md5+hexval
    # chain is expensive to compile, ~15 s per unique stage)
    n_build = bkeys.count()
    m = _c21_m(n_build)
    bits = bkeys.select((_c21_hash(F.col("k")) % m).alias("pos")).distinct()

    probe = li.withColumn("k", F.col("l_orderkey").cast("string"))
    marked = probe.select(
        "l_orderkey",
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
        (_c21_hash(F.col("k")) % m).alias("pos"),
    )
    # ONE broadcast left-semi join = the map-side prune; rows only drop
    # (bits is distinct), the stage stays whole-stage codegen'd
    passed = marked.join(F.broadcast(bits), "pos", "left_semi").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    # probe_rows_total comes from a bare count-star over the probe table
    # (Parquet metadata count, no hashing) so the audit adds only ONE
    # extra evaluation of the hashed probe (the after-filter count)
    audit = (
        li.agg(F.count(F.lit(1)).cast("bigint").alias("probe_rows_total"))
        .crossJoin(
            passed.agg(
                F.count(F.lit(1)).cast("bigint").alias("probe_rows_after_bloom")
            )
        )
        .withColumn("n_build_keys", F.lit(n_build).cast("bigint"))
    )
    # exact join forced to sort-merge: this is the regime the reduction
    # exists for (build side too big to broadcast); filter false
    # positives die here, so the grouped result is filter-independent
    joined = passed.join(
        build.select("o_orderkey").hint("merge"),
        passed["l_orderkey"] == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(audit))
        .select(
            "l_returnflag", "n_lineitems", "revenue_cents",
            "probe_rows_total", "probe_rows_after_bloom", "n_build_keys",
        )
    )


# --------------------------------------------------------------------------
# c22 — merge-on-read POSITIONAL DELETES (round 9): the deletion-vector
# mechanism Delta (DVs) and Iceberg (positional delete files) use to
# delete rows WITHOUT rewriting base files — the missing lakehouse leg
# beside c18's snapshot commits (time travel) and c10's compaction.
# DELETE WHERE <pred> runs as: one scan records the (file, row_index)
# positions of matching rows into a delete file; base data files are
# never touched (pytest pins their bytes); readers merge-on-read by
# anti-joining the scan against the delete file on position.
#
# Spark-first form: the engine's own `_metadata.row_index` file-source
# column IS the position — no custom reader. The oracle aggregates
# `orders WHERE NOT pred` directly, so the hash proves the full chain:
# positions recorded by scan 1 address exactly the same rows when scan 2
# re-reads the files (row-index stability is THE property deletion
# vectors depend on), and the anti-join drops precisely the predicate's
# rows. A month whose rows are all deleted disappears identically on
# both engines.
#
# Scale: the delete build is one scan + one write of positions only; the
# MoR read is scan + ONE anti-join keyed on (file, row_index) — shuffle
# or broadcast as AQE sizes it (a real DV reader applies a per-file
# bitmap at scan time; the relational anti-join is the engine-portable
# equivalent with the same O(|deletes|) state). Base files rewritten: 0.
# --------------------------------------------------------------------------
_C22_PRED_SQL = "o_orderpriority = '1-URGENT'"


@register(
    "c22_positional_delete_read",
    f"""
    WITH base AS (
      SELECT *, (EXTRACT(year FROM o_orderdate) * 100
                 + EXTRACT(month FROM o_orderdate)) AS m
      FROM orders WHERE o_orderdate IS NOT NULL
    ), aud AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_base_rows,
             CAST(COUNT(*) FILTER ({_C22_PRED_SQL}) AS BIGINT) AS n_deleted
      FROM base
    )
    SELECT CAST(m AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           aud.n_base_rows, aud.n_deleted
    FROM base CROSS JOIN aud
    WHERE NOT ({_C22_PRED_SQL})
    GROUP BY 1, 4, 5
    """,
    "merge-on-read positional deletes (Delta DV / Iceberg delete-file "
    "mechanism): DELETE WHERE pred records (file, row_index) positions "
    "into a delete file, base parquet untouched; the reader anti-joins "
    "positions via Spark's _metadata.row_index — per-month aggregate "
    "after deletes hash-matches the predicate-filtered oracle",
)
def c22_positional_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    pred = F.expr(_C22_PRED_SQL)
    root = f"{tempfile.gettempdir()}/c22_{uuid.uuid4().hex}"
    try:
        orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
        m_col = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("m")
        # one file per month (the c20/c16 layout), rows in a deterministic
        # order — not required for correctness (positions are whatever the
        # first scan sees and the second scan re-sees), just tidy
        (
            orders.withColumn("m", m_col)
            .repartition(F.col("m"))
            .sortWithinPartitions("m", "o_orderkey")
            .write.partitionBy("m")
            .parquet(f"{root}/data")
        )

        def scan():
            return spark.read.parquet(f"{root}/data").select(
                "o_orderkey",
                "o_totalprice",
                "o_orderpriority",
                F.col("m").cast("int").alias("m"),
                F.col("_metadata.file_path").alias("fp"),
                F.col("_metadata.row_index").alias("ri"),
            )

        # DELETE WHERE pred: record positions only; data files untouched
        scan().filter(pred).select("fp", "ri").write.parquet(f"{root}/deletes")

        # explicit schema: a predicate matching ZERO rows writes only
        # _SUCCESS, and schema inference on the empty directory would
        # raise where the oracle returns every month (code-review round 9)
        dv = spark.read.schema("fp string, ri bigint").parquet(f"{root}/deletes")
        live = scan().join(dv, ["fp", "ri"], "left_anti")
        audit = scan().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_base_rows"),
            F.sum(pred.cast("long")).cast("bigint").alias("n_deleted"),
        )
        result = (
            live.groupBy("m")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("revenue_cents"),
            )
            .crossJoin(F.broadcast(audit))
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# c23 — delete-vector COMPACTION (round 10, VERDICT r09 #5): the
# maintenance half of c22's merge-on-read positional deletes — Iceberg's
# rewrite_data_files / Delta's DV-compaction shape. When a base file's
# deleted fraction exceeds a threshold, rewrite JUST that file applying
# its positions (and retire its delete entries); under-threshold files
# stay byte-untouched and keep their DV entries. Completes the
# write→read→compact lifecycle.
#
# The per-month aggregate after compaction must equal c22's pure
# merge-on-read answer (deletes fully applied either way); the AUDIT
# columns pin the classification itself — how many files were rewritten
# vs kept and how many delete entries remain live — which the oracle
# recomputes closed-form from the predicate (per-month deleted fraction
# vs the same ppm threshold, exact integer cross-multiplication on both
# engines: no division, no rounding seam). tests/test_round10.py pins
# the file-level mechanics: kept files' (mtime, size) snapshot unchanged,
# rewritten month directories replaced, retired delete entries gone.
#
# Scale: the census is one metadata-light aggregate (per-file counts);
# the only driver state is the over-threshold FILE LIST (bounded by file
# count — the same planning-state scale Iceberg's rewrite action holds);
# rewrite I/O is proportional to the over-threshold files only, never
# the table. The predicate deletes ~50% in Jan/Feb (custkey%2) and ~25%
# elsewhere (custkey%4), so the 40% threshold splits the layout.
# --------------------------------------------------------------------------
_C23_PRED_SQL = (
    "(o_custkey % 4 = 0 OR (EXTRACT(month FROM o_orderdate) IN (1, 2) "
    "AND o_custkey % 2 = 0))"
)
_C23_PRED_SPARK = (
    "(o_custkey % 4 = 0 OR (month(o_orderdate) IN (1, 2) "
    "AND o_custkey % 2 = 0))"
)
_C23_THRESH_PPM = 400_000  # rewrite when deleted_rows/file_rows > 40%


def _c23_scan(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(f"{root}/data").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        F.col("m").cast("int").alias("m"),
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
    )


def _c23_write_layout(spark: SparkSession, sf_dir: str, root: str) -> None:
    """Day 0: month-partitioned base files (one per month) + the DELETE
    WHERE pred recorded as (file, row_index) positions — c22's mechanism."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    m_col = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("m")
    (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .withColumn("m", m_col)
        .repartition(F.col("m"))
        .sortWithinPartitions("m", "o_orderkey")
        .write.partitionBy("m")
        .parquet(f"{root}/data")
    )
    (
        _c23_scan(spark, root)
        .filter(F.expr(_C23_PRED_SPARK))
        .select("fp", "ri")
        .write.parquet(f"{root}/deletes")
    )


def _c23_compact(spark: SparkSession, root: str) -> dict:
    """Rewrite over-threshold files applying their delete positions;
    retire their delete entries into root/deletes2. Returns the audit
    counts (bounded, file-count-sized driver state — Iceberg-planner
    scale)."""
    import os
    import shutil

    base = _c23_scan(spark, root)
    dv = spark.read.schema("fp string, ri bigint").parquet(f"{root}/deletes")
    stats = (
        base.groupBy("fp", "m")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(dv.groupBy("fp").agg(F.count(F.lit(1)).alias("n_del")), "fp", "left")
        .na.fill({"n_del": 0})
    )
    # ONE Spark job computes the whole classification: stats is bounded
    # by file count (Iceberg-planner scale), so collect it once and
    # derive the over-threshold list, the kept count, AND the surviving
    # delete-entry count from the same rows (code-review round 10: the
    # earlier form paid two extra jobs — a stats.count() and a deletes2
    # read-back — for numbers already in hand)
    stat_rows = stats.select("fp", "m", "n_rows", "n_del").collect()
    # exact integer cross-multiplication — no division, no rounding seam
    over_rows = [
        r
        for r in stat_rows
        if 1_000_000 * r["n_del"] > _C23_THRESH_PPM * r["n_rows"]
    ]
    over_months = sorted({r["m"] for r in over_rows})
    over_fps = [r["fp"] for r in over_rows]
    n_rewritten = len(over_rows)
    n_kept = len(stat_rows) - n_rewritten
    n_dv_remaining = sum(r["n_del"] for r in stat_rows) - sum(
        r["n_del"] for r in over_rows
    )

    # retire rewritten files' delete entries FIRST (the retirement plan
    # must not re-scan data files after the in-place rewrite replaces
    # them — collected fps, not a lazy plan, drive the anti-join).
    # Broadcast anti-join, not isin(): a literal IN-list over the file
    # list is the big-literal codegen anti-pattern once tables have
    # thousands of files
    if over_fps:
        over_df = spark.createDataFrame([(fp,) for fp in over_fps], "fp string")
        dv_kept = dv.join(F.broadcast(over_df), "fp", "left_anti")
    else:
        dv_kept = dv
    dv_kept.write.parquet(f"{root}/deletes2")

    if over_months:
        # rewrite ONLY the over-threshold months: live rows -> staging,
        # then per-partition atomic-rename publish (the c18 pattern)
        live = (
            base.filter(F.col("m").isin(over_months))
            .join(dv, ["fp", "ri"], "left_anti")
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "m")
        )
        (
            live.repartition(F.col("m"))
            .sortWithinPartitions("m", "o_orderkey")
            .write.partitionBy("m")
            .parquet(f"{root}/rw")
        )
        for m in over_months:
            src = f"{root}/rw/m={m}"
            dst = f"{root}/data/m={m}"
            # a 100%-deleted month writes NO staging dir (zero live
            # rows): the compacted form of that file is its absence —
            # remove the original, publish nothing. The publish itself
            # is two atomic renames (old aside, staging in) so a crash
            # at any point leaves the month recoverable — either dst or
            # dst.old still holds a complete copy; the lossy rmtree runs
            # only after the new data is in place
            if os.path.isdir(src):
                old = f"{dst}.old"
                os.replace(dst, old)
                os.replace(src, dst)
                shutil.rmtree(old)
            else:
                shutil.rmtree(dst)
        shutil.rmtree(f"{root}/rw", ignore_errors=True)
    return {
        "n_rewritten_files": n_rewritten,
        "n_kept_files": n_kept,
        "n_dv_remaining": n_dv_remaining,
    }


def _c23_read(spark: SparkSession, root: str, audit: dict) -> DataFrame:
    """Merge-on-read over the compacted layout: remaining DV entries only."""
    dv2 = spark.read.schema("fp string, ri bigint").parquet(f"{root}/deletes2")
    live = _c23_scan(spark, root).join(dv2, ["fp", "ri"], "left_anti")
    return (
        live.groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .withColumn(
            "n_rewritten_files", F.lit(audit["n_rewritten_files"]).cast("bigint")
        )
        .withColumn("n_kept_files", F.lit(audit["n_kept_files"]).cast("bigint"))
        .withColumn(
            "n_dv_remaining", F.lit(audit["n_dv_remaining"]).cast("bigint")
        )
    )


@register(
    "c23_delete_vector_compaction",
    f"""
    WITH base AS (
      SELECT *, (EXTRACT(year FROM o_orderdate) * 100
                 + EXTRACT(month FROM o_orderdate)) AS m
      FROM orders WHERE o_orderdate IS NOT NULL
    ), per_m AS (
      SELECT m, COUNT(*) AS n_rows,
             COUNT(*) FILTER ({_C23_PRED_SQL}) AS n_del
      FROM base GROUP BY 1
    ), cls AS (
      SELECT m, 1000000 * n_del > {_C23_THRESH_PPM} * n_rows AS rewritten,
             n_del
      FROM per_m
    ), aud AS (
      SELECT CAST(COUNT(*) FILTER (rewritten) AS BIGINT) AS n_rewritten_files,
             CAST(COUNT(*) FILTER (NOT rewritten) AS BIGINT) AS n_kept_files,
             CAST(COALESCE(SUM(n_del) FILTER (NOT rewritten), 0) AS BIGINT)
               AS n_dv_remaining
      FROM cls
    )
    SELECT CAST(m AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           aud.n_rewritten_files, aud.n_kept_files, aud.n_dv_remaining
    FROM base CROSS JOIN aud
    WHERE NOT ({_C23_PRED_SQL})
    GROUP BY 1, 4, 5, 6
    """,
    "delete-vector compaction (Iceberg rewrite_data_files shape): files "
    "whose deleted fraction exceeds 40% are rewritten applying their "
    "positions and their delete entries retired; under-threshold files "
    "stay byte-untouched with live DVs — post-compaction aggregate "
    "hash-matches the predicate-filtered oracle, audit columns pin the "
    "closed-form file classification",
)
def c23_delete_vector_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    root = f"{tempfile.gettempdir()}/c23_{uuid.uuid4().hex}"
    try:
        _c23_write_layout(spark, sf_dir, root)
        audit = _c23_compact(spark, root)
        return _c23_read(spark, root, audit).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# c24 — WARC-style crawl-container ingestion (round 10): the missing
# SOURCE format of the web-pipeline story (t39 extraction, t40/d22 URL
# stages): crawl corpora arrive as WARC files — multi-record containers
# with per-record headers and LENGTH-PREFIXED payloads. The writer
# composes real records (version line, WARC-Record-ID, WARC-Target-URI
# from t40's URL composer, Content-Length, blank line, payload) grouped
# into one container file per doc_id%8 class; the reader ingests them via
# binaryFile + an Arrow map-stage parser that walks each container
# BYTE-DRIVEN — headers to the blank line, then exactly Content-Length
# payload bytes — so payload content can never confuse record framing
# (the property real WARC readers depend on; a marker-split parser would
# break on a payload containing 'WARC/1.0').
#
# The per-record output (doc_id, target URI, payload byte length, payload
# md5, records-in-my-file) is oracle-checked closed-form from documents +
# the shared URL composer, so the hash pins header round-tripping, exact
# length-driven slicing, AND the one-container-per-class layout (a split
# container would shrink file_records and fail the hash).
#
# Scale: the FILE is the unit of parallelism — exactly the production
# WARC contract (gzip members are non-splittable; crawlers shard into
# ~1 GB containers). Parse cost is linear in container bytes, zero
# shuffle until the downstream consumer aggregates.
# --------------------------------------------------------------------------
_C24_FILES = 8


def _c24_parser_fn():
    """Factory: the parser closure carries everything by value (cloudpickle
    ships it whole — the mapInPandas import-path rule)."""

    def parse(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "target_uri": [],
                "content_length": [],
                "payload_fp": [],
                "file_records": [],
            }
            for content in pdf["content"]:
                data = bytes(content)
                pos = 0
                recs = []
                while pos < len(data):
                    hdr_end = data.index(b"\n\n", pos)
                    lines = data[pos:hdr_end].decode("utf-8").split("\n")
                    if lines[0] != "WARC/1.0":
                        raise ValueError(f"bad record header: {lines[0]!r}")
                    fields = dict(ln.split(": ", 1) for ln in lines[1:])
                    clen = int(fields["Content-Length"])
                    payload = data[hdr_end + 2 : hdr_end + 2 + clen]
                    if len(payload) != clen:
                        raise ValueError("truncated payload")
                    pos = hdr_end + 2 + clen
                    if data[pos : pos + 1] != b"\n":
                        raise ValueError("missing record terminator")
                    pos += 1
                    recs.append(
                        (
                            int(fields["WARC-Record-ID"].rsplit(":", 1)[1]),
                            fields["WARC-Target-URI"],
                            clen,
                            hashlib.md5(payload).hexdigest()[:8],
                        )
                    )
                for d, u, c, f in recs:
                    out["doc_id"].append(d)
                    out["target_uri"].append(u)
                    out["content_length"].append(c)
                    out["payload_fp"].append(f)
                    out["file_records"].append(len(recs))
            yield pd.DataFrame(out)

    return parse


def _c24_oracle() -> str:
    from aws_data_engineering_spark.operators import web as W

    return f"""
    WITH u AS (
      SELECT doc_id,
             regexp_replace(text, '[\\r\\n]', '', 'g') AS payload,
             {W.synth_url_sql()} AS uri,
             doc_id % {_C24_FILES} AS fid
      FROM documents
    ), pf AS (
      SELECT fid, CAST(COUNT(*) AS INT) AS file_records FROM u GROUP BY 1
    )
    SELECT u.doc_id, u.uri AS target_uri,
           CAST(strlen(payload) AS BIGINT) AS content_length,
           substr(md5(payload), 1, 8) AS payload_fp,
           pf.file_records
    FROM u JOIN pf USING (fid)
    """


@register(
    "c24_warc_container_ingest",
    _c24_oracle(),
    "WARC-style crawl-container round-trip: length-prefixed multi-record "
    "container files written one per doc class, ingested via binaryFile + "
    "a byte-driven Arrow parser (headers to the blank line, then exactly "
    "Content-Length payload bytes — framing immune to payload content); "
    "per-record census oracle-checked closed-form, container layout "
    "pinned by the records-per-file column",
)
def c24_warc_container_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from aws_data_engineering_spark.operators import web as W

    docs = _t(spark, sf_dir, "documents")
    # CR/LF guard (the t22 bracket precedent): header parsing is
    # line-based, so payloads are normalized on BOTH engines; fixture
    # text has neither, so outputs are unchanged
    payload = F.regexp_replace(F.col("text"), "[\\r\\n]", "")
    rec = F.concat(
        F.lit("WARC/1.0\nWARC-Type: response\nWARC-Record-ID: urn:doc:"),
        F.col("doc_id").cast("string"),
        F.lit("\nWARC-Target-URI: "),
        W.synth_url(F.col("doc_id")),
        F.lit("\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\n\n"),
        payload,
    )
    root = f"{tempfile.gettempdir()}/c24_{uuid.uuid4().hex}"
    try:
        # one container file per class: repartition(fid) routes each class
        # wholly into one task, partitionBy splits directories -> exactly
        # one part file per fid (the s16/c20 layout trick); the text
        # sink's row separator doubles as the record terminator
        (
            docs.select(
                (F.col("doc_id") % _C24_FILES).cast("int").alias("fid"),
                rec.alias("value"),
            )
            .repartition(F.col("fid"))
            .write.partitionBy("fid")
            .mode("overwrite")
            .text(root)
        )
        containers = spark.read.format("binaryFile").load(f"{root}/fid=*/")
        parsed = containers.select("content").mapInPandas(
            _c24_parser_fn(),
            schema=(
                "doc_id bigint, target_uri string, content_length bigint, "
                "payload_fp string, file_records int"
            ),
        )
        return parsed.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# c25 — snapshot expiration + orphan-file vacuum (round 11, VERDICT r10
# #2): the missing maintenance verb of the c18 (manifests / time travel),
# c22 (delete files), c23 (compaction) lakehouse lifecycle — and the
# counterpart of the reference's one retention touch
# (generic_load_script.py:151 disables Delta's retentionDurationCheck at
# upsert precisely because vacuum is how old files get reclaimed).
#
# Table lifecycle under test: commit v1 writes the pre-cutoff orders
# (4 files), commit v2 appends the rest (superset manifest, 8 files),
# commit v3 is a COMPACTION — the full snapshot rewritten into 3 fresh
# files and a manifest referencing ONLY those — after which the 8 original
# files are referenced exclusively by expired history. A crashed commit is
# simulated by planting an orphan parquet in the data directory that no
# manifest ever references.
#
# Vacuum = expire manifests beyond the retention window (keep the latest),
# then classify every file in ONE distributed plan: explode every
# manifest's file list, take max(referencing version) per file, and label
# the physical listing by left join — max_v >= live floor → live (byte
# untouched), max_v < live floor → expired-only → delete, no manifest at
# all → orphan → delete. The classification output is file-count-sized
# (Iceberg-planner scale — the same bounded driver state c23's rewrite
# planner holds); data rows are never read during vacuum. At 100 TB:
# manifests are KB-sized metadata, the classification join scales with
# file count not bytes, and the post-vacuum read plans exactly the pinned
# live files — deleting history never touches them (pytest pins
# mtime/size byte-identity and before == after aggregates).
#
# Oracle: the post-vacuum read through v3 must still be the FULL orders
# aggregate (v3 is the compacted full snapshot), and the audit columns pin
# the closed-form classification census (2 expired manifests, 8 expired
# files, 1 orphan, 3 live files).
# --------------------------------------------------------------------------
_C25_CUTOFF = "1996-01-01"
_C25_FILES_PER_COMMIT = 4
_C25_COMPACT_FILES = 3


@register(
    "c25_snapshot_expire_vacuum",
    f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(2 AS BIGINT) AS n_expired_manifests,
           CAST({2 * _C25_FILES_PER_COMMIT} AS BIGINT) AS n_expired_files_deleted,
           CAST(1 AS BIGINT) AS n_orphans_deleted,
           CAST({_C25_COMPACT_FILES} AS BIGINT) AS n_live_files
    FROM orders GROUP BY 1
    """,
    "snapshot expiration + orphan-file vacuum on the manifest lakehouse: "
    "append, append, compact, then expire all but the latest snapshot and "
    "GC — files referenced only by expired manifests and a planted "
    "uncommitted orphan are deleted via one distributed "
    "manifest-classification join (never a data scan); the post-vacuum "
    "read through the surviving snapshot hash-matches the full-table "
    "oracle and the audit columns pin the file census",
)
def c25_snapshot_expire_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    root = f"{tempfile.gettempdir()}/c25_{uuid.uuid4().hex}"
    _c25_build_table(spark, sf_dir, root)
    audit = _c25_vacuum(spark, root)
    return _c25_read(spark, root, audit)


def _c25_data_files(data_dir: str) -> set[str]:
    import os

    return {
        f for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    }


def _c25_build_table(spark: SparkSession, sf_dir: str, root: str) -> None:
    """append (v1) -> append (v2) -> compact (v3) + one uncommitted orphan."""
    import json
    import os
    import uuid

    orders = _t(spark, sf_dir, "orders")
    data_dir = f"{root}/data"
    manifest_dir = f"{root}/manifests"
    os.makedirs(manifest_dir, exist_ok=True)

    def _commit(version: int, files: set[str]) -> None:
        # single-line JSON → spark.read.json reads the manifest set
        # directly as a DataFrame (one row per manifest)
        tmp = f"{manifest_dir}/.v{version}.json.tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": sorted(files)}, fh)
        os.replace(tmp, f"{manifest_dir}/v{version}.json")

    # v1: pre-cutoff snapshot; v2: append the rest (c18 append semantics)
    (
        orders.filter(F.col("o_orderdate") < F.lit(_C25_CUTOFF))
        .repartition(_C25_FILES_PER_COMMIT)
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    _commit(1, _c25_data_files(data_dir))
    (
        orders.filter(F.col("o_orderdate") >= F.lit(_C25_CUTOFF))
        .repartition(_C25_FILES_PER_COMMIT)
        .write.mode("append")
        .parquet(data_dir)
    )
    v2_files = _c25_data_files(data_dir)
    _commit(2, v2_files)

    # v3: compaction — the v2 snapshot rewritten into fresh files; the
    # manifest lists ONLY the rewrite output, stranding v1/v2's files in
    # expired history
    (
        spark.read.parquet(*[f"{data_dir}/{f}" for f in sorted(v2_files)])
        .repartition(_C25_COMPACT_FILES)
        .write.mode("append")
        .parquet(data_dir)
    )
    _commit(3, _c25_data_files(data_dir) - v2_files)

    # a crashed writer's uncommitted file: present on disk, in no manifest
    import pyarrow as pa
    import pyarrow.parquet as pq

    orphan = f"{data_dir}/part-orphan-{uuid.uuid4().hex}.parquet"
    pq.write_table(pa.table({"o_orderkey": pa.array([-1], type=pa.int64())}), orphan)


def _c25_vacuum(spark: SparkSession, root: str) -> dict:
    """Expire all manifests but the newest, then GC: ONE distributed
    classification plan (explode manifests -> max referencing version per
    file -> left-join the physical listing) labels every file live /
    expired-only / orphan; non-live files and expired manifests are
    removed. Returns the audit census (file-count-sized driver state —
    Iceberg-planner scale; data rows are never read)."""
    import os

    data_dir = f"{root}/data"
    manifest_dir = f"{root}/manifests"
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(manifest_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    live_floor = versions[-1]  # Iceberg expire_snapshots retain-last=1
    manifests = spark.read.json(
        [f"{manifest_dir}/v{v}.json" for v in versions]
    ).select("version", F.explode("files").alias("f"))
    phys = spark.createDataFrame(
        [(f,) for f in sorted(_c25_data_files(data_dir))], "f string"
    )
    labeled = (
        phys.join(
            manifests.groupBy("f").agg(F.max("version").alias("max_v")),
            "f",
            "left",
        )
        .select(
            "f",
            F.when(F.col("max_v").isNull(), F.lit("orphan"))
            .when(F.col("max_v") < live_floor, F.lit("expired"))
            .otherwise(F.lit("live"))
            .alias("state"),
        )
        .collect()  # file-count-sized driver state (planner scale)
    )
    for r in labeled:
        if r["state"] != "live":
            os.remove(f"{data_dir}/{r['f']}")
    expired_manifests = [v for v in versions if v < live_floor]
    for v in expired_manifests:
        os.remove(f"{manifest_dir}/v{v}.json")
    return {
        "live_floor": live_floor,
        "n_expired_manifests": len(expired_manifests),
        "n_expired_files_deleted": sum(
            1 for r in labeled if r["state"] == "expired"
        ),
        "n_orphans_deleted": sum(1 for r in labeled if r["state"] == "orphan"),
        "n_live_files": sum(1 for r in labeled if r["state"] == "live"),
    }


def _c25_read(spark: SparkSession, root: str, audit: dict) -> DataFrame:
    """Read through the surviving snapshot's manifest (c18's pinned-file
    read path) and append the vacuum audit census."""
    import json

    with open(f"{root}/manifests/v{audit['live_floor']}.json") as fh:
        live_manifest = json.load(fh)
    live_df = spark.read.parquet(
        *[f"{root}/data/{f}" for f in live_manifest["files"]]
    )
    return (
        live_df.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .withColumn(
            "n_expired_manifests",
            F.lit(audit["n_expired_manifests"]).cast("bigint"),
        )
        .withColumn(
            "n_expired_files_deleted",
            F.lit(audit["n_expired_files_deleted"]).cast("bigint"),
        )
        .withColumn(
            "n_orphans_deleted", F.lit(audit["n_orphans_deleted"]).cast("bigint")
        )
        .withColumn("n_live_files", F.lit(audit["n_live_files"]).cast("bigint"))
    )
