"""Event-stream query surface: time windows, JSON extraction, analytic
windows (lag/running sums), sessionization.

These run in batch here (oracle-checkable); the streaming module
(aws_data_engineering_spark.streaming) exposes the same window logic over
``readStream`` with watermarks.

Scale notes: every window is partitioned by ``user_id`` (or keyed by the
time bucket), so the shuffle key matches the natural access pattern; no
global windows over unbounded partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_data_engineering_spark.plans.registry import register
from aws_data_engineering_spark.sources.tables import load_table

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "q20_events_hourly_tumbling",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    "tumbling time-window aggregation (1 hour)",
)
def q20_events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit on BOTH sides: F.window() silently drops NULL-ts rows while
    # a bare date_trunc oracle would keep them as a NULL group (review r6)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q21_events_sliding_window",
    f"""
    WITH shifted AS (
      SELECT date_trunc('hour', ts) - INTERVAL (k.k) HOUR AS window_start, value
      FROM events CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k
      WHERE ts IS NOT NULL
    )
    SELECT strftime(window_start, '{_FMT_DUCK}') AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) / COUNT(*) AS avg_value
    FROM shifted GROUP BY 1
    """,
    "sliding time-window aggregation (2h window / 1h slide)",
)
def q21_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts rows dropped explicitly on both sides (see q20)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # stabilized avg: round the sum first so both engines round a
            # bit-identical double (see relational_queries q01 note)
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


@register(
    "q22_events_json_extract",
    # json_valid guard: Spark's get_json_object returns NULL on malformed
    # JSON, but DuckDB's json_extract_string THROWS — a single corrupt
    # props row would kill the oracle (round-7 malformed-JSON sweep)
    """
    WITH p AS (
      SELECT event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
    FROM p
    GROUP BY event_type
    """,
    "JSON field extraction from string column (events.props); malformed "
    "rows yield NULL on both engines, never a crash",
)
def q22_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        # integer sum is exact on both engines → identical division result
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


@register(
    "q23_events_user_gaps",
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us)                              AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0 AS avg_gap_sec,
           CAST(MAX(gap_us) // 1000000 AS BIGINT)     AS max_gap_sec
    FROM gaps GROUP BY user_id
    """,
    "analytic window: lag() inter-event gaps per user",
)
def q23_events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "gap_us", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.count("gap_us") / 1000000.0).alias("avg_gap_sec"),
        F.floor(F.max("gap_us") / 1000000).cast("bigint").alias("max_gap_sec"),
    )


@register(
    "q24_events_running_total",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value
    FROM events WHERE ts IS NOT NULL
    """,
    "analytic window: cumulative sum per user",
)
def q24_events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts rows excluded on both sides: ORDER BY ts is NULLS FIRST in
    # Spark windows but NULLS LAST in DuckDB, which would shift every
    # running value in the partition (review r6)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@register(
    "q25_events_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events WHERE ts IS NOT NULL
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    "sessionization: 30-min inactivity gap → session ids → per-session agg",
)
def q25_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts rows excluded on both sides (the q24 null-order asymmetry
    # applied to the session flags)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us > 1800 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wcum).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "q41_conversion_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    "sequential conversion funnel (view → click → purchase, event-time "
    "ordered): staged min-ts aggregations, every shuffle keyed on user_id "
    "so AQE co-locates the three stages",
)
def q41_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


@register(
    "q47_json_struct_parse",
    # json_valid guard mirrors from_json's PERMISSIVE default (null struct
    # on malformed input); DuckDB would otherwise throw on one bad row
    """
    WITH p AS (
      SELECT CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS INT)
             END AS k
      FROM events
    )
    SELECT k % 10 AS k_mod,
           COUNT(*) AS n_events,
           CAST(MIN(k) AS INT) AS min_k,
           CAST(MAX(k) AS INT) AS max_k
    FROM p
    GROUP BY k_mod
    """,
    "from_json into a typed struct (schema-on-read JSON parsing — the "
    "JacksonParser path, vs q22's JSONPath extraction), grouped by a "
    "derived field; malformed rows parse to NULL on both engines",
)
def q47_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k int"))
    k = F.col("p").getField("k")
    return (
        parsed.groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "q59_variant_semistructured",
    """
    WITH v AS (
      SELECT event_type, user_id,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM v GROUP BY event_type
    """,
    "VariantType semi-structured path (Spark 4): try_parse_json -> open "
    "binary variant -> typed variant_get extraction. Unlike from_json "
    "(q47) no schema is declared up front — the 100 TB pattern for "
    "heterogeneous event payloads (shredded variant scans beat string "
    "re-parsing); try_parse_json yields a NULL variant on malformed rows "
    "instead of parse_json's FAILFAST job kill",
)
def q59_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0))
            .cast("bigint")
            .alias("n_big_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q61_builtin_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events WHERE ts IS NOT NULL
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
             AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
    "built-in session_window (dynamic-gap windows managed by the engine — "
    "the declarative twin of q25's manual gaps-and-islands; also the "
    "streaming-capable form). Session = [first event, last event + 30min); "
    "an event landing exactly on the boundary opens a NEW session "
    "(half-open intervals), hence >= in the oracle's gap test",
)
def q61_builtin_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
