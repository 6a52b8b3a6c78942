"""Streaming queries surfaced through the driver contract.

Each runs a real Structured Streaming query (``readStream`` → windowed agg →
memory sink, ``availableNow`` trigger) and returns the drained result as a
batch DataFrame — so the DuckDB oracle can check a genuine streaming
execution against the equivalent batch SQL. This is the strongest available
correctness statement for a stream: byte-identical results to batch over the
same input.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from aws_data_engineering_spark.plans.registry import register
from aws_data_engineering_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    windowed_counts,
)

_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "st01_stream_tumbling_counts",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "Structured Streaming tumbling-window counts (readStream → availableNow → memory sink), oracle-checked against batch SQL",
)
def st01_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    name = f"st01_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(windowed_counts(stream, "1 hour"), name, "complete")
