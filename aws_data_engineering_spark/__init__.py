"""aws_data_engineering_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``Imudaypamu/aws-data-engineering`` reference (config-driven lake-table ETL:
CSV/gzip ingestion, three-zone landing/curated layout, date-partitioned
writes, append/overwrite/upsert strategies), extended into a full analytics
surface: relational operators, window functions, LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing), and a
structured-streaming slice.

Everything is expressed through the DataFrame/SQL API so Catalyst + Tungsten
pick the physical strategy; no custom execution engine.
"""

from aws_data_engineering_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
