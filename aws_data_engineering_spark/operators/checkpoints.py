"""Tracked eager localCheckpoints with scoped release.

bpe_learn and the q-digest compressor create eager localCheckpoint chains
and release the intermediates before returning. Releasing by diffing the
session's GLOBAL persisted-RDD registry before/after the whole function
captures checkpoints a CONCURRENT thread created on the shared
SparkSession in the meantime — and unpersisting someone else's
localCheckpoint DESTROYS it (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on their
next action). These helpers accumulate only the ids each checkpoint call
itself created (the diff window shrinks from the whole function to one
eager materialization), then release exactly that set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_ids(spark: SparkSession) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def tracked_local_checkpoint(df: DataFrame, own_ids: set[int]) -> DataFrame:
    """Eager localCheckpoint whose new persisted-RDD ids are added to
    ``own_ids`` (df.rdd.id() is NOT the persisted block's id, so the
    before/after diff around this one call is the only way to learn it)."""
    spark = df.sparkSession
    before = persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    own_ids |= persistent_ids(spark) - before
    return out


def release_checkpoints(spark: SparkSession, own_ids: set[int]) -> None:
    """Unpersist exactly the tracked ids (non-blocking)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in own_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
