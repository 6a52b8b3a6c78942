"""Round-12 optimization pins: each test freezes an internal contract a
round-12 change relies on, cheap enough for the default (non-slow) tier."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stream_shuffle_partitions_derivation(spark):
    """Scale-adaptive streaming partitions: ceil(bytes/advisory) clamped to
    [1, session shuffle partitions] — tiny feeds get 1, huge feeds keep the
    session value (the at-scale no-op that makes this not a local[] tune)."""
    from aws_data_engineering_spark.streaming.streams import (
        stream_shuffle_partitions,
    )

    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert stream_shuffle_partitions(spark, 0) == 1
    assert stream_shuffle_partitions(spark, 1) == 1
    # far beyond advisory x session partitions -> clamped to session value
    assert stream_shuffle_partitions(spark, 10**15) == session_parts


def test_scaled_stream_shuffle_restores_conf(spark, sf_dir):
    from aws_data_engineering_spark.streaming import scaled_stream_shuffle

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with scaled_stream_shuffle(spark, os.path.join(sf_dir, "events.parquet")):
        inside = int(spark.conf.get(key))
        assert 1 <= inside <= int(before)
    assert spark.conf.get(key) == before
    # restore even when the body raises
    try:
        with scaled_stream_shuffle(spark, os.path.join(sf_dir, "events.parquet")):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


def test_d04_signature_pass_single_materialization(spark, sf_dir):
    """The minhash signature table is pinned to ONE RDD identity (lazy
    localCheckpoint): the executed plan must scan an ExistingRDD and carry
    NO Python signature stage per consumer branch — the regression guarded
    against is the 3-4x duplicated ArrowEval/MapInPandas signature pass."""
    from aws_data_engineering_spark.plans.registry import queries

    df = queries()["d04_minhash_candidate_pairs"](spark, sf_dir)
    plan = _plan(df)
    assert "ExistingRDD" in plan, plan[:2000]
    assert "MapInPandas" not in plan and "ArrowEval" not in plan, plan[:2000]


def test_connected_components_star_equals_min_label(spark):
    """The lazy-checkpoint rewrite must leave both algorithms' labels
    identical on a planted graph (two components + chain + isolated pair)."""
    from aws_data_engineering_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    cc = {
        (r["node"], r["label"])
        for r in D.connected_components(pairs).collect()
    }
    star = {
        (r["node"], r["label"])
        for r in D.connected_components_star(pairs).collect()
    }
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }
    assert cc == want
    assert star == want


def test_rollup_hwm_matches_data_max_and_one_file_per_bucket(spark, sf_dir, tmp_path):
    """_rollup_hwm (partition-directory listing) must equal the scanned
    max(bucket_start), and the repartitioned write must leave exactly one
    parquet file per bucket partition."""
    from aws_data_engineering_spark.operators import rollup as R
    from aws_data_engineering_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")
    R.incremental_rollup_refresh(spark, events, path)
    listed = R._rollup_hwm(spark, path)
    scanned = (
        R.read_rollup(spark, path).agg(F.max(R.ROLLUP_BUCKET_COL)).first()[0]
    )
    assert listed == scanned
    for d in glob.glob(f"{path}/{R.ROLLUP_BUCKET_COL}=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, (d, files)


def test_full_drive_fn_source_extraction():
    """Function-granularity tripwire attribution: _fn_source extracts the
    decorated span and detects body-only changes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "full_drive",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "full_drive.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    a = 'x = 1\n\n@deco("n")\ndef q(spark):\n    return 1\n\ndef other():\n    return 2\n'
    b = 'x = 2\n\n@deco("n")\ndef q(spark):\n    return 1\n\ndef other():\n    return 99\n'
    c = a.replace("return 1", "return 3")
    assert mod._fn_source(a, "q") == mod._fn_source(b, "q")  # unrelated hunks
    assert mod._fn_source(a, "q") != mod._fn_source(c, "q")  # body change
    assert mod._fn_source(a, "missing") is None


def test_write_bucketed_feed_matches_loop_form(spark, tmp_path):
    """The one-scan bucketed feed build must reproduce the per-bucket
    filter+append loop it replaced exactly: one file per bucket, bucket
    composition identical (null keys excluded, out-of-range buckets
    excluded), mtimes strictly increasing in bucket order."""
    from aws_data_engineering_spark.streaming import write_bucketed_feed

    rows = [(i, f"doc {i}", "en", "web", 0) for i in range(10)]
    rows.append((None, "null id", "en", "web", 0))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, pad int"
    )
    in_dir = str(tmp_path / "in")
    expr = F.pmod(F.col("doc_id"), F.lit(3))  # NULL -> no bucket
    write_bucketed_feed(df, expr, in_dir, 3)

    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        f"feed-{b}.parquet" for b in range(3)
    ]
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    for b, f in enumerate(files):
        got = {r["doc_id"] for r in spark.read.parquet(f).collect()}
        want = {
            r["doc_id"] for r in df.filter(expr == b).collect()
        }
        assert got == want, (b, got, want)
        # schema matches the plain write the loop form produced
        assert spark.read.parquet(f).columns == df.columns


def test_write_bucketed_feed_pads_empty_bucket(spark, tmp_path):
    """A bucket empty at tiny SFs still yields a schema-only feed file, so
    the micro-batch count stays corpus-independent (the old loop's empty
    coalesce(1) write did the same)."""
    from aws_data_engineering_spark.streaming import write_bucketed_feed

    df = spark.createDataFrame([(0, "a"), (3, "b")], "doc_id bigint, text string")
    in_dir = str(tmp_path / "in")
    write_bucketed_feed(df, F.pmod(F.col("doc_id"), F.lit(3)), in_dir, 3)
    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    assert len(files) == 3
    counts = [spark.read.parquet(f).count() for f in files]
    assert counts == [2, 0, 0]
    assert spark.read.parquet(files[1]).columns == ["doc_id", "text"]
