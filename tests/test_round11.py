"""Round-11 mechanics tests: c25 snapshot-expiration/orphan vacuum file
mechanics and the s04 exhaustive-probe == brute-force identity at the
operator level (the registered query's oracle identity is driver-checked;
q104's skew-split plan assertion lives in tests/test_plans.py)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from aws_data_engineering_spark.plans import lakehouse_queries as LK


def _snap(data_dir: str) -> dict:
    return {
        os.path.basename(p): (os.path.getmtime(p), os.path.getsize(p))
        for p in glob.glob(f"{data_dir}/*.parquet")
    }


def test_c25_vacuum_file_mechanics(spark, sf_dir, tmp_path):
    """Vacuum must delete exactly the expired-only files and the planted
    orphan, leave every live file byte-untouched (mtime/size snapshot),
    remove expired manifests, and keep the surviving-snapshot aggregate
    identical before and after."""
    root = str(tmp_path / "c25")
    LK._c25_build_table(spark, sf_dir, root)
    data_dir = f"{root}/data"

    with open(f"{root}/manifests/v3.json") as fh:
        live_files = set(json.load(fh)["files"])
    before = _snap(data_dir)
    assert len(before) == 2 * LK._C25_FILES_PER_COMMIT + LK._C25_COMPACT_FILES + 1
    assert any(f.startswith("part-orphan-") for f in before)

    def read_v3():
        df = spark.read.parquet(*[f"{data_dir}/{f}" for f in sorted(live_files)])
        return sorted(
            (r["o_orderstatus"], r["n"], r["s"])
            for r in df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("s"),
            )
            .collect()
        )

    before_agg = read_v3()
    audit = LK._c25_vacuum(spark, root)
    after = _snap(data_dir)

    assert audit["n_expired_manifests"] == 2
    assert audit["n_expired_files_deleted"] == 2 * LK._C25_FILES_PER_COMMIT
    assert audit["n_orphans_deleted"] == 1
    assert audit["n_live_files"] == LK._C25_COMPACT_FILES

    # exactly the live set survives, byte-untouched
    assert set(after) == live_files
    for f in live_files:
        assert before[f] == after[f], f"live file changed: {f}"
    # orphan and expired-only files are gone
    assert not any(f.startswith("part-orphan-") for f in after)
    # expired manifests removed, survivor intact
    manifests = sorted(os.listdir(f"{root}/manifests"))
    assert manifests == ["v3.json"]

    # surviving snapshot reads identically before and after vacuum
    assert read_v3() == before_agg

    # the audit-stamped read path agrees with the raw source table
    got = {
        (r["status"], r["n_orders"], r["sum_cents"])
        for r in LK._c25_read(spark, root, audit).collect()
    }
    want = {
        (r["o_orderstatus"], r["n"], r["s"])
        for r in LK._t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("s"),
        )
        .collect()
    }
    assert got == want
