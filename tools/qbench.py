"""Per-query measurement helper for optimization rounds.

Times named queries with the noop sink on a bench-identical session
(same confs as bench.py) and optionally dumps .explain("formatted") to a
file per query. Usage:

    python tools/qbench.py [--plans DIR] [--sf SF_DIR] [--n N] name ...

Prints one JSON line {name: [sec, ...]} (N samples each, default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-qbench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from aws_data_engineering_spark.plans.registry import queries

    qs = queries()
    # warmup: JVM + parquet footer caches (bench.py parity)
    qs["q02_revenue_by_nation"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    # constant-work probe so cross-run comparisons can see host throttle
    t0 = time.time()
    spark.range(0, 400_000_000).selectExpr("sum(id * 2 + 1)").write.mode(
        "overwrite"
    ).format("noop").save()
    cal = round(time.time() - t0, 3)

    out: dict[str, list[float]] = {}
    for name in names:
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        samples = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = samples
    print(json.dumps({"cal": cal, "sf_dir": sf_dir, "timings": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
