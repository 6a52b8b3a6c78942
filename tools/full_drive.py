"""Full-registry oracle drive with per-query wall-time (VERDICT r09 #8).

Mirrors the round-driver's correctness gate over the ENTIRE registry (the
driver itself samples a 50-name prefix): fresh plain SparkSession (NOT the
repo's get_spark — the driver won't use it either), run every queries()
entry at the given SF, compare against oracle_sql() via DuckDB
(sorted-column schema, row count, order-insensitive value rows with floats
canonicalized to round(v, 9)), and record per-query seconds so a
correctness-run perf regression (e.g. an oracle CTE blow-up like r06's
q100 O(L^2) inlining) surfaces without a separate bench.

Usage:
    python tools/full_drive.py [sf_dir] [out.json] [name ...]
Defaults: /root/testdata/sf0.01, /tmp/full_drive.json, all queries.
Output: one JSON object {name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err, spark_sec, oracle_sec}} plus a _meta entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon_rows(rows: list[dict], cols: list[str]) -> list[tuple]:
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, 9) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
        )
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/full_drive.json"
    only = set(sys.argv[3:])

    from aws_data_engineering_spark.compat import ensure_protobuf

    ensure_protobuf()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    t_start = time.time()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "spark_sec": None,
            "oracle_sec": None,
        }
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            cols = sorted(df.columns)
            srows = [{c: r[c] for c in cols} for r in df.collect()]
            row["spark_sec"] = round(time.time() - t0, 3)
            row["spark_rows"] = len(srows)
            if name not in oracles:
                row["err"] = "no_oracle"
            else:
                t1 = time.time()
                ores = con.sql(oracles[name])
                ocols = sorted(ores.columns)
                orows = [dict(zip(ores.columns, r)) for r in ores.fetchall()]
                row["oracle_sec"] = round(time.time() - t1, 3)
                row["oracle_rows"] = len(orows)
                row["rows_match"] = len(srows) == len(orows)
                row["schema_match"] = cols == ocols
                if row["schema_match"]:
                    row["hash_match"] = _canon_rows(srows, cols) == _canon_rows(
                        [{c: r[c] for c in cols} for r in orows], cols
                    )
                else:
                    row["hash_match"] = False
        except Exception as e:  # noqa: BLE001 — record, keep driving
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        green = (
            row["err"] == "no_oracle"
            and row["spark_rows"] is not None
            or row["err"] is None
            and row["hash_match"]
        )
        if not green:
            n_fail += 1
        print(
            f"{name}: {'OK' if green else 'FAIL'} "
            f"rows={row['spark_rows']} sec={row['spark_sec']}"
            + ("" if green else f" err={row['err']}"),
            flush=True,
        )
        results[name] = row
        spark.catalog.clearCache()

    results["_meta"] = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_fail": n_fail,
        "total_sec": round(time.time() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}: {len(results) - 1} queries, {n_fail} failures")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
