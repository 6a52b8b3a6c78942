"""spark-submit entry point — the reference's CLI contract.

The reference is launched as
``spark-submit load_script.py <inbound_key> <config> ...`` from a shell
wrapper that parsed the landed S3 key (``Script.sh:10-24``;
``FInal/script.sh:10-30``). This module gives the package the same front
door::

    spark-submit /path/to/aws_data_engineering_spark/__main__.py \
        --inbound-key inbound/crm/customer/customer_20240115.gz \
        --config /path/to/customer_config.json \
        --landing-root s3a://landing --curated-root s3a://curated

or, equivalently, ``python -m aws_data_engineering_spark ...`` for local
runs (spark-submit takes an application file path — it has no ``-m``). Paths compose exactly like the reference's v2 layout:
``<root>/<source_system>/<table_name>`` (``FInal/load_script.py:180``),
with the inbound file read from ``<landing-root>/<inbound_key>`` unless
``--inbound-path`` overrides it.
"""

from __future__ import annotations

import argparse
import sys

from aws_data_engineering_spark.pipeline import (
    TableConfig,
    compose_inbound_path,
    parse_inbound_key,
    run_load,
    to_s3a,
)
from aws_data_engineering_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="aws_data_engineering_spark")
    p.add_argument(
        "--inbound-key",
        required=True,
        help="landed object key: inbound/<source_system>/<table_name>/<file>",
    )
    p.add_argument(
        "--config", required=True, help="path to the per-table JSON config"
    )
    p.add_argument("--landing-root", required=True)
    p.add_argument("--curated-root", required=True)
    p.add_argument(
        "--inbound-path",
        default=None,
        help="explicit inbound file path (default: <landing-root>/<inbound-key>)",
    )
    p.add_argument("--app-name", default="aws-data-engineering-spark")
    args = p.parse_args(argv)

    source_system, table_name, _file = parse_inbound_key(args.inbound_key)
    config = TableConfig.from_file(args.config)
    if config.table_name != table_name:
        raise SystemExit(
            f"config is for table {config.table_name!r} but the inbound key "
            f"names {table_name!r}"
        )
    # s3:// roots normalize to s3a:// for Spark (the reference's s3a_path,
    # FInal/load_script.py:138-144); inbound joins root+key with the same
    # rstrip/lstrip contract (minus the reference's undefined-file_key bug)
    landing_root = to_s3a(args.landing_root)
    curated_root = to_s3a(args.curated_root)
    inbound = (
        to_s3a(args.inbound_path)
        if args.inbound_path
        else compose_inbound_path(landing_root, args.inbound_key)
    )
    landing = f"{landing_root.rstrip('/')}/{source_system}/{table_name}"
    curated = f"{curated_root.rstrip('/')}/{source_system}/{table_name}"

    spark = get_spark(app_name=args.app_name)
    run_load(spark, config, inbound, landing, curated)
    return 0


if __name__ == "__main__":
    sys.exit(main())
