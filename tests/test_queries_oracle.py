"""Oracle-differential tests: every registered query with an oracle must
hash-match DuckDB at the test scale factor — mirrors the driver's gate."""

from __future__ import annotations

import pytest

from aws_data_engineering_spark.plans.registry import QUERIES, queries

from tests.oracle_utils import compare

queries()  # force registration


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        # rows-only check: query runs, schema is stable, rows >= 0
        rows = df.collect()
        assert isinstance(rows, list)
        assert len(df.columns) > 0
    else:
        compare(df, q.oracle, sf_dir)
