"""Guards on the oracle harness itself.

Round-2 driver failure q12 was caused by a DuckDB ``SUM(int)`` returning
HUGEINT: values equal, typed hash different, and ``fetchall()``-based local
comparison blind to it. These tests pin the harness-side defense."""

from __future__ import annotations

import pytest

from aws_data_engineering_spark.plans.registry import QUERIES, queries

from tests.oracle_utils import (
    _assert_driver_hashable_types,
    _assert_no_nested_output_types,
    duckdb_conn,
)


def test_uncast_sum_int_is_rejected(sf_dir):
    """A deliberate un-cast SUM(int) must fail loudly in the local harness."""
    conn = duckdb_conn(sf_dir)
    try:
        rel = conn.sql("SELECT SUM(1) AS c FROM region")
        with pytest.raises(AssertionError, match="HUGEINT"):
            _assert_driver_hashable_types(rel.columns, rel.types, "SELECT ...")
    finally:
        conn.close()


def test_cast_sum_bigint_is_accepted(sf_dir):
    conn = duckdb_conn(sf_dir)
    try:
        rel = conn.sql("SELECT CAST(SUM(1) AS BIGINT) AS c FROM region")
        _assert_driver_hashable_types(rel.columns, rel.types, "SELECT ...")
    finally:
        conn.close()


def test_all_registered_oracles_have_driver_hashable_types(sf_dir):
    """Sweep every registered oracle's result types (no value fetch needed).

    This is the static half of the q12 class: any oracle whose result schema
    contains an over-wide integer fails here before it can fail at the
    driver. Streaming queries without an oracle are skipped by design."""
    queries()
    conn = duckdb_conn(sf_dir)
    bad = {}
    try:
        for name, q in sorted(QUERIES.items()):
            if q.oracle is None:
                continue
            rel = conn.sql(q.oracle)
            wide = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if str(t) in {"HUGEINT", "UHUGEINT", "UBIGINT"}
            ]
            if wide:
                bad[name] = wide
    finally:
        conn.close()
    assert not bad, f"oracles with over-wide integer columns: {bad}"


def test_list_output_column_is_rejected(spark, sf_dir):
    """The round-3 driver failure class (q65): a top-level array column makes
    the driver's pandas canonicalizer throw ``unhashable type: 'list'``. A
    deliberate list-valued output must fail loudly in the local harness, on
    both the Spark and the DuckDB side."""
    sdf = spark.range(1).selectExpr("array(1, 2) AS a")
    conn = duckdb_conn(sf_dir)
    try:
        rel = conn.sql("SELECT [1, 2] AS a")
        with pytest.raises(AssertionError, match="array/map/struct"):
            _assert_no_nested_output_types(sdf, rel.columns, rel.types)
        # oracle-side alone (scalar Spark output, list oracle output)
        scalar = spark.range(1).selectExpr("1 AS a")
        with pytest.raises(AssertionError, match="nested-typed"):
            _assert_no_nested_output_types(scalar, rel.columns, rel.types)
    finally:
        conn.close()


def test_all_registered_oracles_have_scalar_output_types(sf_dir):
    """Static sweep (types only, no value fetch): any oracle whose result
    schema contains a LIST/MAP/STRUCT column fails here before the driver's
    canonicalizer can crash on it. Spark-side counterpart:
    test_plans.test_whole_registry_scalar_output_columns."""
    queries()
    conn = duckdb_conn(sf_dir)
    bad = {}
    try:
        for name, q in sorted(QUERIES.items()):
            if q.oracle is None:
                continue
            rel = conn.sql(q.oracle)
            nested = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if "[]" in str(t) or str(t).startswith(("MAP(", "STRUCT(", "UNION("))
            ]
            if nested:
                bad[name] = nested
    finally:
        conn.close()
    assert not bad, f"oracles with nested output columns: {bad}"
