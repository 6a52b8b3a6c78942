"""Fixture-schema drift guard.

The driver regenerates /root/testdata between rounds, and encodings have
already changed under us once (events.ts went TIMESTAMP(NANOS) →
timestamp[us] while every pytest stayed green — only the fresh-process
oracle drive caught it). This test pins the COLUMN CONTRACT the engine
depends on, while staying deliberately tolerant of the physical ts
encodings ``load_table`` is built to normalize — so a regeneration that
breaks an assumption fails loudly here instead of silently skewing results.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# ts encodings load_table/read_events_stream know how to normalize;
# anything else is a new fixture generation that needs a reader update
KNOWN_TS_ENCODINGS = {"timestamp[ns]", "timestamp[us]", "timestamp[ms]", "int64"}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_fixture_schema_contract(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path)
    assert schema.names == EXPECTED_COLUMNS[table], (
        f"{table} columns changed — fixture regenerated with a new layout?"
    )
    if table == "events":
        enc = str(schema.field("ts").type)
        assert enc in KNOWN_TS_ENCODINGS, (
            f"events.ts arrived as {enc!r} — extend load_table/"
            "read_events_stream normalization for this encoding"
        )
    if table == "embeddings":
        assert str(schema.field("embedding").type).startswith("list"), (
            "embedding column is no longer a list type"
        )


_ID_COLUMNS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
}


@pytest.mark.parametrize("table", sorted(_ID_COLUMNS))
def test_fixture_ids_non_negative(sf_dir, table):
    """The synthetic-media generator family (m02/m05/m08/m12/m19/...)
    derives dimensions and pixel formulas from ids with Python's
    always-non-negative %, while the DuckDB oracles use sign-of-dividend
    % — the closed-form parity holds ONLY for non-negative, non-NULL ids.
    This pins that fixture contract; if a regenerated fixture ever ships
    negative or NULL ids, this fails before any oracle mysteriously does."""
    import duckdb

    path = os.path.join(sf_dir, f"{table}.parquet")
    col = _ID_COLUMNS[table]
    n_bad = duckdb.sql(
        f"SELECT COUNT(*) FROM '{path}' WHERE {col} IS NULL OR {col} < 0"
    ).fetchone()[0]
    assert n_bad == 0, f"{table}.{col} has {n_bad} NULL/negative ids"
