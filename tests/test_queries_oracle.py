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


def test_d05_oracle_whitespace_parity(spark, tmp_path):
    """Planted multi-whitespace corpus: the d05 oracle's regexp_replace
    must genuinely collapse runs of whitespace (tabs/newlines/double
    spaces), matching the Spark side's Python normalizer. Guards the
    f-string escaping of the '\\s+' pattern — an over-escaped '\\\\s+'
    reaches DuckDB as a literal-backslash regex, a silent no-op that the
    whitespace-free fixture corpora never exercise (ADVICE r04)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 0),
        # same token stream as doc 1 once \s+ collapses — jaccard must be 1.0
        (2, "alpha  beta\tgamma\ndelta epsilon\r\nzeta  eta\ttheta", "en", "web", 0),
        (3, "alpha beta gamma delta unrelated tail words here", "en", "web", 0),
        (4, "totally different content with no shared shingles at all", "en", "web", 0),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    q = QUERIES["d05_ngram_jaccard_pairs"]
    df = q.spark(spark, str(tmp_path))
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in df.collect()}
    # whitespace-only variation is invisible to the shingler
    assert got.get((1, 2)) == 1.0
    compare(q.spark(spark, str(tmp_path)), q.oracle, str(tmp_path))
