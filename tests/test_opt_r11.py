"""Round-11 optimization equivalence pins: every rewrite that changed an
operator's internals must produce bit-identical results to the form it
replaced (the oracle hash proves Spark == DuckDB; these prove new == old
on the seams the oracle can't see, e.g. NULL/empty-text edge rows that the
fixture corpus may not exercise at every SF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_engineering_spark.operators import sketch as SK
from aws_data_engineering_spark.sources.tables import load_table


def test_qdigest_report_matches_unfused_walk(spark, sf_dir):
    """The fused single-Arrow-stage q-digest report must equal the walk
    computed independently from the digest nodes (rank walk over (hi,lo)
    order, exact percentile from the leaf cumsum, achieved rank) — the
    decomposed form the fused kernel replaced."""
    orders = load_table(spark, sf_dir, "orders")
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    leaves = SK.qdigest_leaves(orders, F.floor("o_totalprice"))
    got = {
        r["q"]: r
        for r in SK.qdigest_report_from_leaves(leaves, qs).collect()
    }
    digest = sorted(
        ((r["hi"], r["lo"], r["cnt"]) for r in
         SK.qdigest_nodes_from_leaves(leaves).collect()),
    )
    lv = sorted((r["v"], r["cnt"]) for r in leaves.collect())
    n = sum(c for _, _, c in digest)
    t = n // SK.QDIGEST_K
    import math

    for q in qs:
        rank = math.ceil(q * n)
        cum = 0
        est = None
        for hi, lo, cnt in digest:
            cum += cnt
            if cum >= rank:
                est = hi - 1
                break
        lcum = 0
        exact = None
        for v, cnt in lv:
            lcum += cnt
            if lcum >= rank:
                exact = v
                break
        achieved = 0
        for v, cnt in lv:
            if v <= est:
                achieved += cnt
        r = got[q]
        assert (r["rank"], r["est"], r["exact"], r["rank_achieved"]) == (
            rank, est, exact, achieved
        ), (q, dict(r.asDict()))
        assert r["rank_overshoot"] == achieved - rank
        assert r["rank_err_bound"] == 2 * SK.QDIGEST_LEVELS * t
        assert r["digest_size"] == len(digest)
        assert r["n_total"] == n
