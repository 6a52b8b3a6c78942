"""Deterministic mergeable sketches.

The q-digest here is the Shrivastava et al. (SenSys 2004) quantile
summary in a deterministic bottom-up variant: every stage is a plain
aggregation with no randomness and no ordering dependence, so the digest
is a pure function of the value multiset — which makes it (a) exactly
mergeable (leaf histograms sum; compression is canonical-after-merge) and
(b) oracle-checkable bit-for-bit in SQL, unlike the engine's HLL/
approx-percentile sketches whose internals are implementation-defined
(q26/q39 are rows-only for exactly that reason).

Reference repo carries no sketches (its ETL is projection/sort/stamp —
generic_load_script.py:113-148); this is engine-surface extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QDIGEST_LEVELS = 19  # domain [0, 2^19): whole-dollar order totals
QDIGEST_K = 64  # compression: keep nodes with count > n // k


def qdigest_leaves(
    df: DataFrame, value: Column, levels: int = QDIGEST_LEVELS
) -> DataFrame:
    """Exact leaf histogram of the integer value clamped to [0, 2^levels):
    the MERGEABLE partial of the q-digest — leaf histograms from any data
    split sum exactly, and compressing the summed leaves equals building
    from the whole multiset (st14 streams these per micro-batch)."""
    cap = (1 << levels) - 1
    return (
        df.select(
            F.least(F.greatest(value.cast("long"), F.lit(0)), F.lit(cap)).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qdigest_nodes(
    df: DataFrame,
    value: Column,
    levels: int = QDIGEST_LEVELS,
    k: int = QDIGEST_K,
) -> DataFrame:
    """Build the q-digest over an integer column clamped to [0, 2^levels).

    Deterministic bottom-up rule, one partial-agg groupBy per level:
    level-0 nodes are the exact value histogram; at each level a node
    with count <= T (T = n // k) pushes its count into its parent
    (id // 2), a node with count > T is emitted into the digest; the root
    keeps the remainder unconditionally. A node only ever receives pushes
    from its two children, each <= T at push time, so every internal
    digest node holds <= 2T — which bounds the rank ambiguity of any
    query point by its <= levels straddling ancestors: rank error
    <= 2 * levels * T (the classic q-digest epsilon = O(log U / k)). Every stage is order-free aggregation, so the
    digest is a pure function of the multiset: summing two corpora's leaf
    histograms and compressing equals compressing their union (the merge
    rule, pinned by pytest).

    Returns (level, node_id, cnt, lo, hi) — [lo, hi) the node's value
    range — plus the same ``n_total`` on every row.
    """
    return qdigest_nodes_from_leaves(
        qdigest_leaves(df, value, levels), levels=levels, k=k
    )


def qdigest_nodes_from_leaves(
    leaves: DataFrame, levels: int = QDIGEST_LEVELS, k: int = QDIGEST_K
) -> DataFrame:
    """Canonical compression over a (v, cnt) leaf histogram — see
    :func:`qdigest_nodes` for the contract and invariants."""
    from aws_data_engineering_spark.operators.checkpoints import (
        release_checkpoints,
        tracked_local_checkpoint,
    )

    spark = leaves.sparkSession
    own_ids: set[int] = set()
    # n and T ride a 1-task window over the DOMAIN-BOUNDED leaf table
    # (<= 2^levels rows at any corpus size — never the fact table)
    w_all = Window.partitionBy(F.lit(1))
    leaves = leaves.withColumn("n_total", F.sum("cnt").over(w_all)).withColumn(
        "t_thresh", F.expr(f"n_total div {k}")
    )
    nodes = tracked_local_checkpoint(
        leaves.select(F.col("v").alias("node_id"), "cnt", "n_total", "t_thresh"),
        own_ids,
    )
    # eager per-level checkpoints (the bpe_learn pattern): each level's
    # node table is tiny but its lineage is every previous level — without
    # materialization the L kept-branches of the final union re-run their
    # whole level prefix (O(L^2) shuffle stages; measured 63s -> ~8s at
    # sf0.001). Construction therefore RUNS jobs; intermediates are
    # released before returning, the final digest block stays until GC.
    kept = None
    for level in range(levels):
        keep = nodes.filter(
            (F.col("cnt") > F.col("t_thresh"))
        ).select(
            F.lit(level).alias("level"),
            "node_id",
            "cnt",
            (F.col("node_id") * (1 << level)).alias("lo"),
            ((F.col("node_id") + 1) * (1 << level)).alias("hi"),
            "n_total",
        )
        kept = keep if kept is None else kept.unionAll(keep)
        pushed = (
            nodes.filter(F.col("cnt") <= F.col("t_thresh"))
            .groupBy(
                F.expr("node_id div 2").alias("node_id"), "n_total", "t_thresh"
            )
            .agg(F.sum("cnt").alias("cnt"))
            .select("node_id", "cnt", "n_total", "t_thresh")
        )
        # checkpoint every 3rd level: enough to keep the kept-branch
        # recompute depth <= 2 levels while paying ~7 jobs instead of ~20
        nodes = (
            tracked_local_checkpoint(pushed, own_ids)
            if level % 3 == 2
            else pushed
        )
    # root by CONSERVATION (n minus the emitted mass), not by aggregating
    # the final pushed table: when every node of some level clears the
    # threshold the push chain dies early and a groupBy over the empty
    # table would emit NO root row at all — while the oracle's SUM-over-
    # empty emits cnt=0 — skewing digest_size between engines (caught by
    # the sf0.01 drive). Pushes preserve mass, so the two forms agree
    # whenever the chain survives.
    meta1 = leaves.groupBy("n_total").agg(F.count(F.lit(1)).alias("_"))
    kept_sum = kept.groupBy().agg(F.sum("cnt").alias("ks"))
    root = meta1.crossJoin(kept_sum).select(
        F.lit(levels).alias("level"),
        F.lit(0).cast("long").alias("node_id"),
        (F.col("n_total") - F.coalesce(F.col("ks"), F.lit(0))).alias("cnt"),
        F.lit(0).cast("long").alias("lo"),
        F.lit(1 << levels).cast("long").alias("hi"),
        "n_total",
    )
    # final digest checkpoint happens AFTER the tracked set is complete,
    # then exactly the tracked intermediates are released: per-checkpoint
    # id tracking (not a global before/after registry diff) so checkpoints
    # a concurrent thread created on the shared session are never
    # destroyed (review r6)
    digest = kept.unionAll(root).localCheckpoint(eager=True)
    release_checkpoints(spark, own_ids)
    return digest


def qdigest_quantiles(digest: DataFrame, qs: tuple[float, ...]) -> DataFrame:
    """Rank-walk quantile estimates from a q-digest.

    Canonical walk: nodes ordered by (hi, lo) ascending — narrower ranges
    before the ancestors that contain them — cumulative counts, and the
    estimate for rank r = ceil(q * n) is ``hi - 1`` of the first node
    whose running total reaches r. Pure integer arithmetic after the one
    IEEE multiply ceil(q*n), identical on any engine.
    """
    w = Window.partitionBy(F.lit(1)).orderBy("hi", "lo")
    cum = digest.withColumn("cum", F.sum("cnt").over(w))
    out = None
    for q in qs:
        r = F.ceil(F.lit(q) * F.col("n_total"))
        row = (
            cum.filter(F.col("cum") >= r)
            .orderBy("hi", "lo")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                r.cast("long").alias("rank"),
                (F.col("hi") - 1).alias("est"),
                "n_total",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


def qdigest_report(
    digest: DataFrame,
    leaves: DataFrame,
    qs: tuple[float, ...],
    levels: int = QDIGEST_LEVELS,
    k: int = QDIGEST_K,
) -> DataFrame:
    """Quantile report from a digest + its leaf histogram: per q, the
    rank, the (hi,lo)-walk estimate, the exact percentile, the achieved
    rank, the overshoot, the 2*levels*T bound, digest size and n. The
    post-digest block q100 and st14 share (both produce bit-identical
    digests — merge == rebuild — so both hash-match the same oracle)."""
    spark = digest.sparkSession
    w = Window.partitionBy(F.lit(1)).orderBy("hi", "lo")
    cum = digest.select("lo", "hi", "cnt", F.sum("cnt").over(w).alias("cum"))
    meta = digest.groupBy("n_total").agg(F.count(F.lit(1)).alias("digest_size"))
    qs_df = spark.createDataFrame([(q,) for q in qs], "q double")
    ranks = qs_df.crossJoin(F.broadcast(meta)).select(
        "q",
        F.ceil(F.col("q") * F.col("n_total")).cast("long").alias("rank"),
        "n_total",
        "digest_size",
    )
    # bounded non-equi joins: |qs| ranks x a digest-sized (resp. domain-
    # bounded) table — BNLJ over sketch state, never the fact table
    w_q = Window.partitionBy("q").orderBy("hi", "lo")
    pick = (
        ranks.join(cum, cum["cum"] >= ranks["rank"])
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") == 1)
        .select("q", "rank", (F.col("hi") - 1).alias("est"),
                "n_total", "digest_size")
    )
    lcum = leaves.select(
        "v",
        F.sum("cnt").over(Window.partitionBy(F.lit(1)).orderBy("v")).alias("cum"),
    )
    exact = (
        ranks.select("q", "rank")
        .join(lcum, lcum["cum"] >= F.col("rank"))
        .groupBy("q")
        .agg(F.min("v").alias("exact_v"))
    )
    achieved = (
        pick.select("q", "est")
        .join(lcum, lcum["v"] <= F.col("est"))
        .groupBy("q")
        .agg(F.max("cum").alias("rank_achieved"))
    )
    t = F.expr(f"n_total div {k}")
    return pick.join(exact, "q").join(achieved, "q").select(
        "q",
        "rank",
        "est",
        F.col("exact_v").alias("exact"),
        "rank_achieved",
        (F.col("rank_achieved") - F.col("rank")).alias("rank_overshoot"),
        (F.lit(2 * levels) * t).cast("bigint").alias("rank_err_bound"),
        F.col("digest_size").cast("bigint").alias("digest_size"),
        F.col("n_total").cast("bigint").alias("n_total"),
    )


def qdigest_oracle_sql(
    levels: int = QDIGEST_LEVELS,
    k: int = QDIGEST_K,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> str:
    """DuckDB SQL reproducing the whole q-digest pipeline over the
    ``orders`` view bit-for-bit: 19 MATERIALIZED compression levels (the
    default CTE inlining re-executes each level's prefix — O(L^2)), the
    conservation root, the (hi,lo) rank walk, exact percentiles and the
    achieved-rank overshoot. Shared by q100 (batch) and st14 (streaming
    partial-merge — same digest by the merge==rebuild property)."""
    cap = (1 << levels) - 1
    parts = [f"""
    WITH vals AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice) AS BIGINT), 0), {cap}) AS v
      FROM orders
    ), l0 AS MATERIALIZED (
      SELECT v AS node_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY v
    ), tot AS MATERIALIZED (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) // {k} AS t
      FROM l0
    )"""]
    prev = "l0"
    keeps = []
    for lvl in range(levels):
        # MATERIALIZED: inlining re-executes each level's whole prefix
        # (O(L^2) — measured 90s at sf0.01 vs ~1s materialized)
        parts.append(f""", k{lvl} AS MATERIALIZED (
      SELECT {lvl} AS level, node_id, cnt FROM {prev}, tot WHERE cnt > t
    ), p{lvl} AS MATERIALIZED (
      SELECT node_id // 2 AS node_id, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM {prev}, tot WHERE cnt <= t GROUP BY node_id // 2
    )""")
        keeps.append(f"SELECT * FROM k{lvl}")
        prev = f"p{lvl}"
    parts.append(f""", digest0 AS MATERIALIZED ({' UNION ALL '.join(keeps)}),
    root AS (
      -- conservation: root = n minus emitted mass (see sketch.py — the
      -- push chain can die early, but mass is preserved)
      SELECT {levels} AS level, CAST(0 AS BIGINT) AS node_id,
             CAST(tot.n - COALESCE((SELECT SUM(cnt) FROM digest0), 0)
                  AS BIGINT) AS cnt
      FROM tot
    ), digest AS (SELECT * FROM digest0 UNION ALL SELECT * FROM root),
    walk AS (
      SELECT level, node_id, cnt,
             node_id * (CAST(1 AS BIGINT) << level) AS lo,
             (node_id + 1) * (CAST(1 AS BIGINT) << level) AS hi
      FROM digest
    ), cum AS (
      SELECT *, CAST(SUM(cnt) OVER (ORDER BY hi, lo) AS BIGINT) AS cum FROM walk
    ), dsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS digest_size FROM digest),
    qs(q) AS (VALUES {', '.join(f'({q})' for q in qs)}),
    est AS (SELECT q, CAST(CEIL(q * n) AS BIGINT) AS r FROM qs, tot),
    pick AS (
      SELECT e.q, e.r, c.hi,
             ROW_NUMBER() OVER (PARTITION BY e.q ORDER BY c.hi, c.lo) AS rn
      FROM est e JOIN cum c ON c.cum >= e.r
    ), lcum AS (
      SELECT node_id AS v, CAST(SUM(cnt) OVER (ORDER BY node_id) AS BIGINT)
               AS cum
      FROM l0
    ), exact AS (
      SELECT e.q, MIN(s.v) AS exact_v FROM est e JOIN lcum s ON s.cum >= e.r
      GROUP BY e.q
    )
    , achieved AS (
      SELECT p.q, MAX(s.cum) AS rank_achieved
      FROM pick p JOIN lcum s ON s.v <= p.hi - 1
      WHERE p.rn = 1 GROUP BY p.q
    )
    SELECT CAST(p.q AS DOUBLE) AS q, p.r AS rank, p.hi - 1 AS est,
           x.exact_v AS exact,
           a.rank_achieved,
           a.rank_achieved - p.r AS rank_overshoot,
           CAST(2 * {levels} * tot.t AS BIGINT) AS rank_err_bound,
           dsize.digest_size, tot.n AS n_total
    FROM pick p JOIN exact x USING (q) JOIN achieved a USING (q), tot, dsize
    WHERE p.rn = 1
    """)
    return "".join(parts)
