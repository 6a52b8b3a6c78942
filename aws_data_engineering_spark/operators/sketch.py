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
    spark = df.sparkSession

    def _persistent_ids() -> set[int]:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    pre_ids = _persistent_ids()
    cap = (1 << levels) - 1
    leaves = (
        df.select(
            F.least(F.greatest(value.cast("long"), F.lit(0)), F.lit(cap)).alias("v")
        )
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # n and T ride a 1-task window over the DOMAIN-BOUNDED leaf table
    # (<= 2^levels rows at any corpus size — never the fact table)
    w_all = Window.partitionBy(F.lit(1))
    leaves = leaves.withColumn("n_total", F.sum("cnt").over(w_all)).withColumn(
        "t_thresh", F.expr(f"n_total div {k}")
    )
    nodes = leaves.select(
        F.col("v").alias("node_id"), "cnt", "n_total", "t_thresh"
    ).localCheckpoint(eager=True)
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
            pushed.localCheckpoint(eager=True)
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
    # snapshot intermediate block ids BEFORE the final checkpoint, then
    # release exactly those: the digest's own persisted RDD id is not
    # recoverable from the DataFrame (df.rdd wraps a different RDD), so
    # exclusion-by-id does not work — capture-order does (bpe_learn)
    mid_ids = _persistent_ids()
    digest = kept.unionAll(root).localCheckpoint(eager=True)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in mid_ids - pre_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
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
