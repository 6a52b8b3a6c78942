"""Round-3 breadth batches 2-4: exact-substring span dedup, merge-table
(BPE-style) segmentation, RAG chunking, weighted priority / k-fold sampling,
power-iteration PCA, silhouette + embedding-health + ANN-recall audits,
label propagation, MMR retrieval, PMI collocations, event transition matrix,
incremental join-view maintenance, RFM segmentation, partition-pruned reads,
and the winsorize / uniqueness / Benford data-quality audits.

This module registers AFTER ``extra_queries`` (see ``registry._load_all``) so
these land at the very tail of the driver's not-yet-checked sample prefix —
earlier rounds' unchecked queries keep rotation priority.

Hash-match rules as the registry docstring: identical aliases both sides,
ROUND on float aggregates, integer outputs CAST to BIGINT on the DuckDB side
(SUM(int) is HUGEINT there), ``+ 0.0`` after ROUND where a near-zero value
could round to IEEE ``-0.0`` on one side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_data_engineering_spark.operators import dedup as DD
from aws_data_engineering_spark.operators import sampling as SAMP
from aws_data_engineering_spark.operators import similarity as SIM
from aws_data_engineering_spark.operators import sketch as SK
from aws_data_engineering_spark.operators import text as T
from aws_data_engineering_spark.plans.registry import register
from aws_data_engineering_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# d14 — exact-substring duplicate SPANS (the deduplicate-text-datasets
# output shape, approximated at gram granularity): build an inverted index
# of 8-token grams, keep grams seen in >=2 distinct docs, then merge each
# doc's duplicated gram positions into maximal spans (gaps-and-islands over
# the position column). Scale: the index is a shuffle equi-join on the gram
# string — no all-pairs doc comparison anywhere — and span merging is a
# per-doc window, so the whole plan is embarrassingly key-parallel at 100 TB.
# Mirrors the span-level output of suffix-array dedup (reference has no such
# operator; this is the LLM-pipeline breadth the brief asks for).
# --------------------------------------------------------------------------
_D14_GRAM = 8


@register(
    "d14_duplicate_span_merge",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             UNNEST(generate_series(0, len(t) - {_D14_GRAM})) AS pos,
             t
      FROM toks WHERE len(t) >= {_D14_GRAM}
    ), g2 AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             array_to_string(list_slice(t, pos + 1, pos + {_D14_GRAM}), ' ') AS gram
      FROM grams
    ), dup AS (
      SELECT gram FROM g2 GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g2.doc_id, g2.pos FROM g2 JOIN dup USING (gram)
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {_D14_GRAM} THEN 0 ELSE 1 END AS is_break
      FROM hits
    ), isl AS (
      SELECT doc_id, pos,
             SUM(is_break) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM brk
    ), spans AS (
      SELECT doc_id, island, MIN(pos) AS span_start,
             MAX(pos) + {_D14_GRAM} AS span_end
      FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(span_end - span_start) AS BIGINT) AS dup_tokens,
           CAST(MIN(span_start) AS BIGINT) AS first_span_start
    FROM spans GROUP BY doc_id
    """,
    "exact-substring duplicate span merging: 8-gram inverted index (equi-join, "
    "no all-pairs), per-doc gaps-and-islands window merges overlapping gram "
    "hits into maximal duplicated spans",
)
def d14_duplicate_span_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    spans = DD.duplicate_spans(docs, "doc_id", "text", gram=_D14_GRAM)
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
        F.min("span_start").alias("first_span_start"),
    )


# --------------------------------------------------------------------------
# t22 — merge-table segmentation (the BPE apply step): text becomes a
# bracket-framed symbol stream ('<t><h><e>< ><f>...' — one '<c>' per char,
# '< >' as the word-boundary symbol no rule names), then an ORDERED merge
# table is applied as literal replaces of '<x><y>' -> '<xy>'. Adjacent
# matches share no characters, so one left-to-right replace() pass merges
# every disjoint occurrence — the standard greedy BPE-apply semantics,
# identical in Spark and DuckDB and pinned against a pure-Python model by
# test_bpe_apply_equals_model. JVM-side string expressions only: no UDF,
# shuffle only for the final symbol count.
# --------------------------------------------------------------------------
_T20_MERGES = [
    ("s", "t"),
    ("t", "h"),
    ("th", "e"),
    ("o", "r"),
    ("a", "n"),
    ("e", "y"),
    ("k", "ey"),
    ("j", "o"),
    ("i", "n"),
    ("jo", "in"),
    ("s", "p"),
    ("sp", "a"),
]


def _t20_oracle() -> str:
    # strip literal '<'/'>' before encoding, mirroring bpe_apply's
    # frame-bracket guard (no-op on the bracket-free fixture corpora)
    expr = "regexp_replace(regexp_replace(text, '[<>]', '', 'g'), '(.)', '<\\1>', 'g')"
    for a, b in _T20_MERGES:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    return f"""
    WITH s AS (
      SELECT {expr} AS s FROM documents
    ), sym AS (
      SELECT UNNEST(string_split(substr(s, 2, greatest(0, length(s) - 2)),
                                 '><')) AS symbol
      FROM s
    )
    SELECT symbol, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM sym WHERE symbol NOT IN ('', ' ')
    GROUP BY symbol ORDER BY cnt DESC, symbol LIMIT 20
    """


@register(
    "t22_bpe_merge_segment",
    _t20_oracle(),
    "BPE merge-table application as pure string expressions: bracket-framed "
    "symbol stream + ordered '<x><y>'->'<xy>' replaces (boundary-exact, "
    "standard greedy semantics, no UDF), then a top-20 symbol count",
)
def t22_bpe_merge_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = T.bpe_apply(F.col("text"), _T20_MERGES)
    sym = docs.select(F.explode(T.bpe_symbols(s)).alias("symbol"))
    return (
        sym.groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("symbol"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# t21 — RAG document chunking: fixed 32-token windows with stride 16
# (50% overlap), one output row per chunk with a stable md5 fingerprint.
# The chunk spine comes from sequence() + posexplode per row — purely
# columnar, no UDF, and embarrassingly row-parallel (each doc expands
# independently; no shuffle at all until a downstream consumer needs one).
# --------------------------------------------------------------------------
_T21_WIN, _T21_STRIDE = 32, 16


@register(
    "t21_doc_chunking",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks,
             UNNEST(generate_series(0, len(toks) - 1, {_T21_STRIDE})) AS start
      FROM t
    ), c AS (
      SELECT doc_id, CAST(start AS BIGINT) AS start,
             list_slice(toks, start + 1, start + {_T21_WIN}) AS chunk
      FROM s
    )
    SELECT doc_id, start // {_T21_STRIDE} AS chunk_idx, start,
           CAST(len(chunk) AS BIGINT) AS chunk_len,
           chunk[1] AS first_tok,
           substr(md5(array_to_string(chunk, ' ')), 1, 8) AS fp
    FROM c
    """,
    "RAG chunking: 32-token windows, stride 16, per-chunk md5 fingerprint — "
    "sequence()+posexplode columnar expansion, zero shuffle",
)
def t21_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    s = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_T21_STRIDE))
        ).alias("start"),
    ).withColumn("start", F.col("start").cast("long"))
    chunk = F.slice("toks", F.col("start") + 1, _T21_WIN)
    return s.select(
        "doc_id",
        F.expr(f"CAST(start DIV {_T21_STRIDE} AS BIGINT)").alias("chunk_idx"),
        "start",
        F.size(chunk).cast("long").alias("chunk_len"),
        F.element_at("toks", (F.col("start") + 1).cast("int")).alias("first_tok"),
        F.substring(F.md5(F.concat_ws(" ", chunk)), 1, 8).alias("fp"),
    )


# --------------------------------------------------------------------------
# p09 — deterministic weighted priority sampling: each doc draws a uniform
# 32-bit integer from md5(doc_id) and its priority is u / weight, so heavier
# (longer) docs systematically sort earlier — a seedable, retry-idempotent
# weighted sample (the same md5-bucket determinism as p01/p06, extended with
# per-row weights). Per-source top-30 via one window; selection is exact on
# integer-derived doubles, so Spark and DuckDB pick identical rows.
# --------------------------------------------------------------------------
@register(
    "p09_weighted_priority_sample",
    """
    WITH pri AS (
      SELECT source, doc_id, n_chars,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS DOUBLE) / n_chars AS priority
      FROM documents
    ), rk AS (
      SELECT source, doc_id, n_chars, priority,
             row_number() OVER (PARTITION BY source
                                ORDER BY priority, doc_id) AS rn
      FROM pri
    )
    SELECT source, doc_id, n_chars, CAST(rn AS INT) AS rn,
           ROUND(priority, 6) AS priority
    FROM rk WHERE rn <= 30
    """,
    "weighted priority sampling: md5-derived uniform / weight priority, "
    "per-source top-30 window — deterministic and idempotent under retries",
)
def p09_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    pri = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (u.cast("double") / F.col("n_chars")).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.col("rn").cast("int").alias("rn"),
            F.round("priority", 6).alias("priority"),
        )
    )


# --------------------------------------------------------------------------
# e08 — distributed PCA top component via power iteration (2 unrolled
# iterations from the uniform unit vector): each iteration is two partial-agg
# shuffles — dot_i = <x_i, v> (group by row) then w_j = Σ_i x_ij·dot_i
# (group by dimension, 64 groups) — i.e. the Gram-matrix-free A^T(Av)
# product, never materializing A^T A. v is a 64-row DataFrame joined back by
# broadcast, so nothing vector-sized ever leaves the executors; at 100 TB the
# plan is two map-side-combine aggregations per iteration over the exploded
# (row, dim, value) relation. Output is ROUND(...,4)+0.0 so near-zero
# components can't hash-split on IEEE -0.0.
# --------------------------------------------------------------------------
@register(
    "e08_power_iteration_pca",
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), x AS (
      SELECT vec_id, generate_subscripts(emb, 1) AS j,
             UNNEST(emb) AS val
      FROM e
    ), d1 AS (
      SELECT vec_id, SUM(val) * 0.125 AS dot FROM x GROUP BY vec_id
    ), w1 AS (
      SELECT j, SUM(x.val * d1.dot) AS w FROM x JOIN d1 USING (vec_id) GROUP BY j
    ), n1 AS (
      SELECT sqrt(SUM(w * w)) AS nrm FROM w1
    ), v1 AS (
      SELECT j, w / nrm AS v FROM w1, n1
    ), d2 AS (
      SELECT vec_id, SUM(x.val * v1.v) AS dot FROM x JOIN v1 USING (j)
      GROUP BY vec_id
    ), w2 AS (
      SELECT j, SUM(x.val * d2.dot) AS w FROM x JOIN d2 USING (vec_id) GROUP BY j
    ), n2 AS (
      SELECT sqrt(SUM(w * w)) AS nrm FROM w2
    )
    SELECT CAST(j - 1 AS INT) AS dim,
           ROUND(w / n2.nrm, 4) + 0.0 AS component,
           ROUND(n2.nrm, 2) AS eigval
    FROM w2, n2
    """,
    "top principal component by matrix-free power iteration: per-iteration "
    "A^T(Av) as two partial-agg shuffles over the exploded (row,dim,val) "
    "relation; v stays a broadcast 64-row DataFrame",
)
def e08_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "val"),
    )
    # iteration 1: v0 = (1/8, ..., 1/8) (unit for dim 64), so <x, v0> folds
    # to 0.125 * sum(x)
    d1 = x.groupBy("vec_id").agg((F.sum("val") * F.lit(0.125)).alias("dot"))
    w1 = (
        x.join(d1, "vec_id")
        .groupBy("j")
        .agg(F.sum(F.col("val") * F.col("dot")).alias("w"))
    )
    n1 = w1.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    v1 = w1.crossJoin(F.broadcast(n1)).select(
        "j", (F.col("w") / F.col("nrm")).alias("v")
    )
    # iteration 2: full <x_i, v1> via broadcast join on the dimension index
    d2 = (
        x.join(F.broadcast(v1), "j")
        .groupBy("vec_id")
        .agg(F.sum(F.col("val") * F.col("v")).alias("dot"))
    )
    w2 = (
        x.join(d2, "vec_id")
        .groupBy("j")
        .agg(F.sum(F.col("val") * F.col("dot")).alias("w"))
    )
    n2 = w2.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w2.crossJoin(F.broadcast(n2)).select(
        F.col("j").cast("int").alias("dim"),
        (F.round(F.col("w") / F.col("nrm"), 4) + F.lit(0.0)).alias("component"),
        F.round("nrm", 2).alias("eigval"),
    )


# --------------------------------------------------------------------------
# g03 — synchronous label propagation (2 unrolled rounds) over the same
# exact-near-dup graph as g02's triangles: labels start as node ids; each
# round every node adopts its most frequent neighbor label (ties -> smallest
# label), which is one groupBy(node,label) count plus one row_number window —
# both shuffle-parallel on node id. The edge set is eager-checkpointed once
# (same pattern as g01/g02/CC) so the O(N^2 D) cosine scan never replays.
# Deterministic: integer labels, total-order tie-break.
# --------------------------------------------------------------------------
_G03_EDGES_CTE = """edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) a
      JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) b
        ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.e, b.e) >= 0.35)"""


@register(
    "g03_label_propagation",
    f"""
    WITH {_G03_EDGES_CTE},
    und AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ), l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS lbl FROM und
    ), c1 AS (
      SELECT u.src AS node, l.lbl, COUNT(*) AS c
      FROM und u JOIN l0 l ON u.dst = l.node GROUP BY u.src, l.lbl
    ), l1 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM c1) WHERE rn = 1
    ), c2 AS (
      SELECT u.src AS node, l.lbl, COUNT(*) AS c
      FROM und u JOIN l1 l ON u.dst = l.node GROUP BY u.src, l.lbl
    ), l2 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM c2) WHERE rn = 1
    )
    SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM l2 GROUP BY lbl
    """,
    "synchronous label propagation, 2 rounds, most-frequent-neighbor-label "
    "update with min-label tie-break — groupBy+window per round, "
    "eager-checkpointed edge set",
)
def g03_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    edges = (
        SIM.exact_neardup_pairs(emb, threshold=0.35)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(2):
        msgs = und.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "lbl")
        cnt = msgs.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_node"),
    )


# --------------------------------------------------------------------------
# c11 — incremental view maintenance for a join-aggregate: the monthly
# revenue view over orders⨝lineitem is maintained as base(o_orderdate <
# cutoff) plus delta(o_orderdate >= cutoff), then the two partial aggregates
# merge by month — the standard IVM decomposition (join distributes over
# union, SUM/COUNT re-aggregate losslessly). The oracle recomputes the view
# from scratch; a green hash is the proof the incremental plan equals full
# recomputation. Scale: the delta branch's o_orderdate >= cutoff predicate is
# sargable, so a partitioned lake only scans new partitions — the same
# high-water-mark shape as c04's rollup refresh.
# --------------------------------------------------------------------------
_C11_CUTOFF = "1997-01-01"


@register(
    "c11_incremental_view_maintenance",
    f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY order_month
    """,
    "incremental join-view maintenance: base(<cutoff) + delta(>=cutoff) "
    "partial aggregates merged by month; oracle recomputes from scratch, so "
    "the hash match proves incremental == full recompute",
)
def c11_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def partial(orders_slice: DataFrame) -> DataFrame:
        return (
            orders_slice.join(
                lineitem, F.col("o_orderkey") == F.col("l_orderkey")
            )
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(F.sum(rev).alias("rev_part"), F.count(F.lit(1)).alias("cnt_part"))
        )

    base = partial(orders.filter(F.col("o_orderdate") < F.lit(_C11_CUTOFF)))
    delta = partial(orders.filter(F.col("o_orderdate") >= F.lit(_C11_CUTOFF)))
    return (
        base.unionByName(delta)
        .groupBy("order_month")
        .agg(
            F.round(F.sum("rev_part"), 2).alias("revenue"),
            F.sum("cnt_part").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# dq07 — winsorized statistics: per-segment p01/p99 exact percentiles of
# customer balance, then mean/stddev before vs after clipping to that band —
# the outlier-robust feature-scaling audit. Percentiles come from one
# groupBy agg over 5 segments (exact interpolated percentile == DuckDB
# quantile_cont), re-joined by broadcast; everything else is plain
# partial-agg arithmetic.
# --------------------------------------------------------------------------
@register(
    "dq07_winsorized_stats",
    """
    WITH q AS (
      SELECT c_mktsegment,
             quantile_cont(c_acctbal, 0.01) AS p01,
             quantile_cont(c_acctbal, 0.99) AS p99
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(MIN(q.p01), 2) AS p01,
           ROUND(MIN(q.p99), 2) AS p99,
           ROUND(AVG(c_acctbal), 2) AS avg_raw,
           ROUND(AVG(LEAST(GREATEST(c_acctbal, q.p01), q.p99)), 2) AS avg_winsor,
           ROUND(stddev_samp(c_acctbal), 2) AS std_raw,
           ROUND(stddev_samp(LEAST(GREATEST(c_acctbal, q.p01), q.p99)), 2)
             AS std_winsor
    FROM customer c JOIN q USING (c_mktsegment)
    GROUP BY c.c_mktsegment
    """,
    "winsorized stats: exact per-segment p01/p99 clip band, mean/stddev "
    "before vs after clipping — percentile agg + broadcast re-join",
)
def dq07_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    q = cust.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", 0.01).alias("p01"),
        F.percentile("c_acctbal", 0.99).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("p01")), F.col("p99"))
    return (
        cust.join(F.broadcast(q), "c_mktsegment")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("p01"), 2).alias("p01"),
            F.round(F.min("p99"), 2).alias("p99"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_raw"),
            F.round(F.avg(clipped), 2).alias("avg_winsor"),
            F.round(F.stddev_samp("c_acctbal"), 2).alias("std_raw"),
            F.round(F.stddev_samp(clipped), 2).alias("std_winsor"),
        )
    )


# --------------------------------------------------------------------------
# q88 — event transition matrix (first-order Markov estimate): per-user lag
# window over the event stream gives (prev_type, event_type) pairs; counts
# plus a row-normalized transition probability. One shuffle for the window
# (partitioned by user — fully parallel), one partial-agg shuffle for the
# matrix. The probability divides exact integers, so both engines emit
# bit-identical doubles before the ROUND.
# --------------------------------------------------------------------------
@register(
    "q88_event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE ts IS NOT NULL
    ), pairs AS (
      SELECT prev_type, event_type AS curr_type, COUNT(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, curr_type, CAST(cnt AS BIGINT) AS cnt,
           ROUND(CAST(cnt AS DOUBLE)
                 / SUM(cnt) OVER (PARTITION BY prev_type), 6) AS prob
    FROM pairs
    """,
    "first-order Markov transition matrix over the event stream: per-user "
    "lag window + pair counts, row-normalized on exact integers",
)
def q88_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events excluded on both sides (Spark lag windows order them
    # first, DuckDB last — different transition pairs; review r6)
    events = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wprev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "curr_type",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.sum("cnt").over(wprev), 6).alias(
            "prob"
        ),
    )


# --------------------------------------------------------------------------
# e10 — simplified silhouette score per label cluster: centroids are the
# per-label mean vectors (computed distributed over the exploded relation,
# like e03), a(i) = distance to own centroid, b(i) = min distance to any
# other centroid, s = (b-a)/max(a,b). Two partial-agg shuffles (centroid,
# per-(vector,candidate) distance) — the candidate set is |labels| wide, so
# the "cross" join is a bounded fan-out, never an all-pairs. The standard
# cluster-quality audit for the k-means / SemDeDup family (e06/e07).
# --------------------------------------------------------------------------
@register(
    "e09_silhouette_by_label",
    """
    WITH x AS (
      SELECT vec_id, label, gs AS j, CAST(embedding AS DOUBLE[])[gs] AS val
      FROM embeddings, generate_series(1, 64) g(gs)
    ), cent AS (
      SELECT label AS clabel, j, ROUND(SUM(val) / COUNT(*), 6) AS c
      FROM x GROUP BY label, j
    ), d AS (
      SELECT x.vec_id, x.label, cent.clabel,
             SUM((x.val - cent.c) * (x.val - cent.c)) AS d2
      FROM x JOIN cent USING (j)
      GROUP BY x.vec_id, x.label, cent.clabel
    ), s AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN sqrt(d2) END) AS a,
             MIN(CASE WHEN clabel <> label THEN sqrt(d2) END) AS b
      FROM d GROUP BY vec_id, label
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG((b - a) / GREATEST(a, b)), 4) AS avg_silhouette
    FROM s GROUP BY label
    """,
    "simplified silhouette per label: 6dp-rounded mean centroids (drift-"
    "killed like e03), own-vs-nearest-other centroid distance, bounded "
    "|labels| fan-out — no all-pairs",
)
def e09_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j0", "val"),
    ).withColumn("j", F.col("j0") + 1)
    cent = x.groupBy(F.col("label").alias("clabel"), "j").agg(
        F.round(F.sum("val") / F.count(F.lit(1)), 6).alias("c")
    )
    d = (
        x.join(F.broadcast(cent), "j")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c"))).alias("d2"))
    )
    s = d.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.sqrt("d2"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.sqrt("d2"))
        ).alias("b"),
    )
    sil = (F.col("b") - F.col("a")) / F.greatest("a", "b")
    return s.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(sil), 4).alias("avg_silhouette"),
    )


# --------------------------------------------------------------------------
# p10 — deterministic k-fold assignment: fold = md5(doc_id) 32-bit prefix
# mod k, the same seedable bucketing as p01's splits, so folds are disjoint,
# exhaustive, and idempotent under retries — rerunning assignment on a
# 100 TB corpus reproduces byte-identical folds with zero coordination.
# Output is the per-fold census the training loop consumes.
# --------------------------------------------------------------------------
_P10_K = 5


@register(
    "p10_kfold_assignment",
    f"""
    WITH f AS (
      SELECT doc_id, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % {_P10_K} AS fold
      FROM documents
    )
    SELECT CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM f GROUP BY fold
    """,
    "deterministic k-fold split: md5-prefix mod k bucketing (disjoint, "
    "exhaustive, retry-idempotent), per-fold census",
)
def p10_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _P10_K
    )
    return (
        docs.withColumn("fold", fold)
        .groupBy(F.col("fold").cast("int").alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# s09 — MMR-diversified retrieval (k=3, lambda=0.5) from a 12-candidate
# relevance pool: greedy argmax of 0.5*rel - 0.5*max_sim_to_selected,
# unrolled. Every cosine uses the fold-order-matched SIM.cosine (bit-equal
# to DuckDB list_cosine_similarity, the e03 precedent), and every argmax
# tie-breaks on vec_id, so both engines select identical rows. The selected
# set stays a <=2-row broadcast; the candidate pool is the only scan. Scale
# path: swap the brute-force pool for the s02/s06 ANN candidates — the MMR
# re-rank itself is O(k * pool) regardless of corpus size.
# --------------------------------------------------------------------------
_S09_POOL, _S09_LAMBDA = 12, 0.5


@register(
    "s09_mmr_diversified_topk",
    f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT e AS qe FROM v WHERE vec_id = 0
    ), cand0 AS (
      SELECT c.vec_id, c.e, list_cosine_similarity(c.e, q.qe) AS rel
      FROM v c, q WHERE c.vec_id <> 0
    ), cand AS (
      SELECT vec_id, e, rel FROM (
        SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id) AS rn
        FROM cand0) WHERE rn <= {_S09_POOL}
    ), s1 AS (
      SELECT vec_id, e, rel FROM (
        SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id) AS rn
        FROM cand) WHERE rn = 1
    ), c2 AS (
      SELECT c.vec_id, c.e, c.rel,
             {_S09_LAMBDA} * c.rel
               - {1 - _S09_LAMBDA} * list_cosine_similarity(c.e, s1.e) AS score
      FROM cand c, s1 WHERE c.vec_id <> s1.vec_id
    ), s2 AS (
      SELECT vec_id, e, rel, score FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, vec_id) AS rn
        FROM c2) WHERE rn = 1
    ), c3 AS (
      SELECT c.vec_id, c.rel,
             {_S09_LAMBDA} * c.rel
               - {1 - _S09_LAMBDA} * GREATEST(
                   list_cosine_similarity(c.e, s1.e),
                   list_cosine_similarity(c.e, s2.e)) AS score
      FROM cand c, s1, s2
      WHERE c.vec_id <> s1.vec_id AND c.vec_id <> s2.vec_id
    ), s3 AS (
      SELECT vec_id, rel, score FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, vec_id) AS rn
        FROM c3) WHERE rn = 1
    )
    SELECT CAST(1 AS INT) AS rank, vec_id, ROUND(rel, 6) AS relevance,
           ROUND(rel, 6) AS mmr_score FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s2
    UNION ALL
    SELECT CAST(3 AS INT), vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s3
    """,
    "MMR diversified top-3 from a 12-candidate pool: greedy "
    "0.5*rel - 0.5*max-sim-to-selected, bit-parity cosine, vec_id "
    "tie-breaks — selected set stays a broadcast",
)
def s09_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    sel = SIM.mmr_topk(
        emb, query_vec_id=0, k=3, lam=_S09_LAMBDA, pool=_S09_POOL
    )
    return sel.select(
        "rank",
        "vec_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


# --------------------------------------------------------------------------
# t23 — PMI collocation mining (the word2vec-phrases step): in-doc adjacent
# bigrams via a columnar transform (no window, no shuffle until the count),
# unigram/bigram count tables re-joined on the token — never collected to
# the driver, so an unbounded vocabulary shards across executors. PMI is
# computed in double arithmetic with identical association order on both
# engines, so even out-of-2^53 products stay bit-equal.
# --------------------------------------------------------------------------
_T23_MIN_COUNT = 5


@register(
    "t23_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), uni AS (
      SELECT u.tok, COUNT(*) AS cx
      FROM toks, LATERAL UNNEST(t) AS u(tok) GROUP BY u.tok
    ), n1 AS (
      SELECT SUM(cx) AS n_uni FROM uni
    ), big AS (
      SELECT t[i + 1] AS w1, t[i + 2] AS w2
      FROM (SELECT t, UNNEST(generate_series(0, len(t) - 2)) AS i FROM toks
            WHERE len(t) >= 2)
    ), bc AS (
      SELECT w1, w2, COUNT(*) AS cxy FROM big GROUP BY w1, w2
    ), n2 AS (
      SELECT SUM(cxy) AS n_bi FROM bc
    ), scored AS (
      SELECT bc.w1 || ' ' || bc.w2 AS bigram, CAST(bc.cxy AS BIGINT) AS cnt,
             ROUND(ln(CAST(bc.cxy AS DOUBLE) * CAST(n1.n_uni AS DOUBLE)
                      * CAST(n1.n_uni AS DOUBLE)
                      / (CAST(n2.n_bi AS DOUBLE) * CAST(u1.cx AS DOUBLE)
                         * CAST(u2.cx AS DOUBLE))), 6) AS pmi
      FROM bc
      JOIN uni u1 ON bc.w1 = u1.tok
      JOIN uni u2 ON bc.w2 = u2.tok
      CROSS JOIN n1 CROSS JOIN n2
      WHERE bc.cxy >= {_T23_MIN_COUNT}
    )
    SELECT bigram, cnt, pmi FROM scored
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
    "PMI collocation mining: columnar in-doc bigrams, count tables re-joined "
    "on token (no driver-side vocab), double-arithmetic PMI with matched "
    "association order",
)
def t23_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    uni = toks.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("cx")
    )
    n1 = uni.agg(F.sum("cx").alias("n_uni"))
    big = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at("t", i + 1).alias("w1"),
                        F.element_at("t", i + 2).alias("w2"),
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
    n2 = bc.agg(F.sum("cxy").alias("n_bi"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("cx").alias("cx1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("cx").alias("cx2"))
    scored = (
        bc.filter(F.col("cxy") >= _T23_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("cxy").alias("cnt"),
            F.round(
                F.log(
                    F.col("cxy").cast("double")
                    * F.col("n_uni").cast("double")
                    * F.col("n_uni").cast("double")
                    / (
                        F.col("n_bi").cast("double")
                        * F.col("cx1").cast("double")
                        * F.col("cx2").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(20)


# --------------------------------------------------------------------------
# e11 — embedding-health audit per label: vector-norm distribution,
# centroid norm (anisotropy proxy — near 0 for isotropic clouds), and mean
# cosine-to-centroid (cluster tightness). Centroids are the 6dp-rounded
# distributed means (e03 pattern) so both engines agree bit-exactly before
# the final averages; norms use the fold-order-matched SIM.norm. The whole
# audit is two partial-agg shuffles + one broadcast join.
# --------------------------------------------------------------------------
@register(
    "e11_embedding_health",
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), ex AS (
      SELECT label, gs AS pos, emb[gs] AS v
      FROM e, generate_series(1, 64) g(gs)
    ), comp AS (
      SELECT label, pos, ROUND(SUM(v) / COUNT(*), 6) AS v
      FROM ex GROUP BY label, pos
    ), cent AS (
      SELECT label, list(v ORDER BY pos) AS centroid FROM comp GROUP BY label
    ), per_vec AS (
      SELECT e.vec_id, e.label,
             sqrt(list_sum(list_transform(e.emb, x -> x * x))) AS nrm,
             list_cosine_similarity(e.emb, c.centroid) AS cosc
      FROM e JOIN cent c USING (label)
    ), cn AS (
      SELECT label,
             sqrt(list_sum(list_transform(centroid, x -> x * x))) AS centroid_norm
      FROM cent
    )
    SELECT p.label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(nrm), 4) AS avg_norm,
           ROUND(stddev_samp(nrm), 4) AS std_norm,
           ROUND(MIN(cn.centroid_norm), 4) AS centroid_norm,
           ROUND(AVG(cosc), 4) AS avg_cos_to_centroid
    FROM per_vec p JOIN cn USING (label)
    GROUP BY p.label
    """,
    "embedding-health audit: per-label norm distribution, centroid norm "
    "(anisotropy proxy), mean cosine-to-centroid — 6dp-rounded distributed "
    "centroids, fold-order-matched norms, broadcast re-join",
)
def e11_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    ex = emb.select("label", F.posexplode("emb").alias("pos", "v"))
    comp = ex.groupBy("label", "pos").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("v")
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )
    per_vec = emb.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        SIM.norm(F.col("emb")).alias("nrm"),
        SIM.cosine(F.col("emb"), F.col("centroid")).alias("cosc"),
    )
    cn = cent.select("label", SIM.norm(F.col("centroid")).alias("centroid_norm"))
    return (
        per_vec.join(F.broadcast(cn), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.stddev_samp("nrm"), 4).alias("std_norm"),
            F.round(F.min("centroid_norm"), 4).alias("centroid_norm"),
            F.round(F.avg("cosc"), 4).alias("avg_cos_to_centroid"),
        )
    )


# --------------------------------------------------------------------------
# q89 — RFM customer segmentation: recency/frequency/monetary per customer,
# quartiled with ntile(4) (order-by includes custkey so tile boundaries are
# deterministic on both engines), then the 4x4x4 segment census. The ntile
# here is a global-order window (the exact baseline); at 100 TB swap in
# approx_percentile thresholds + a broadcast re-join — the q39/dq07 shape —
# so no single-partition sort is needed.
# --------------------------------------------------------------------------
@register(
    "q89_rfm_segmentation",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS recency,
             COUNT(*) AS frequency,
             -- exact integer cents: ntile ordered by a raw double SUM
             -- could reorder customers at a quartile edge on cross-engine
             -- summation ulp drift (the q80 class; review r6)
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY o_custkey
    ), tiled AS (
      SELECT custkey,
             ntile(4) OVER (ORDER BY recency, custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency, custkey) AS f_q,
             ntile(4) OVER (ORDER BY monetary_cents, custkey) AS m_q,
             monetary_cents
      FROM rfm
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(monetary_cents) AS DOUBLE) / 100.0, 2)
             AS total_monetary
    FROM tiled GROUP BY r_q, f_q, m_q
    """,
    "RFM segmentation: per-customer recency/frequency/monetary, "
    "deterministic ntile(4) quartiles, 4x4x4 segment census",
)
def q89_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-cents monetary (order-free integer sum) so the m_q ntile key
    # can never move on summation ulp drift; NULL order dates excluded on
    # both sides (NULL recency sorts first in Spark, last in DuckDB)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "monetary_cents"
        ),
    )
    tiled = rfm.select(
        "custkey",
        "monetary_cents",
        F.ntile(4).over(Window.orderBy("recency", "custkey")).alias("r_q"),
        F.ntile(4).over(Window.orderBy("frequency", "custkey")).alias("f_q"),
        F.ntile(4).over(
            Window.orderBy("monetary_cents", "custkey")
        ).alias("m_q"),
    )
    return tiled.groupBy(
        F.col("r_q").cast("int").alias("r_q"),
        F.col("f_q").cast("int").alias("f_q"),
        F.col("m_q").cast("int").alias("m_q"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum("monetary_cents").cast("double") / F.lit(100.0), 2
        ).alias("total_monetary"),
    )


# --------------------------------------------------------------------------
# dq08 — uniqueness / candidate-key profile: declared-key cardinality vs
# row count for every keyed fixture table (including lineitem's compound
# key), the "is my primary key actually unique" audit that gates any MERGE
# pipeline (the reference's W5 assumes PK uniqueness; this is the check).
# One partial-agg + exact distinct per table, unioned.
# --------------------------------------------------------------------------
@register(
    "dq08_uniqueness_profile",
    """
    SELECT 'orders.o_orderkey' AS entity, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(COUNT(DISTINCT o_orderkey) = COUNT(*) AS INT) AS is_unique
    FROM orders
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) = COUNT(*) AS INT)
    FROM lineitem
    UNION ALL
    SELECT 'customer.c_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT c_custkey) = COUNT(*) AS INT)
    FROM customer
    UNION ALL
    SELECT 'events.event_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT event_id) AS BIGINT),
           CAST(COUNT(DISTINCT event_id) = COUNT(*) AS INT)
    FROM events
    UNION ALL
    SELECT 'documents.doc_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) = COUNT(*) AS INT)
    FROM documents
    """,
    "candidate-key uniqueness profile: exact key cardinality vs row count "
    "per keyed table (incl. compound keys) — the PK-uniqueness gate any "
    "MERGE pipeline assumes",
)
def dq08_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def profile(df: DataFrame, entity: str, *cols: str) -> DataFrame:
        return df.agg(
            F.lit(entity).alias("entity"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(*cols).alias("n_distinct"),
        ).select(
            "entity",
            "n_rows",
            "n_distinct",
            (F.col("n_distinct") == F.col("n_rows")).cast("int").alias("is_unique"),
        )

    parts = [
        profile(_t(spark, sf_dir, "orders"), "orders.o_orderkey", "o_orderkey"),
        profile(
            _t(spark, sf_dir, "lineitem"),
            "lineitem.(l_orderkey,l_linenumber)",
            "l_orderkey",
            "l_linenumber",
        ),
        profile(_t(spark, sf_dir, "customer"), "customer.c_custkey", "c_custkey"),
        profile(_t(spark, sf_dir, "events"), "events.event_id", "event_id"),
        profile(_t(spark, sf_dir, "documents"), "documents.doc_id", "doc_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# c12 — partition-pruned read: events are written out partitioned by
# event_date (the reference's dt-partitioned lake layout), then read back
# with a date-range predicate that must prune at LISTING time — the scan
# touches only 3 of ~30 partition directories (asserted in-plan by
# tests/test_plans.py). This is the mechanism that turns a 100 TB lake scan
# into a 3-partition read; the oracle recomputes from the raw table.
# --------------------------------------------------------------------------
_C12_LO, _C12_HI = "2024-01-05", "2024-01-07"


@register(
    "c12_partition_pruned_read",
    f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{_C12_LO}' AND DATE '{_C12_HI}'
    GROUP BY event_date
    """,
    "dt-partitioned lake write + partition-pruned read-back: only the 3 "
    "predicate-covered partition directories are listed/scanned "
    "(plan-asserted); oracle recomputes from the raw table",
)
def c12_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    events = _t(spark, sf_dir, "events")
    path = f"{tempfile.gettempdir()}/c12_{uuid.uuid4().hex}"
    (
        events.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.filter(
            (F.col("event_date") >= F.lit(_C12_LO))
            & (F.col("event_date") <= F.lit(_C12_HI))
        )
        .groupBy(F.col("event_date").cast("string").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# e12 — ANN recall audit: PQ-ADC top-5 (s07's exact parameters) joined
# against the exact-cosine top-5 per query, recall@5 = |intersection|/5.
# The d13 estimator-accuracy pattern applied to the ANN index family: the
# approximate index's quality is itself an oracle-checked query, because
# both rankings are bit-reproducible (integer ADC scores; fold-order-
# matched cosine). At 100 TB the exact side is the guarded baseline on a
# sampled query set — recall auditing is O(queries), not O(corpus).
# --------------------------------------------------------------------------
from aws_data_engineering_spark.operators.similarity import pq_oracle_sql as _pq_sql


def _e12_oracle() -> str:
    return f"""
    WITH pq AS ({_pq_sql(m_sub=8, k_codes=16, subdim=8, k=5,
                         query_pred="vec_id < 10")}),
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), exact_rank AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                         c.vec_id) AS rnk
      FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    ), ex5 AS (
      SELECT query_id, list_sort(list(neighbor_id)) AS ex_arr
      FROM exact_rank WHERE rnk <= 5 GROUP BY query_id
    ), pq5 AS (
      SELECT query_id, list_sort(list(neighbor_id)) AS pq_arr
      FROM pq GROUP BY query_id
    )
    SELECT ex5.query_id,
           array_to_string(ex_arr, ',') AS exact_top5,
           array_to_string(pq_arr, ',') AS pq_top5,
           CAST(len(list_intersect(ex_arr, pq_arr)) AS INT) AS n_overlap,
           ROUND(len(list_intersect(ex_arr, pq_arr)) / 5.0, 2) AS recall_at_5
    FROM ex5 JOIN pq5 USING (query_id)
    """


@register(
    "e12_pq_recall_audit",
    _e12_oracle(),
    "ANN recall@5 audit: PQ-ADC top-5 vs exact-cosine top-5 per query — "
    "the index-quality measurement as an oracle-checked query (d13's "
    "estimator-audit pattern for the ANN family)",
)
def e12_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    pq = SIM.pq_topk(q, emb, SIM.pq_codebook(m_sub=8, k_codes=16, subdim=8), k=5)
    exact = SIM.brute_force_topk(q, emb, k=5)
    ex5 = exact.groupBy("query_id").agg(
        F.sort_array(F.collect_list("neighbor_id")).alias("ex_arr")
    )
    pq5 = pq.groupBy("query_id").agg(
        F.sort_array(F.collect_list("neighbor_id")).alias("pq_arr")
    )
    inter = F.size(F.array_intersect(F.col("ex_arr"), F.col("pq_arr")))
    # neighbor sets serialized to CSV at the edge: top-level array columns
    # crash the driver's pandas canonicalizer (the q65 lesson)
    return ex5.join(pq5, "query_id").select(
        "query_id",
        F.array_join(F.col("ex_arr").cast("array<string>"), ",").alias("exact_top5"),
        F.array_join(F.col("pq_arr").cast("array<string>"), ",").alias("pq_top5"),
        inter.alias("n_overlap"),
        F.round(inter / F.lit(5.0), 2).alias("recall_at_5"),
    )


# --------------------------------------------------------------------------
# dq09 — Benford first-digit audit: the fraud/corruption screen for any
# financial column. The leading significant digit is extracted through
# integer cents (ROUND(x*100) -> BIGINT -> first char of the integer's
# decimal string) — never through float log10/pow, whose boundary rounding
# can flip a digit on one engine only. Expected Benford mass log10(1+1/d)
# computes on exact small rationals, so both engines round identically.
# --------------------------------------------------------------------------
@register(
    "dq09_benford_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), c AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    ), t AS (
      SELECT SUM(n) AS total FROM c
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_frac,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_frac
    FROM c, t
    """,
    "Benford first-digit audit over order totals: digit extracted via "
    "integer cents (no float log paths), observed vs theoretical mass "
    "per digit",
)
def dq09_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed_frac"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_frac"),
    )


# --------------------------------------------------------------------------
# d15 — content-defined chunk dedup accounting (the FastCDC/rsync storage
# shape): chunk boundaries land where the rolling hash is 0 mod 64, so an
# edit shifts only its own chunk and every other chunk keeps its
# fingerprint — chunk-level dedup then counts, per doc, how many chunks
# (and chars) already exist elsewhere in the corpus. Inverted index on the
# chunk fingerprint (equi-join, no all-pairs); the rolling hash is the same
# uint64 polynomial as winnowing, reproduced in HUGEINT by the oracle.
# --------------------------------------------------------------------------
from aws_data_engineering_spark.operators.text import cdc_sql_cte as _cdc_cte


@register(
    "d15_cdc_chunk_dedup",
    f"""
    WITH {_cdc_cte(k=8, divisor=64)},
    shared AS (
      SELECT fp FROM cdc_chunks GROUP BY fp
      HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(c.chunk_len) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           CAST(SUM(CASE WHEN s.fp IS NOT NULL THEN c.chunk_len ELSE 0 END)
                AS BIGINT) AS dup_chars
    FROM cdc_chunks c LEFT JOIN shared s ON c.fp = s.fp
    GROUP BY c.doc_id
    """,
    "content-defined chunking dedup audit: rolling-hash boundaries "
    "(0 mod 64), chunk fingerprints shared across >=2 docs counted per doc "
    "— edit-stable chunk dedup, inverted-index joins only",
)
def d15_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    chunks = T.content_defined_chunks(
        docs, "doc_id", "text", k=8, divisor=64
    ).localCheckpoint(eager=True)  # consumed by both the index and the census
    shared = (
        chunks.groupBy("fp")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    flagged = chunks.join(
        shared.withColumn("is_shared", F.lit(1)), "fp", "left"
    )
    return flagged.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").alias("total_chars"),
        F.sum(F.coalesce(F.col("is_shared"), F.lit(0))).alias("dup_chunks"),
        F.sum(
            F.when(F.col("is_shared").isNotNull(), F.col("chunk_len")).otherwise(0)
        ).alias("dup_chars"),
    )


# --------------------------------------------------------------------------
# m12 — PNG pixel histogram: the m05 real-codec path upgraded from a
# closed-form pixel SUM to the full pixel MULTISET — every decoded byte is
# bucketed (pixel // 16) and the corpus-wide histogram must equal the
# closed-form regeneration of ((id + k) * 31) % 256. One wrong unfilter
# byte anywhere moves a bucket count and fails the hash. Blobs never leave
# the Python worker; only (bucket, cnt) partials shuffle.
# --------------------------------------------------------------------------
from aws_data_engineering_spark.operators import multimodal as MM


@register(
    "m12_png_pixel_histogram",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height
      FROM documents
    ), px AS (
      SELECT id,
             UNNEST([CAST((id + k) * 31 % 256 AS INT) // 16
                     FOR k IN generate_series(0, width * height - 1)]) AS bucket
      FROM dims
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_images
    FROM px GROUP BY bucket
    """,
    "corpus-wide pixel histogram through the real PNG codec: the decoded "
    "pixel multiset (not just its sum) must match the closed-form "
    "generator — per-bucket counts + contributing-image counts",
)
def m12_png_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    images = MM.synthesize_png_images(docs, "doc_id")
    hist = MM.image_pixel_histogram(images, "id", "data", bucket_width=16)
    return hist.groupBy("bucket").agg(
        F.sum("cnt").alias("n_pixels"),
        F.countDistinct("id").alias("n_images"),
    )


# --------------------------------------------------------------------------
# g04 — bounded k-core peeling (3 rounds, k=2) over the near-dup graph:
# each round drops nodes of induced degree < k and re-induces the subgraph
# — the standard iterative coreness peel with a fixed round budget (the
# g01 fixed-iteration trade: each round is one degree aggregation + two
# semi-joins, all shuffle-parallel on node id). Output is the surviving
# nodes with their round-3 induced degree — the dense duplicate cliques
# that hub-and-spoke false positives can't reach.
# --------------------------------------------------------------------------
_G04_K, _G04_ROUNDS = 2, 3


def _g04_oracle() -> str:
    sql = f"""
    WITH {_G03_EDGES_CTE},
    und0 AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    )"""
    prev = "und0"
    for r in range(1, _G04_ROUNDS + 1):
        sql += f""",
    deg{r} AS (
      SELECT src AS node, COUNT(*) AS deg FROM {prev} GROUP BY src
    ), keep{r} AS (
      SELECT node FROM deg{r} WHERE deg >= {_G04_K}
    ), und{r} AS (
      SELECT u.src, u.dst FROM {prev} u
      JOIN keep{r} a ON u.src = a.node
      JOIN keep{r} b ON u.dst = b.node
    )"""
        prev = f"und{r}"
    sql += f"""
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM {prev} GROUP BY src
    """
    return sql


@register(
    "g04_kcore_peeling",
    _g04_oracle(),
    "bounded k-core peeling (3 rounds, k=2): per-round degree aggregation "
    "+ endpoint semi-joins on the eager-checkpointed near-dup graph — "
    "surfaces dense duplicate cliques",
)
def g04_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    edges = (
        SIM.exact_neardup_pairs(emb, threshold=0.35)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    for _ in range(_G04_ROUNDS):
        keep = (
            und.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _G04_K)
            .select("node")
        )
        und = und.join(
            keep.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        und = und.localCheckpoint(eager=True)
    return und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


# --------------------------------------------------------------------------
# q90 — clickstream path mining: top 3-step event-type paths per user
# stream (two lead() windows over the per-user order, then a count) — the
# path-analysis complement to q88's single-step transition matrix. One
# shuffle for the user window, one partial-agg shuffle for the path count,
# TakeOrdered for the top-20.
# --------------------------------------------------------------------------
@register(
    "q90_event_path_mining",
    """
    WITH seq AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY path ORDER BY cnt DESC, path LIMIT 20
    """,
    "top 3-step event paths: two lead() windows per user + path count — "
    "the path-mining complement to q88's transition matrix",
)
def q90_event_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events excluded on both sides (see q88)
    events = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(" > ", "e1", "e2", "e3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# t24 — KWIC concordance (keyword in context): every occurrence of the
# target token with its 3-token left/right windows — the corpus-inspection
# utility behind search snippets and annotation tooling. Pure columnar
# array slicing after one posexplode; no shuffle at all (row-parallel),
# deterministic integer positions.
# --------------------------------------------------------------------------
_T24_TARGET, _T24_CTX = "spark", 3


@register(
    "t24_kwic_concordance",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), hits AS (
      SELECT doc_id, toks, i
      FROM (SELECT doc_id, toks, UNNEST(toks) AS tok,
                   generate_subscripts(toks, 1) AS i FROM t)
      WHERE tok = '{_T24_TARGET}'
    )
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           COALESCE(array_to_string(
             list_slice(toks, greatest(i - {_T24_CTX}, 1), i - 1), ' '), '')
             AS left_ctx,
           COALESCE(array_to_string(
             list_slice(toks, i + 1, i + {_T24_CTX}), ' '), '') AS right_ctx
    FROM hits
    """,
    "KWIC concordance: every 'spark' occurrence with 3-token left/right "
    "context — columnar array slicing, zero shuffle",
)
def t24_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    c = _T24_CTX
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    hits = t.select(
        "doc_id", "toks", F.posexplode("toks").alias("pos", "tok")
    ).filter(F.col("tok") == _T24_TARGET)
    i = F.col("pos") + 1  # 1-based, mirrors the oracle's subscripts
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.concat_ws(
            " ",
            F.slice(
                "toks",
                F.greatest(i - c, F.lit(1)),
                F.greatest(i - F.greatest(i - c, F.lit(1)), F.lit(0)),
            ),
        ).alias("left_ctx"),
        F.concat_ws(" ", F.slice("toks", i + 1, c)).alias("right_ctx"),
    )


# --------------------------------------------------------------------------
# e13 — binary-quantized retrieval: each 64-dim embedding collapses to two
# 32-bit sign words (1 bit per dimension, 64x compression — the binary-
# embedding trick below even e04's int8), and search is hamming distance =
# popcount(xor) on the words, entirely JVM-side. Queries broadcast against
# the packed corpus; at larger corpora the simhash band-blocking (d07)
# applies verbatim to these words. Packing sums exact powers of two per
# word, so both engines build identical integers.
# --------------------------------------------------------------------------
@register(
    "e13_binary_hamming_topk",
    """
    WITH x AS (
      SELECT vec_id, gs - 1 AS j0, CAST(embedding AS DOUBLE[])[gs] AS val
      FROM embeddings, generate_series(1, 64) g(gs)
    ), packed AS (
      SELECT vec_id, j0 // 32 AS word,
             CAST(SUM(CASE WHEN val > 0
                           THEN CAST(power(2, j0 % 32) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS bits
      FROM x GROUP BY vec_id, j0 // 32
    ), pv AS (
      SELECT vec_id,
             MAX(CASE WHEN word = 0 THEN bits END) AS lo,
             MAX(CASE WHEN word = 1 THEN bits END) AS hi
      FROM packed GROUP BY vec_id
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi))
                  AS INT) AS hamming
      FROM pv q JOIN pv c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, hamming, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS rnk
      FROM scored) WHERE rnk <= 5
    """,
    "binary-quantized ANN: sign-bit packing to two 32-bit words (64x "
    "compression), hamming = popcount(xor) top-5 per query — JVM bit ops "
    "end-to-end, d07's band blocking is the documented scale path",
)
def e13_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j0", "val"),
    )
    weight = F.pow(F.lit(2.0), (F.col("j0") % 32).cast("double")).cast("bigint")
    packed = x.groupBy("vec_id", (F.col("j0") / 32).cast("int").alias("word")).agg(
        F.sum(F.when(F.col("val") > 0, weight).otherwise(F.lit(0))).alias("bits")
    )
    pv = packed.groupBy("vec_id").agg(
        F.max(F.when(F.col("word") == 0, F.col("bits"))).alias("lo"),
        F.max(F.when(F.col("word") == 1, F.col("bits"))).alias("hi"),
    )
    q = pv.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    scored = pv.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
            + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
        ).cast("int").alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "hamming", F.col("rnk").cast("int").alias("rnk"))
    )


# --------------------------------------------------------------------------
# q91 — cohort retention: users grouped by first-activity date, retention
# counted as distinct users active at each day offset — the product-
# analytics triangle. Two partial-agg shuffles (first-seen per user,
# distinct activity days) and one join keyed on user — all shuffle-
# parallel, no window over the whole table.
# --------------------------------------------------------------------------
@register(
    "q91_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
    )
    SELECT strftime(f.cohort_date, '%Y-%m-%d') AS cohort_date,
           CAST(date_diff('day', f.cohort_date, a.active_date) AS INT)
             AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM first_seen f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    "cohort retention triangle: first-seen cohort per user, distinct users "
    "active per day offset — two partial aggs + one user-keyed join",
)
def q91_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    activity = events.select(
        "user_id", F.col("ts").cast("date").alias("active_date")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("active_date", "cohort_date").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# q92 — association rules over per-user behavior (apriori level-1):
# support/confidence/lift for every event-type pair co-performed by the
# same user — co-occurrence, where q88/q90 are sequence. The pair join is
# keyed on user_id (each user holds <=|event types| rows, so the fan-out is
# bounded by the type vocabulary, never by corpus size); ratios divide
# exact integers in a fixed association order, so both engines emit
# identical doubles before ROUND.
# --------------------------------------------------------------------------
@register(
    "q92_association_rules",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n_users AS (
      SELECT COUNT(DISTINCT user_id) AS n FROM ut
    ), type_counts AS (
      SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
           ROUND(CAST(n_ab AS DOUBLE) / n, 6) AS support,
           ROUND(CAST(n_ab AS DOUBLE) / ta.n_t, 6) AS confidence,
           ROUND(CAST(n_ab AS DOUBLE) * n / (CAST(ta.n_t AS DOUBLE) * tb.n_t), 6)
             AS lift
    FROM pairs
    JOIN type_counts ta ON pairs.type_a = ta.event_type
    JOIN type_counts tb ON pairs.type_b = tb.event_type
    CROSS JOIN n_users
    """,
    "association rules (apriori level-1): per-user event-type pairs, "
    "support/confidence/lift on exact integer counts — user-keyed join, "
    "fan-out bounded by the type vocabulary",
)
def q92_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    n_users = ut.agg(F.countDistinct("user_id").alias("n"))
    type_counts = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = type_counts.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_ta")
    )
    tb = type_counts.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_tb")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("n_ta"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n")
                / (F.col("n_ta").cast("double") * F.col("n_tb")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# p11 — padding-waste audit: the quantified rationale for length-bucketed
# batching. Docs are grouped into batches of 8 two ways — arrival order vs
# sorted by token count — and each batch pays max(len)*8 padded tokens;
# the audit reports total waste per strategy (sorted batching should cut
# padding drastically). Global row_number is the exact baseline at test
# scale; at 100 TB the same audit runs per range-partition (sort keys are
# already clustered), which changes only the batch boundaries at partition
# edges.
# --------------------------------------------------------------------------
_P11_BATCH, _P11_MAXLEN = 8, 64


@register(
    "p11_padding_waste_audit",
    f"""
    WITH lens AS (
      SELECT doc_id, LEAST(len(string_split(text, ' ')), {_P11_MAXLEN}) AS n
      FROM documents
    ), naive AS (
      SELECT n, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // {_P11_BATCH}
               AS batch_id
      FROM lens
    ), bucketed AS (
      SELECT n, (ROW_NUMBER() OVER (ORDER BY n, doc_id) - 1) // {_P11_BATCH}
               AS batch_id
      FROM lens
    ), naive_b AS (
      SELECT batch_id, MAX(n) * COUNT(*) AS padded, SUM(n) AS used
      FROM naive GROUP BY batch_id
    ), bucketed_b AS (
      SELECT batch_id, MAX(n) * COUNT(*) AS padded, SUM(n) AS used
      FROM bucketed GROUP BY batch_id
    )
    SELECT 'naive' AS strategy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(used) AS BIGINT) AS total_tokens,
           CAST(SUM(padded) AS BIGINT) AS padded_tokens,
           CAST(SUM(padded) - SUM(used) AS BIGINT) AS wasted_tokens,
           ROUND(CAST(SUM(padded) - SUM(used) AS DOUBLE) / SUM(padded), 4)
             AS waste_frac
    FROM naive_b
    UNION ALL
    SELECT 'length_bucketed', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(used) AS BIGINT), CAST(SUM(padded) AS BIGINT),
           CAST(SUM(padded) - SUM(used) AS BIGINT),
           ROUND(CAST(SUM(padded) - SUM(used) AS DOUBLE) / SUM(padded), 4)
    FROM bucketed_b
    """,
    "padding-waste audit: batches of 8 pay max(len)*8 padded tokens; "
    "arrival-order vs length-sorted batching quantifies why length "
    "bucketing matters before training",
)
def p11_padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        F.least(F.size(F.split("text", " ")), F.lit(_P11_MAXLEN)).alias("n"),
    )

    def strategy(order_cols: list, name: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        batched = lens.select(
            "n",
            ((F.row_number().over(w) - 1) / _P11_BATCH)
            .cast("bigint")
            .alias("batch_id"),
        )
        per_batch = batched.groupBy("batch_id").agg(
            (F.max("n") * F.count(F.lit(1))).alias("padded"),
            F.sum("n").alias("used"),
        )
        return per_batch.agg(
            F.lit(name).alias("strategy"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("used").alias("total_tokens"),
            F.sum("padded").alias("padded_tokens"),
            (F.sum("padded") - F.sum("used")).alias("wasted_tokens"),
            F.round(
                (F.sum("padded") - F.sum("used")).cast("double") / F.sum("padded"), 4
            ).alias("waste_frac"),
        )

    return strategy(["doc_id"], "naive").unionByName(
        strategy(["n", "doc_id"], "length_bucketed")
    )


# --------------------------------------------------------------------------
# t25 — Zipf fit audit: regress ln(frequency) on ln(rank) over the corpus
# token distribution; a healthy natural-language corpus shows slope near
# -1. regr_slope/regr_r2 are order-free moment aggregates (both engines
# accumulate the same sufficient statistics), and rank is deterministic
# via the (count DESC, token) total order. One token count shuffle + one
# tiny regression agg.
# --------------------------------------------------------------------------
@register(
    "t25_zipf_fit",
    """
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM counts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4)
             AS zipf_slope,
           ROUND(regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4)
             AS r2
    FROM ranked
    """,
    "Zipf fit: ln(freq) ~ ln(rank) regression over the token distribution "
    "(slope ~ -1 for natural language) — order-free moment aggregates, "
    "deterministic rank order",
)
def t25_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    lnc = F.log(F.col("cnt").cast("double"))
    lnr = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(F.regr_slope(lnc, lnr), 4).alias("zipf_slope"),
        F.round(F.regr_r2(lnc, lnr), 4).alias("r2"),
    )


# --------------------------------------------------------------------------
# q93 — daily new vs cumulative users: first-seen date per user, daily
# new-user counts, running cumulative total — the growth-accounting view
# (and the scalable form of "cumulative COUNT DISTINCT over time", which
# no window supports directly: distinct collapses to first-seen, then a
# plain running SUM).
# --------------------------------------------------------------------------
@register(
    "q93_cumulative_users",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events
      WHERE ts IS NOT NULL GROUP BY user_id
    ), daily AS (
      SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM daily
    """,
    "daily new vs cumulative users: cumulative COUNT DISTINCT rewritten as "
    "first-seen collapse + running SUM — the form that scales",
)
def q93_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events excluded on both sides: a user with only NULL
    # timestamps would contribute a NULL first-seen day that the running
    # sum orders differently per engine (review r6)
    events = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    first_seen = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


# --------------------------------------------------------------------------
# c13 — CSV quoting round-trip: values containing the delimiter, quotes,
# and embedded newlines are written through the CSV sink and read back
# with multiLine parsing; the oracle reconstructs the same values straight
# from the source table, so the hash match proves the quote/escape cycle
# is lossless (the classic CSV corruption class the reference's
# CSV-centric pipeline would hit first). Escaping is RFC-4180 style
# (quote doubling) via the writer's escapeQuotes.
# --------------------------------------------------------------------------
@register(
    "c13_csv_quoting_roundtrip",
    """
    SELECT doc_id,
           'v,' || chr(34) || lang || chr(34) || chr(10) || source AS tricky,
           CAST(length('v,' || chr(34) || lang || chr(34) || chr(10) || source)
                AS BIGINT) AS n_chars
    FROM documents
    """,
    "CSV quote/escape round-trip: delimiter, quotes, and embedded newlines "
    "survive write->multiLine read byte-exactly (hash-proven against the "
    "source-derived values)",
)
def c13_csv_quoting_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    docs = _t(spark, sf_dir, "documents")
    tricky = F.concat(
        F.lit('v,"'), F.col("lang"), F.lit('"'), F.lit("\n"), F.col("source")
    )
    src = docs.select("doc_id", tricky.alias("tricky"))
    path = f"{tempfile.gettempdir()}/c13_{uuid.uuid4().hex}"
    src.write.mode("overwrite").option("header", "true").option(
        "escapeQuotes", "true"
    ).csv(path)
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .schema("doc_id long, tricky string")
        .csv(path)
    )
    return back.select(
        "doc_id", "tricky", F.length("tricky").cast("long").alias("n_chars")
    )


# --------------------------------------------------------------------------
# e14 — cluster separation map: pairwise cosine between the per-label mean
# centroids (6dp-rounded, the e03/e11 pattern) — the centroid-level
# complement to e09's per-point silhouette: which clusters are actually
# near each other. |labels|^2 rows, so the "all-pairs" is bounded by the
# label vocabulary, never the corpus.
# --------------------------------------------------------------------------
@register(
    "e14_centroid_separation",
    """
    WITH ex AS (
      SELECT label, gs AS pos, CAST(embedding AS DOUBLE[])[gs] AS v
      FROM embeddings, generate_series(1, 64) g(gs)
    ), comp AS (
      SELECT label, pos, ROUND(SUM(v) / COUNT(*), 6) AS v
      FROM ex GROUP BY label, pos
    ), cent AS (
      SELECT label, list(v ORDER BY pos) AS centroid FROM comp GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(list_cosine_similarity(a.centroid, b.centroid), 6)
             AS centroid_cosine
    FROM cent a JOIN cent b ON a.label < b.label
    """,
    "cluster separation map: pairwise cosine between 6dp-rounded label "
    "centroids — bounded by the label vocabulary, the centroid-level "
    "complement to the silhouette audit",
)
def e14_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("p0", "v"),
    ).withColumn("pos", F.col("p0") + 1)
    comp = ex.groupBy("label", "pos").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("v")
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("centroid").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("centroid").alias("cb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(SIM.cosine(F.col("ca"), F.col("cb")), 6).alias(
                "centroid_cosine"
            ),
        )
    )


# --------------------------------------------------------------------------
# dq11 — population stability index (PSI): the standard feature-drift
# monitor. Decile edges come from the REFERENCE week's exact percentiles
# (interpolated percentile == DuckDB quantile_cont, the q17/dq07 parity),
# both periods bin against those same edges (pure double comparisons on
# bit-identical edge values), and each bin reports its PSI term
# (p-q)*ln(p/q) on exact-integer count ratios. A bin the current period
# never hits yields NULL on both engines rather than a fabricated epsilon.
# --------------------------------------------------------------------------
_DQ11_REF_END, _DQ11_CUR_START = "2024-01-08", "2024-01-24"


def _dq11_oracle() -> str:
    deciles = ", ".join(f"quantile_cont(value, {i / 10})" for i in range(1, 10))
    bin_expr = "1 + " + " + ".join(
        f"CASE WHEN value > e.edges[{k}] THEN 1 ELSE 0 END" for k in range(1, 10)
    )
    return f"""
    WITH ref AS (
      SELECT value FROM events
      WHERE ts < TIMESTAMP '{_DQ11_REF_END}' AND value IS NOT NULL
    ), cur AS (
      SELECT value FROM events
      WHERE ts >= TIMESTAMP '{_DQ11_CUR_START}' AND value IS NOT NULL
    ), e AS (
      SELECT [{deciles}] AS edges FROM ref
    ), rb AS (
      SELECT {bin_expr} AS bin, COUNT(*) AS n FROM ref, e GROUP BY bin
    ), cb AS (
      SELECT {bin_expr} AS bin, COUNT(*) AS n FROM cur, e GROUP BY bin
    ), tot AS MATERIALIZED (
      SELECT (SELECT SUM(n) FROM rb) AS nr, (SELECT SUM(n) FROM cb) AS nc
    )
    SELECT CAST(rb.bin AS INT) AS bin,
           CAST(rb.n AS BIGINT) AS n_ref,
           CAST(COALESCE(cb.n, 0) AS BIGINT) AS n_cur,
           ROUND((CAST(rb.n AS DOUBLE) / nr - CAST(cb.n AS DOUBLE) / nc)
                 * ln((CAST(rb.n AS DOUBLE) / nr)
                      / (CAST(cb.n AS DOUBLE) / nc)), 6) AS psi_term
    FROM rb LEFT JOIN cb USING (bin) CROSS JOIN tot
    """


@register(
    "dq11_psi_drift",
    _dq11_oracle(),
    "population stability index per decile bin: reference-week percentile "
    "edges, both periods binned on bit-identical edge doubles, PSI terms "
    "on exact-integer count ratios — the standard feature-drift monitor",
)
def dq11_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    ref = events.filter(
        (F.col("ts") < F.lit(_DQ11_REF_END).cast("timestamp"))
        & F.col("value").isNotNull()
    ).select("value")
    cur = events.filter(
        (F.col("ts") >= F.lit(_DQ11_CUR_START).cast("timestamp"))
        & F.col("value").isNotNull()
    ).select("value")
    edges = ref.agg(
        F.percentile("value", F.array(*[F.lit(i / 10) for i in range(1, 10)])).alias(
            "edges"
        )
    )

    def binned(df: DataFrame) -> DataFrame:
        b = F.lit(1)
        for k in range(1, 10):
            b = b + F.when(
                F.col("value") > F.element_at("edges", k), 1
            ).otherwise(0)
        return (
            df.crossJoin(F.broadcast(edges))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    rb = binned(ref).select(F.col("bin"), F.col("n").alias("n_ref"))
    cb = binned(cur).select(F.col("bin").alias("cbin"), F.col("n").alias("n_cur0"))
    nr = rb.agg(F.sum("n_ref").alias("nr"))
    nc = cb.agg(F.sum("n_cur0").alias("nc"))
    joined = (
        rb.join(cb, rb["bin"] == cb["cbin"], "left")
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
    )
    p = F.col("n_ref").cast("double") / F.col("nr")
    q = F.col("n_cur0").cast("double") / F.col("nc")
    return joined.select(
        F.col("bin").cast("int").alias("bin"),
        "n_ref",
        F.coalesce(F.col("n_cur0"), F.lit(0)).alias("n_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


# --------------------------------------------------------------------------
# g05 — BFS shortest-hop distances over the part co-purchase graph: parts
# are connected when a high-quantity (>=40) lineitem pair shares an order.
# The Spark side is level-synchronous frontier expansion — each level is one
# shuffle equi-join of the (small) frontier against the eager-checkpointed
# edge set plus an anti-join against the visited set, so no iteration ever
# rescans lineitem and lineage stays flat. The oracle is DuckDB's recursive
# CTE with the textbook MIN(hops) reduction. At 100 TB the edge build is a
# per-order self-join (key-parallel, no all-pairs across orders) and each
# BFS level is one bounded shuffle; hop count is capped so the job graph is
# statically finite.
# --------------------------------------------------------------------------
_G05_QTY, _G05_MAX_HOPS = 40, 4


@register(
    "g05_bfs_copurchase_hops",
    f"""
    WITH RECURSIVE li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_quantity >= {_G05_QTY}
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), s AS (
      SELECT MIN(src) AS root FROM edges
    ), bfs AS (
      SELECT root AS node, 0 AS hops FROM s
      UNION
      SELECT e.dst, bfs.hops + 1
      FROM bfs JOIN edges e ON e.src = bfs.node
      WHERE bfs.hops < {_G05_MAX_HOPS}
    )
    SELECT node AS part, CAST(MIN(hops) AS INT) AS hops
    FROM bfs GROUP BY node
    """,
    "level-synchronous BFS from the min-key part over the co-purchase "
    "graph (parts sharing an order at quantity >= 40), hop-capped; oracle "
    "is a recursive CTE with MIN(hops)",
)
def g05_bfs_copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _G05_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    # consumed once per BFS level: materialize so no level rescans lineitem
    edges = (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    root = edges.agg(F.min("src")).first()[0]
    dist = spark.createDataFrame(
        [(root, 0)], "node bigint, hops int"
    ).localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, _G05_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(h).cast("int").alias("hops"))
            .localCheckpoint(eager=True)  # flat lineage per level
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist.select(F.col("node").alias("part"), F.col("hops"))


# --------------------------------------------------------------------------
# q94 — trailing 7-day distinct users per day (the sliding-window COUNT
# DISTINCT every growth dashboard needs). Spark has no DISTINCT window
# aggregate, so the scale-right formulation is: distinct (day, user) pairs
# -> broadcast range-join against the (bounded, one row per calendar day)
# day spine -> countDistinct per spine day. The broadcast side is the day
# spine, never the pair set, so at 100 TB the big side streams map-side.
# The oracle mirrors the join formulation exactly.
# --------------------------------------------------------------------------
@register(
    "q94_trailing_distinct_users",
    """
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), spine AS (
      SELECT DISTINCT day FROM pairs
    )
    SELECT s.day AS day,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS users_7d
    FROM spine s JOIN pairs p
      ON p.day >= s.day - 6 AND p.day <= s.day
    GROUP BY s.day
    """,
    "trailing 7-day distinct users per day: distinct (day,user) pairs "
    "broadcast-range-joined to the bounded day spine (Spark has no "
    "DISTINCT window aggregate); big side streams, spine broadcasts",
)
def q94_trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("pday"), "user_id")
        .distinct()
    )
    spine = pairs.select(F.col("pday").alias("day")).distinct()
    return (
        pairs.join(
            F.broadcast(spine),
            (F.col("pday") >= F.date_sub(F.col("day"), 6))
            & (F.col("pday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


# --------------------------------------------------------------------------
# dq12 — functional-dependency audit: for each candidate FD X -> Y, how
# many X values map to more than one distinct Y (profilers call these FD
# violations; they catch denormalization drift and bad joins upstream).
# One shuffle groupBy per FD, then a single-row reduce — fully partial-agg
# friendly, nothing driver-side. NULL determinants are excluded, NULL
# dependents are ignored by COUNT(DISTINCT) on both engines.
# --------------------------------------------------------------------------
_DQ12_FDS = [
    ("orders", "o_custkey", "o_orderpriority"),
    ("events", "user_id", "event_type"),
    ("documents", "lang", "source"),
    ("customer", "c_nationkey", "c_mktsegment"),
]


def _dq12_oracle() -> str:
    parts = []
    for table, det, dep in _DQ12_FDS:
        parts.append(f"""
    SELECT '{table}.{det}->{dep}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           ROUND(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS violation_rate
    FROM (
      SELECT {det}, COUNT(DISTINCT {dep}) AS nd
      FROM {table} WHERE {det} IS NOT NULL GROUP BY {det}
    )""")
    return " UNION ALL ".join(parts)


@register(
    "dq12_functional_dependency_audit",
    _dq12_oracle(),
    "candidate functional-dependency audit over four X->Y pairs: count of "
    "determinant values with >1 distinct dependent, as a violation rate",
)
def dq12_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, det, dep in _DQ12_FDS:
        g = (
            _t(spark, sf_dir, table)
            .filter(F.col(det).isNotNull())
            .groupBy(det)
            .agg(F.countDistinct(dep).alias("nd"))
        )
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        row = g.agg(
            F.count(F.lit(1)).alias("n_keys"),
            viol.alias("n_violating"),
            F.round(viol / F.count(F.lit(1)), 6).alias("violation_rate"),
        ).select(
            F.lit(f"{table}.{det}->{dep}").alias("fd"),
            "n_keys",
            "n_violating",
            "violation_rate",
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# t26 — Flesch-style readability per language. Pure column expressions:
# words = non-space runs, sentences = [.!?]+ runs (clamped to >=1),
# syllable proxy = vowel-group runs. Word runs use the EXPLICIT negated
# ASCII-whitespace class: Java's \S excludes vertical tab, RE2's \S does
# not (RE2 \s is only [\t\n\f\r ]), so a bare \S+ diverges on corpora
# containing VT (round-7 exotic-whitespace sweep). All JVM-side,
# whole-stage-codegen friendly, one shuffle for the lang groupBy.
# --------------------------------------------------------------------------
@register(
    "t26_readability_by_lang",
    r"""
    WITH d AS (
      SELECT lang,
             len(regexp_extract_all(text, '[^ \t\n\x0b\f\r]+')) AS words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
             len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[aeiouy]+')) AS syllables
      FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(CAST(words AS DOUBLE)), 4) AS avg_words,
           ROUND(AVG(206.835 - 1.015 * (words * 1.0 / sentences)
                     - 84.6 * (syllables * 1.0 / words)), 4) AS avg_flesch
    FROM d WHERE words > 0 GROUP BY lang
    """,
    "Flesch-style readability score per language from word / sentence / "
    "vowel-group-run counts, all as built-in regexp column expressions",
)
def t26_readability_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "lang",
            F.size(
                F.regexp_extract_all(
                    F.col("text"), F.lit(r"[^ \t\n\x0b\f\r]+"), F.lit(0)
                )
            ).alias("words"),
            F.greatest(
                F.size(
                    F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))
                ),
                F.lit(1),
            ).alias("sentences"),
            F.size(
                F.regexp_extract_all(
                    T.ascii_lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0)
                )
            ).alias("syllables"),
        )
        .filter(F.col("words") > 0)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words") / F.col("sentences"))
        - F.lit(84.6) * (F.col("syllables") / F.col("words"))
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("words").cast("double")), 4).alias("avg_words"),
        F.round(F.avg(flesch), 4).alias("avg_flesch"),
    )


# --------------------------------------------------------------------------
# e15 — Johnson-Lindenstrauss random-projection distortion audit: project
# 64-d embeddings to 16-d with a deterministic Rademacher sign matrix
# (sign from integer parity of i*73856093 + j*19349663 — pure arithmetic,
# bit-identical on both engines), then compare pairwise squared distances
# before and after on a deterministic vec_id sample. Both sides fold the
# arrays sequentially (F.aggregate / list_sum over list_transform), so the
# floats agree to well past the ROUND precision. The pair join is a
# sample×sample broadcast comparison, bounded by the sampling rate — the
# full-corpus path stays linear (each vector projects independently).
# --------------------------------------------------------------------------
_E15_MOD, _E15_K = 25, 16


@register(
    "e15_jl_projection_audit",
    f"""
    WITH s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id % {_E15_MOD} = 0
    ), p AS (
      SELECT vec_id, emb,
             list_transform(range(1, {_E15_K} + 1), j ->
               list_sum(list_transform(range(1, len(emb) + 1), i ->
                 emb[i] * (CASE WHEN (i * 73856093 + j * 19349663) % 2 = 0
                           THEN CAST(1 AS DOUBLE)
                           ELSE CAST(-1 AS DOUBLE) END)))
               / sqrt({_E15_K})) AS proj
      FROM s
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, len(a.emb) + 1),
               i -> (a.emb[i] - b.emb[i]) ^ 2)) AS d2o,
             list_sum(list_transform(range(1, {_E15_K} + 1),
               j -> (a.proj[j] - b.proj[j]) ^ 2)) AS d2p
      FROM p a JOIN p b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           ROUND(d2o, 6) AS d2_orig,
           ROUND(d2p, 6) AS d2_proj,
           ROUND(d2p / NULLIF(d2o, 0), 4) AS distortion
    FROM pairs
    """,
    "JL random-projection distortion audit: deterministic Rademacher "
    "projection 64d->16d, pairwise squared-distance ratio on a sampled "
    "pair set; projection itself is per-row linear",
)
def e15_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("emb")

    def sign(i: F.Column, j: F.Column) -> F.Column:
        par = (i.cast("long") * 73856093 + j.cast("long") * 19349663) % 2
        return F.when(par == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    s = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _E15_MOD == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    proj = F.transform(
        F.sequence(F.lit(1), F.lit(_E15_K)),
        lambda j: F.aggregate(
            F.sequence(F.lit(1), F.size(emb)),
            F.lit(0.0),
            lambda acc, i: acc + F.element_at(emb, i) * sign(i, j),
        )
        / F.sqrt(F.lit(float(_E15_K))),
    )
    p = s.select("vec_id", "emb", proj.alias("proj"))
    a = p.select(
        F.col("vec_id").alias("id_a"),
        F.col("emb").alias("emb_a"),
        F.col("proj").alias("proj_a"),
    )
    b = p.select(
        F.col("vec_id").alias("id_b"),
        F.col("emb").alias("emb_b"),
        F.col("proj").alias("proj_b"),
    )

    def sqdist(x: F.Column, y: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: (u - v) * (u - v)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    d2o = sqdist(F.col("emb_a"), F.col("emb_b"))
    d2p = sqdist(F.col("proj_a"), F.col("proj_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(d2o, 6).alias("d2_orig"),
            F.round(d2p, 6).alias("d2_proj"),
            F.round(d2p / F.nullif(d2o, F.lit(0.0)), 4).alias("distortion"),
        )
    )


# --------------------------------------------------------------------------
# d16 — shingle-containment near-dup pairs via operators.dedup.
# containment_pairs: the asymmetric |S(a)∩S(b)|/|S(a)| complement to d05's
# Jaccard. A short doc quoted verbatim inside a longer one scores ~1.0 here
# while its Jaccard is diluted below any sane threshold — the "superset
# duplicate" class every LLM-corpus dedup needs. Stop-shingle doc-frequency
# cap bounds the inverted-index fan-out; every join is an equi-join.
# --------------------------------------------------------------------------
_D16_GRAM, _D16_MAXDF, _D16_TH = 3, 20, 0.5


@register(
    "d16_containment_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE text IS NOT NULL
    ), grams_s AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(t, i.i + 1, i.i + {_D16_GRAM}), ' ')
               AS gram_s
      FROM toks,
           LATERAL (SELECT UNNEST(generate_series(0, len(t) - {_D16_GRAM}))
                    AS i) i
      WHERE len(t) >= {_D16_GRAM}
    ), grams AS (
      -- 48-bit md5-prefix join key, identical to the Spark side's
      -- conv(substr(md5(gram),1,12),16,10): distinctness at the string
      -- level, hashing after, so both engines agree bit-exactly
      SELECT doc_id,
             CAST('0x' || substr(md5(gram_s), 1, 12) AS BIGINT) AS gram
      FROM grams_s
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS src_grams FROM grams GROUP BY doc_id
    ), keep AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= {_D16_MAXDF}
    ), g2 AS (
      SELECT doc_id, gram FROM grams JOIN keep USING (gram)
    ), shared AS (
      SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS shared_grams
      FROM g2 a JOIN g2 b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.src, s.dst,
           CAST(s.shared_grams AS BIGINT) AS shared_grams,
           CAST(z.src_grams AS BIGINT) AS src_grams,
           ROUND(s.shared_grams * 1.0 / z.src_grams, 6) AS containment
    FROM shared s JOIN sizes z ON s.src = z.doc_id
    WHERE s.shared_grams * 1.0 / z.src_grams >= {_D16_TH}
    """,
    "directed shingle-containment near-dup pairs (|S(a)∩S(b)|/|S(a)| with "
    "a stop-shingle doc-frequency cap) — the asymmetric complement to "
    "Jaccard that catches superset duplicates",
)
def d16_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.containment_pairs(
        _t(spark, sf_dir, "documents"),
        gram=_D16_GRAM,
        max_doc_freq=_D16_MAXDF,
        threshold=_D16_TH,
    )


# --------------------------------------------------------------------------
# c14 — PERMISSIVE JSON-lines ingest with corrupt-record quarantine: the
# JSON twin of c08's CSV path. Malformed lines (a bare unquoted token where
# a number belongs) land whole in _corrupt_record with every typed field
# NULL; the audit recovers the key from the raw line by regex and proves
# nothing was dropped. Schema-on-read with a corrupt column stays a single
# map-stage scan at any scale.
# --------------------------------------------------------------------------
@register(
    "c14_json_corrupt_quarantine",
    """
    WITH feed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 3 THEN NULL
                  ELSE ROUND(o_totalprice, 2) END AS o_totalprice,
             o_orderkey % 7 = 3 AS is_corrupt
      FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT is_corrupt,
           COUNT(*) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           ROUND(SUM(COALESCE(o_totalprice, 0)), 2) AS parsed_total
    FROM feed GROUP BY is_corrupt
    """,
    "PERMISSIVE JSON-lines ingest with _corrupt_record quarantine (the "
    "JSON twin of c08): malformed lines kept whole, key recovered by regex "
    "from the raw line, audit proves nothing dropped",
)
def c14_json_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile as _tempfile
    import uuid as _uuid

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    base = _os.path.join(
        _tempfile.gettempdir(), "spark_c14", _uuid.uuid4().hex[:8]
    )
    clean = F.to_json(
        F.struct(
            F.col("o_orderkey"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
    )
    corrupt = F.concat(
        F.lit('{"o_orderkey": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "o_totalprice": oops}'),
    )
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 1)
        .select(
            F.when(F.col("o_orderkey") % 7 == 3, corrupt)
            .otherwise(clean)
            .alias("value")
        )
    )
    src.write.mode("overwrite").text(base)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(base)
    )
    is_corrupt = F.col("_corrupt_record").isNotNull()
    key = F.when(
        is_corrupt,
        F.regexp_extract(
            F.col("_corrupt_record"), r'"o_orderkey": (\d+)', 1
        ).cast("bigint"),
    ).otherwise(F.col("o_orderkey"))
    return (
        parsed.select(
            is_corrupt.alias("is_corrupt"),
            key.alias("key"),
            F.col("o_totalprice"),
        )
        .groupBy("is_corrupt")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("key").cast("bigint").alias("min_key"),
            F.max("key").cast("bigint").alias("max_key"),
            F.round(
                F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2
            ).alias("parsed_total"),
        )
    )


# --------------------------------------------------------------------------
# dq13 — median-absolute-deviation robust outlier scan: the robust twin of
# dq03's 3-sigma z-score (one far outlier inflates sigma and hides its
# peers; the MAD doesn't break down until half the data is bad). FP rule:
# values are floored to integer micro-units FIRST, so the medians are exact
# dyadic doubles and the |x - med| > 4.4478 * mad compare is bit-identical
# on both engines (no raw-double-vs-aggregate-threshold count flips).
# Two percentile passes + one counting pass, each a shuffle agg; the
# per-type median re-join is a broadcast of |event types| rows.
# --------------------------------------------------------------------------
@register(
    "dq13_mad_outliers",
    """
    WITH u AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ), med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS med_u FROM u GROUP BY 1
    ), dev AS (
      SELECT u.event_type, ABS(u.v - m.med_u) AS d, m.med_u
      FROM u JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad_u FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(d.med_u) AS median_u,
           MIN(a.mad_u) AS mad_u,
           CAST(SUM(CASE WHEN d.d > 3 * 1.4826 * a.mad_u THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    """,
    "median-absolute-deviation robust outlier scan per event type on "
    "integer micro-units (exact medians, bit-stable threshold compare) — "
    "the robust twin of dq03's z-score",
)
def dq13_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1e6).cast("bigint").alias("v"),
        )
    )
    med = u.groupBy("event_type").agg(F.percentile("v", 0.5).alias("med_u"))
    dev = u.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med_u")).alias("d"), "med_u"
    )
    mad = dev.groupBy("event_type").agg(F.percentile("d", 0.5).alias("mad_u"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med_u").alias("median_u"),
            F.min("mad_u").alias("mad_u"),
            F.sum(
                F.when(
                    F.col("d") > F.lit(3) * F.lit(1.4826) * F.col("mad_u"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# q95 — decile lift table (the campaign-targeting diagnostic): rank
# customers by account balance into ntile(10) deciles over a fully
# deterministic order (score DESC, key ASC — ties can't shuffle rows
# between engines), mark responders via a semi-join on orders, and report
# each decile's response rate and lift vs the global rate. Lift is computed
# from exact integer cross-products (resp*N)/(n*R), never a ratio of
# rounded ratios, so the doubles are bit-identical. The global totals come
# from a window over the 10-row decile aggregate — no scalar broadcast.
# Scale note: the exact unpartitioned ntile is the oracle-checkable form;
# at 100 TB decile edges come from approx_percentile and rows bin against
# the broadcast edge array instead of a global sort (the q89 RFM pattern).
# --------------------------------------------------------------------------
@register(
    "q95_decile_lift",
    """
    WITH resp AS (
      SELECT DISTINCT o_custkey FROM orders
    ), scored AS (
      SELECT c.c_custkey, ntile(10) OVER (ORDER BY c.c_acctbal DESC,
                                          c.c_custkey) AS decile,
             CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_resp
      FROM customer c LEFT JOIN resp r ON c.c_custkey = r.o_custkey
    ), d AS (
      SELECT decile, COUNT(*) AS n, SUM(is_resp) AS resp
      FROM scored GROUP BY decile
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n AS BIGINT) AS n_customers,
           CAST(resp AS BIGINT) AS responders,
           ROUND(resp * 1.0 / n, 6) AS response_rate,
           ROUND((resp * 1.0 * SUM(n) OVER ()) / (n * SUM(resp) OVER ()), 6)
             AS lift
    FROM d
    """,
    "decile lift table: balance-ranked ntile deciles (deterministic "
    "tie-broken order), responder rate per decile, lift vs global rate "
    "from exact integer cross-products",
)
def q95_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    resp = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    scored = (
        cust.join(resp, cust["c_custkey"] == resp["o_custkey"], "left")
        .select(
            F.ntile(10)
            .over(
                Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
            )
            .alias("decile"),
            F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias(
                "is_resp"
            ),
        )
    )
    d = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_resp").alias("resp")
    )
    w = Window.partitionBy()
    return d.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").alias("n_customers"),
        F.col("resp").alias("responders"),
        F.round(F.col("resp") * 1.0 / F.col("n"), 6).alias("response_rate"),
        F.round(
            (F.col("resp") * 1.0 * F.sum("n").over(w))
            / (F.col("n") * F.sum("resp").over(w)),
            6,
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# t27 — character-class entropy quality signal: Shannon entropy over the
# five fixed character classes (lower/upper/digit/space/other) per doc,
# averaged per source. The class counts are integer regexp_count
# expressions and the entropy sum is a FIXED-ORDER five-term expression
# (not a group-by), so both engines execute the identical float ops —
# no summation-order drift at all. Low-entropy docs are boilerplate/
# code-dump candidates; the signal complements t02/t17's ratio rules.
# --------------------------------------------------------------------------
def _t27_oracle() -> str:
    cls = {
        "c_lower": "[a-z]",
        "c_upper": "[A-Z]",
        "c_digit": "[0-9]",
        "c_space": r"[ \t\n]",
    }
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{p}')) AS {k}" for k, p in cls.items()
    )
    tot = "GREATEST(length(text), 1)"
    other = f"length(text) - (c_lower + c_upper + c_digit + c_space)"
    terms = " + ".join(
        f"(CASE WHEN {c} > 0 THEN -({c} * 1.0 / t) * ln({c} * 1.0 / t) "
        f"ELSE 0 END)"
        for c in ["c_lower", "c_upper", "c_digit", "c_space", "c_other"]
    )
    return f"""
    WITH d AS (
      SELECT source, text, {counts}, {tot} AS t FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    ), e AS (
      SELECT source, {other} AS c_other, c_lower, c_upper, c_digit, c_space,
             t
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG({terms}), 4) AS avg_class_entropy
    FROM e GROUP BY source
    """


@register(
    "t27_charclass_entropy",
    _t27_oracle(),
    "Shannon entropy over five fixed character classes per doc, averaged "
    "per source — fixed-order five-term float expression, zero "
    "summation-order drift; boilerplate/code-dump quality signal",
)
def t27_charclass_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "source",
            F.regexp_count(F.col("text"), F.lit("[a-z]")).alias("c_lower"),
            F.regexp_count(F.col("text"), F.lit("[A-Z]")).alias("c_upper"),
            F.regexp_count(F.col("text"), F.lit("[0-9]")).alias("c_digit"),
            F.regexp_count(F.col("text"), F.lit(r"[ \t\n]")).alias("c_space"),
            F.length("text").alias("len"),
            F.greatest(F.length("text"), F.lit(1)).alias("t"),
        )
        .withColumn(
            "c_other",
            F.col("len")
            - (
                F.col("c_lower")
                + F.col("c_upper")
                + F.col("c_digit")
                + F.col("c_space")
            ),
        )
    )

    def term(c: str) -> F.Column:
        p = F.col(c) * 1.0 / F.col("t")
        return F.when(F.col(c) > 0, -p * F.log(p)).otherwise(F.lit(0.0))

    ent = (
        term("c_lower")
        + term("c_upper")
        + term("c_digit")
        + term("c_space")
        + term("c_other")
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(ent), 4).alias("avg_class_entropy"),
    )


# --------------------------------------------------------------------------
# q96 — bitmap-index activity rollup: each user-month's active days become
# one BIGINT bitmap (bit_or of 1<<(day-1)), active-day count is a popcount.
# The roaring-bitmap idea on DataFrames: a month of per-day activity
# crosses the shuffle as 8 bytes per user instead of up to 31 rows, and
# popcount/AND/OR answer day-count and overlap questions without re-visiting
# raw events. Pure integer bit ops (bit_or agg, shiftleft, bit_count) on
# both engines — bit-exact by construction.
# --------------------------------------------------------------------------
@register(
    "q96_activity_bitmap",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('month', ts) AS DATE) AS month,
             day(ts) AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), bm AS (
      SELECT user_id, month,
             bit_or(CAST(1 AS BIGINT) << (d - 1)) AS bitmap
      FROM ud GROUP BY user_id, month
    )
    SELECT month,
           CAST(bit_count(bitmap) AS INT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM bm GROUP BY month, bit_count(bitmap)
    """,
    "bitmap-index activity rollup: user-month active days packed into one "
    "BIGINT via bit_or(1<<day), histogram by popcount — 8 bytes per user "
    "cross the shuffle instead of 31 rows",
)
def q96_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.trunc(F.to_date("ts"), "month").alias("month"),
            F.dayofmonth("ts").alias("d"),
        )
        .distinct()
    )
    # F.shiftleft only takes a literal shift amount; the SQL form takes a
    # column
    bm = ud.groupBy("user_id", "month").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), d - 1)")).alias("bitmap")
    )
    return (
        bm.select("month", F.bit_count("bitmap").cast("int").alias("active_days"))
        .groupBy("month", "active_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select("month", "active_days", "n_users")
    )


# --------------------------------------------------------------------------
# t28 — count-min sketch frequency estimation, bit-exact: depth 4 × width
# 256 cell table from engine-portable md5 bucketing (operators.sampling.
# hash_bucket / bucket_sql — the same portable-hash spine as p01's
# splits), estimates for the top-20 tokens as min-over-rows of their
# cells. The sketch property (estimate >= exact, overcount >= 0) is
# visible in the output columns. Scale: the cell table is a FIXED 1024
# rows no matter the corpus — sketch cells, not token rows, cross the
# final shuffle, and the estimate lookup is an equi-join on (row, bucket).
# --------------------------------------------------------------------------
_T28_DEPTH, _T28_TOPK = 4, 20


def _t28_oracle() -> str:
    # shared with the streaming twin st15 — see text.cms_report_oracle_sql
    return T.cms_report_oracle_sql(depth=_T28_DEPTH, topk=_T28_TOPK)


@register(
    "t28_count_min_sketch",
    _t28_oracle(),
    "count-min sketch (depth 4 × width 256) token-frequency estimation "
    "with engine-portable md5 bucketing — fixed 1024-cell table crosses "
    "the shuffle, top-20 estimates vs exact counts, overcount >= 0",
)
def t28_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # cells + report from the one shared CMS definition (st15's streaming
    # twin and the per-batch partial sink use the same helpers)
    return T.cms_report(tc, T.cms_cells(tc, _T28_DEPTH), _T28_DEPTH, _T28_TOPK)


# --------------------------------------------------------------------------
# e16 — diagonal-Mahalanobis out-of-distribution scan: per (label, dim)
# mean and population variance from one exploded-embedding shuffle agg,
# re-joined to score every vector by sum((x-mu)^2 / (var+eps)) — the
# standard data-curation OOD filter (a vector far from its own class
# centroid in variance-normalized units is a label-noise / outlier
# candidate; complements e11's norm-based health audit). Top-5 per label
# ranked on the ROUNDED score with vec_id tie-break, so the cut is
# deterministic under cross-engine ulp drift. Scale: stats table is
# |labels|×dims rows (broadcastable), scoring is one equi-join + one
# per-vector agg — linear end to end.
# --------------------------------------------------------------------------
@register(
    "e16_mahalanobis_ood",
    """
    WITH ex AS (
      SELECT vec_id, label, i.i AS pos,
             CAST(embedding[i.i] AS DOUBLE) AS v
      FROM embeddings,
           LATERAL (SELECT UNNEST(generate_series(1, len(embedding))) AS i) i
    ), st AS (
      SELECT label, pos, AVG(v) AS mu, var_pop(v) AS vr
      FROM ex GROUP BY label, pos
    ), sc AS (
      SELECT e.vec_id, e.label,
             SUM((e.v - s.mu) * (e.v - s.mu) / (s.vr + 1e-6)) AS score
      FROM ex e JOIN st s ON e.label = s.label AND e.pos = s.pos
      GROUP BY e.vec_id, e.label
    ), rk AS (
      SELECT label, vec_id, ROUND(score, 6) AS ood_score,
             row_number() OVER (PARTITION BY label
                                ORDER BY ROUND(score, 6) DESC, vec_id) AS rn
      FROM sc
    )
    SELECT label, vec_id, ood_score FROM rk WHERE rn <= 5
    """,
    "diagonal-Mahalanobis OOD scan: per-(label,dim) mean/variance stats "
    "re-joined to score vectors in variance-normalized units, top-5 per "
    "label on the rounded score — the label-noise/outlier curation filter",
)
def e16_mahalanobis_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "p0", "v"
            ),
        )
        .select("vec_id", "label", (F.col("p0") + 1).alias("pos"), "v")
    )
    st = ex.groupBy("label", "pos").agg(
        F.avg("v").alias("mu"), F.var_pop("v").alias("vr")
    )
    sc = (
        ex.join(F.broadcast(st), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("v") - F.col("mu"))
                * (F.col("v") - F.col("mu"))
                / (F.col("vr") + F.lit(1e-6))
            ).alias("score")
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.round("score", 6).desc(), F.col("vec_id")
    )
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("label", "vec_id", F.round("score", 6).alias("ood_score"))
    )


# --------------------------------------------------------------------------
# q97 — ordered funnel with a time bound: users whose earliest view is
# followed by a later click and then a later purchase, all within 24 h of
# the view (q41's funnel checks presence; this one enforces ORDER and a
# completion window — the product-analytics "did the journey happen in
# sequence" question). Each stage is one groupBy-min plus one user-keyed
# equi-join, so the funnel deepens linearly in stages with no window over
# the full event stream; durations are exact integer microseconds.
# --------------------------------------------------------------------------
_Q97_WINDOW_US = 86_400_000_000  # 24 h


@register(
    "q97_ordered_funnel",
    f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, v.t1, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id, v.t1
    ), p AS (
      SELECT e.user_id, c.t1, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id, c.t1
    )
    SELECT user_id,
           CAST(epoch_us(t3) - epoch_us(t1) AS BIGINT) AS funnel_us
    FROM p WHERE epoch_us(t3) - epoch_us(t1) <= {_Q97_WINDOW_US}
    """,
    "ordered view->click->purchase funnel completed within 24 h: earliest "
    "view, earliest later click, earliest later purchase via stagewise "
    "groupBy-min + user-keyed equi-joins; exact integer-microsecond "
    "durations",
)
def q97_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t3"))
    )
    dur = F.unix_micros("t3") - F.unix_micros("t1")
    return p.filter(dur <= _Q97_WINDOW_US).select(
        "user_id", dur.alias("funnel_us")
    )


# --------------------------------------------------------------------------
# p12 — deterministic per-epoch shuffle: training loaders need a DIFFERENT
# document order every epoch that is nonetheless reproducible on any
# worker count — sort by md5(doc_id || ':' || epoch). No materialized
# permutation table, no driver-side RNG state; the order key is a pure
# column expression, so at 100 TB each epoch is one sort (or a
# sortWithinPartitions feeding a shuffle-free loader) and resuming a crashed
# epoch re-derives the identical order. Output: the first 5 doc_ids of
# epochs 0-2, proving orders differ across epochs while each is stable.
# --------------------------------------------------------------------------
@register(
    "p12_epoch_shuffle",
    """
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                 CAST(e.epoch AS VARCHAR)) AS k
      FROM documents d,
           (SELECT UNNEST(generate_series(0, 2)) AS epoch) e
    ), rk AS (
      SELECT epoch, doc_id,
             row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id)
               AS rank
      FROM keyed
    )
    SELECT CAST(epoch AS INT) AS epoch, CAST(rank AS INT) AS rank, doc_id
    FROM rk WHERE rank <= 5
    """,
    "deterministic per-epoch shuffle order: sort key md5(doc_id:epoch) — "
    "different reproducible order every epoch, no permutation table, no "
    "driver RNG; first 5 docs of epochs 0-2 shown",
)
def p12_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"),
                        F.col("epoch").cast("string"))
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("epoch", F.col("rank").cast("int").alias("rank"), "doc_id")
    )


# --------------------------------------------------------------------------
# dq14 — order-insensitive cross-engine table checksum: every row hashes to
# a 60-bit integer (first 15 hex chars of md5 over a '|'-joined canonical
# string form — doubles quantized to integer cents first, NULLs mapped to
# a sentinel), and the table fingerprint is the SUM of row hashes mod
# 2^61-1. Addition commutes, so the checksum is partition- and
# order-independent: two engines (or a source and its replicated copy)
# agree iff the row multisets agree (modulo hash collisions) — the
# replication-validation primitive, computed in one pass with only an
# 8-byte accumulator per partition crossing the shuffle. The per-row sum
# accumulates in decimal(38) so no scale of table can overflow it.
# --------------------------------------------------------------------------
_DQ14_MOD = 2305843009213693951  # 2^61 - 1


def _dq14_hash_sql(cols: str) -> str:
    h = f"md5({cols})"

    def hexval(i: int) -> str:
        a = f"ascii(substr({h}, {i}, 1))"
        return f"({a} - 48 - CASE WHEN {a} >= 97 THEN 39 ELSE 0 END)"

    return " + ".join(
        f"CAST({hexval(i + 1)} AS BIGINT) * CAST({16 ** (14 - i)} AS BIGINT)"
        for i in range(15)
    )


def _dq14_oracle() -> str:
    specs = {
        "region": "CAST(r_regionkey AS VARCHAR) || '|' || COALESCE(r_name, chr(1))",
        "nation": (
            "CAST(n_nationkey AS VARCHAR) || '|' || COALESCE(n_name, chr(1))"
            " || '|' || CAST(n_regionkey AS VARCHAR)"
        ),
        "supplier": (
            "CAST(s_suppkey AS VARCHAR) || '|' || COALESCE(s_name, chr(1))"
            " || '|' || CAST(s_nationkey AS VARCHAR) || '|' ||"
            " CAST(CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS VARCHAR)"
        ),
    }
    parts = [
        f"""
    SELECT '{t}' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(({_dq14_hash_sql(expr)}) AS HUGEINT))
                % {_DQ14_MOD} AS BIGINT) AS checksum
    FROM {t}"""
        for t, expr in specs.items()
    ]
    return " UNION ALL ".join(parts)


@register(
    "dq14_table_checksum",
    _dq14_oracle(),
    "order-insensitive cross-engine table fingerprint: 60-bit md5 row "
    "hashes over canonicalized columns (doubles as integer cents) summed "
    "mod 2^61-1 — replication validation in one pass, 8 bytes per "
    "partition cross the shuffle",
)
def dq14_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    sentinel = F.lit("\x01")

    def canon_str(c: F.Column) -> F.Column:
        return F.coalesce(c.cast("string"), sentinel)

    def cents(c: F.Column) -> F.Column:
        return F.floor(c * 100).cast("bigint").cast("string")

    specs = {
        "region": lambda d: F.concat_ws(
            "|", canon_str(d["r_regionkey"]), canon_str(d["r_name"])
        ),
        "nation": lambda d: F.concat_ws(
            "|",
            canon_str(d["n_nationkey"]),
            canon_str(d["n_name"]),
            canon_str(d["n_regionkey"]),
        ),
        "supplier": lambda d: F.concat_ws(
            "|",
            canon_str(d["s_suppkey"]),
            canon_str(d["s_name"]),
            canon_str(d["s_nationkey"]),
            cents(d["s_acctbal"]),
        ),
    }
    out = None
    for t, rowfn in specs.items():
        d = _t(spark, sf_dir, t)
        h = F.conv(F.substring(F.md5(rowfn(d)), 1, 15), 16, 10).cast("bigint")
        row = d.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(F.sum(h.cast("decimal(38,0)")), F.lit(_DQ14_MOD))
            .cast("bigint")
            .alias("checksum"),
        ).select(F.lit(t).alias("tbl"), "n_rows", "checksum")
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# dq15 — chi-square independence audit between event_type and day-of-week:
# the contingency table is exact integer counts, expected counts are
# (row_total * col_total) / grand_total on exact integers, and each cell
# reports its (observed-expected)^2/expected term — flags weekly
# seasonality interacting with event mix (a skewed error-by-weekday cell
# is an ops incident signature). Totals come from windows over the
# |types|×|weekdays| cell table (35 rows), so nothing driver-side and no
# scalar broadcast; the raw scan is one groupBy.
# --------------------------------------------------------------------------
@register(
    "dq15_chi2_independence",
    """
    WITH cells AS (
      SELECT event_type, CAST(isodow(ts) AS INT) AS dow, COUNT(*) AS o
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), tot AS MATERIALIZED (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_t,
             SUM(o) OVER (PARTITION BY dow) AS col_t,
             SUM(o) OVER () AS grand
      FROM cells
    )
    SELECT event_type, dow,
           CAST(o AS BIGINT) AS observed,
           ROUND(row_t * 1.0 * col_t / grand, 6) AS expected,
           ROUND((o - row_t * 1.0 * col_t / grand)
                 * (o - row_t * 1.0 * col_t / grand)
                 / (row_t * 1.0 * col_t / grand), 6) AS chi2_term
    FROM tot
    """,
    "chi-square independence audit between event type and ISO weekday: "
    "exact-integer contingency table, expected counts from integer "
    "cross-products, per-cell chi2 terms — weekly-seasonality × event-mix "
    "drift detector",
)
def dq15_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.dayofweek_iso("ts").cast("int").alias("dow")
            if hasattr(F, "dayofweek_iso")
            else F.expr("(dayofweek(ts) + 5) % 7 + 1").cast("int").alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_t = F.sum("o").over(Window.partitionBy("event_type"))
    col_t = F.sum("o").over(Window.partitionBy("dow"))
    grand = F.sum("o").over(Window.partitionBy())
    e = row_t * 1.0 * col_t / grand
    return cells.select(
        "event_type",
        "dow",
        F.col("o").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# q98 — week-over-week revenue delta: weekly order revenue (Monday-anchored
# ISO week via date_trunc) with lag() for the prior week and an exact
# integer-cents delta; pct change only where a prior week exists. One
# groupBy plus one 52-row-per-year window — trivially partial-agg friendly.
# --------------------------------------------------------------------------
@register(
    "q98_wow_revenue_delta",
    """
    WITH w AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    )
    SELECT week, rev_cents,
           CAST(rev_cents - lag(rev_cents) OVER (ORDER BY week) AS BIGINT)
             AS wow_delta_cents,
           ROUND((rev_cents - lag(rev_cents) OVER (ORDER BY week)) * 1.0
                 / lag(rev_cents) OVER (ORDER BY week), 6) AS wow_pct
    FROM w
    """,
    "week-over-week revenue delta on exact integer cents: weekly groupBy "
    "+ lag window, pct change from integer ratios",
)
def q98_wow_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL order dates excluded on both sides: a NULL week group would sit
    # at opposite ends of the lag window per engine (the q35 class)
    w = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.trunc(F.to_date("o_orderdate"), "week").alias("week"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    win = Window.orderBy("week")
    prev = F.lag("rev_cents").over(win)
    return w.select(
        "week",
        "rev_cents",
        (F.col("rev_cents") - prev).alias("wow_delta_cents"),
        F.round((F.col("rev_cents") - prev) * 1.0 / prev, 6).alias("wow_pct"),
    )


# --------------------------------------------------------------------------
# t29 — BPE merge LEARNING (Sennrich et al. 2016), completing the tokenizer
# story: t22 applies a merge table, t29 learns one. Six rounds of
# (adjacent-pair count, word boundary excluded) -> (argmax, count DESC /
# lexicographic tiebreak) -> (corpus-wide merge), unrolled with zero
# driver-side state: each round's winner is a 1-row aggregate
# broadcast-crossJoined back so the next replace pattern is built from
# Columns, and each round's merged stream (and 1-row winner) is
# localCheckpoint-ed so k merges really cost O(k) corpus scans + k tiny
# shuffles — without the checkpoint every argmax/union branch re-derives
# the whole replace chain (O(k^2) scans; ADVICE r04). The distributed BPE
# recipe at any scale. Oracle un-rolls the same rounds as chained CTEs
# with CROSS JOIN-built replace patterns.
# --------------------------------------------------------------------------
_T29_ROUNDS = 6


@register(
    "t29_bpe_merge_learning",
    T.bpe_learn_oracle_sql(rounds=_T29_ROUNDS),
    "BPE merge-table learning: k rounds of pair-count/argmax/merge as one "
    "unrolled plan (1-row broadcast winners, Column-built replace "
    "patterns, per-round checkpoints so k merges = O(k) corpus scans, no "
    "driver state) — the Sennrich algorithm Spark-first. NOTE: "
    "construction runs jobs eagerly (checkpoint materialization) and "
    "returns a checkpointed k-row result; intermediates are unpersisted "
    "before returning. '<'/'>' are stripped (audit-grade, lossy on "
    "HTML-heavy corpora — documented in bpe_learn)",
)
def t29_bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.bpe_learn(docs, "text", rounds=_T29_ROUNDS)


# --------------------------------------------------------------------------
# s10 — hard-negative mining for contrastive training (round-6: wires the
# round-5 operator into the oracle gate). For each of 4 anchor vectors,
# the top-5 most-similar candidates with a DIFFERENT label — the
# dense-retrieval recipe (mine the highest-scoring wrong answers, not
# random ones). The anchor batch is a guarded broadcast inside a numpy
# mapInPandas kernel over the candidate scan; each Arrow batch emits only
# its per-anchor top-k, so the one shuffle moves ~k*A rows — the corpus
# never leaves the scan stage. Cosines use the fold-order-matched
# sequential kernel (bit-equal to DuckDB list_cosine_similarity).
# --------------------------------------------------------------------------
_S10_K, _S10_ANCHORS = 5, 4


@register(
    "s10_hard_negative_topk",
    f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), a AS (SELECT * FROM v WHERE vec_id < {_S10_ANCHORS}),
    scored AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             list_cosine_similarity(c.e, a.e) AS sim
      FROM a JOIN v c ON c.vec_id <> a.vec_id AND c.label <> a.label
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                   ORDER BY sim DESC, negative_id) AS rnk
      FROM scored
    )
    SELECT anchor_id, CAST(anchor_label AS INT) AS anchor_label,
           negative_id, CAST(negative_label AS INT) AS negative_label,
           ROUND(sim, 4) AS sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_S10_K}
    """,
    "hard-negative mining: per-anchor top-5 highest-cosine different-label "
    "candidates via a guarded anchor broadcast + per-batch partial top-k "
    "(corpus map-side only); bit-parity sequential cosine",
)
def s10_hard_negative_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _S10_ANCHORS)
    return SIM.hard_negative_topk(anchors, emb, k=_S10_K)


# --------------------------------------------------------------------------
# p13 — quality-weighted epoch upsampling (round-6: wires the round-5
# operator into the oracle gate). n_epochs = doc_id % 5 plants the full
# edge spectrum: 0 (drop — the guarded fan-out must emit NOTHING, the
# ADVICE r05 bug), 1..4 (that many stamped copies). Output is the
# per-copy_idx census plus min/max of the deterministic md5 sample keys,
# proving both the copy counts and the key derivation. Purely columnar
# sequence+posexplode in the scan stage — zero shuffle before the audit agg.
# --------------------------------------------------------------------------
_P13_SALT = "epoch-v1"


@register(
    "p13_epoch_upsample",
    f"""
    WITH src AS (
      SELECT doc_id, CAST(doc_id % 5 AS INT) AS n_epochs FROM documents
    ), fan AS (
      SELECT doc_id, UNNEST(generate_series(1, n_epochs)) AS copy_idx
      FROM src WHERE n_epochs >= 1
    ), k AS (
      SELECT doc_id, copy_idx,
             md5(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(copy_idx AS VARCHAR) || '{_P13_SALT}') AS sample_key
      FROM fan
    )
    SELECT CAST(copy_idx AS INT) AS copy_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           MIN(sample_key) AS min_key, MAX(sample_key) AS max_key
    FROM k GROUP BY 1
    """,
    "quality-weighted epoch upsampling: per-row sequence+posexplode fan-out "
    "(n_epochs<1 drops the row — guarded against the descending-sequence "
    "bug), md5 sample keys for a reproducible global shuffle; per-copy "
    "census output",
)
def p13_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_data_engineering_spark.operators.sampling import epoch_upsample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 5).cast("int").alias("n_epochs")
    )
    up = epoch_upsample(docs, "doc_id", F.col("n_epochs"), salt=_P13_SALT)
    return up.groupBy(F.col("copy_idx").cast("int").alias("copy_idx")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.min("sample_key").alias("min_key"),
        F.max("sample_key").alias("max_key"),
    )


# --------------------------------------------------------------------------
# m14 — audio dynamics audit over the REAL WAV codec (round-6: wires the
# round-5 operator into the oracle gate). Per doc_id, a synthesized
# 512-sample clip with integer-exact planted segments (silence / ±32767
# clipping / ±amp square wave), decoded back through the real WAV parser
# into peak / silence-fraction / clip-fraction / RMS — the "is this clip
# usable training audio" curation gate. Fractions are exact dyadic
# rationals and RMS is one correctly-rounded sqrt of an exact int/2^9, so
# every column hash-matches the closed-form oracle with NO rounding.
# Blobs die inside the Arrow map stage; six scalars cross the shuffle.
# --------------------------------------------------------------------------
@register(
    "m14_audio_dynamics",
    """
    WITH f AS (
      SELECT doc_id AS id,
             64 + (doc_id % 4) * 32 AS n_sil,
             (doc_id % 8) * 8 AS n_clip,
             8000 + (doc_id % 5) * 1000 AS amp
      FROM documents
    ), g AS (
      SELECT id, n_sil, n_clip, amp, 512 - n_sil - n_clip AS body FROM f
    )
    SELECT id, CAST(512 AS INT) AS n_samples,
           CAST(CASE WHEN n_clip > 0 THEN 32767 ELSE amp END AS INT)
             AS peak_abs,
           CAST(n_sil AS DOUBLE) / 512 AS silence_frac,
           CAST(n_clip AS DOUBLE) / 512 AS clip_frac,
           sqrt((CAST(n_clip AS BIGINT) * 32767 * 32767
                 + CAST(body AS BIGINT) * amp * amp) / 512.0) AS rms
    FROM g
    """,
    "audio dynamics gate over the real WAV codec: synthesized integer-exact "
    "clips, decode -> peak/silence/clip/RMS per clip; exact dyadic "
    "fractions + one correctly-rounded sqrt, zero rounding in the oracle",
)
def m14_audio_dynamics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    wavs = MM.synthesize_dynamics_wavs(docs, "doc_id")
    return MM.audio_dynamics_features(wavs, "id", "data")


# --------------------------------------------------------------------------
# g07 — triangle counting over the LSH near-dup graph: the scale-safe
# composition the g02 verdict asked for (g02's registered edge source is
# the exact O(N^2 D) cosine baseline, guarded at 4096 vectors; this one
# builds its edges from e02's hyperplane-LSH buckets, so the edge join is
# an equi-join on bucket id — the 100 TB path end-to-end). Same canonical
# a<b<c two-equi-join triangle enumeration and corner explode as g02;
# deterministic literal hyperplanes keep even the approximate edge set
# bit-exactly oracle-checkable. Threshold 0.30 / 3 planes chosen so the
# LSH recall leaves a non-empty triangle set at sf0.001 AND sf0.01.
# --------------------------------------------------------------------------
_G07_THRESHOLD, _G07_PLANES = 0.30, 3


def _g07_oracle() -> str:
    lsh = SIM.bucketed_neardup_oracle_sql(
        threshold=_G07_THRESHOLD, n_planes=_G07_PLANES, dim=64
    )
    return f"""
    WITH lsh_pairs AS ({lsh}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM lsh_pairs),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1
      JOIN edges e2 ON e1.dst = e2.src
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ), corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM corners GROUP BY node
    """


@register(
    "g07_triangle_count_lsh",
    _g07_oracle(),
    "triangle counting over the LSH-bucketed near-dup graph: bucket-id "
    "equi-join edges (no all-pairs cosine anywhere) feeding the canonical "
    "a<b<c two-equi-join triangle enumeration — g02's scale-safe form",
)
def g07_triangle_count_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    edges = SIM.bucketed_neardup_pairs(
        emb, threshold=_G07_THRESHOLD, n_planes=_G07_PLANES, dim=64
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # the LSH pair scan is cheap but feeds three join branches; one eager
    # materialization beats three bucket-join replays (g02 precedent)
    edges = edges.localCheckpoint(eager=True)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


# --------------------------------------------------------------------------
# d17 — MinHash pairs with the band-bucket pair-emission valve (round-6:
# operationalizes the 100× scale finding, SURVEY §6.2). d04's candidate
# set is C(n,2) per band bucket — quadratic in duplication multiplicity
# (measured 25 → 24.75M pairs on the 100-twin corpus). Here band buckets
# larger than max_bucket emit NO pairs: an oversized bucket is a duplicate
# CLUSTER, to be collapsed by cluster key (d10 components), never
# enumerated pairwise. The census is one partial-agg groupBy on the same
# (band, band_hash) key the join already shuffles on — zero extra shuffle
# keys. max_bucket=2 engages on the fixture corpora (size-3/4 buckets
# exist at both sf0.001 and sf0.01), so the driver evidence is
# non-vacuous: the output genuinely differs from d04's.
# --------------------------------------------------------------------------
_D17_MAX_BUCKET = 2


@register(
    "d17_capped_minhash_pairs",
    DD.minhash_capped_oracle_sql(
        num_hashes=32, num_bands=8, max_bucket=_D17_MAX_BUCKET
    ),
    "MinHash-LSH candidate pairs with a band-bucket size cap: buckets "
    "larger than max_bucket emit no pairs (duplicate clusters are "
    "collapsed by key, not enumerated pairwise) — the pair-emission valve "
    "that bounds fuzzy dedup on duplication-heavy corpora",
)
def d17_capped_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_candidate_pairs(
        docs, "doc_id", "text", max_bucket=_D17_MAX_BUCKET
    )


# --------------------------------------------------------------------------
# m15 — 4:2:0 color JPEG decode audit (round-6): the chroma-subsampled
# baseline layout real web JPEGs use, through the REAL pure-Python codec —
# interleaved-MCU entropy decode, per-component DC predictors and
# quant/Huffman bindings, 2×2 chroma box-upsampling. Constant-valued MCUs
# make the lossy pipeline exactly representable, so the full-res plane
# sums are closed-form integers (no rounding anywhere). Progressive and
# 4:2:2/4:4:4 streams are refused, never misdecoded (pytest).
# --------------------------------------------------------------------------
@register(
    "m15_jpeg420_decode",
    f"""
    WITH mcu AS (
      SELECT doc_id AS id, UNNEST(generate_series(0, 3)) AS m FROM documents
    )
    SELECT id, CAST({MM.JPEG420_DIM} AS INT) AS width,
           CAST({MM.JPEG420_DIM} AS INT) AS height,
           CAST(SUM(256 * ((3 * id + 17 * m) % 256)) AS BIGINT) AS y_sum,
           CAST(SUM(256 * ((5 * id + 29 * m) % 256)) AS BIGINT) AS cb_sum,
           CAST(SUM(256 * ((7 * id + 41 * m) % 256)) AS BIGINT) AS cr_sum
    FROM mcu GROUP BY id
    """,
    "4:2:0 color JPEG decode through the real codec: interleaved MCUs, "
    "per-component DC predictors, chroma box-upsampling — full-res plane "
    "sums as exact int64, closed-form oracle",
)
def m15_jpeg420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    jpegs = MM.synthesize_jpeg420_images(docs, "doc_id")
    return MM.decode_jpeg420_features(jpegs, "id", "data")


# --------------------------------------------------------------------------
# c15 — ORC source/sink roundtrip (round-6): ORC was dispatch-supported and
# pytest-exercised but had no driver evidence. Write supplier to an ORC
# table (uuid scratch path — fixed paths race concurrent sessions), read
# it back through the format dispatch, aggregate; the oracle aggregates
# the parquet source, so any column lost, retyped, or value-shifted by
# the ORC writer/reader fails the hash. Money stays integer (floor cents)
# so the check is order-free exact.
# --------------------------------------------------------------------------
@register(
    "c15_orc_roundtrip",
    """
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           MIN(s_name) AS first_name
    FROM supplier GROUP BY s_nationkey
    """,
    "ORC sink+source roundtrip through the format dispatch: write "
    "supplier to ORC, read back, aggregate — the oracle aggregates the "
    "parquet source, so ORC data loss or retyping fails the hash",
)
def c15_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from aws_data_engineering_spark.sources.readers import read_table
    from aws_data_engineering_spark.sources.writers import write_append

    sup = _t(spark, sf_dir, "supplier")
    path = f"/tmp/spark_graft_c15_{uuid.uuid4().hex[:8]}"
    write_append(sup, path, partition_by=(), fmt="orc")
    back = read_table(spark, path, fmt="orc")
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.floor(F.col("s_acctbal") * 100).cast("bigint")).alias(
            "acctbal_cents"
        ),
        F.min("s_name").alias("first_name"),
    )


# --------------------------------------------------------------------------
# e17 — auto-planed LSH near-dup pairs (round-6): operationalizes the
# 100×-measured plane-count rule as a first-class operator. The Spark side
# COUNTS the corpus and picks p = recommended_lsh_planes(N) (=
# ceil(log2(N/1024)) — per-bucket kernel matrices stay ~8 MB at any N),
# so the same registered query is safe at 500 vectors and at 200k, where
# e02's fixture constant (p=4) would build multi-GB per-task matrices.
# On the fixture corpora (500 / 2000 vectors) the rule resolves to p=1,
# which is what the fixed oracle bakes in — the oracle stays valid for
# any fixture up to 2048 vectors, and the operator stays valid beyond.
# --------------------------------------------------------------------------
_E17_THRESHOLD = 0.45


@register(
    "e17_autoplaned_neardup_lsh",
    SIM.bucketed_neardup_oracle_sql(
        threshold=_E17_THRESHOLD, n_planes=1, dim=64
    ),
    "embedding near-dup pairs with DATA-SIZED hyperplane count: p = "
    "ceil(log2(N/1024)) keeps per-bucket kernel matrices ~constant at any "
    "corpus size (the measured 100x rule, similarity.recommended_lsh_planes)",
)
def e17_autoplaned_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    p = SIM.recommended_lsh_planes(emb.count())
    return SIM.bucketed_neardup_pairs(
        emb, threshold=_E17_THRESHOLD, n_planes=p, dim=64
    )


# --------------------------------------------------------------------------
# q99 — TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
# this schema's lateness proxy (no l_receiptdate/l_commitdate in the
# fixtures; late = shipped > 60 days after order date). The classic
# double-correlated EXISTS / NOT EXISTS is re-expressed as one per-(order,
# supplier) aggregate + one per-order aggregate — "exists another supplier"
# = n_supps > 1, "not exists another LATE supplier" = n_late = 1 — so the
# whole query is equi-join/groupBy shaped: lineitem⨝orders shuffles on
# orderkey once (AQE-sized), both dims broadcast, and the top-20 is a
# TakeOrderedAndProject. No correlated re-scan of lineitem anywhere — the
# form that survives 100 TB where a literal EXISTS-pair translation
# rescans the fact table twice.
# --------------------------------------------------------------------------
_Q99_NATIONS = ("NATION_1", "NATION_7", "NATION_13")


@register(
    "q99_waiting_suppliers",
    f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supps, SUM(is_late) AS n_late
      FROM late GROUP BY l_orderkey
    ), waiters AS (
      SELECT late.l_suppkey
      FROM late JOIN per_order USING (l_orderkey)
      WHERE late.is_late = 1 AND per_order.n_supps > 1
        AND per_order.n_late = 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM waiters w JOIN supplier s ON w.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN {_Q99_NATIONS!r}
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
    "TPC-H Q21 shape: sole-late supplier on multi-supplier finished orders "
    "— EXISTS/NOT-EXISTS pair decorrelated into per-order counts (one "
    "orderkey shuffle, dims broadcast, top-20 TakeOrdered)",
)
def q99_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("is_late")
        )
    )
    per_order = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"), F.sum("is_late").alias("n_late")
    )
    waiters = (
        late.filter(F.col("is_late") == 1)
        .join(
            per_order.filter(
                (F.col("n_supps") > 1) & (F.col("n_late") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q99_NATIONS)
    )
    return (
        waiters.join(
            F.broadcast(sup), waiters["l_suppkey"] == sup["s_suppkey"]
        )
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# t30 — BM25 retrieval for a fixed query over the corpus: the classic
# sparse-retrieval scorer (Robertson & Zaragoza 2009) the dense-retrieval
# operators (s01/s02/s06..) are usually hybridized with. Fixed query terms
# make the whole thing scan-local: per-term tf and doc length are
# higher-order-function expressions (no explode), corpus stats are one
# 1-row broadcast aggregate, and the top-10 is a TakeOrderedAndProject —
# zero data shuffle at any corpus size. Scores are bit-identical to the
# oracle (same literal arithmetic order, ln parity as t15/t16), rounded
# only at the output edge.
# --------------------------------------------------------------------------
_T30_TERMS = ("spark", "merge", "window")
_T30_K = 10


@register(
    "t30_bm25_topk",
    T.bm25_oracle_sql(terms=_T30_TERMS, k=_T30_K),
    "BM25 top-10 for a fixed 3-term query: HOF tf/dl in the scan stage, "
    "1-row broadcast corpus stats, TakeOrdered top-k — shuffle-free sparse "
    "retrieval",
)
def t30_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = T.bm25_scores(docs, "doc_id", "text", terms=_T30_TERMS)
    top = scored.orderBy(F.desc("bm25"), F.asc("id")).limit(_T30_K)
    w = Window.orderBy(F.desc("bm25"), F.asc("id"))
    return top.select(
        "id",
        F.round("bm25", 6).alias("bm25"),
        F.row_number().over(w).cast("int").alias("rnk"),
    )


# --------------------------------------------------------------------------
# p14 — curriculum-ordered epoch schedule: easy-first training mixtures
# (Bengio et al. 2009) as a data-pipeline operator. Phase = fixed
# difficulty thresholds on n_chars (a scan-stage expression — deliberately
# NOT ntile(), whose global total-order window is a single-partition sort
# at 100 TB); epoch e trains on phases 1..e via a guarded
# sequence+posexplode fan-out (phase > n_epochs rows fan to NOTHING — the
# same descending-sequence bug class p13 guards). Census output: per
# (epoch, phase) doc counts + md5 sample-key extrema proving the
# deterministic within-epoch shuffle keys.
# --------------------------------------------------------------------------
_P14_THRESHOLDS = (180, 300, 420)
_P14_EPOCHS = 4
_P14_SALT = "curr-v1"


@register(
    "p14_curriculum_schedule",
    f"""
    WITH fan AS ({{inner}})
    SELECT epoch, phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(id) AS BIGINT) AS sum_doc_id,
           MIN(sample_key) AS min_key, MAX(sample_key) AS max_key
    FROM fan GROUP BY 1, 2
    """.format(
        inner=SAMP.curriculum_sql(
            "doc_id", "n_chars", _P14_THRESHOLDS, _P14_EPOCHS, salt=_P14_SALT
        )
    ),
    "curriculum schedule: fixed-threshold difficulty phases (scan-stage, "
    "no global ntile sort), epoch fan-in via guarded sequence+posexplode, "
    "deterministic md5 within-epoch shuffle keys; per-(epoch, phase) census",
)
def p14_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sched = SAMP.curriculum_schedule(
        docs,
        "doc_id",
        "n_chars",
        thresholds=_P14_THRESHOLDS,
        n_epochs=_P14_EPOCHS,
        salt=_P14_SALT,
    )
    return sched.groupBy(
        F.col("epoch").cast("int").alias("epoch"),
        F.col("phase").cast("int").alias("phase"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.min("sample_key").alias("min_key"),
        F.max("sample_key").alias("max_key"),
    )


# --------------------------------------------------------------------------
# d18 — canonical-document selection over the LSH near-dup graph: the
# "keep the BEST copy" dedup finisher. d10 resolves clusters with min-id
# canonicals over the exact O(N²) pair baseline; this is the production
# form — edges from e02's hyperplane-LSH buckets (equi-join on bucket id,
# the 100 TB path), components via iterative min-label propagation, and
# the kept doc per cluster chosen by QUALITY (longest n_chars, doc_id
# tiebreak) — the heuristic real pipelines use so boilerplate fragments
# don't survive as cluster representatives. Window argmax per cluster_id;
# oracle walks the same LSH edges with a recursive CTE.
#
# Plane count is SIZED FROM THE DATA (e17's measured rule,
# recommended_lsh_planes: p = ceil(log2(N/1024)) holds per-bucket kernel
# matrices ~8 MB at any corpus size) — round 6 shipped these two
# production finishers on fixture-tuned 3-plane constants that SURVEY
# §6.2's own analysis shows build multi-GB kernel tasks at 200k vectors.
# The Spark side derives p from a live count; the oracle derives it from
# the same rule at the driver's correctness corpus size
# (test_d18_oracle_planes_match_fixture pins the two against each other,
# so a regenerated fixture fails loudly instead of hash-diverging).
# --------------------------------------------------------------------------
_D18_THRESHOLD = 0.30
# sf0.001 and sf0.01 both carry 500 embeddings -> p = 1
_D18_ORACLE_N_EMB = 500
_D18_ORACLE_PLANES = SIM.recommended_lsh_planes(_D18_ORACLE_N_EMB)


def _d18_edges(spark: SparkSession, sf_dir: str):
    """Shared d18/g09 edge source: LSH near-dup pairs with the plane count
    derived from the corpus size (one tiny count job, exactly e18's
    pattern)."""
    emb = _t(spark, sf_dir, "embeddings")
    p = SIM.recommended_lsh_planes(emb.count())
    return SIM.bucketed_neardup_pairs(
        emb, threshold=_D18_THRESHOLD, n_planes=p, dim=64
    ).select("id_a", "id_b")


def _d18_oracle() -> str:
    lsh = SIM.bucketed_neardup_oracle_sql(
        threshold=_D18_THRESHOLD, n_planes=_D18_ORACLE_PLANES, dim=64
    )
    return f"""
    WITH RECURSIVE lsh_pairs AS ({lsh}),
    edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
              UNION SELECT id_b AS a, id_a AS b FROM lsh_pairs),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    labeled AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                FROM reach GROUP BY src),
    j AS (SELECT d.doc_id, d.n_chars, l.cluster_id
          FROM documents d JOIN labeled l USING (doc_id)),
    ranked AS (
      SELECT doc_id, cluster_id,
             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
             FIRST_VALUE(doc_id) OVER (
               PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS canonical_doc_id
      FROM j
    )
    SELECT doc_id, cluster_id, cluster_size, canonical_doc_id,
           doc_id = canonical_doc_id AS kept
    FROM ranked
    """


@register(
    "d18_canonical_doc_selection",
    _d18_oracle(),
    "canonical-doc selection: LSH-bucketed near-dup edges (plane count "
    "sized from the corpus via e17's rule) -> connected components -> "
    "keep the highest-quality (longest) doc per cluster via window argmax "
    "— the scale-safe 'keep best copy' dedup finisher",
)
def d18_canonical_doc_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _d18_edges(spark, sf_dir)
    comp = DD.connected_components(pairs, "id_a", "id_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(
        comp, docs["doc_id"] == comp["node"], "left"
    ).select(
        "doc_id", "n_chars", F.coalesce("label", "doc_id").alias("cluster_id")
    )
    wsize = Window.partitionBy("cluster_id")
    wcanon = (
        Window.partitionBy("cluster_id")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(wsize).cast("bigint").alias("cluster_size"),
        F.first("doc_id").over(wcanon).alias("canonical_doc_id"),
        (F.col("doc_id") == F.first("doc_id").over(wcanon)).alias("kept"),
    )


# --------------------------------------------------------------------------
# m16 — progressive JPEG decode (round 6: the real-codec breadth gap named
# since round 5 — real web corpora are full of SOF2 streams a baseline-only
# parser must skip). The decoder implements the complete T.81 §G.1.2
# progressive control flow: DC first scans with point transform, DC
# refinement bits, AC band scans with EOB-run state, AC refinement with
# correction bits — accumulated across scans, one dequant + float IDCT at
# EOI. The synthesized 4-scan streams use the constant-block family (plus
# planted AC coefficients in pytest, where newly-significant-in-refinement
# |AC1|=1 and correction-bit paths are proven against an independent IDCT
# reference), so the registered output has a closed-form oracle and the
# n_scans column proves the multi-scan path actually ran.
# --------------------------------------------------------------------------
@register(
    "m16_jpeg_progressive_decode",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(8 * (1 + doc_id % 3) AS INT) AS width,
             CAST(8 * (1 + doc_id % 2) AS INT) AS height,
             CAST((1 + doc_id % 3) * (1 + doc_id % 2) AS INT) AS nb
      FROM documents
    )
    SELECT id, width, height,
           CAST(width AS BIGINT) * height AS n_pixels,
           CAST(list_aggregate(
                  [((id + b) * 31 % 256) * 64
                   FOR b IN generate_series(0, nb - 1)],
                  'sum') AS BIGINT) AS sum_pixel,
           CAST(list_aggregate(
                  [((id + b) * 31 % 256) * 64
                   FOR b IN generate_series(0, nb - 1)],
                  'sum') AS DOUBLE) / (width * height) AS mean_pixel,
           CAST(4 AS INT) AS n_scans
    FROM dims
    """,
    "REAL progressive (SOF2) JPEG decode: 4-scan streams (DC first/refine, "
    "AC band with EOB runs, AC refinement) through the full T.81 G.1.2 "
    "control flow — constant-block family keeps the output closed-form; "
    "blobs die in the Arrow map stage",
)
def m16_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    jpgs = MM.synthesize_progressive_jpegs(docs, "doc_id")
    return MM.decode_jpeg_progressive_features(jpgs, "id", "data")


# --------------------------------------------------------------------------
# e18 — LSH bucket-occupancy audit: the operational pre-flight for every
# bucketed kernel in the repo (e02/e17/g07/d18). The 100× experiment's
# core finding is that per-bucket kernel work is (N/2^p)² — quadratic in
# occupancy — so the audit reports, per bucket, the member count, the
# C(occ,2) candidate pairs the kernel would enumerate, and the occ²·8-byte
# task matrix it would materialize. Plane count sized from the data like
# e17 (p = recommended_lsh_planes(N)); one partial-agg groupBy on the same
# bucket key the kernel shuffles on — the audit is strictly cheaper than
# the kernel it budgets.
# --------------------------------------------------------------------------
@register(
    "e18_lsh_bucket_occupancy",
    SIM.lsh_occupancy_oracle_sql(n_planes=1, dim=64),
    "LSH bucket-occupancy audit: per-bucket member count, C(occ,2) "
    "candidate-pair work, and the occ^2*8-byte kernel task matrix — the "
    "pre-flight that sizes n_planes before any bucketed similarity kernel "
    "runs",
)
def e18_lsh_bucket_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    p = SIM.recommended_lsh_planes(emb.count())
    return SIM.lsh_bucket_occupancy(emb, n_planes=p, dim=64)


# --------------------------------------------------------------------------
# st12 — STREAMING MinHash dedup: "is this newly-arriving doc a near-dup
# of anything already in the corpus?" — the continuous-ingestion question
# batch d04 can't answer without re-scanning the lake per increment. The
# corpus is fed as doc_id-ordered files with maxFilesPerTrigger=1, so a
# real multi-batch foreachBatch run (band-bucket state accumulated
# merge-on-read across batches) must converge to the batch-SQL fixpoint:
# kept(d) iff no smaller doc_id shares a band bucket. A dropped state row,
# a verdict computed after the state append, or a batch-boundary leak all
# flip verdicts and fail the hash.
# --------------------------------------------------------------------------
@register(
    "st12_stream_minhash_dedup",
    DD.minhash_first_seen_oracle_sql(num_hashes=32, num_bands=8),
    "streaming fuzzy dedup: per-micro-batch MinHash band buckets joined "
    "against merge-on-read first-seen state (append-only, min-folded) — "
    "first-seen-wins verdicts over a genuinely multi-batch availableNow "
    "run, oracle-checked against the batch first-seen rule",
)
def st12_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from aws_data_engineering_spark.streaming import (
        read_documents_stream,
        read_minhash_verdicts,
        stamp_feed_mtimes,
        stream_minhash_dedup_sink,
    )

    docs = _t(spark, sf_dir, "documents")
    base = os.path.join(tempfile.gettempdir(), "spark_st12", uuid.uuid4().hex[:8])
    in_dir = os.path.join(base, "in")
    # feed the corpus as doc_id-RANGE files written sequentially: the file
    # source processes oldest-modification-time first, so batch order ==
    # doc_id order and the streaming first-seen rule equals the oracle's
    # global min-id rule (any batch decomposition respecting that order
    # yields identical verdicts — see stream_minhash_dedup_sink).
    # stamp_feed_mtimes pins that order explicitly: mtime ties on a
    # coarse-granularity filesystem would otherwise leave the batch order
    # to listing luck.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    n_files = 4
    step = (int(max_id) + n_files) // n_files
    seen: set = set()
    for i in range(n_files):
        docs.filter(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(in_dir)
        seen = stamp_feed_mtimes(in_dir, seen, i)
    stream = read_documents_stream(spark, in_dir, max_files_per_trigger=1)
    q = stream_minhash_dedup_sink(
        stream,
        state_dir=os.path.join(base, "state"),
        out_dir=os.path.join(base, "out"),
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination()
    return read_minhash_verdicts(spark, os.path.join(base, "out"))


# --------------------------------------------------------------------------
# g08 — connected components via large-star/small-star contraction
# (Kiveris et al.): the O(log n)-round algorithm d10's min-label docstring
# promised "in prose" since round 1, now registered code. Min-label
# propagation needs diameter rounds — a chain of 100 near-identical
# crawl snapshots (each similar only to its neighbors) is a diameter-100
# graph that d10's 25-round budget now REFUSES (RuntimeError) rather than
# silently mislabeling; star contraction closes it in ~log2(n)
# alternations, each two groupBy shuffles over the shrinking edge set.
# Edges from the LSH buckets (the 100 TB path, as g07/d18); oracle walks
# the same edges with a recursive CTE, so both algorithms' cluster
# labelings are pinned to the same ground truth.
# --------------------------------------------------------------------------
def _g08_oracle() -> str:
    lsh = SIM.bucketed_neardup_oracle_sql(
        threshold=_D18_THRESHOLD, n_planes=_D18_ORACLE_PLANES, dim=64
    )
    return f"""
    WITH RECURSIVE lsh_pairs AS ({lsh}),
    edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
              UNION SELECT id_b AS a, id_a AS b FROM lsh_pairs),
    reach(src, dst) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    labeled AS (SELECT src AS vec_id, MIN(dst) AS cluster_id
                FROM reach GROUP BY src)
    SELECT vec_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size
    FROM labeled
    """


@register(
    "g08_star_components",
    _g08_oracle(),
    "connected components by alternating large-star/small-star contraction "
    "(O(log n) rounds, two shuffles each) over the LSH near-dup graph — "
    "the high-diameter-safe form of d10's min-label propagation, same "
    "min-id labels",
)
def g08_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    pairs = _d18_edges(spark, sf_dir)
    comp = DD.connected_components_star(pairs, "id_a", "id_b")
    labeled = (
        emb.select("vec_id")
        .join(comp, F.col("vec_id") == comp["node"], "left")
        .select("vec_id", F.coalesce("label", "vec_id").alias("cluster_id"))
    )
    w = Window.partitionBy("cluster_id")
    return labeled.select(
        "vec_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )


# --------------------------------------------------------------------------
# m17 — MJPEG-in-MP4 sample decode (round-6): closes VERDICT r05's last
# real-codec gap ("MP4 sample decode"). The muxer writes a genuine
# ISO-BMFF movie — mdat holding 1 + id % 4 REAL baseline-JPEG frames and
# a complete sample table (stsd 'jpeg' VisualSampleEntry, stts/stsc/stsz/
# stco with absolute chunk offsets) — and the demuxer resolves every
# sample's byte range from the table and decodes it through the same
# codec m07 verified. One output row per FRAME, so a wrong stsz size, a
# shifted stco offset, or a broken per-sample slice fails the hash on
# frame counts and pixel sums alike. Frame f of video id uses m07's
# exactly-representable block family shifted by f. Reference carries
# opaque blobs only (generic_load_script.py:63-76); this is the
# engine-side multimodal extension the brief asks for.
# --------------------------------------------------------------------------
@register(
    "m17_mjpeg_frame_decode",
    """
    WITH v AS (
      SELECT doc_id AS id,
             CAST(1 + doc_id % 4 AS INT) AS n_frames,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height,
             CAST((4 + doc_id % 16 + 7) // 8 AS INT) AS bx_n,
             CAST((4 + doc_id % 12 + 7) // 8 AS INT) AS by_n
      FROM documents
    ), f AS (
      SELECT id, width, height, bx_n, by_n,
             CAST(UNNEST(generate_series(0, n_frames - 1)) AS INT) AS frame_idx
      FROM v
    )
    SELECT id, frame_idx, width, height,
           CAST(width AS BIGINT) * height AS n_pixels,
           CAST(list_aggregate(
                  [(id + frame_idx + b) * 31 % 256
                     * least(8, width - b % bx_n * 8)
                     * least(8, height - b // bx_n * 8)
                   FOR b IN generate_series(0, bx_n * by_n - 1)],
                  'sum') AS BIGINT) AS sum_pixel
    FROM f
    """,
    "REAL MP4 sample decode: demux via the stsd/stts/stsc/stsz/stco "
    "sample table, slice each sample at its stco+stsz byte range, decode "
    "every MJPEG frame through the real baseline JPEG codec — one row per "
    "frame; non-'jpeg' sample entries are refused, never misdecoded",
)
def m17_mjpeg_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    movies = MM.synthesize_mjpeg_videos(docs, "doc_id")
    return MM.decode_mjpeg_frame_features(movies, "id", "data")


# --------------------------------------------------------------------------
# t31 — interpolated Kneser-Ney bigram LM (round-6): the smoothing real
# LM-quality filters (CCNet/KenLM lineage) actually use, upgrading t18's
# add-k. Absolute discount D=0.75 with the continuation-probability
# back-off: P(w2|w1) = max(c12-D,0)/c1 + (D*N1+(w1,.)/c1) * N1+(.,w2)/B
# where N1+ are distinct-bigram-type counts and B the total type count.
# All five statistics are partial-agg groupBys over the bigram table,
# re-joined on prefix/suffix (never a driver-side LM); B rides a 1-task
# window over the vocab-bounded suffix table. Both engines evaluate the
# probability in the same literal order; per-doc cross-entropies round at
# the final source-level aggregate only (t18's proven shape).
# --------------------------------------------------------------------------
@register(
    "t31_kneser_ney_bigram",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(translate(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'),
                         x -> x <> '') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, source,
             unnest([{'p': t[i], 's': t[i+1]}
                     FOR i IN generate_series(1, len(t) - 1)], recursive := true)
      FROM toks WHERE len(t) >= 2
    ), bgc AS (
      SELECT p, s, COUNT(*) AS cnt2 FROM bg GROUP BY p, s
    ), pref AS (
      SELECT p, SUM(cnt2) AS tot1, COUNT(*) AS n_follow FROM bgc GROUP BY p
    ), succ AS (
      SELECT s, COUNT(*) AS n_prec, SUM(COUNT(*)) OVER () AS n_types
      FROM bgc GROUP BY s
    ), scored AS (
      SELECT bg.doc_id, bg.source,
             -ln(
               (greatest(bgc.cnt2 - 0.75, 0.0) / pref.tot1)
               + ((0.75 * pref.n_follow) / pref.tot1)
                 * (CAST(succ.n_prec AS DOUBLE) / succ.n_types)
             ) AS nll
      FROM bg
      JOIN bgc ON bg.p = bgc.p AND bg.s = bgc.s
      JOIN pref ON bg.p = pref.p
      JOIN succ ON bg.s = succ.s
    ), doc_scores AS (
      SELECT doc_id, source, AVG(nll) AS ce FROM scored GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(ce), 3) AS avg_kn_cross_entropy,
           ROUND(MIN(ce), 3) AS min_kn_cross_entropy,
           ROUND(MAX(ce), 3) AS max_kn_cross_entropy
    FROM doc_scores GROUP BY source
    """,
    "interpolated Kneser-Ney bigram cross-entropy per source (D=0.75, "
    "continuation-probability back-off from distinct-type counts): the "
    "real LM-quality-filter smoothing; five partial-agg count tables "
    "re-joined on the gram, no driver-side state",
)
def t31_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.filter(
            F.split(T.ascii_lower(T.ascii_trim(F.col("text"))), r"\s+"), lambda x: x != ""
        ).alias("t"),
    )
    bg = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("p"),
                    F.element_at("t", i + 2).alias("s"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "source", "g.p", "g.s")
    bgc = bg.groupBy("p", "s").agg(F.count(F.lit(1)).alias("cnt2"))
    pref = bgc.groupBy("p").agg(
        F.sum("cnt2").alias("tot1"), F.count(F.lit(1)).alias("n_follow")
    )
    succ = bgc.groupBy("s").agg(F.count(F.lit(1)).alias("n_prec"))
    succ = succ.withColumn(
        "n_types", F.sum("n_prec").over(Window.partitionBy(F.lit(1)))
    )
    p_kn = (
        F.greatest(F.col("cnt2") - F.lit(0.75), F.lit(0.0)) / F.col("tot1")
    ) + ((F.lit(0.75) * F.col("n_follow")) / F.col("tot1")) * (
        F.col("n_prec").cast("double") / F.col("n_types")
    )
    scored = (
        bg.join(bgc, ["p", "s"])
        .join(pref, "p")
        .join(succ, "s")
        .select("doc_id", "source", (-F.log(p_kn)).alias("nll"))
    )
    doc_scores = scored.groupBy("doc_id", "source").agg(F.avg("nll").alias("ce"))
    return doc_scores.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("ce"), 3).alias("avg_kn_cross_entropy"),
        F.round(F.min("ce"), 3).alias("min_kn_cross_entropy"),
        F.round(F.max("ce"), 3).alias("max_kn_cross_entropy"),
    )


# --------------------------------------------------------------------------
# dq16 — mean-shift changepoint scan (round-6): the two-sided sliding-
# window test a monitoring pipeline runs over a metric series ("did daily
# revenue level-shift here?"). Daily revenue is aggregated in exact
# integer cents (floor, matching both engines bit-for-bit), then each day
# compares the trailing-7-day sum against the leading-7-day sum with
# RANGE-keyed windows (day-number key, so calendar gaps can't misalign
# the frames the way ROWS would); the flag is RELATIVE (|shift|*4 > trail,
# i.e. a >25%% level shift) so it stays discriminative at any scale
# factor. shift = lead - trail is pure int64
# arithmetic — the whole query has NO floating point, so the hash match
# is exact by construction (the dq03 quantize-first rule taken to its
# limit). Scale: one partial-agg groupBy(day) collapses the fact table to
# a bounded series before any window runs — the window stage sees ~10^3
# rows however big the input is; a production run would partition the
# window by (year) or metric key to keep it off a single task.
# --------------------------------------------------------------------------
_DQ16_WIN = 7  # days on each side
_DQ16_REL_NUM = 4  # flag when |shift| * 4 > trail (a >25% level shift)


@register(
    "dq16_mean_shift_changepoints",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY 1, 2
    ), shifted AS (
      SELECT day, rev_cents,
             SUM(rev_cents) OVER (ORDER BY day_num
               RANGE BETWEEN {_DQ16_WIN} PRECEDING AND 1 PRECEDING)
               AS trail_cents,
             COUNT(*) OVER (ORDER BY day_num
               RANGE BETWEEN {_DQ16_WIN} PRECEDING AND 1 PRECEDING)
               AS trail_days,
             SUM(rev_cents) OVER (ORDER BY day_num
               RANGE BETWEEN CURRENT ROW AND {_DQ16_WIN - 1} FOLLOWING)
               AS lead_cents,
             COUNT(*) OVER (ORDER BY day_num
               RANGE BETWEEN CURRENT ROW AND {_DQ16_WIN - 1} FOLLOWING)
               AS lead_days
      FROM daily
    )
    SELECT day,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(trail_cents AS BIGINT) AS trail_cents,
           CAST(lead_cents AS BIGINT) AS lead_cents,
           CAST(lead_cents - trail_cents AS BIGINT) AS shift_cents,
           CAST(abs(lead_cents - trail_cents) * {_DQ16_REL_NUM} > trail_cents
                AND trail_days = {_DQ16_WIN} AND lead_days = {_DQ16_WIN}
                AS BOOLEAN) AS is_changepoint
    FROM shifted
    """,
    "mean-shift changepoint scan over the daily revenue series: trailing "
    "vs leading 7-day RANGE windows in exact integer cents (zero floating "
    "point end-to-end); partial-agg collapses the fact table to a bounded "
    "series before the window stage",
)
def dq16_mean_shift_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias(
            "day_num"
        ),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev_cents"
        )
    )
    w_trail = (
        Window.orderBy("day_num").rangeBetween(-_DQ16_WIN, -1)
    )
    w_lead = Window.orderBy("day_num").rangeBetween(0, _DQ16_WIN - 1)
    shifted = daily.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w_trail).alias("trail_cents"),
        F.count(F.lit(1)).over(w_trail).alias("trail_days"),
        F.sum("rev_cents").over(w_lead).alias("lead_cents"),
        F.count(F.lit(1)).over(w_lead).alias("lead_days"),
    )
    return shifted.select(
        "day",
        "rev_cents",
        "trail_cents",
        "lead_cents",
        (F.col("lead_cents") - F.col("trail_cents")).alias("shift_cents"),
        (
            (
                F.abs(F.col("lead_cents") - F.col("trail_cents"))
                * F.lit(_DQ16_REL_NUM)
                > F.col("trail_cents")
            )
            & (F.col("trail_days") == _DQ16_WIN)
            & (F.col("lead_days") == _DQ16_WIN)
        ).alias("is_changepoint"),
    )


# --------------------------------------------------------------------------
# p15 — token-budget waterfill mixture planning (round-6): given per-
# source token capacities and a global training budget B (here 90% of the
# corpus so the answer mixes fully-granted and truncated sources), find
# the waterfill level L with sum_s min(c_s, L) <= B and allocate
# a_s = min(c_s, L) — the standard "spend the budget proportionally but
# never over-sample a source" planning step that sits in front of p06's
# per-doc budget sampling. Exact INTEGER algorithm on both engines:
# sources sorted by (capacity, name), a source is FULL when topping every
# remaining source up to its capacity still fits the remaining budget
# (cum_prev + c_i * rem_i <= B, monotone in i), and the first non-full
# prefix fixes L = (B - cum_prev) div rem (floor division on
# non-negatives). The fact table collapses to one row per source before
# any window runs, so the window stage is vocabulary-bounded at any data
# scale. Zero floating point end-to-end.
# --------------------------------------------------------------------------
@register(
    "p15_token_budget_waterfill",
    r"""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(len(list_filter(
                    string_split_regex(translate(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'),
                    x -> x <> ''))) AS BIGINT) AS c_tokens
      FROM documents GROUP BY source
    ), tot AS MATERIALIZED (
      SELECT source, c_tokens,
             SUM(c_tokens) OVER () AS total,
             (SUM(c_tokens) OVER () * 9) // 10 AS budget,
             COUNT(*) OVER () AS n_src,
             ROW_NUMBER() OVER (ORDER BY c_tokens, source) AS i,
             COALESCE(SUM(c_tokens) OVER (ORDER BY c_tokens, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM per_src
    ), flagged AS (
      SELECT *,
             (cum_prev + c_tokens * (n_src - i + 1) <= budget) AS is_full,
             MIN(CASE WHEN NOT (cum_prev + c_tokens * (n_src - i + 1) <= budget)
                 THEN i END) OVER () AS first_nf
      FROM tot
    ), lvl AS (
      -- the waterfill level comes from the FIRST infeasible prefix only
      -- (infeasibility is monotone in i; later prefixes have cum_prev >
      -- budget and would yield negative levels)
      SELECT *,
             MIN(CASE WHEN i = first_nf
                 THEN (budget - cum_prev) // (n_src - i + 1) END) OVER ()
               AS level
      FROM flagged
    )
    SELECT source, c_tokens,
           CAST(CASE WHEN is_full THEN c_tokens
                     ELSE least(c_tokens, level) END AS BIGINT) AS allocation,
           CAST(COALESCE(level, c_tokens) AS BIGINT) AS fill_level,
           CAST(budget AS BIGINT) AS budget,
           is_full
    FROM lvl
    """,
    "token-budget waterfill mixture planning: per-source capacities, "
    "global budget = 90% of corpus tokens, exact integer waterfill level "
    "via the sorted-prefix feasibility test — the allocation step in "
    "front of per-doc budget sampling (p06); vocabulary-bounded window "
    "stage, zero floating point",
)
def p15_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.size(
            F.filter(
                F.split(T.ascii_lower(T.ascii_trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("n_tok"),
    )
    per_src = toks.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("c_tokens")
    )
    w_all = Window.partitionBy(F.lit(1))
    w_ord = Window.partitionBy(F.lit(1)).orderBy("c_tokens", "source")
    tot = per_src.withColumn("total", F.sum("c_tokens").over(w_all))
    tot = (
        tot.withColumn("budget", F.expr("(total * 9) div 10"))
        .withColumn("n_src", F.count(F.lit(1)).over(w_all))
        .withColumn("i", F.row_number().over(w_ord))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("c_tokens").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    feasible = (
        F.col("cum_prev") + F.col("c_tokens") * (F.col("n_src") - F.col("i") + 1)
        <= F.col("budget")
    )
    flagged = tot.withColumn("is_full", feasible).withColumn(
        "first_nf", F.min(F.when(~feasible, F.col("i"))).over(w_all)
    )
    # level from the FIRST infeasible prefix only — infeasibility is
    # monotone in i, and later prefixes (cum_prev > budget) would yield
    # negative levels
    lvl = flagged.withColumn(
        "level",
        F.min(
            F.when(
                F.col("i") == F.col("first_nf"),
                F.expr("(budget - cum_prev) div (n_src - i + 1)"),
            )
        ).over(w_all),
    )
    return lvl.select(
        "source",
        "c_tokens",
        F.when(F.col("is_full"), F.col("c_tokens"))
        .otherwise(F.least("c_tokens", "level"))
        .cast("bigint")
        .alias("allocation"),
        F.coalesce("level", "c_tokens").cast("bigint").alias("fill_level"),
        F.col("budget").cast("bigint").alias("budget"),
        "is_full",
    )


# --------------------------------------------------------------------------
# st13 — watermark late-data drop audit (round-6): the one watermark
# behavior no other streaming query pins — rows arriving AFTER their
# window closed are DROPPED, and the drop boundary is modeled exactly.
# The corpus is fed as three event_id%3 files (each spans the full time
# range, so later batches are massively late) with maxFilesPerTrigger=1.
# Empirically pinned semantics (Spark 4.1, probed at equality edges):
# the watermark batch b RUNS with is max-event-time over batches < b
# (ms-truncated) minus the delay, the LATE-DATA FILTER in batch b uses
# the watermark batch b-1 ran with (one further batch of lag), equality
# DROPS (window_end <= filter-wm), and the availableNow drain ends with
# an empty batch that advances the watermark to the global max, emitting
# every window with end <= final watermark. With three files the only
# drop-exposed batch is the third (filter-wm = max of file 0 - delay);
# the oracle reproduces the admitted set and the final emission set in
# closed form. 37-minute delay keeps watermarks off hour boundaries.
# --------------------------------------------------------------------------
@register(
    "st13_stream_late_data_audit",
    """
    WITH bat AS (
      -- pmod semantics (match the Spark feed splitter: DuckDB % keeps
      -- the dividend's sign, NULL -> bucket 0)
      SELECT *, ((COALESCE(event_id, 0) % 3) + 3) % 3 AS b FROM events
    ), m0 AS (
      SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL 37 MINUTE AS wm
      FROM bat WHERE b = 0
    ), mall AS (
      SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL 37 MINUTE AS wm
      FROM bat
    ), admitted AS (
      SELECT bat.* FROM bat, m0
      WHERE b <= 1 OR date_trunc('hour', ts) + INTERVAL 1 HOUR > m0.wm
    ), agg AS (
      SELECT date_trunc('hour', ts) AS ws, event_type,
             COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
      FROM admitted GROUP BY 1, 2
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, total_value
    FROM agg, mall
    WHERE ws + INTERVAL 1 HOUR <= mall.wm
    """,
    "watermark late-data drop audit: corpus fed as three full-time-range "
    "files so the third batch is massively late; append-mode tumbling agg "
    "under a 37-minute watermark — the oracle reproduces the empirically "
    "pinned drop rule (one-batch-lagged filter watermark, equality drops) "
    "and the final emission set exactly",
)
def st13_stream_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from aws_data_engineering_spark.streaming import (
        read_events_stream,
        run_to_memory_sink,
        stamp_feed_mtimes,
    )

    events = _t(spark, sf_dir, "events")
    base = os.path.join(tempfile.gettempdir(), "spark_st13", uuid.uuid4().hex[:8])
    in_dir = os.path.join(base, "in")
    # one file per event_id%3 class, written sequentially: the file source
    # processes oldest-modification-time first, so batch order == class
    # order (the st12 feed pattern; stamp_feed_mtimes pins it against
    # coarse-mtime tie luck). ts re-encoded as nanos bigint — the
    # EVENTS_DDL raw-INT64 contract (Spark's own timestamp writer emits
    # INT96, which the bigint stream schema refuses)
    feed = events.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    seen: set = set()
    for b in range(3):
        feed.filter(
            F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(3)) == b
        ).coalesce(1).write.mode("append").parquet(in_dir)
        seen = stamp_feed_mtimes(in_dir, seen, b)
    stream = read_events_stream(spark, in_dir, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "37 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = f"st13_{uuid.uuid4().hex[:8]}"
    return run_to_memory_sink(agg, name, "append")


# --------------------------------------------------------------------------
# c16 — parquet zone-map (row-group skipping) audit (round-6): the
# physical-layout property a 100 TB scan lives or dies by. Lineitem is
# laid out the way a date-partitioned lake table would be — one file per
# ship-month, rows sorted by (shipdate, orderkey, linenumber), written
# EXECUTOR-SIDE by pyarrow with a fixed 512-row row-group size so the
# row-group boundaries are closed-form — then a footer-only second pass
# reads each file's REAL row-group statistics (min/max, counts; never the
# data pages) and decides, per row group, whether a Q1-1996 predicate
# could skip it (mid-range of the fixture's 1995-2001 shipdates: 159 of
# 165 row groups skip at sf0.01, 6 scan). The oracle recomputes every row group's extent from the
# sort order, so a writer that mis-sorts, mis-chunks, or drops statistics
# fails the hash. This is the min/max pruning contract Spark's own
# parquet reader, DuckDB, and every lakehouse format (Iceberg/Delta
# data-skipping stats) rely on, made auditable as a query.
#
# Round 7 (VERDICT r06 #7): months are SUB-PARTITIONED by a portable
# md5 hash bucket of (orderkey, linenumber), so the write stage has
# months × _C16_BUCKETS tasks instead of 84 single-task month files at
# every SF — the r06 100× measurement (60.5×) was entirely that stage's
# task-count ceiling, not a plan-shape problem. Each (month, bucket)
# file keeps the shipdate sort and fixed 512-row row groups; per-bucket
# min/max stay month-tight (the bucket is date-independent), so the
# Q1-1996 skippability contract is unchanged and the oracle recomputes
# every group's extent closed-form per (month, bucket).
# --------------------------------------------------------------------------
_C16_RG_ROWS = 512
_C16_LO, _C16_HI = "1996-01-01", "1996-03-31"
_C16_BUCKETS = 8


@register(
    "c16_parquet_zonemap_audit",
    f"""
    WITH r AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             -- portable sub-partition bucket: first md5 hex char of
             -- 'orderkey:linenumber' mod {_C16_BUCKETS} (the d05 '0x' cast
             -- pattern; Spark mirrors it with ascii arithmetic)
             CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                      CAST(l_linenumber AS VARCHAR)), 1, 1)
                  AS BIGINT) % {_C16_BUCKETS} AS bucket,
             CAST(l_shipdate AS DATE) AS d,
             l_orderkey, l_linenumber
      FROM lineitem
    ), rn AS (
      SELECT month, bucket, d,
             -- order by the DATE-cast column, matching the Spark writer's
             -- sort key d: a raw-timestamp order would diverge on
             -- intraday time components (fixture shipdates are midnight
             -- today, but a regenerated corpus need not be)
             ROW_NUMBER() OVER (
               PARTITION BY month, bucket
               ORDER BY d, l_orderkey, l_linenumber) - 1 AS rn
      FROM r
    ), g AS (
      SELECT month, bucket, rn // {_C16_RG_ROWS} AS rg_idx,
             COUNT(*) AS n_rows, MIN(d) AS min_date, MAX(d) AS max_date
      FROM rn GROUP BY 1, 2, 3
    )
    SELECT month, CAST(bucket AS INT) AS bucket, CAST(rg_idx AS INT) AS rg_idx,
           CAST(n_rows AS BIGINT) AS n_rows, min_date, max_date,
           (max_date < DATE '{_C16_LO}' OR min_date > DATE '{_C16_HI}')
             AS skippable
    FROM g
    """,
    "parquet zone-map audit: (month × hash-bucket)-partitioned, "
    "shipdate-sorted files written executor-side with fixed 512-row row "
    "groups (bucketing lifts the write stage past one-task-per-month); a "
    "footer-only pass reads the real row-group min/max statistics and "
    "decides Q1-1996 skippability per group — the data-skipping contract "
    "lakehouse scans rely on, hash-checked against the closed-form layout",
)
def c16_parquet_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    out_dir = os.path.join(
        tempfile.gettempdir(), "spark_c16", uuid.uuid4().hex[:8]
    )
    os.makedirs(out_dir, exist_ok=True)
    rg_rows, lo, hi = _C16_RG_ROWS, _C16_LO, _C16_HI

    from aws_data_engineering_spark.operators.sampling import _hexval

    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        (_hexval(F.substring(F.md5(key), 1, 1)) % _C16_BUCKETS).alias("bucket"),
        F.col("l_shipdate").cast("date").alias("d"),
        "l_orderkey",
        "l_linenumber",
    )

    def write_part(pdf):
        import os as os_w

        import pandas as pd_w
        import pyarrow as pa_w
        import pyarrow.parquet as pq_w

        pdf = pdf.sort_values(
            ["d", "l_orderkey", "l_linenumber"], kind="mergesort"
        ).reset_index(drop=True)
        month = str(pdf["month"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        path = os_w.path.join(out_dir, f"{month}-b{bucket}.parquet")
        # Array.from_pandas converts the date column in C — the
        # list()-per-element form dominated the 100× write stage
        tbl = pa_w.table(
            {"d": pa_w.Array.from_pandas(pdf["d"], type=pa_w.date32())}
        )
        pq_w.write_table(tbl, path, row_group_size=rg_rows)
        return pd_w.DataFrame(
            {"month": [month], "bucket": [bucket], "path": [path]}
        )

    files = li.groupBy("month", "bucket").applyInPandas(
        write_part, "month string, bucket int, path string"
    )

    def read_footers(batches):
        import datetime as dt_w

        import pandas as pd_w
        import pyarrow.parquet as pq_w

        lo_d = dt_w.date.fromisoformat(lo)
        hi_d = dt_w.date.fromisoformat(hi)
        cols = (
            "month", "bucket", "rg_idx", "n_rows",
            "min_date", "max_date", "skippable",
        )
        for pdf in batches:
            out = {c: [] for c in cols}
            for month, bucket, path in zip(
                pdf["month"], pdf["bucket"], pdf["path"]
            ):
                pf = pq_w.ParquetFile(path)
                for rg in range(pf.metadata.num_row_groups):
                    meta = pf.metadata.row_group(rg)
                    st = meta.column(0).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(f"{path} rg {rg}: missing statistics")
                    out["month"].append(month)
                    out["bucket"].append(int(bucket))
                    out["rg_idx"].append(rg)
                    out["n_rows"].append(meta.num_rows)
                    out["min_date"].append(st.min)
                    out["max_date"].append(st.max)
                    out["skippable"].append(st.max < lo_d or st.min > hi_d)
            yield pd_w.DataFrame(out)

    return files.mapInPandas(
        read_footers,
        "month string, bucket int, rg_idx int, n_rows bigint, "
        "min_date date, max_date date, skippable boolean",
    )


# --------------------------------------------------------------------------
# p16 — deterministic source interleave (round-6): build the single
# global training order a sharded dataloader walks, with sources
# round-robin interleaved so any prefix of the stream preserves the
# source mixture (the property epoch-level shuffling alone does not
# give). Within-source order is the p12 md5 shuffle (seedless,
# crash-resumable); the global position is within_rank * n_sources +
# source_index — a collision-free affine interleave computed with ZERO
# global sort: the only full-table window partitions BY SOURCE (parallel
# across sources), and source_index/n_sources come from a broadcast
# vocabulary-bounded source table. A 100 TB corpus gets a total order
# without any single-partition stage.
# --------------------------------------------------------------------------
@register(
    "p16_source_interleave",
    """
    WITH srcs AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS source_index,
             COUNT(*) OVER () AS n_sources
      FROM (SELECT DISTINCT source FROM documents)
    ), ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR))) - 1
               AS within_rank
      FROM documents d
    )
    SELECT r.doc_id, r.source,
           CAST(r.within_rank AS BIGINT) AS within_rank,
           CAST(r.within_rank * s.n_sources + s.source_index AS BIGINT)
             AS global_pos
    FROM ranked r JOIN srcs s ON r.source = s.source
    """,
    "deterministic source interleave: md5 within-source shuffle + affine "
    "round-robin global position (within_rank * n_sources + source_index) "
    "— any prefix of the stream preserves the source mixture; no global "
    "sort, windows partition by source, source table broadcast",
)
def p16_source_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    srcs = docs.select("source").distinct()
    w_src = Window.partitionBy(F.lit(1)).orderBy("source")
    srcs = srcs.select(
        "source",
        (F.row_number().over(w_src) - 1).alias("source_index"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n_sources"),
    )
    w_in = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    )
    ranked = docs.select(
        "doc_id", "source", (F.row_number().over(w_in) - 1).alias("within_rank")
    )
    return ranked.join(F.broadcast(srcs), "source").select(
        "doc_id",
        "source",
        F.col("within_rank").cast("bigint").alias("within_rank"),
        (F.col("within_rank") * F.col("n_sources") + F.col("source_index"))
        .cast("bigint")
        .alias("global_pos"),
    )


# --------------------------------------------------------------------------
# m18 — audio resample through a full real-codec round trip (round-6c):
# decode RIFF/PCM16 → decimate by 2 (integer pairwise mean, truncation
# toward zero to match DuckDB's `//` on negative amplitudes) → re-ENCODE
# a genuine half-rate WAV → fresh decode for features. The second decode
# proves the re-encoded container is spec-valid; the closed-form oracle
# reproduces every output sample from the synthesis lattice, so a wrong
# fmt block, byte order, or off-by-one pairing fails the hash.
# --------------------------------------------------------------------------
@register(
    "m18_audio_resample",
    """
    WITH a AS (
      SELECT doc_id AS id,
             8000 + (doc_id % 4) * 4000 AS rate,
             CAST(256 + doc_id % 512 AS INT) AS n
      FROM documents
    ), res AS (
      SELECT id, rate, n,
             [(((id + 2*j) * 31 % 256 - 128)
               + ((id + 2*j + 1) * 31 % 256 - 128)) // 2
              FOR j IN generate_series(0, n // 2 - 1)] AS y
      FROM a
    )
    SELECT id,
           CAST(rate AS INT) AS orig_rate,
           CAST(rate // 2 AS INT) AS new_rate,
           n AS n_in,
           CAST(n // 2 AS INT) AS n_out,
           CAST(list_aggregate(y, 'sum') AS BIGINT) AS sum_amplitude,
           CAST(list_aggregate(list_transform(y, v -> abs(v)), 'max') AS INT)
             AS peak_amplitude,
           (n // 2) * 1000.0 / (rate // 2) AS duration_ms
    FROM res
    """,
    "audio decimate-by-2 through a full real-codec round trip: decode "
    "RIFF/PCM16, integer pairwise-mean downsample (truncation-matched to "
    "the oracle), re-encode a genuine half-rate WAV, fresh decode for "
    "features — container validity and every output sample hash-checked",
)
def m18_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    clips = MM.synthesize_wav_audio(docs, "doc_id")
    half = MM.resample_wavs_half(clips, "id", "data")
    return MM.resampled_wav_features(half, "id", "data")


# --------------------------------------------------------------------------
# e19 — IVF probe-recall sweep (round-6c): the operational tuning table
# for the inverted-file index — recall@5 as a function of n_probe (1, 2,
# 4, 8 of 16 lists) against the exact-cosine ground truth on the guarded
# 10-anchor query set. This is THE decision faiss users make before any
# billion-scale deployment (probe more lists = more recall, linearly more
# scan), and here the whole frontier is one oracle-checked query: both
# rankings are bit-reproducible (fold-order-matched cosine, centroid-id
# tie-breaks), so the per-probe overlap counts are exact integers. At
# 100 TB the exact side stays O(anchors x corpus) on a sampled query set
# — recall auditing never touches all-pairs.
# --------------------------------------------------------------------------
_E19_PROBES = (1, 2, 4, 8)
_E19_CENTROIDS = SIM._hyperplanes(dim=64, n_planes=16, seed=7)


def _e19_oracle() -> str:
    parts = [f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), exact_rank AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                         c.vec_id) AS rnk
      FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    ), ex5 AS (
      SELECT query_id, list_sort(list(neighbor_id)) AS ex_arr
      FROM exact_rank WHERE rnk <= 5 GROUP BY query_id
    )"""]
    selects = []
    for npb in _E19_PROBES:
        ivf = SIM.ivf_fixed_oracle_sql(
            _E19_CENTROIDS, k=5, n_probe=npb, query_pred="vec_id < 10"
        )
        parts.append(f""", iv{npb} AS ({ivf})
    , iv{npb}_arr AS (
      SELECT query_id, list_sort(list(neighbor_id)) AS iv_arr
      FROM iv{npb} GROUP BY query_id
    )""")
        selects.append(f"""
    SELECT CAST({npb} AS INT) AS n_probe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(len(list_intersect(ex_arr, iv_arr))) AS BIGINT)
             AS sum_overlap,
           ROUND(SUM(len(list_intersect(ex_arr, iv_arr)))
                 / (5.0 * COUNT(*)), 4) AS recall_at_5
    FROM ex5 JOIN iv{npb}_arr USING (query_id)""")
    return "".join(parts) + " UNION ALL ".join(selects)


@register(
    "e19_ivf_probe_recall_sweep",
    _e19_oracle(),
    "IVF tuning table: recall@5 vs n_probe (1/2/4/8 of 16 lists) against "
    "exact-cosine ground truth on the guarded anchor set — the probe-vs-"
    "recall frontier as one oracle-checked query; exact integer overlap "
    "counts, one final division",
)
def e19_ivf_probe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(q, emb, k=5)
    ex5 = exact.groupBy("query_id").agg(
        F.sort_array(F.collect_list("neighbor_id")).alias("ex_arr")
    )
    out = None
    for npb in _E19_PROBES:
        ivf = SIM.ivf_fixed_topk(q, emb, _E19_CENTROIDS, k=5, n_probe=npb)
        iv5 = ivf.groupBy("query_id").agg(
            F.sort_array(F.collect_list("neighbor_id")).alias("iv_arr")
        )
        ov = F.size(F.array_intersect(F.col("ex_arr"), F.col("iv_arr")))
        row = (
            ex5.join(iv5, "query_id")
            .agg(
                F.count(F.lit(1)).alias("n_queries"),
                F.sum(ov).alias("sum_overlap"),
            )
            .select(
                F.lit(npb).cast("int").alias("n_probe"),
                F.col("n_queries").cast("bigint").alias("n_queries"),
                F.col("sum_overlap").cast("bigint").alias("sum_overlap"),
                F.round(
                    F.col("sum_overlap") / (F.lit(5.0) * F.col("n_queries")), 4
                ).alias("recall_at_5"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# --------------------------------------------------------------------------
# q100 — deterministic mergeable q-digest quantiles (round-6c): the
# Shrivastava et al. 2004 quantile summary in a canonical bottom-up form
# (operators/sketch.py). Unlike the engine's approx_percentile/HLL
# (q26/q39 — rows-only, implementation-defined internals), every stage
# here is order-free aggregation, so the digest is a pure function of the
# value multiset and the WHOLE SKETCH is oracle-checked bit-for-bit: 19
# unrolled compression levels on both engines, the canonical (hi, lo)
# rank walk, estimates AND exact percentiles AND the rank-error bound in
# one result. Mergeability (sum leaf histograms, compress once) is pinned
# by pytest across disjoint splits. Scale: level 0 is one partial-agg
# groupBy over the fact table; every later stage is bounded by the 2^19
# domain, not the corpus.
# --------------------------------------------------------------------------
_Q100_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


@register(
    "q100_qdigest_quantiles",
    SK.qdigest_oracle_sql(qs=_Q100_QS),
    "deterministic mergeable q-digest quantile sketch: 19 canonical "
    "bottom-up compression levels over whole-dollar order totals, "
    "(hi,lo)-rank-walk estimates vs exact percentiles vs the rank-error "
    "bound — the entire sketch oracle-checked bit-for-bit (q39's "
    "approx_percentile twin with reproducible internals); merge = sum "
    "leaf histograms, compress once (pytest-pinned)",
)
def q100_qdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    leaves = SK.qdigest_leaves(orders, F.floor("o_totalprice"))
    # the digest is tiny (<= ~levels * k rows) but its lineage is 19
    # unrolled groupBy levels; eager-localCheckpoint it ONCE so the walk,
    # the metadata row, and the quantile joins read a few-KB block instead
    # of re-running the compression per reference (the bpe_learn lesson)
    digest = SK.qdigest_nodes_from_leaves(leaves).localCheckpoint(eager=True)
    return SK.qdigest_report(digest, leaves, _Q100_QS)


# --------------------------------------------------------------------------
# c17 — dynamic partition pruning (round-6c): the optimization that makes
# star-schema joins survive a 100 TB partitioned lake — the selective dim
# filter prunes FACT PARTITIONS AT RUNTIME through the join, so the scan
# reads 3 of 84 month directories instead of all of them. The fact table
# is written month-partitioned, a month→quarter dim is derived and
# filtered to one quarter, and the broadcast join's pruning subquery
# (SubqueryAdaptiveBroadcast … dynamicpruning#N) is plan-asserted in
# tests/test_plans.py. The oracle recomputes from the raw table, so a
# pruning bug that DROPS a partition fails the hash, not just the plan
# shape. Money stays integer cents.
# --------------------------------------------------------------------------
_C17_QUARTER = "1996Q2"


@register(
    "c17_dynamic_partition_pruned_join",
    f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    WHERE strftime(l_shipdate, '%Y') || 'Q' ||
          CAST((CAST(strftime(l_shipdate, '%m') AS INT) - 1) // 3 + 1 AS VARCHAR)
            = '{_C17_QUARTER}'
    GROUP BY 1
    """,
    "dynamic partition pruning: month-partitioned fact lake table joined "
    "to a quarter-filtered month dim — the runtime pruning subquery scans "
    "3 of 84 partition directories (plan-asserted); oracle recomputes "
    "from the raw table so a dropped partition fails the hash",
)
def c17_dynamic_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    li = _t(spark, sf_dir, "lineitem")
    path = os.path.join(
        tempfile.gettempdir(), "spark_c17", uuid.uuid4().hex[:8]
    )
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    dim = (
        back.select("ship_month")
        .distinct()
        .withColumn(
            "quarter",
            F.concat(
                F.substring("ship_month", 1, 4),
                F.lit("Q"),
                (
                    (F.substring("ship_month", 6, 2).cast("int") - 1) / 3 + 1
                ).cast("int"),
            ),
        )
    )
    joined = back.join(
        F.broadcast(dim.filter(F.col("quarter") == _C17_QUARTER)), "ship_month"
    )
    return joined.groupBy(
        F.col("ship_month").cast("string").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# q101 — exact per-group median via value-census prefix sum (round-6d):
# the scalable exact-median recipe. A naive exact median sorts every row
# per group; this form first QUANTIZES to a bounded domain (whole dollars,
# like q100's q-digest) and partial-agg collapses the fact table to a
# (group, value, cnt) census, then one window over the census — bounded by
# distinct quantized values per group, not rows — walks the prefix sums to
# the two middle positions. median = (lo + hi) / 2 is an exact dyadic
# double, so no rounding is needed and DuckDB's interpolating median()
# (an INDEPENDENT implementation) must agree bit-for-bit. Complements
# q100: same census collapse, exact answer instead of a sketch.
# --------------------------------------------------------------------------
@register(
    "q101_exact_group_median",
    """
    WITH census AS (
      SELECT o_orderpriority AS priority,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS v
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           median(v) AS median_dollars,
           CAST(MIN(v) AS BIGINT) AS min_dollars,
           CAST(MAX(v) AS BIGINT) AS max_dollars
    FROM census GROUP BY priority
    """,
    "exact per-group median the scalable way: whole-dollar census "
    "(partial-agg collapse) + prefix-sum walk to the two middle positions "
    "over the bounded census — (lo+hi)/2 is exact dyadic, hash-matched "
    "against DuckDB's independent interpolating median()",
)
def q101_exact_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL totals filtered on BOTH sides: DuckDB's median() ignores NULLs
    # but COUNT(*)/the position walk would not — a NULL row must not
    # occupy a rank (review r6d finding)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    census = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.floor("o_totalprice").cast("bigint").alias("v"),
        )
        .groupBy("priority", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("priority").orderBy("v")
    wall = Window.partitionBy("priority")
    walk = census.select(
        "priority",
        "v",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
        F.min("v").over(wall).alias("min_v"),
        F.max("v").over(wall).alias("max_v"),
    ).withColumn("prev", F.col("cum") - F.col("cnt"))
    # positions of the two middles: lo = (n+1) div 2, hi = (n+2) div 2
    lo_pos = F.floor((F.col("n") + 1) / 2).cast("bigint")
    hi_pos = F.floor((F.col("n") + 2) / 2).cast("bigint")
    return walk.groupBy("priority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        (
            (
                F.max(
                    F.when(
                        (F.col("prev") < lo_pos) & (F.col("cum") >= lo_pos),
                        F.col("v"),
                    )
                )
                + F.max(
                    F.when(
                        (F.col("prev") < hi_pos) & (F.col("cum") >= hi_pos),
                        F.col("v"),
                    )
                )
            )
            / F.lit(2.0)
        ).alias("median_dollars"),
        F.max("min_v").cast("bigint").alias("min_dollars"),
        F.max("max_v").cast("bigint").alias("max_dollars"),
    )


# --------------------------------------------------------------------------
# t32 — Cavnar–Trenkle character-n-gram language identification (round-6d):
# the classic rank-profile langid algorithm (Cavnar & Trenkle 1994), the
# standard pre-neural language filter in web-corpus pipelines. Train: per
# labeled lang, char-trigram counts -> top-K profile ranked by (count DESC,
# gram ASC). Classify: each doc's own top-K trigram profile scored against
# every lang profile by out-of-place distance (|doc_rank - lang_rank|,
# missing gram -> K penalty); predicted lang = argmin with lang tie-break.
# Output is the actual x predicted confusion matrix. Scale: lang profiles
# are a bounded |langs| x K broadcast; the only corpus-sized stages are the
# trigram explode (map-side) and the per-doc top-K window (keyed by doc).
# --------------------------------------------------------------------------
_T32_K = 40


def _t32_oracle() -> str:
    return f"""
    WITH norm AS (
      SELECT doc_id, lang,
             regexp_replace(translate(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+', ' ', 'g') AS s
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT doc_id, lang, substr(s, g, 3) AS gram
      FROM (SELECT doc_id, lang, s,
                   UNNEST(generate_series(1, len(s) - 2)) AS g
            FROM norm WHERE len(s) >= 3)
    ), lang_cnt AS (
      SELECT lang, gram, COUNT(*) AS cnt FROM grams GROUP BY lang, gram
    ), lang_prof AS (
      SELECT lang, gram,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, gram) AS lrank
      FROM lang_cnt
      QUALIFY lrank <= {_T32_K}
    ), doc_cnt AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram
    ), doc_prof AS (
      SELECT doc_id, gram,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, gram) AS drank
      FROM doc_cnt
      QUALIFY drank <= {_T32_K}
    ), langs AS (
      -- candidates come from the SAME filtered set the profiles train on
      -- (not raw documents): a lang appearing only on null-text docs must
      -- not be a candidate, and a NULL lang never is (NULLS FIRST/LAST
      -- tie-break divergence) — review r6d findings
      SELECT DISTINCT lang AS cand FROM norm WHERE lang IS NOT NULL
    ), dist AS (
      SELECT d.doc_id, l.cand,
             SUM(COALESCE(ABS(d.drank - p.lrank), {_T32_K})) AS oop
      FROM doc_prof d
      CROSS JOIN langs l
      LEFT JOIN lang_prof p ON p.lang = l.cand AND p.gram = d.gram
      GROUP BY d.doc_id, l.cand
    ), pred AS (
      SELECT doc_id, cand AS predicted,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY oop, cand) AS rn
      FROM dist
      QUALIFY rn = 1
    )
    SELECT n.lang AS actual_lang, p.predicted AS predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM norm n JOIN pred p ON n.doc_id = p.doc_id
    GROUP BY 1, 2
    """


@register(
    "t32_langid_ngram_profile",
    _t32_oracle(),
    "Cavnar-Trenkle char-trigram language ID: per-lang top-40 rank "
    "profiles (bounded broadcast) scored against per-doc profiles by "
    "out-of-place distance, argmin prediction, actual x predicted "
    "confusion matrix — exact integer distances, deterministic ranks",
)
def t32_langid_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    norm = docs.select(
        "doc_id",
        "lang",
        F.regexp_replace(T.ascii_lower(T.ascii_trim("text")), r"\s+", " ").alias("s"),
    )
    grams = (
        norm.filter(F.length("s") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("s") - 2)).alias("g"),
            "s",
        )
        .select("doc_id", "lang", F.col("s").substr(F.col("g"), F.lit(3)).alias("gram"))
    )
    # Two independent explode scans, deliberately NOT materialized: the
    # doc-grain census is corpus-sized (docs x distinct grams), and an
    # eager localCheckpoint of it OOMs at the 100x corpus where two lazy
    # scans run fine — recompute beats persist for map-stage lineage
    # (measured; the d11/bloom checkpoint pattern applies to expensive
    # PYTHON fan-outs, not to codegen'd explodes).
    lang_prof = (
        grams.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "lrank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram"))
            ),
        )
        .filter(F.col("lrank") <= _T32_K)
        .select("lang", "gram", "lrank")
    )
    doc_prof = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "drank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
            ),
        )
        .filter(F.col("drank") <= _T32_K)
        .select("doc_id", "gram", "drank")
    )
    # same filtered candidate set as the oracle's langs CTE (see comment
    # there): derived from norm, NULL langs excluded
    langs = (
        norm.filter(F.col("lang").isNotNull())
        .select(F.col("lang").alias("cand"))
        .distinct()
    )
    dist = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(lang_prof.withColumnRenamed("lang", "cand")),
            ["cand", "gram"],
            "left",
        )
        .groupBy("doc_id", "cand")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("lrank")), F.lit(_T32_K)
                )
            ).alias("oop")
        )
    )
    pred = (
        dist.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("oop"), F.asc("cand"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("predicted"))
    )
    return (
        norm.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy(
            F.col("lang").alias("actual_lang"),
            F.col("predicted").alias("predicted_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# t33 — Heaps'-law vocabulary-growth fit (round-6d): V(n) ~ K * n^beta,
# the standard sublinear vocab-growth law (the planning number behind
# "how big must the tokenizer vocab be at 10x the corpus"). Docs are
# ordered by md5(doc_id) — a deterministic, engine-portable shuffle —
# and the cumulative (tokens_seen, vocab_size) curve is ln-ln regressed.
# "Cumulative distinct" is rewritten scalably: each token collapses to its
# FIRST-SEEN doc position (one groupBy), so the curve needs only running
# SUMs. The running sums themselves use a TWO-PHASE prefix sum — per-range
# bucket partials + broadcast bucket offsets + within-bucket windows — so
# no global single-task window appears anywhere (the 1000-executor form of
# q24/q93's running totals; the oracle uses the naive global window, so
# the hash match PROVES two-phase == global). regr_* moments are order-
# free; 4dp rounding absorbs summation ulp drift (the t25 idiom).
# --------------------------------------------------------------------------
_T33_BUCKETS = 64


def _t33_oracle() -> str:
    return """
    WITH docs AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ), ordered AS (
      SELECT doc_id, toks, len(toks) AS n_toks,
             ROW_NUMBER() OVER (ORDER BY k) AS doc_order
      FROM docs
    ), tok_pos AS (
      SELECT UNNEST(toks) AS token, doc_order FROM ordered
    ), first_seen AS (
      SELECT token, MIN(doc_order) AS fs FROM tok_pos GROUP BY token
    ), new_types AS (
      SELECT fs AS doc_order, COUNT(*) AS nt FROM first_seen GROUP BY fs
    ), series AS (
      SELECT o.doc_order, o.n_toks, COALESCE(n.nt, 0) AS nt
      FROM ordered o LEFT JOIN new_types n ON o.doc_order = n.doc_order
    ), curve AS (
      SELECT doc_order,
             SUM(n_toks) OVER (ORDER BY doc_order
                               ROWS UNBOUNDED PRECEDING) AS cum_toks,
             SUM(nt) OVER (ORDER BY doc_order
                           ROWS UNBOUNDED PRECEDING) AS cum_vocab
      FROM series
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(cum_toks) AS BIGINT) AS total_tokens,
           CAST(MAX(cum_vocab) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(ln(CAST(cum_vocab AS DOUBLE)),
                            ln(CAST(cum_toks AS DOUBLE))), 4) AS heaps_beta,
           ROUND(regr_intercept(ln(CAST(cum_vocab AS DOUBLE)),
                                ln(CAST(cum_toks AS DOUBLE))), 4) AS heaps_lnk,
           ROUND(regr_r2(ln(CAST(cum_vocab AS DOUBLE)),
                         ln(CAST(cum_toks AS DOUBLE))), 4) AS r2
    FROM curve WHERE cum_toks >= 1 AND cum_vocab >= 1
    """


@register(
    "t33_heaps_law_fit",
    _t33_oracle(),
    "Heaps'-law vocab-growth fit V(n) ~ K*n^beta over an md5-shuffled doc "
    "order: first-seen collapse turns cumulative-distinct into running "
    "sums, computed via a TWO-PHASE prefix sum (bucket partials + "
    "broadcast offsets — no global window task); ln-ln regr_* fit, 4dp",
)
def t33_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL doc_id filtered on BOTH sides: md5(NULL) is NULL, so the row
    # would silently drop at the Spark bucket join while DuckDB's
    # ROW_NUMBER keeps it ordered last (review r6d finding)
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("k"),
            F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
        )
    )
    # ---- global doc_order WITHOUT a global window: md5-prefix range
    # buckets give a deterministic partition of the md5 ORDER (hex sorts
    # lexicographically), ranks are computed within-bucket, and the
    # 256-row bucket-offset table is broadcast back.
    withb = docs.withColumn("b", F.substring("k", 1, 2))
    wrank = F.row_number().over(Window.partitionBy("b").orderBy("k"))
    ranked = withb.withColumn("wr", wrank).withColumn(
        "n_toks", F.size("toks").cast("bigint")
    )
    bstats = ranked.groupBy("b").agg(F.count(F.lit(1)).alias("bn"))
    woff = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bstats.select(
        "b", F.coalesce(F.sum("bn").over(woff), F.lit(0)).alias("off")
    )
    ordered = ranked.join(F.broadcast(boff), "b").select(
        "doc_id",
        "toks",
        "n_toks",
        (F.col("off") + F.col("wr")).cast("bigint").alias("doc_order"),
    )
    tok_pos = ordered.select(
        F.explode("toks").alias("token"), "doc_order"
    )
    first_seen = tok_pos.groupBy("token").agg(F.min("doc_order").alias("fs"))
    new_types = first_seen.groupBy(F.col("fs").alias("doc_order")).agg(
        F.count(F.lit(1)).alias("nt")
    )
    series = (
        ordered.select("doc_order", "n_toks")
        .join(new_types, "doc_order", "left")
        .withColumn("nt", F.coalesce(F.col("nt"), F.lit(0)).cast("bigint"))
    )
    # ---- two-phase prefix sums over doc_order (range buckets of 64):
    # per-bucket partial sums -> broadcast cumulative offsets -> within-
    # bucket running windows. Identical to the global window by
    # construction; the oracle computes the global form.
    series = series.withColumn(
        "pb", F.floor((F.col("doc_order") - 1) / _T33_BUCKETS).cast("bigint")
    )
    parts = series.groupBy("pb").agg(
        F.sum("n_toks").alias("pt"), F.sum("nt").alias("pv")
    )
    wpoff = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    poffs = parts.select(
        "pb",
        F.coalesce(F.sum("pt").over(wpoff), F.lit(0)).alias("off_toks"),
        F.coalesce(F.sum("pv").over(wpoff), F.lit(0)).alias("off_vocab"),
    )
    wwin = Window.partitionBy("pb").orderBy("doc_order").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = series.join(F.broadcast(poffs), "pb").select(
        "doc_order",
        (F.col("off_toks") + F.sum("n_toks").over(wwin)).alias("cum_toks"),
        (F.col("off_vocab") + F.sum("nt").over(wwin)).alias("cum_vocab"),
    )
    pts = curve.filter((F.col("cum_toks") >= 1) & (F.col("cum_vocab") >= 1))
    lnv = F.log(F.col("cum_vocab").cast("double"))
    lnt = F.log(F.col("cum_toks").cast("double"))
    return pts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("cum_toks").cast("bigint").alias("total_tokens"),
        F.max("cum_vocab").cast("bigint").alias("vocab_size"),
        F.round(F.regr_slope(lnv, lnt), 4).alias("heaps_beta"),
        F.round(F.regr_intercept(lnv, lnt), 4).alias("heaps_lnk"),
        F.round(F.regr_r2(lnv, lnt), 4).alias("r2"),
    )


# --------------------------------------------------------------------------
# t34 — pairwise Jensen-Shannon divergence between language subcorpora
# (round-6d): the corpus-mixture diagnostic — how far apart are the
# unigram distributions of each pair of langs (0 = identical, ln 2 =
# disjoint support). Every KL term's ln() argument is the exact integer
# ratio 2*c_a*N_b / (c_a*N_b + c_b*N_a), so both engines feed ln bit-
# identical doubles (the t15/t20 integer-products discipline); each
# token's contribution is FLOOR-quantized to integer picounits and summed
# exactly, so summation order can't move the hash. Scale: count tables
# are (lang x vocab)-bounded; the pair scaffold is |langs|^2/2 rows cross
# the vocab — never corpus rows. NOTE: the integer products c*N must stay
# under 2^53 for double exactness; at larger scales compute the ratio in
# DECIMAL(38,0) first (same plan shape).
# --------------------------------------------------------------------------
def _t34_oracle() -> str:
    return """
    WITH tok AS (
      SELECT lang, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents WHERE text IS NOT NULL
    ), cnt AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ), tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY lang
    ), vocab AS (
      SELECT DISTINCT token FROM cnt
    ), pairs AS (
      SELECT a.lang AS lang_a, a.n AS na, b.lang AS lang_b, b.n AS nb
      FROM tot a JOIN tot b ON a.lang < b.lang
    ), scaffold AS (
      SELECT p.lang_a, p.lang_b, p.na, p.nb, v.token,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
      FROM pairs p
      CROSS JOIN vocab v
      LEFT JOIN cnt ca ON ca.lang = p.lang_a AND ca.token = v.token
      LEFT JOIN cnt cb ON cb.lang = p.lang_b AND cb.token = v.token
      WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0
    ), terms AS (
      SELECT lang_a, lang_b,
             CAST(FLOOR(1e12 * 0.5 * (
               (CASE WHEN ca > 0 THEN
                  (CAST(ca AS DOUBLE) / na) *
                  ln((2.0 * ca * nb) / (CAST(ca * nb + cb * na AS DOUBLE)))
                ELSE 0.0 END) +
               (CASE WHEN cb > 0 THEN
                  (CAST(cb AS DOUBLE) / nb) *
                  ln((2.0 * cb * na) / (CAST(ca * nb + cb * na AS DOUBLE)))
                ELSE 0.0 END))) AS BIGINT) AS q
      FROM scaffold
    )
    SELECT lang_a, lang_b,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(q) AS BIGINT) AS jsd_picounits,
           ROUND(SUM(q) / 1e12, 6) AS jsd_nats
    FROM terms GROUP BY lang_a, lang_b
    """


@register(
    "t34_lang_jsd_matrix",
    _t34_oracle(),
    "pairwise Jensen-Shannon divergence between language subcorpora: "
    "unigram KL terms with exact-integer-ratio ln() inputs, FLOOR-"
    "quantized to picounits and summed exactly (order-free) — the "
    "corpus-mixture divergence diagnostic, vocab-bounded tables only",
)
def t34_lang_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "lang",
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("token"),
        )
    )
    cnt = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n"))
    vocab = cnt.select("token").distinct()
    a = tot.select(
        F.col("lang").alias("lang_a"), F.col("n").alias("na")
    )
    b = tot.select(
        F.col("lang").alias("lang_b"), F.col("n").alias("nb")
    )
    pairs = a.join(b, F.col("lang_a") < F.col("lang_b"))
    ca = cnt.select(
        F.col("lang").alias("lang_a"), "token", F.col("c").alias("ca")
    )
    cb = cnt.select(
        F.col("lang").alias("lang_b"), "token", F.col("c").alias("cb")
    )
    scaffold = (
        pairs.crossJoin(F.broadcast(vocab))
        .join(F.broadcast(ca), ["lang_a", "token"], "left")
        .join(F.broadcast(cb), ["lang_b", "token"], "left")
        .withColumn("ca", F.coalesce(F.col("ca"), F.lit(0)))
        .withColumn("cb", F.coalesce(F.col("cb"), F.lit(0)))
        .filter(F.col("ca") + F.col("cb") > 0)
    )
    denom = (F.col("ca") * F.col("nb") + F.col("cb") * F.col("na")).cast(
        "double"
    )
    term_a = F.when(
        F.col("ca") > 0,
        (F.col("ca").cast("double") / F.col("na"))
        * F.log((F.lit(2.0) * F.col("ca") * F.col("nb")) / denom),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("cb") > 0,
        (F.col("cb").cast("double") / F.col("nb"))
        * F.log((F.lit(2.0) * F.col("cb") * F.col("na")) / denom),
    ).otherwise(F.lit(0.0))
    q = F.floor(F.lit(1e12) * F.lit(0.5) * (term_a + term_b)).cast("bigint")
    return (
        scaffold.withColumn("q", q)
        .groupBy("lang_a", "lang_b")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("q").cast("bigint").alias("jsd_picounits"),
            F.round(F.sum("q") / F.lit(1e12), 6).alias("jsd_nats"),
        )
    )


# --------------------------------------------------------------------------
# m19 — indexed-color (palette) PNG decode (round-6d): the third real PNG
# pixel layout after grayscale (m05) and the RGB path — color type 3 with
# a PLTE chunk, the layout icons / charts / screenshots use. The codec
# encodes genuine palette PNGs (CRC'd chunks, scanline filters cycling
# over index BYTES) and the decoder unfilters then expands indices through
# the palette table; per-image per-channel pixel sums must equal the
# closed-form generator (palette entry j = (17j, 29j, 43j) mod 256, pixel
# k's index = (id+3k) mod 16). One wrong unfiltered index byte anywhere
# moves a channel sum and fails the hash. Blobs die inside the Arrow map
# stage; 7 scalars per image cross the shuffle.
# --------------------------------------------------------------------------
@register(
    "m19_palette_png_channel_sums",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height
      FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
    ), px AS (
      SELECT id, width, height,
             UNNEST(generate_series(0, width * height - 1)) AS k
      FROM dims
    )
    SELECT id,
           CAST(MAX(width) AS INT) AS width,
           CAST(MAX(height) AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(SUM((id + 3 * k) % 16 * 17 % 256) AS BIGINT) AS sum_r,
           CAST(SUM((id + 3 * k) % 16 * 29 % 256) AS BIGINT) AS sum_g,
           CAST(SUM((id + 3 * k) % 16 * 43 % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY id
    """,
    "REAL indexed-color PNG decode (color type 3 + PLTE): palette PNGs "
    "round-trip the codec, per-image per-channel sums hash-checked against "
    "the closed-form generator — the icons/charts layout, closing the "
    "third PNG pixel path",
)
def m19_palette_png_channel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-negative ids only, on BOTH sides: the generator's Python % is
    # always non-negative while DuckDB's % keeps the dividend's sign
    # (review r6d finding; same id contract as the m12 generator family)
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    images = MM.synthesize_palette_png_images(docs, "doc_id")
    return MM.png_channel_sums(images, "id", "data")


# --------------------------------------------------------------------------
# e20 — clustering-inertia elbow sweep (round-6d): mean cosine distortion
# (1 - best-centroid cosine) as a function of k over fixed deterministic
# quantizers (k = 2/4/8/16) — the k-selection frontier for IVF list counts
# and k-means clustering in ONE oracle-checked query, like e19's probe
# sweep is for n_probe. Per-vector distortions are FLOOR-quantized to
# nano-units and summed exactly (order-free); the mean is one division of
# exact integers on both engines. Ties in best-centroid score don't matter
# — only MAX(score) is consumed. Scale: each k's centroid table is a
# bounded broadcast; one corpus scan per k, no pairwise anything.
# --------------------------------------------------------------------------
_E20_KS = (2, 4, 8, 16)


def _e20_oracle() -> str:
    selects = []
    for k in _E20_KS:
        cents = ", ".join(
            f"([{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
            for c in SIM._hyperplanes(dim=64, n_planes=k, seed=11)
        )
        selects.append(f"""
    SELECT CAST({k} AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(q) AS BIGINT) AS inertia_nano,
           CAST(SUM(q) AS DOUBLE) / 1e9 / COUNT(*) AS mean_distortion
    FROM (
      SELECT vec_id,
             CAST(FLOOR(1e9 * (1.0 - MAX(
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c)
             ))) AS BIGINT) AS q
      FROM embeddings e CROSS JOIN (VALUES {cents}) c(c)
      GROUP BY vec_id
    )""")
    return " UNION ALL ".join(selects)


@register(
    "e20_inertia_elbow_sweep",
    _e20_oracle(),
    "clustering-inertia elbow sweep: mean cosine distortion vs k over "
    "fixed quantizers (k=2/4/8/16) — the k-selection frontier as one "
    "oracle-checked query; per-vector distortions nano-quantized and "
    "summed exactly, bounded centroid broadcasts only",
)
def e20_inertia_elbow_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    out = None
    for k in _E20_KS:
        cents = SIM._hyperplanes(dim=64, n_planes=k, seed=11)
        cent_df = emb.sparkSession.createDataFrame(
            [(c,) for c in cents], "c array<double>"
        )
        best = (
            emb.crossJoin(F.broadcast(cent_df))
            .withColumn("score", SIM.cosine(F.col("e"), F.col("c")))
            .groupBy("vec_id")
            .agg(F.max("score").alias("best"))
            .select(
                F.floor(F.lit(1e9) * (F.lit(1.0) - F.col("best")))
                .cast("bigint")
                .alias("q")
            )
        )
        row = best.agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("q").cast("bigint").alias("inertia_nano"),
        ).select(
            F.lit(k).cast("int").alias("k"),
            "n_vectors",
            "inertia_nano",
            (F.col("inertia_nano").cast("double") / F.lit(1e9) / F.col("n_vectors"))
            .alias("mean_distortion"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# --------------------------------------------------------------------------
# g09 — duplicate-cluster size census (round-6d): the "blast radius" audit
# run BEFORE committing to a dedup pass — how much of the corpus sits in
# near-dup clusters, at what cluster sizes, and how big is the largest
# cluster (the skew that decides banding caps — see d17). Same scale-safe
# LSH edge set as d18/g07 (equi-join on hyperplane bucket, no all-pairs),
# components via min-label propagation, then a two-level census: cluster
# sizes, then the size HISTOGRAM (n_clusters and n_docs per size) — both
# bounded by the cluster-size vocabulary, tiny at any corpus scale.
# Singleton docs (no near-dup edges) appear as size-1 clusters, so n_docs
# sums to the corpus and the "fraction in dup clusters" falls out exactly.
# --------------------------------------------------------------------------
def _g09_oracle() -> str:
    lsh = SIM.bucketed_neardup_oracle_sql(
        threshold=_D18_THRESHOLD, n_planes=_D18_ORACLE_PLANES, dim=64
    )
    return f"""
    WITH RECURSIVE lsh_pairs AS ({lsh}),
    edges AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
              UNION SELECT id_b AS a, id_a AS b FROM lsh_pairs),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    labeled AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                FROM reach GROUP BY src),
    sizes AS (SELECT cluster_id, COUNT(*) AS sz FROM labeled
              GROUP BY cluster_id)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """


@register(
    "g09_dup_cluster_census",
    _g09_oracle(),
    "duplicate-cluster size census over the LSH near-dup graph (plane "
    "count sized from the corpus via e17's rule): cluster sizes -> size "
    "histogram (n_clusters, n_docs per size) — the dedup blast-radius "
    "audit that sizes banding caps before any 100 TB pass; singletons "
    "included so n_docs sums to the corpus",
)
def g09_dup_cluster_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _d18_edges(spark, sf_dir)
    comp = DD.connected_components(pairs, "id_a", "id_b")
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    labeled = docs.join(
        comp, docs["doc_id"] == comp["node"], "left"
    ).select("doc_id", F.coalesce("label", "doc_id").alias("cluster_id"))
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.groupBy(F.col("sz").cast("bigint").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# dq17 — schema/profile drift audit (round-6d): the post-ingest check that
# an upstream producer changed SHAPE, not just volume (dq04 catches
# volume) — per column, row/null/distinct counts in two adjacent periods
# plus the distinct-cardinality ratio. Columns are MELTED into (column,
# canonical string value) rows so one groupBy profiles every column in a
# single pass; doubles are quantized to integer micro-units BEFORE the
# string cast (float->string formatting is not an engine-portable
# canonicalization; integers are). All counts exact; the drift ratio is
# one division of exact integers. Scale: 2 scans (one per period side of
# the melt) x partial-agg; output bounded by the column list.
# --------------------------------------------------------------------------
_DQ17_SPLIT = "2024-01-16"


@register(
    "dq17_profile_drift_audit",
    f"""
    WITH melted AS (
      SELECT CASE WHEN ts < TIMESTAMP '{_DQ17_SPLIT}' THEN 'a' ELSE 'b' END
               AS period, col, val
      FROM (
        SELECT ts, 'user_id' AS col, CAST(user_id AS VARCHAR) AS val FROM events
        UNION ALL
        SELECT ts, 'event_type', event_type FROM events
        UNION ALL
        SELECT ts, 'value',
               CAST(CAST(FLOOR(value * 1e6) AS BIGINT) AS VARCHAR) FROM events
        UNION ALL
        SELECT ts, 'props', props FROM events
      ) WHERE ts IS NOT NULL
    ), prof AS (
      SELECT period, col,
             COUNT(*) AS n_rows,
             COUNT(*) - COUNT(val) AS n_nulls,
             COUNT(DISTINCT val) AS n_distinct
      FROM melted GROUP BY period, col
    )
    SELECT a.col AS column_name,
           CAST(a.n_rows AS BIGINT) AS rows_a,
           CAST(a.n_nulls AS BIGINT) AS nulls_a,
           CAST(a.n_distinct AS BIGINT) AS distinct_a,
           CAST(b.n_rows AS BIGINT) AS rows_b,
           CAST(b.n_nulls AS BIGINT) AS nulls_b,
           CAST(b.n_distinct AS BIGINT) AS distinct_b,
           CAST(b.n_distinct AS DOUBLE) / a.n_distinct AS distinct_ratio
    FROM (SELECT * FROM prof WHERE period = 'a') a
    JOIN (SELECT * FROM prof WHERE period = 'b') b ON a.col = b.col
    """,
    "schema/profile drift audit: per-column row/null/distinct counts in "
    "two adjacent periods via a single melted groupBy pass — doubles "
    "micro-quantized before the string canonicalization; exact counts, "
    "one integer-ratio division",
)
def dq17_profile_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    parts = [
        ev.select("ts", F.lit("user_id").alias("col"),
                  F.col("user_id").cast("string").alias("val")),
        ev.select("ts", F.lit("event_type").alias("col"),
                  F.col("event_type").alias("val")),
        ev.select("ts", F.lit("value").alias("col"),
                  F.floor(F.col("value") * 1e6).cast("bigint")
                  .cast("string").alias("val")),
        ev.select("ts", F.lit("props").alias("col"), F.col("props").alias("val")),
    ]
    melted = parts[0]
    for p in parts[1:]:
        melted = melted.unionByName(p)
    melted = melted.select(
        F.when(F.col("ts") < F.lit(_DQ17_SPLIT).cast("timestamp"), "a")
        .otherwise("b")
        .alias("period"),
        "col",
        "val",
    )
    prof = melted.groupBy("period", "col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_nulls"),
        F.countDistinct("val").alias("n_distinct"),
    )
    a = prof.filter(F.col("period") == "a").drop("period")
    b = prof.filter(F.col("period") == "b").drop("period")
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.col") == F.col("b.col"))
        .select(
            F.col("a.col").alias("column_name"),
            F.col("a.n_rows").cast("bigint").alias("rows_a"),
            F.col("a.n_nulls").cast("bigint").alias("nulls_a"),
            F.col("a.n_distinct").cast("bigint").alias("distinct_a"),
            F.col("b.n_rows").cast("bigint").alias("rows_b"),
            F.col("b.n_nulls").cast("bigint").alias("nulls_b"),
            F.col("b.n_distinct").cast("bigint").alias("distinct_b"),
            (
                F.col("b.n_distinct").cast("double") / F.col("a.n_distinct")
            ).alias("distinct_ratio"),
        )
    )


# --------------------------------------------------------------------------
# e21 — product-quantization codebook TRAINING (round 7): the missing
# first stage of the faiss recipe whose encode/search stages s07/s08
# already exercise with a fixed deterministic codebook. Per SUBSPACE
# (4 slices of 16 dims), k=4 centroids learned by 2 Lloyd iterations from
# a fixed LCG init — e07's unrolled-loop pattern, but in PQ's metric
# (squared L2, not cosine) and sharded by subspace: one broadcast join of
# the (subspace × k)-row centroid table + one shuffle agg per round, so a
# 100 TB corpus trains all subspace codebooks in the same two passes.
# Distances are FLOOR-quantized per dimension to integer nano-units and
# summed as BIGINTs (order-free, engine-portable — the e20 trick), so
# assignment argmins and the reported total distortion are bit-exact.
# Centroid means are exact too: components FLOOR-quantize to integer
# MICRO-units before the sum (integer addition is order-free, unlike the
# e03/e07 6dp-rounded double mean, which sits one ulp from a .5 boundary
# away from a cross-engine flip), then one deterministic division pair
# (/count, /1e6) recovers the double centroid bit-identically.
# --------------------------------------------------------------------------
_E21_SUBSPACES = 4
_E21_SUBDIM = 16
_E21_K = 4
_E21_ITERS = 2
_E21_INIT = {
    s: SIM._hyperplanes(dim=_E21_SUBDIM, n_planes=_E21_K, seed=211 + s)
    for s in range(_E21_SUBSPACES)
}


def _e21_oracle() -> str:
    init_vals = " UNION ALL ".join(
        f"SELECT {s} AS sub_id, {c} AS cand, {_E21_INIT[s][c]}::DOUBLE[] AS centroid"
        for s in range(_E21_SUBSPACES)
        for c in range(_E21_K)
    )
    d = _E21_SUBDIM
    ctes = [
        f"""sub AS (
      SELECT vec_id, g.s AS sub_id,
             CAST(embedding AS DOUBLE[])[g.s * {d} + 1 : g.s * {d} + {d}] AS sv
      FROM embeddings, generate_series(0, {_E21_SUBSPACES - 1}) g(s))""",
        f"cent0 AS ({init_vals})",
    ]
    for it in range(1, _E21_ITERS + 1):
        prev = f"cent{it - 1}"
        ctes.append(f"""s{it} AS (
      SELECT sub.vec_id, sub.sub_id, c.cand, sub.sv,
             (SELECT CAST(SUM(CAST(FLOOR((sub.sv[i] - c.centroid[i]) *
                                         (sub.sv[i] - c.centroid[i]) * 1e9)
                              AS BIGINT)) AS BIGINT)
              FROM generate_series(1, {d}) t(i)) AS dist
      FROM sub JOIN {prev} c ON sub.sub_id = c.sub_id)""")
        ctes.append(f"""a{it} AS (
      SELECT vec_id, sub_id, cand, dist, sv FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                     ORDER BY dist, cand) AS rnk
        FROM s{it}) WHERE rnk = 1)""")
        if it < _E21_ITERS:
            ctes.append(f"""ex{it} AS (
      SELECT sub_id, cand, gs AS pos, sv[gs] AS val
      FROM a{it}, generate_series(1, {d}) g(gs))""")
            ctes.append(f"""cm{it} AS (
      SELECT sub_id, cand, pos,
             CAST(SUM(CAST(FLOOR(val * 1e6) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 1e6 AS val
      FROM ex{it} GROUP BY sub_id, cand, pos)""")
            ctes.append(f"""cent{it} AS (
      SELECT sub_id, cand, list(val ORDER BY pos) AS centroid
      FROM cm{it} GROUP BY sub_id, cand)""")
    last = f"a{_E21_ITERS}"
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT CAST(sub_id AS INT) AS subspace, CAST(cand AS INT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(dist) AS BIGINT) AS total_dist_nano
    FROM {last} GROUP BY sub_id, cand
    """
    )


@register(
    "e21_pq_codebook_training",
    _e21_oracle(),
    "PQ codebook training: per-subspace k-means (2 Lloyd iterations, "
    "fixed LCG init, squared-L2 in exact integer nano-units) — the "
    "train stage in front of s07/s08's encode/search; one broadcast "
    "centroid join + one shuffle agg per round covers ALL subspaces",
)
def e21_pq_codebook_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _E21_SUBDIM
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sub = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub_id"),
                        F.slice("e", s * d + 1, d).alias("sv"),
                    )
                    for s in range(_E21_SUBSPACES)
                ]
            )
        ).alias("x"),
    ).select("vec_id", "x.sub_id", "x.sv")

    def dist_nano(sv, cent):
        diffs = F.zip_with(
            sv, cent, lambda x, y: F.floor((x - y) * (x - y) * F.lit(1e9))
        )
        return F.aggregate(
            diffs, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        )

    cent = spark.createDataFrame(
        [
            (s, c, _E21_INIT[s][c])
            for s in range(_E21_SUBSPACES)
            for c in range(_E21_K)
        ],
        "sub_id int, cand int, centroid array<double>",
    )
    assigned = None
    for it in range(1, _E21_ITERS + 1):
        scored = sub.join(F.broadcast(cent), "sub_id").withColumn(
            "dist", dist_nano(F.col("sv"), F.col("centroid"))
        )
        assigned = (
            scored.groupBy("vec_id", "sub_id")
            .agg(
                F.min_by(
                    F.struct("cand", "dist"), F.struct("dist", "cand")
                ).alias("b"),
                F.first("sv").alias("sv"),
            )
            .select(
                "vec_id",
                "sub_id",
                F.col("b.cand").alias("cand"),
                F.col("b.dist").alias("dist"),
                "sv",
            )
        )
        if it < _E21_ITERS:
            ex = assigned.select(
                "sub_id", "cand", F.posexplode("sv").alias("pos", "val")
            )
            cm = ex.groupBy("sub_id", "cand", "pos").agg(
                (
                    F.sum(F.floor(F.col("val") * F.lit(1e6)).cast("bigint"))
                    .cast("double")
                    / F.count(F.lit(1))
                    / F.lit(1e6)
                ).alias("val")
            )
            cent = cm.groupBy("sub_id", "cand").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("centroid")
            )
    return assigned.groupBy(
        F.col("sub_id").cast("int").alias("subspace"),
        F.col("cand").cast("int").alias("cluster_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("dist").cast("bigint").alias("total_dist_nano"),
    )


# --------------------------------------------------------------------------
# s11 — reciprocal-rank-fusion hybrid retrieval (VERDICT r07 #5): fuse the
# sparse (t30 BM25) and dense (s01-style cosine) rankings the way every
# production RAG pipeline does (Cormack/Clarke/Buettcher SIGIR'09):
# RRF(d) = Σ_rankings 1/(K + rank_d), K = 60. Both arms reuse the repo's
# bit-exact building blocks (the one BM25 definition via
# T.bm25_scores/bm25_scored_cte_sql; the fold-order-matched cosine), ranks
# are exact integers (row_number with id tiebreaks), and the fused score is
# a fixed-order sum of two integer-reciprocal doubles — bit-identical
# across engines — quantized to floor(rrf·1e9) so the hash compare never
# meets a decimal .5 boundary.
#
# Scale: each arm is the already-audited retrieval plan (BM25: two corpus
# scans + a 1-row broadcast; dense: one corpus scan against a broadcast
# query vector — swap in s02/s08's LSH/IVFPQ arm for ad-hoc query sets);
# the fusion itself touches only 2×POOL ranked rows — a full-outer join and
# a top-k on a bounded table, independent of corpus size. The doc↔vector
# identity contract is positional: embeddings.vec_id is taken as
# documents.doc_id (both fixture tables enumerate the same corpus ids).
# --------------------------------------------------------------------------
_S11_TERMS = ("spark", "merge", "window")  # t30's fixed query
_S11_QVEC = 0  # dense query = this vec_id's embedding
_S11_POOL = 20  # per-arm candidate pool fed to the fusion
_S11_K = 10  # fused output size
_S11_RRFK = 60  # the standard RRF constant


@register(
    "s11_rrf_hybrid_retrieval",
    f"""
    WITH {T.bm25_scored_cte_sql(terms=_S11_TERMS)},
    sr AS (
      SELECT id, s_rnk FROM (
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, id) AS INT) AS s_rnk
        FROM scored WHERE bm25 > 0
      ) WHERE s_rnk <= {_S11_POOL}
    ), q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = {_S11_QVEC}
    ), dense AS (
      SELECT vec_id AS id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS sim
      FROM embeddings CROSS JOIN q WHERE vec_id <> {_S11_QVEC}
    ), dr AS (
      SELECT id, d_rnk FROM (
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, id) AS INT) AS d_rnk
        FROM dense
      ) WHERE d_rnk <= {_S11_POOL}
    ), fused AS (
      SELECT COALESCE(sr.id, dr.id) AS id, sr.s_rnk, dr.d_rnk,
             COALESCE(CAST(1.0 AS DOUBLE) / ({_S11_RRFK} + sr.s_rnk),
                      CAST(0.0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE) / ({_S11_RRFK} + dr.d_rnk),
                        CAST(0.0 AS DOUBLE)) AS rrf
      FROM sr FULL OUTER JOIN dr ON sr.id = dr.id
    )
    SELECT id, rrf_n9, s_rnk, d_rnk, rnk FROM (
      SELECT id, CAST(FLOOR(rrf * 1e9) AS BIGINT) AS rrf_n9, s_rnk, d_rnk,
             CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS INT) AS rnk
      FROM fused
    ) WHERE rnk <= {_S11_K}
    """,
    "reciprocal-rank-fusion hybrid retrieval: BM25 arm + dense-cosine arm "
    "fused by sum of 1/(60+rank) — bounded-by-pool fusion join, exact "
    "integer ranks, floor-quantized score",
)
def s11_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    sw = Window.orderBy(F.desc("bm25"), F.asc("id"))
    sr = (
        T.bm25_scores(docs, "doc_id", "text", terms=_S11_TERMS)
        .select("id", F.row_number().over(sw).cast("int").alias("s_rnk"))
        .filter(F.col("s_rnk") <= _S11_POOL)
    )

    qv = emb.filter(F.col("vec_id") == _S11_QVEC).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    dense = (
        emb.filter(F.col("vec_id") != _S11_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            SIM.cosine(F.col("embedding").cast("array<double>"), F.col("qv")).alias(
                "sim"
            ),
        )
    )
    dw = Window.orderBy(F.desc("sim"), F.asc("id"))
    dr = dense.select(
        "id", F.row_number().over(dw).cast("int").alias("d_rnk")
    ).filter(F.col("d_rnk") <= _S11_POOL)

    fused = (
        sr.withColumnRenamed("id", "s_id")
        .join(dr.withColumnRenamed("id", "d_id"),
              F.col("s_id") == F.col("d_id"), "full_outer")
        .select(
            F.coalesce(F.col("s_id"), F.col("d_id")).alias("id"),
            "s_rnk",
            "d_rnk",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_S11_RRFK) + F.col("s_rnk")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_S11_RRFK) + F.col("d_rnk")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    fw = Window.orderBy(F.desc("rrf"), F.asc("id"))
    return (
        fused.select(
            "id",
            F.floor(F.col("rrf") * F.lit(1e9)).cast("bigint").alias("rrf_n9"),
            "s_rnk",
            "d_rnk",
            F.row_number().over(fw).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= _S11_K)
    )


# --------------------------------------------------------------------------
# t35 — hashed-n-gram quality-classifier inference (VERDICT r07 #6): the
# fastText-style linear scorer every production quality filter runs
# (Joulin et al. 2016): score(doc) = Σ_grams w[h(gram) mod B] over word
# unigrams+bigrams, keep iff score ≥ 0 (σ is monotone, so thresholding the
# raw sum IS thresholding the sigmoid — and keeps the oracle exact-integer).
# The weight table is deterministic and engine-portable: bucket = the t28
# md5 trick (hash_bucket/bucket_sql, B=256), weight = a fixed integer mix
# ((bucket·2654435761) mod 2001 − 1000 ∈ [-1000,1000]) computed INLINE from
# the bucket — no weight table to join, no floats anywhere until nothing.
#
# Scale: shuffle-free like t17 — tokenize/gram/hash/score are all
# scan-stage expressions (per-doc HOF over the token list), and the only
# exchange is the final (source, keep) census partial-agg over a bounded
# key space. Linear in corpus bytes, map-parallel at 100 TB. A learned
# (non-toy) model drops in by replacing the weight expression with a
# broadcast bucket→weight table join — same plan shape.
# --------------------------------------------------------------------------
_T35_SALT = "t35-qc-v1"
_T35_MIX = 2654435761  # Knuth multiplicative constant
_T35_RANGE = 2001  # weights in [-1000, 1000]


def _t35_weight_spark(gram):
    """Integer weight for one gram Column (HOF-lambda safe)."""
    b = SAMP.hash_bucket(gram, _T35_SALT)
    return (b.cast("bigint") * F.lit(_T35_MIX)) % F.lit(_T35_RANGE) - F.lit(1000)


def _t35_weight_sql(gram_expr: str) -> str:
    return (
        f"((CAST({SAMP.bucket_sql(gram_expr, _T35_SALT)} AS BIGINT)"
        f" * {_T35_MIX}) % {_T35_RANGE}) - 1000"
    )


@register(
    "t35_hashed_ngram_quality",
    f"""
    WITH base AS (
      SELECT source,
             string_split_regex(trim(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \\t\\n\\x0b\\f\\r]+') AS t
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT source,
             t || [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))] AS g
      FROM base
    ), scored AS (
      SELECT source,
             len(g) AS n_grams,
             CAST(list_aggregate([{_t35_weight_sql('x')} FOR x IN g], 'sum')
                  AS BIGINT) AS score_units
      FROM grams
    )
    SELECT source,
           CASE WHEN score_units >= 0 THEN 1 ELSE 0 END AS keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_units) AS BIGINT) AS sum_score_units,
           CAST(SUM(n_grams) AS BIGINT) AS sum_grams
    FROM scored GROUP BY source, keep
    """,
    "fastText-style hashed unigram+bigram linear quality scorer with a "
    "deterministic md5-bucket weight table — shuffle-free scan-stage "
    "scoring, exact-integer keep/drop census per source",
)
def t35_hashed_ngram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split(T.ascii_trim(T.ascii_lower(F.col("text"))), r"\s+")
    n1 = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(toks, bigrams)
    score = F.aggregate(
        F.transform(grams, _t35_weight_spark),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + w,
    )
    scored = docs.select(
        "source",
        F.size(grams).cast("bigint").alias("n_grams"),
        score.alias("score_units"),
    )
    return scored.groupBy(
        "source",
        F.when(F.col("score_units") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_units").alias("sum_score_units"),
        F.sum("n_grams").alias("sum_grams"),
    )


# --------------------------------------------------------------------------
# s12 — IVFPQ search + EXACT refine (faiss IndexRefineFlat): the last
# stage of the billion-scale recipe the repo already trains (e21), encodes
# (s07), and searches (s08). The PQ index returns a candidate pool of
# R >> k approximately-ranked ids; the refine stage re-scores ONLY those
# Q×R pairs with exact full-precision cosine and emits the exact top-k.
# Output carries both ranks (adc_rnk vs rnk) so the re-ordering the
# refine performs is itself visible and oracle-checked.
#
# Scale: the candidate pool (Q×R rows) broadcasts into two equi-joins
# against the vector table — refine cost is O(Q·R) full-vector fetches +
# exact distances, independent of corpus size; the corpus is only ever
# touched through s08's prune-lists/scan-codes plan. This is exactly how
# faiss composes IndexIVFPQ + IndexRefineFlat.
# --------------------------------------------------------------------------
_S12_CENTROIDS = SIM._hyperplanes(dim=64, n_planes=16, seed=7)  # == s08's
_S12_R = 10  # PQ candidate pool per query
_S12_K = 5  # exact top-k after refine


@register(
    "s12_ann_ivfpq_refine_topk",
    f"""
    WITH {SIM.ivfpq_scores_cte_sql(_S12_CENTROIDS, m_sub=8, k_codes=16,
                                   subdim=8, n_probe=4,
                                   query_pred="vec_id < 10")},
    cand AS (
      SELECT query_id, neighbor_id, arnk FROM (
        SELECT query_id, neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adc_dist ASC, neighbor_id ASC)
                    AS INT) AS arnk
        FROM scores) WHERE arnk <= {_S12_R}),
    refined AS (
      SELECT c.query_id, c.neighbor_id, c.arnk,
             list_cosine_similarity(q.v, n.v) AS sim
      FROM cand c
      JOIN v q ON q.vec_id = c.query_id
      JOIN v n ON n.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim,
           arnk AS adc_rnk, rnk
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id)
                     AS INT) AS rnk
      FROM refined) WHERE rnk <= {_S12_K}
    """,
    "IVFPQ search + exact refine (faiss IndexRefineFlat): PQ top-R "
    "candidate pool re-scored with exact cosine, both ranks emitted — "
    "refine cost O(Q*R), corpus touched only through the code scan",
)
def s12_ann_ivfpq_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cands = SIM.ivfpq_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        _S12_CENTROIDS,
        SIM.pq_codebook(m_sub=8, k_codes=16, subdim=8),
        k=_S12_R,
        n_probe=4,
    ).select("query_id", "neighbor_id", F.col("rnk").alias("adc_rnk"))
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    refined = (
        qv.join(F.broadcast(cands), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_rnk",
            SIM.cosine(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        refined.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _S12_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("sim"),
            "adc_rnk",
            "rnk",
        )
    )


# --------------------------------------------------------------------------
# s13 — label-filtered vector search (round 8): the "filtered ANN" shape
# every production vector store serves — a metadata predicate restricts the
# candidate set BEFORE the similarity ranking (tenant isolation, language
# filter, time-range filter). Expressed Spark-first as an equi-join on the
# filter key instead of a post-filtered cross join: each query scores ONLY
# its own label's partition of the corpus, so the work is
# sum_q |corpus_label(q)| rather than Q x N. At 100 TB the corpus is
# hash-partitioned (or bucketed) by the tenant key, the tiny query table
# broadcasts, and the scan prunes to the touched labels — the same plan
# this registers. Exact within the filtered set, so fully oracle-checkable
# (the s-family's approximate paths cover the unfiltered scale story).
# --------------------------------------------------------------------------
_S13_K = 5
_S13_NQ = 10  # query vectors: vec_id < 10 (one per label bucket at sf0.01)


@register(
    "s13_ann_label_filtered_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, label, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {_S13_NQ}
    ), c AS (
      SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings
    ), scored AS (
      SELECT query_id, c.label, neighbor_id,
             list_cosine_similarity(qv, nv) AS sim
      FROM q JOIN c USING (label)
      WHERE query_id <> neighbor_id
    ), ranked AS (
      SELECT query_id, label, neighbor_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS INT)
               AS rnk
      FROM scored
    )
    SELECT query_id, label, neighbor_id, ROUND(sim, 4) AS sim, rnk
    FROM ranked WHERE rnk <= {_S13_K}
    """,
    "label-filtered exact cosine top-k (filtered vector search): the "
    "metadata predicate becomes an equi-join on the filter key, so each "
    "query scores only its label's corpus slice — never a post-filtered "
    "cross join",
)
def s13_ann_label_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _S13_NQ).select(
        F.col("vec_id").alias("query_id"),
        "label",
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    scored = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "label",
            "neighbor_id",
            # F.aggregate fold: same left-to-right IEEE sequence as
            # DuckDB's list_cosine_similarity (see s01/e01 contract)
            SIM.cosine(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _S13_K)
        .select("query_id", "label", "neighbor_id",
                F.round("sim", 4).alias("sim"), "rnk")
    )


# --------------------------------------------------------------------------
# t36 — cross-document n-gram novelty (round 8): the corpus-curation curve
# that tells you when a crawl stops adding new content. Attribution rule:
# a distinct 3-gram is NOVEL in the lowest doc_id that contains it (a
# deterministic stand-in for crawl order), so a doc's novelty is the
# fraction of its distinct grams it introduced. Plan: Arrow-batched shingle
# fanout (exploded_shingles, the d05/d09 kernel) -> gram-keyed min(doc_id)
# partial agg -> big-big shuffle join back on gram -> per-doc agg ->
# bounded per-source census. Both shuffles key on the gram (the inverted-
# index shape d09/d14 already run at 100x); nothing is quadratic and no
# state ever leaves the executors.
# --------------------------------------------------------------------------
@register(
    "t36_crossdoc_ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(regexp_replace(translate(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                  ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(t) - 2)])
             END AS sh
      FROM toks
    ), ex AS (
      SELECT doc_id, UNNEST(sh) AS shingle FROM grams
    ), firsts AS (
      SELECT shingle, MIN(doc_id) AS first_id FROM ex GROUP BY shingle
    ), per_doc AS (
      SELECT e.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN e.doc_id = f.first_id THEN 1 ELSE 0 END) AS n_novel
      FROM ex e JOIN firsts f USING (shingle)
      GROUP BY e.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(n_novel) AS BIGINT) AS novel_grams,
           CAST(FLOOR(1e6 * SUM(n_novel) / SUM(n_grams)) AS BIGINT)
             AS novelty_ppm
    FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.source
    """,
    "cross-document 3-gram novelty census per source: a gram is novel in "
    "the lowest doc_id containing it — inverted-index min-attribution, "
    "gram-keyed shuffles only",
)
def t36_crossdoc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ex = DD.exploded_shingles(docs, "doc_id", "text", shingle_n=3)
    firsts = ex.groupBy("shingle").agg(F.min("id").alias("first_id"))
    per_doc = (
        ex.join(firsts, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("id") == F.col("first_id")).cast("int")).alias("n_novel"),
        )
    )
    return (
        per_doc.join(
            docs.select(F.col("doc_id").alias("id"), "source"), "id"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("total_grams"),
            F.sum("n_novel").cast("bigint").alias("novel_grams"),
            F.floor(
                F.lit(1e6) * F.sum("n_novel") / F.sum("n_grams")
            ).cast("bigint").alias("novelty_ppm"),
        )
    )


# --------------------------------------------------------------------------
# q102 — weekly retention cohorts (round 8): the classic product-analytics
# matrix — users grouped by first-seen week, activity counted per weeks-
# since-cohort. Plan: per-user min(ts) agg (map-side combined), distinct
# (user, week) activity pairs, one join on user_id, then a bounded
# (cohort x offset) cell agg; cohort size recovered from the offset-0 cell
# by a window over the already-bounded cells (weeks^2 rows), so no extra
# shuffle of the big table. At 100 TB: two user-keyed shuffles + one
# bounded agg — the same shape as d02/q20.
# --------------------------------------------------------------------------
@register(
    "q102_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    ), cells AS (
      SELECT cw,
             CAST(date_diff('day', CAST(cw AS DATE), CAST(aw AS DATE)) / 7
                  AS INT) AS week_offset,
             COUNT(*) AS n_users
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           week_offset,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(FLOOR(1e6 * n_users /
                      (MAX(CASE WHEN week_offset = 0 THEN n_users END)
                       OVER (PARTITION BY cw))) AS BIGINT) AS retention_ppm
    FROM cells
    """,
    "weekly retention cohort matrix: first-seen week x weeks-since-cohort "
    "distinct-user counts with ppm retention vs the cohort's week-0 size",
)
def q102_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    cells = (
        act.join(first, "user_id")
        .groupBy(
            "cw",
            (F.datediff(F.col("aw"), F.col("cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("cw")
    return cells.select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.floor(
            F.lit(1e6)
            * F.col("n_users")
            / F.max(
                F.when(F.col("week_offset") == 0, F.col("n_users"))
            ).over(w)
        )
        .cast("bigint")
        .alias("retention_ppm"),
    )


# --------------------------------------------------------------------------
# m20 — animated GIF decode (round 8): the one mainstream image container
# missing after PNG x3 / JPEG x3 / MJPEG — indexed color under REAL LZW
# compression plus multi-frame animation. The generator writes genuine
# GIF89a bytes (LSD, global color table, per-frame graphic control
# extensions, LSB-first variable-width LZW in 255-byte sub-blocks); the
# decoder implements full GIF LZW (clear/end codes, width growth at
# 2^width, KwKwK case, 4096 dictionary reset) and expands indices through
# the palette. One wrong code anywhere shifts every later pixel of the
# frame and moves a channel sum — the closed-form oracle catches it.
# Blobs die inside the Arrow map stage (m19 contract); codec cost is
# linear in pixels and embarrassingly parallel at 100 TB.
# --------------------------------------------------------------------------
@register(
    "m20_gif_frame_decode",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 8 AS INT) AS width,
             CAST(4 + doc_id % 6 AS INT) AS height,
             CAST(1 + doc_id % 3 AS INT) AS n_frames
      FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
    ), fr AS (
      SELECT id, width, height, n_frames,
             UNNEST(generate_series(0, n_frames - 1)) AS f
      FROM dims
    ), px AS (
      SELECT id, width, height, n_frames, f,
             UNNEST(generate_series(0, width * height - 1)) AS k
      FROM fr
    )
    SELECT id,
           CAST(MAX(width) AS INT) AS width,
           CAST(MAX(height) AS INT) AS height,
           CAST(MAX(n_frames) AS INT) AS n_frames,
           CAST(SUM((id + f + 3 * k) % 16 * 17 % 256) AS BIGINT) AS sum_r,
           CAST(SUM((id + f + 3 * k) % 16 * 29 % 256) AS BIGINT) AS sum_g,
           CAST(SUM((id + f + 3 * k) % 16 * 43 % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY id
    """,
    "REAL animated-GIF decode: genuine GIF89a blobs (global color table, "
    "graphic control extensions, variable-width LZW) decoded frame by "
    "frame; across-frame per-channel sums hash-checked against the "
    "closed-form generator",
)
def m20_gif_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-negative ids only, both sides: Python % is non-negative while
    # DuckDB % keeps the dividend's sign (the m12/m19 generator contract)
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    gifs = MM.synthesize_gif_animations(docs, "doc_id")
    return MM.gif_channel_sums(gifs, "id", "data")


# --------------------------------------------------------------------------
# c18 — manifest-based snapshot time travel (round 8): the lakehouse
# capability Delta/Iceberg provide, rebuilt on plain parquet + an explicit
# commit protocol — because delta-spark is provably uninstallable here
# (SURVEY §5) and the MECHANISM is what matters: data files are immutable,
# a commit is "write new files, then publish a manifest listing the full
# snapshot file set", and a reader pins a version by reading EXACTLY its
# manifest's files. v1 commits the pre-cutoff orders; v2 appends the
# post-cutoff delta INTO THE SAME DIRECTORY and publishes a superset
# manifest — yet the as-of-v1 read still returns exactly the v1 aggregate
# (snapshot isolation under concurrent appends). File listing happens
# once at commit time on a bounded just-written set (the same driver-side
# step every real table format's commit runs — writers.py:175 precedent);
# readers never list the directory, so dirty/uncommitted files are
# invisible by construction. At 100 TB: manifests are per-commit metadata
# (KB), data files never rewrite, and the as-of read plans exactly the
# pinned files — no full-directory listing anywhere.
# --------------------------------------------------------------------------
_C18_CUTOFF = "1997-01-01"
_C18_FILES_PER_COMMIT = 4


@register(
    "c18_manifest_time_travel",
    f"""
    WITH v1 AS (
      SELECT COUNT(*) AS n, SUM(o_totalprice) AS s FROM orders
      WHERE o_orderdate < DATE '{_C18_CUTOFF}'
    ), v2 AS (
      SELECT COUNT(*) AS n, SUM(o_totalprice) AS s FROM orders
    )
    SELECT 'v1' AS version, CAST(n AS BIGINT) AS n_rows,
           ROUND(s, 2) AS total_price,
           CAST({_C18_FILES_PER_COMMIT} AS INT) AS n_files
    FROM v1
    UNION ALL
    SELECT 'v2', CAST(n AS BIGINT), ROUND(s, 2),
           CAST({2 * _C18_FILES_PER_COMMIT} AS INT)
    FROM v2
    """,
    "snapshot time travel on plain parquet: immutable data files + "
    "versioned full-snapshot manifests; the as-of-v1 read returns exactly "
    "the v1 aggregate even though v2's delta was appended into the same "
    "directory (oracle recomputes both snapshots from the raw table)",
)
def c18_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile
    import uuid

    orders = _t(spark, sf_dir, "orders")
    root = f"{tempfile.gettempdir()}/c18_{uuid.uuid4().hex}"
    data_dir = f"{root}/data"
    manifest_dir = f"{root}/manifests"
    os.makedirs(manifest_dir, exist_ok=True)

    def _data_files() -> set[str]:
        return {
            f for f in os.listdir(data_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        }

    def _commit(version: int, files: set[str]) -> None:
        # manifest = the FULL snapshot file set; publish is an atomic
        # rename so a reader never sees a half-written manifest
        tmp = f"{manifest_dir}/.v{version}.json.tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": sorted(files)}, fh)
        os.replace(tmp, f"{manifest_dir}/v{version}.json")

    # commit 1: the pre-cutoff snapshot
    (
        orders.filter(F.col("o_orderdate") < F.lit(_C18_CUTOFF))
        .repartition(_C18_FILES_PER_COMMIT)
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    v1_files = _data_files()
    _commit(1, v1_files)

    # commit 2: append the post-cutoff delta into the SAME directory;
    # the new manifest is the superset (Iceberg append semantics)
    (
        orders.filter(F.col("o_orderdate") >= F.lit(_C18_CUTOFF))
        .repartition(_C18_FILES_PER_COMMIT)
        .write.mode("append")
        .parquet(data_dir)
    )
    _commit(2, _data_files())

    def _read_asof(version: int) -> DataFrame:
        with open(f"{manifest_dir}/v{version}.json") as fh:
            m = json.load(fh)
        paths = [f"{data_dir}/{f}" for f in m["files"]]
        df = spark.read.parquet(*paths)
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        ).select(
            F.lit(f"v{version}").alias("version"),
            "n_rows",
            "total_price",
            F.lit(len(paths)).cast("int").alias("n_files"),
        )

    return _read_asof(1).unionByName(_read_asof(2))


# --------------------------------------------------------------------------
# d20 — blocked sorted-neighborhood edit-distance pairs (round 8): the
# record-linkage family's classic alternative to LSH — sort records within
# a blocking key and compare each record only to its next R sort-order
# neighbors, so candidate pairs are n*R instead of n^2. Block key =
# (first token, token-count//16 bucket): at 100 TB the blocks ARE the
# window partitions, so the whole comparison is embarrassingly
# block-parallel with no all-pairs stage and no global sort (a plain
# sorted-neighborhood over ONE global order would collapse to a single
# window partition — the blocked form is the scale-safe variant, at the
# standard blocking cost of missing cross-block pairs). Distance is exact
# Levenshtein on a 48-char prefix, ASCII-sanitized first on BOTH sides
# (non-printable/non-ASCII chars -> '?'): Spark's levenshtein counts
# codepoints while DuckDB's counts BYTES (measured: 'καλός'->'καλό' is 1
# vs 2), so the portable contract pins the key to the byte==codepoint
# range — the same reasoning as the ascii_lower fold. The single window
# computes all R=3 leads in one pass.
# --------------------------------------------------------------------------
_D20_LEADS = 3
_D20_PREFIX = 48


@register(
    "d20_sorted_neighborhood_pairs",
    f"""
    WITH d AS (
      SELECT doc_id,
             split_part(text, ' ', 1) AS first_tok,
             len(string_split(text, ' ')) AS n_toks,
             regexp_replace(substring(text, 1, {_D20_PREFIX}),
                            '[^\\x20-\\x7e]', '?', 'g') AS prefix
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), nb AS (
      SELECT prefix,
             lead(prefix, 1) OVER w AS p1,
             lead(prefix, 2) OVER w AS p2,
             lead(prefix, 3) OVER w AS p3
      FROM d
      WINDOW w AS (PARTITION BY first_tok, n_toks // 16
                   ORDER BY n_toks, doc_id)
    ), pairs AS (
      SELECT 1 AS k, levenshtein(prefix, p1) AS dist FROM nb WHERE p1 IS NOT NULL
      UNION ALL
      SELECT 2 AS k, levenshtein(prefix, p2) AS dist FROM nb WHERE p2 IS NOT NULL
      UNION ALL
      SELECT 3 AS k, levenshtein(prefix, p3) AS dist FROM nb WHERE p3 IS NOT NULL
    )
    SELECT CAST(k AS INT) AS k,
           CAST(dist // 8 AS INT) AS dist_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(dist) AS INT) AS min_dist,
           CAST(MAX(dist) AS INT) AS max_dist
    FROM pairs GROUP BY 1, 2
    """,
    "blocked sorted-neighborhood record linkage: within (first-token, "
    "length-bucket) blocks, exact Levenshtein on 48-char prefixes against "
    "the next 3 sort-order neighbors — n*R candidate pairs, never n^2",
)
def d20_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    d = docs.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_tok"),
        F.size(F.split(F.col("text"), " ")).alias("n_toks"),
        # byte==codepoint only in printable ASCII: Spark levenshtein counts
        # codepoints, DuckDB counts bytes — sanitize the key identically
        F.regexp_replace(
            F.substring("text", 1, _D20_PREFIX), r"[^\x20-\x7e]", "?"
        ).alias("prefix"),
    )
    w = Window.partitionBy(
        "first_tok", F.expr("n_toks DIV 16")
    ).orderBy("n_toks", "doc_id")
    nb = d.select(
        "prefix",
        *[F.lead("prefix", k).over(w).alias(f"p{k}") for k in range(1, _D20_LEADS + 1)],
    )
    # one exploded pass over the window output: levenshtein(prefix, NULL)
    # is NULL, dropped by the ok filter — no per-lead re-scan of nb
    pairs = (
        nb.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("k"),
                            F.levenshtein("prefix", f"p{k}").alias("dist"),
                            F.col(f"p{k}").isNotNull().alias("ok"),
                        )
                        for k in range(1, _D20_LEADS + 1)
                    ]
                )
            ).alias("s")
        )
        .filter(F.col("s.ok"))
        .select(F.col("s.k").cast("int").alias("k"), F.col("s.dist").alias("dist"))
    )
    return pairs.groupBy("k", F.expr("dist DIV 8").cast("int").alias("dist_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("dist").cast("int").alias("min_dist"),
        F.max("dist").cast("int").alias("max_dist"),
    )


# --------------------------------------------------------------------------
# q103 — time-weighted average value per event type (round 8): the TWAP /
# time-in-state aggregate — each event's value holds until the user's next
# event, capped at a 3600 s idle horizon, and the average weights value by
# held duration instead of event count. Everything is integer arithmetic
# (cents x whole seconds) so the result is bit-exact regardless of
# aggregation order. Plan: ONE user-keyed window (lead) then a bounded
# group-by on event_type — the same single-shuffle shape as q23/q24, fully
# partition-parallel at 100 TB.
# --------------------------------------------------------------------------
_Q103_IDLE_CAP_S = 3600


@register(
    "q103_time_weighted_value",
    f"""
    WITH e AS (
      SELECT user_id, event_type, event_id,
             epoch_us(ts) AS us,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), gaps AS (
      SELECT event_type, cents,
             (LEAD(us) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) - us) // 1000000 AS gap_s
      FROM e
    ), seg AS (
      -- LEAST() SKIPS NULLs in both engines, so cap only when a successor
      -- exists — a user's final event must drop, not get the cap value
      SELECT event_type, cents,
             CASE WHEN gap_s IS NULL THEN NULL
                  ELSE LEAST(gap_s, {_Q103_IDLE_CAP_S}) END AS dur_s
      FROM gaps
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(SUM(cents * dur_s) AS BIGINT) AS weighted_cents_s,
           CAST(SUM(cents * dur_s) // GREATEST(SUM(dur_s), 1) AS BIGINT)
             AS twap_cents
    FROM seg WHERE dur_s IS NOT NULL
    GROUP BY event_type
    """,
    "time-weighted average value (TWAP) per event type: value held until "
    "the user's next event, idle-capped at 1 h — integer cents x seconds, "
    "one user-keyed window + one bounded agg",
)
def q103_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    # load_table normalizes ts to TimestampType; unix_micros keeps the
    # epoch integer (never double — μs epochs exceed double's 2^53)
    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    # least() SKIPS NULLs in both Spark and DuckDB — cap only when a
    # successor exists so each user's final event drops instead of
    # inheriting the cap value
    seg = (
        e.withColumn("lead_us", F.lead("us").over(w))
        .select(
            "event_type",
            "cents",
            F.when(
                F.col("lead_us").isNotNull(),
                F.least(
                    F.expr("(lead_us - us) DIV 1000000"),
                    F.lit(_Q103_IDLE_CAP_S).cast("bigint"),
                ),
            ).alias("dur_s"),
        )
    )
    return (
        seg.filter(F.col("dur_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dur_s").cast("bigint").alias("total_s"),
            F.sum(F.col("cents") * F.col("dur_s")).cast("bigint").alias("weighted_cents_s"),
            F.expr(
                "sum(cents * dur_s) DIV greatest(sum(dur_s), 1)"
            ).cast("bigint").alias("twap_cents"),
        )
    )


# --------------------------------------------------------------------------
# m21 — REAL PNG decode + nearest-neighbor resize (round 8): the
# pre-embedding thumbnail normalization every image training pipeline runs.
# Genuine PNG blobs (zlib IDAT, CRC'd chunks, filter types cycling 0-4)
# are decoded by the pure-Python codec and resized 8x8 with the canonical
# integer floor index map inside ONE Arrow map stage; the oracle replays
# the same index map over the closed-form pixel generator. The
# position-weighted checksum (sum px[k]*(k+1)) pins the exact index map —
# a plain sum could survive a transposed or off-by-one resize.
# --------------------------------------------------------------------------
@register(
    "m21_png_resize_thumbnail",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height
      FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
    ), px AS (
      SELECT id, width, height, UNNEST(generate_series(0, 63)) AS k
      FROM dims
    ), rp AS (
      SELECT id, width, height, k,
             (id + ((k // 8) * height // 8) * width
                 + ((k % 8) * width // 8)) * 31 % 256 AS val
      FROM px
    )
    SELECT id,
           CAST(MAX(width) AS INT) AS width,
           CAST(MAX(height) AS INT) AS height,
           CAST(8 AS INT) AS out_w,
           CAST(8 AS INT) AS out_h,
           CAST(SUM(val) AS BIGINT) AS sum_px,
           CAST(SUM(val * (k + 1)) AS BIGINT) AS wsum_px
    FROM rp GROUP BY id
    """,
    "REAL PNG decode + nearest-neighbor 8x8 thumbnail resize: floor index "
    "map over genuine decoded scanlines, position-weighted checksum "
    "hash-checked against the closed-form generator",
)
def m21_png_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-negative ids only, both sides: Python % is non-negative while
    # DuckDB % keeps the dividend's sign (the m12/m19/m20 generator contract)
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    images = MM.synthesize_png_images(docs, "doc_id")
    return MM.png_resize_channel_sums(images, "id", "data", out_w=8, out_h=8)


# --------------------------------------------------------------------------
# c19 — fixed-width text source round-trip (round 8): the mainframe-export
# format classic ETL still ingests — no delimiters, fields live at byte
# offsets. Spark has no fixed-width reader, so the scale-correct form IS
# this plan: spark.read.text (splittable, whole-stage codegen) + substring
# slicing + casts, which Catalyst keeps entirely JVM-side. The query
# formats orders into 60-byte records, writes real text files, reads them
# back cold, parses by offset, and aggregates — the census hash-matches
# the source table only if every field survives the byte round trip.
# --------------------------------------------------------------------------
@register(
    "c19_fixed_width_roundtrip",
    """
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           MIN(strftime(o_orderdate, '%Y-%m-%d')) AS min_date,
           MAX(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
    FROM orders
    GROUP BY 1, 2
    """,
    "fixed-width (mainframe-style) text source: format -> write text -> "
    "cold re-read -> parse by byte offset -> census; hash-proves the "
    "byte-offset round trip against the source table",
)
def c19_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    orders = _t(spark, sf_dir, "orders")
    # layout: orderkey 1-12, custkey 13-22, status 23, cents 24-35,
    # date 36-45, priority 46-60 (space right-padded)
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 10, "0"),
        F.col("o_orderstatus"),
        F.lpad(F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 12, "0"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.rpad(F.col("o_orderpriority"), 15, " "),
    )
    path = f"{tempfile.gettempdir()}/c19_{uuid.uuid4().hex}"
    orders.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path).select(
        F.substring("value", 23, 1).alias("status"),
        F.substring("value", 24, 12).cast("bigint").alias("cents"),
        F.substring("value", 36, 10).alias("order_date"),
        F.rtrim(F.substring("value", 46, 15)).alias("priority"),
    )
    return back.groupBy("status", "priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.min("order_date").alias("min_date"),
        F.max("order_date").alias("max_date"),
    )


# --------------------------------------------------------------------------
# d21 — incremental MinHash probe (round 8): the shape a production crawl
# pipeline actually runs daily — dedup the NEW batch against the existing
# corpus index without re-comparing the corpus to itself. At 100 TB the
# index signatures are computed once and persisted; each delta pays only
# its own signature pass plus a band-keyed join. The index-side bucket cap
# keeps probe fan-out bounded (an oversized index bucket is a duplicate
# cluster inside the index — collapse it by key, don't attach every new
# doc to it). Batch = doc_id % 10 == 0 (a deterministic 10% "new crawl"
# stand-in); signatures are bit-identical to d04's, so the oracle
# reproduces everything exactly.
# --------------------------------------------------------------------------
@register(
    "d21_incremental_minhash_probe",
    DD.minhash_probe_oracle_sql(num_hashes=32, num_bands=8),
    "incremental fuzzy dedup: MinHash-band probe of a new 10% batch "
    "against the remaining 90% corpus index — no corpus self-join, "
    "index-side bucket cap bounds probe fan-out",
)
def d21_incremental_minhash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    index = docs.filter(F.col("doc_id") % 10 != 0)
    return DD.minhash_probe_pairs(index, batch, "doc_id", "text")


# --------------------------------------------------------------------------
# m22 — REAL WAV decode + silence segmentation (round 8): the VAD-style
# dead-air audit an audio training pipeline runs before chunking. Genuine
# RIFF/WAVE 16-bit PCM blobs decoded by the pure-Python codec; the
# per-sample run-length analysis stays INSIDE the Arrow map stage (numpy
# over the decoded buffer) — exploding samples to rows would shuffle 500×
# the data for a per-clip answer. The oracle replays the closed-form
# sample generator through a SQL gaps-and-islands.
# --------------------------------------------------------------------------
_M22_THRESHOLD = 32
_M22_MIN_RUN = 2


@register(
    "m22_wav_silence_segments",
    f"""
    WITH a AS (
      SELECT doc_id AS id,
             CAST(8000 + doc_id % 4 * 4000 AS INT) AS sample_rate,
             CAST(256 + doc_id % 512 AS INT) AS n_samples
      FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
    ), s AS (
      SELECT id, n_samples, UNNEST(generate_series(0, n_samples - 1)) AS k
      FROM a
    ), m AS (
      SELECT id, k
      FROM s WHERE abs((id + k) * 31 % 256 - 128) < {_M22_THRESHOLD}
    ), isl AS (
      SELECT id, k, k - ROW_NUMBER() OVER (PARTITION BY id ORDER BY k) AS grp
      FROM m
    ), runs AS (
      SELECT id, COUNT(*) AS run_len, MIN(k) AS run_start
      FROM isl GROUP BY id, grp
    ), agg AS (
      SELECT id,
             SUM(run_len) AS n_silent,
             SUM(CASE WHEN run_len >= {_M22_MIN_RUN} THEN 1 ELSE 0 END)
               AS n_segments,
             MAX(run_len) AS longest_run,
             MIN(CASE WHEN run_len >= {_M22_MIN_RUN} THEN run_start END)
               AS first_silent
      FROM runs GROUP BY id
    )
    SELECT a.id, a.sample_rate, a.n_samples,
           CAST(COALESCE(g.n_silent, 0) AS BIGINT) AS n_silent,
           CAST(COALESCE(g.n_segments, 0) AS INT) AS n_segments,
           CAST(COALESCE(g.longest_run, 0) AS INT) AS longest_run,
           CAST(COALESCE(g.first_silent, -1) AS INT) AS first_silent
    FROM a LEFT JOIN agg g USING (id)
    """,
    "REAL WAV decode + VAD-style silence segmentation: |amp| < 32 runs of "
    ">= 2 samples found by numpy run-length inside the Arrow stage; "
    "oracle = SQL gaps-and-islands over the closed-form generator",
)
def m22_wav_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # non-negative ids only, both sides: Python % is non-negative while
    # DuckDB % keeps the dividend's sign (the m12/m19/m20/m21 contract)
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    clips = MM.synthesize_wav_audio(docs, "doc_id")
    return MM.wav_silence_segments(
        clips, "id", "data", threshold=_M22_THRESHOLD, min_run=_M22_MIN_RUN
    )


# --------------------------------------------------------------------------
# e22 — kNN label-agreement audit (round 8): the standard embedding-quality
# probe — what fraction of each point's top-k neighbors share its label
# (a leave-one-out kNN-classifier consistency score). Complements e09's
# geometric silhouette with a retrieval-semantics answer. Plan: the s05
# brute-force kNN kernel (per-batch top-k, only k·Q rows shuffle) + two
# vec_id-keyed label joins + a label-bounded census; agreement quantized
# to integer ppm so the hash is order-proof.
# --------------------------------------------------------------------------
_E22_K = 5


@register(
    "e22_knn_label_agreement",
    f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS qid, a.label AS q_label,
             b.vec_id AS nid, b.label AS n_label,
             list_cosine_similarity(a.e, b.e) AS sim
      FROM v a CROSS JOIN v b WHERE a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT q_label, n_label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY sim DESC, nid) AS rnk
      FROM scored
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same,
           CAST(FLOOR(1e6 * SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END)
                      / COUNT(*)) AS BIGINT) AS agreement_ppm
    FROM ranked WHERE rnk <= {_E22_K}
    GROUP BY 1
    """,
    "kNN label-agreement audit: fraction of each vector's top-5 cosine "
    "neighbors sharing its label, censused per label — the leave-one-out "
    "kNN-classifier probe of embedding quality",
)
def e22_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    knn = SIM.brute_force_topk(emb, emb, k=_E22_K)
    lab = emb.select("vec_id", "label")
    j = knn.join(
        lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")),
        "query_id",
    ).join(
        lab.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
        ),
        "neighbor_id",
    )
    same = (F.col("q_label") == F.col("n_label")).cast("int")
    return (
        j.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum(same).cast("bigint").alias("n_same"),
            F.floor(F.lit(1e6) * F.sum(same) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("agreement_ppm"),
        )
    )


# --------------------------------------------------------------------------
# dq18 — line-number continuity audit (round 8): the classic sequence-
# integrity DQ check — within each order, line numbers should be the
# consecutive run 1..n with no duplicates. Naturally partition-parallel
# (per-order groupBy, then a one-row global census): no global sort, no
# window — the scale-correct form of a sequence audit. Fixture lineitem
# genuinely contains duplicate line numbers, so the census is non-vacuous.
# --------------------------------------------------------------------------
@register(
    "dq18_linenumber_continuity",
    """
    WITH per AS (
      SELECT l_orderkey,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT l_linenumber) AS n_distinct,
             MIN(l_linenumber) AS min_ln,
             MAX(l_linenumber) AS max_ln
      FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
      GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN n_rows > n_distinct THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_dups,
           CAST(SUM(n_rows - n_distinct) AS BIGINT) AS total_dup_rows,
           CAST(SUM(CASE WHEN max_ln - min_ln + 1 > n_distinct
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_gaps,
           CAST(SUM(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_not_starting_at_1,
           CAST(MAX(n_rows) AS BIGINT) AS max_rows_per_order
    FROM per
    """,
    "sequence-continuity audit: per-order line numbers checked for "
    "duplicates, interior gaps, and wrong starts — per-key groupBy census, "
    "no global sort",
)
def dq18_linenumber_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_linenumber").isNotNull()
    )
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_linenumber").alias("n_distinct"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum((F.col("n_rows") > F.col("n_distinct")).cast("int"))
        .cast("bigint")
        .alias("n_with_dups"),
        F.sum(F.col("n_rows") - F.col("n_distinct")).cast("bigint").alias("total_dup_rows"),
        F.sum(
            (F.col("max_ln") - F.col("min_ln") + 1 > F.col("n_distinct")).cast("int")
        )
        .cast("bigint")
        .alias("n_with_gaps"),
        F.sum((F.col("min_ln") != 1).cast("int")).cast("bigint").alias("n_not_starting_at_1"),
        F.max("n_rows").cast("bigint").alias("max_rows_per_order"),
    )


# --------------------------------------------------------------------------
# s15 — projection-tree ANN (round 8): the annoy / RP-tree index family
# (Dasgupta & Freund 2008), completing the repo's index taxonomy — flat
# (s01), hash (s02/e02), inverted-list (s04/s06), product-quantized
# (s07/s08/s12), tree (this). Balanced MEDIAN splits — not hash signs —
# bound every leaf at ~N/2^levels regardless of the data distribution;
# medians come from q101's census walk (bounded coarse-bucket census +
# prefix sum), never a per-node sort of the corpus. All scoring is exact
# integer dot over floor-quantized vectors, so both engines agree
# bit-for-bit with no IEEE accumulation pact.
# --------------------------------------------------------------------------
@register(
    "s15_projection_tree_topk",
    SIM.projection_tree_oracle_sql(levels=3, k=5),
    "projection-tree ANN (annoy family): 3 balanced median splits on "
    "hashed integer directions -> 8 leaves, each query searches only its "
    "own leaf; exact bigint-dot ranking, leaf path + occupancy audited",
)
def s15_projection_tree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.projection_tree_topk(emb, levels=3, k=5)


# --------------------------------------------------------------------------
# t37 — CCNet-style perplexity bucketing (round 8): the head/middle/tail
# tercile split CCNet (Wenzek et al. 2019) uses to stratify a web corpus
# by LM quality before sampling. The LM score is a Zipf-rank surrogate:
# each token costs bit_length(vocab_rank) — an exact-integer stand-in for
# log2(rank), which under Zipf's law tracks the unigram surprisal
# -log p(token) — so the whole pipeline (rank, per-doc milli-rate,
# per-lang tercile boundaries, bucket census) is integer arithmetic and
# hash-exact across engines, with none of log()'s cross-libm ulp risk.
# Boundaries come from the q101 census walk over the BOUNDED milli-rate
# domain (rate <= 31000), never a per-lang sort of the corpus.
# --------------------------------------------------------------------------
_T37_BITLEN_MAX = 31


def _t37_bitlen_spark(col: Column) -> Column:
    out = F.lit(_T37_BITLEN_MAX + 1)
    for b in range(_T37_BITLEN_MAX, 0, -1):
        out = F.when(col < F.lit(1 << b), F.lit(b)).otherwise(out)
    return out


def _t37_bitlen_sql(expr: str) -> str:
    branches = " ".join(
        f"WHEN {expr} < {1 << b} THEN {b}" for b in range(1, _T37_BITLEN_MAX + 1)
    )
    return f"(CASE {branches} ELSE {_T37_BITLEN_MAX + 1} END)"


def _t37_oracle() -> str:
    tok_expr = (
        "translate(unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10)"
        " || chr(11) || chr(12) || chr(13)), '[ \\t\\n\\x0b\\f\\r]+')),"
        " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"
    )
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, lang, {tok_expr} AS token
      FROM documents WHERE text IS NOT NULL
    ), t2 AS (SELECT * FROM tok WHERE token <> ''),
    vocab AS MATERIALIZED (
      SELECT token,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
      FROM t2 GROUP BY token
    ), doc_scores AS MATERIALIZED (
      SELECT t2.doc_id, t2.lang,
             COUNT(*) AS n_tokens,
             SUM({_t37_bitlen_sql('vocab.rank')}) AS score_units
      FROM t2 JOIN vocab USING (token)
      GROUP BY 1, 2
    ), rates AS MATERIALIZED (
      SELECT doc_id, lang, n_tokens, score_units,
             score_units * 1000 // n_tokens AS milli_rate
      FROM doc_scores
    ), pos AS (
      SELECT lang, milli_rate,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY milli_rate) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM rates
    ), bounds AS (
      SELECT lang,
             MAX(CASE WHEN rk = (n + 2) // 3 THEN milli_rate END) AS b1,
             MAX(CASE WHEN rk = (2 * n + 2) // 3 THEN milli_rate END) AS b2
      FROM pos GROUP BY lang
    )
    SELECT r.lang,
           CAST(1 + CASE WHEN r.milli_rate > b.b1 THEN 1 ELSE 0 END
                  + CASE WHEN r.milli_rate > b.b2 THEN 1 ELSE 0 END AS INT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r.score_units) AS BIGINT) AS sum_score_units,
           CAST(MIN(r.milli_rate) AS BIGINT) AS min_milli,
           CAST(MAX(r.milli_rate) AS BIGINT) AS max_milli
    FROM rates r JOIN bounds b USING (lang)
    GROUP BY 1, 2
    """


@register(
    "t37_ccnet_surprisal_buckets",
    _t37_oracle(),
    "CCNet-style head/middle/tail quality terciles per language: integer "
    "Zipf-rank surprisal (bit_length of vocab rank) scores each doc, "
    "census-walk tercile boundaries per lang, bucket census — the "
    "perplexity-stratified sampling stage of web-corpus curation",
)
def t37_ccnet_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(T.ascii_trim(F.col("text")), r"\s+")).alias("raw"),
        )
        .select("doc_id", "lang", T.ascii_lower(F.col("raw")).alias("token"))
        .filter(F.col("token") != "")
    )
    # global frequency rank rides a 1-task window over the AGGREGATED vocab
    # (bounded by language, never corpus-sized — the t15 posture)
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token"))),
        )
        .select("token", "rank")
    )
    doc_scores = (
        toks.join(vocab, "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(_t37_bitlen_spark(F.col("rank"))).alias("score_units"),
        )
        .withColumn("milli_rate", F.expr("score_units * 1000 div n_tokens"))
    )
    # per-lang tercile boundaries via the q101 census walk: the census is
    # (lang, milli_rate) — milli_rate <= 31000, a bounded domain — so no
    # per-lang sort of the doc table ever happens
    census = doc_scores.groupBy("lang", "milli_rate").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = Window.partitionBy("lang").orderBy("milli_rate")
    wall = Window.partitionBy("lang")
    walk = census.select(
        "lang",
        "milli_rate",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("prev"),
    )
    r1 = F.floor((F.col("n") + 2) / 3).cast("bigint")
    r2 = F.floor((2 * F.col("n") + 2) / 3).cast("bigint")
    bounds = walk.groupBy("lang").agg(
        F.max(
            F.when((F.col("prev") < r1) & (F.col("cum") >= r1), F.col("milli_rate"))
        ).alias("b1"),
        F.max(
            F.when((F.col("prev") < r2) & (F.col("cum") >= r2), F.col("milli_rate"))
        ).alias("b2"),
    )
    bucket = (
        F.lit(1)
        + (F.col("milli_rate") > F.col("b1")).cast("int")
        + (F.col("milli_rate") > F.col("b2")).cast("int")
    )
    return (
        doc_scores.join(F.broadcast(bounds), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("score_units").cast("bigint").alias("sum_score_units"),
            F.min("milli_rate").cast("bigint").alias("min_milli"),
            F.max("milli_rate").cast("bigint").alias("max_milli"),
        )
    )


# --------------------------------------------------------------------------
# dq19 — referential-integrity orphan audit (round 8): every FK edge of
# the TPC-H-ish schema checked in one pass each — child rows whose key is
# NULL, rows whose non-null key has no parent, and the distinct orphan
# keys behind them. One LEFT join per edge against the DISTINCT parent
# keys (dims broadcast; the two fact-sized edges shuffle on their natural
# join key) + a one-row conditional-agg census; the 7 one-row results
# union into the audit table. The fixture is referentially clean, so the
# oracle pins zeros (the t14 PII posture); the planted-orphan pytest
# proves nonzero counts.
# --------------------------------------------------------------------------
_DQ19_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _dq19_oracle() -> str:
    selects = []
    for rel, child, fk, parent, pk in _DQ19_EDGES:
        selects.append(f"""
    SELECT '{rel}' AS relationship,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(SUM(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_keys,
           CAST(SUM(CASE WHEN c.{fk} IS NOT NULL AND p.pk IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_rows,
           CAST(COUNT(DISTINCT CASE WHEN c.{fk} IS NOT NULL AND p.pk IS NULL
                                    THEN c.{fk} END) AS BIGINT) AS n_orphan_keys
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON c.{fk} = p.pk""")
    return " UNION ALL ".join(selects)


@register(
    "dq19_referential_orphans",
    _dq19_oracle(),
    "referential-integrity audit over all 7 FK edges of the schema: "
    "null-key rows, orphan rows, distinct orphan keys — one left join vs "
    "distinct parent keys per edge, conditional-agg census",
)
def dq19_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for rel, child, fk, parent, pk in _DQ19_EDGES:
        c = _t(spark, sf_dir, child)
        # DISTINCT parent keys: defensive against a duplicated parent pk,
        # which would fan out the left join and inflate the row census
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        j = c.join(p, c[fk] == F.col("pk"), "left")
        orphan = F.col(fk).isNotNull() & F.col("pk").isNull()
        row = j.agg(
            F.lit(rel).alias("relationship"),
            F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
            F.sum(F.col(fk).isNull().cast("int")).cast("bigint").alias("n_null_keys"),
            F.sum(orphan.cast("int")).cast("bigint").alias("n_orphan_rows"),
            F.countDistinct(F.when(orphan, F.col(fk)))
            .cast("bigint")
            .alias("n_orphan_keys"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# p17 — per-user contribution-bounded aggregation (round 8): the
# DP-style pre-aggregation every privacy-reviewed analytics pipeline runs
# (Wilson et al. 2020, "Differentially private SQL with bounded user
# contribution"): before any daily metric, each user contributes at most
# C events per day — rank events per (user, day) by (ts, event_id), keep
# rank <= C — so a single bot account cannot dominate a count or sum.
# Emits the capped metrics NEXT TO the raw ones plus the clipped-user
# census, making the bounding itself auditable. One (user, day)-keyed
# window over naturally partition-parallel groups; values quantized to
# integer cents BEFORE summing (the dq03 rule) so both engines'
# aggregation is order-free.
# --------------------------------------------------------------------------
_P17_CAP = 5


@register(
    "p17_user_contribution_cap",
    f"""
    WITH ev AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rk
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), per_user AS (
      SELECT user_id, day,
             COUNT(*) AS n_raw,
             SUM(CASE WHEN rk <= {_P17_CAP} THEN 1 ELSE 0 END) AS n_capped,
             SUM(cents) AS raw_cents,
             SUM(CASE WHEN rk <= {_P17_CAP} THEN cents ELSE 0 END) AS capped_cents
      FROM ev GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN n_raw > {_P17_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_users,
           CAST(SUM(n_raw) AS BIGINT) AS n_events_raw,
           CAST(SUM(n_capped) AS BIGINT) AS n_events_capped,
           CAST(SUM(raw_cents) AS BIGINT) AS raw_cents,
           CAST(SUM(capped_cents) AS BIGINT) AS capped_cents
    FROM per_user GROUP BY 1
    """,
    "DP-style bounded-contribution daily aggregation: each user capped at "
    "5 events/day by a (user, day) window, capped vs raw counts and cent "
    "sums plus the clipped-user census per day",
)
def p17_user_contribution_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    day = F.to_date("ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id",
        day.alias("day"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.row_number().over(w).alias("rk"),
    )
    per_user = ranked.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum((F.col("rk") <= _P17_CAP).cast("int")).alias("n_capped"),
        F.sum("cents").alias("raw_cents"),
        F.sum(F.when(F.col("rk") <= _P17_CAP, F.col("cents")).otherwise(F.lit(0))).alias(
            "capped_cents"
        ),
    )
    return per_user.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum((F.col("n_raw") > _P17_CAP).cast("int"))
        .cast("bigint")
        .alias("n_clipped_users"),
        F.sum("n_raw").cast("bigint").alias("n_events_raw"),
        F.sum("n_capped").cast("bigint").alias("n_events_capped"),
        F.sum("raw_cents").cast("bigint").alias("raw_cents"),
        F.sum("capped_cents").cast("bigint").alias("capped_cents"),
    )


# --------------------------------------------------------------------------
# m23 — REAL G.711 mu-law companding round trip (round 8): the telephony
# codec (ITU-T G.711) every speech corpus recorded off a phone line went
# through. Wide-amplitude 14-bit PCM WAVs are synthesized, decoded by the
# real RIFF parser, mu-law encoded (sign/exponent/mantissa, bias 132,
# clip 8159, ones-complement) and decoded back to cell midpoints — all
# inside one Arrow map stage, integer end-to-end. The oracle replays the
# identical integer formulas over the closed-form sample generator. The
# position-weighted code checksum pins byte-level codec agreement, not
# just error statistics.
# --------------------------------------------------------------------------
def _m23_oracle() -> str:
    x = "(((id * 7 + k * 13) % 16384) - 8192)"
    mag = f"ABS({x})"
    v = f"(LEAST({mag}, 8159) + 132)"
    e = (
        f"(CASE WHEN {v} >= 256 THEN 1 ELSE 0 END"
        f" + CASE WHEN {v} >= 512 THEN 1 ELSE 0 END"
        f" + CASE WHEN {v} >= 1024 THEN 1 ELSE 0 END"
        f" + CASE WHEN {v} >= 2048 THEN 1 ELSE 0 END"
        f" + CASE WHEN {v} >= 4096 THEN 1 ELSE 0 END"
        f" + CASE WHEN {v} >= 8192 THEN 1 ELSE 0 END)"
    )
    return f"""
    WITH a AS (
      SELECT doc_id AS id,
             CAST(8000 + doc_id % 2 * 8000 AS INT) AS sample_rate,
             CAST(256 + doc_id % 384 AS INT) AS n_samples
      FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
    ), s AS (
      SELECT id, UNNEST(generate_series(0, n_samples - 1)) AS k
      FROM a
    ), comp AS (
      SELECT id, k, {x} AS x, {mag} AS mag, {v} AS v, {e} AS e
      FROM s
    ), codec AS (
      SELECT id, k, x, mag, e,
             ((v // (8 << e)) % 16) AS m
      FROM comp
    ), rt AS (
      SELECT id, k, x, mag, e, m,
             255 - (CASE WHEN x < 0 THEN 128 ELSE 0 END + e * 16 + m) AS code,
             CASE WHEN x < 0 THEN -((2 * m + 33) * (4 << e) - 132)
                  ELSE (2 * m + 33) * (4 << e) - 132 END AS rec
      FROM codec
    )
    SELECT a.id, a.sample_rate, a.n_samples,
           CAST(SUM(CASE WHEN mag > 8159 THEN 1 ELSE 0 END) AS INT) AS n_clipped,
           CAST(MAX(ABS(x - rec)) AS INT) AS max_abs_err,
           CAST(SUM(ABS(x - rec)) AS BIGINT) AS sum_abs_err,
           CAST(SUM(code * (k + 1)) AS BIGINT) AS code_weighted_sum
    FROM rt JOIN a USING (id)
    GROUP BY 1, 2, 3
    """


@register(
    "m23_g711_mulaw_roundtrip",
    _m23_oracle(),
    "REAL G.711 mu-law companding round trip over synthesized wide-range "
    "PCM WAVs: encode/decode in one Arrow map stage, integer error "
    "profile + position-weighted code checksum, oracle = closed-form SQL "
    "replay of the ITU formulas",
)
def m23_g711_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    clips = MM.synthesize_pcm14_wav(docs, "doc_id")
    return MM.mulaw_roundtrip_audit(clips, "id", "data")


# --------------------------------------------------------------------------
# c20 — Iceberg-style hidden partitioning + manifest transform pruning
# (round 8): the table declares a PARTITION TRANSFORM (month(o_orderdate))
# the way Iceberg does — the reader never touches directory names or even
# knows the layout; it derives the transform range from its row-level
# date predicate, consults the MANIFEST (file -> transform value), and
# reads only the matching files by explicit path, applying the original
# predicate as the residual filter. Complements c12 (directory-layout
# pruning), c17 (runtime DPP) and c18 (snapshot manifests): this is
# metadata-only pruning on a DERIVED value, the thing that makes Iceberg
# queries cheap without the user ever writing the partition column. One
# corpus-sized write (repartition by transform -> exactly one file per
# month), KB-sized manifest at any scale; the pruning audit (files +
# rows scanned vs total) is part of the oracle-checked output.
# --------------------------------------------------------------------------
_C20_FROM = "1996-02-10"
_C20_TO = "1996-08-20"


@register(
    "c20_hidden_partition_pruning",
    f"""
    WITH all_m AS (
      SELECT (EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate)) AS m, COUNT(*) AS n
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), pruned AS (
      SELECT m, n FROM all_m
      WHERE m BETWEEN 199602 AND 199608
    ), audit AS (
      SELECT (SELECT COUNT(*) FROM all_m) AS n_files_total,
             (SELECT COUNT(*) FROM pruned) AS n_files_scanned,
             (SELECT SUM(n) FROM pruned) AS rows_scanned
    )
    SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                + EXTRACT(month FROM o_orderdate) AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(audit.n_files_total AS INT) AS n_files_total,
           CAST(audit.n_files_scanned AS INT) AS n_files_scanned,
           CAST(audit.rows_scanned AS BIGINT) AS rows_scanned
    FROM orders CROSS JOIN audit
    WHERE o_orderdate BETWEEN DATE '{_C20_FROM}' AND DATE '{_C20_TO}'
    GROUP BY 1, 4, 5, 6
    """,
    "Iceberg-style hidden partitioning: month(o_orderdate) transform "
    "recorded in a manifest, reader prunes files from the manifest by the "
    "derived transform range and applies the date predicate as residual — "
    "per-month revenue plus the files/rows-scanned pruning audit",
)
def c20_hidden_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile
    import uuid

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    m_col = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("m")
    root = f"{tempfile.gettempdir()}/c20_{uuid.uuid4().hex}"
    data_dir = f"{root}/data"

    # ONE corpus write: repartition on the transform puts each month in
    # exactly one shuffle partition -> exactly one data file per transform
    # value; partitionBy only routes rows, the reader below never relies
    # on the directory names
    (
        orders.withColumn("m", m_col)
        .repartition(F.col("m"))
        .write.partitionBy("m")
        .parquet(data_dir)
    )

    # manifest: file path -> transform value (+ row count), the KB-sized
    # per-commit metadata Iceberg keeps; built from the write's layout
    # here, then treated as the ONLY source of truth by the reader
    manifest = []
    for d in os.listdir(data_dir):
        if not d.startswith("m="):
            continue
        m_val = int(d.split("=", 1)[1])
        for f in os.listdir(f"{data_dir}/{d}"):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                manifest.append({"path": f"{data_dir}/{d}/{f}", "m": m_val})
    with open(f"{root}/manifest.json", "w") as fh:
        json.dump(manifest, fh)

    # reader: derive the transform range from the ROW predicate (the
    # hidden-partitioning contract: the user only ever states the date
    # range), prune via the manifest, read surviving files by path.
    # The scratch layout is removed in `finally` — the tiny result is
    # eagerly localCheckpoint'ed first so the returned plan no longer
    # references the deleted files (ADVICE r08: repeated runs leaked
    # an orders-sized copy under /tmp per invocation).
    try:
        lo = int(_C20_FROM[:4]) * 100 + int(_C20_FROM[5:7])
        hi = int(_C20_TO[:4]) * 100 + int(_C20_TO[5:7])
        with open(f"{root}/manifest.json") as fh:
            entries = json.load(fh)
        scanned = [e["path"] for e in entries if lo <= e["m"] <= hi]
        out_schema = (
            "m int, n_orders bigint, revenue_cents bigint, "
            "n_files_total int, n_files_scanned int, rows_scanned bigint"
        )
        if not scanned:
            # manifest pruned every file: the oracle returns zero groups,
            # so return an empty frame with the output schema instead of
            # letting spark.read.parquet() raise on an empty path list
            return spark.createDataFrame([], out_schema)
        pruned_read = spark.read.parquet(*scanned)
        rows_scanned = pruned_read.count()
        result = (
            pruned_read.filter(
                F.col("o_orderdate").between(F.lit(_C20_FROM), F.lit(_C20_TO))
            )
            .groupBy(
                (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("int")
                .alias("m")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("revenue_cents"),
            )
            .withColumn("n_files_total", F.lit(len(entries)).cast("int"))
            .withColumn("n_files_scanned", F.lit(len(scanned)).cast("int"))
            .withColumn("rows_scanned", F.lit(rows_scanned).cast("bigint"))
        )
        # eager: materializes the (<=#months)-row result into block storage
        return result.localCheckpoint(eager=True)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# c21 — hash-filter semi-join reduction (round 8): the runtime-filter /
# semi-join reduction every distributed optimizer applies to a selective
# shuffle join (Spark's own runtime bloomFilter rewrite, Trino's dynamic
# filters): hash the SELECTIVE build side's join keys into a bounded
# position table, prune the probe side MAP-SIDE with one broadcast semi
# join before the exchange, then run the exact join — the filter has no
# false negatives, so the result is byte-identical to the unfiltered plan
# while the shuffle moves a fraction of the probe rows. The explicit form
# matters at 100 TB precisely when the build side is too big to
# broadcast AS KEYS: the position table is capped at min(n, m) INTEGER
# positions (m data-sized by the same rule production filters use), where
# the raw keys are unbounded-width strings.
#
# Why k=1 (a hashed-bitmap filter) and not a k>1 Bloom, and why conv():
# every alternative physical form was tried and measured before this one.
# Shipping packed bits as a LITERAL (Spark's own BloomFilterMightContain
# design) fails at DataFrame level: a 16k-long array literal
# re-materializes its ArrayData per evaluation (GCLocker churn, then OOM
# in the audit agg), a binary literal blows janino outright
# (InternalCompilerException on the 131 KB constant), and a hex-string
# literal pays O(index) per lookup because UTF8String.substring counts
# codepoints from the start. Probing k positions through k chained
# broadcast joins planned as clean BHJs but, combined with the d11-style
# ascii-arithmetic hash chains, re-evaluated the hash trees across every
# stage boundary (projection collapse) — three such forms measured
# 296-511 s per pass at 100× against ~25 s of actual hash work. The form
# that survives: ONE position per key (hash % m) via Spark's conv() on
# an md5 hex prefix (a single expression node, trivially codegen'd;
# DuckDB twins it as a '0x' || hex cast), ONE broadcast left-semi join,
# and m sized to the build side. The FP cost of k=1 is priced by the
# m-sizing rule (~n/m, ~10% at the 100× build side), is VISIBLE in the
# oracle-checked audit columns, and the exact join removes it. Measured
# at 100×: 60M probe rows -> 14.6M after the filter (24%: 14% true + 10%
# FP), whole plan 19.3 s best-of-2 on an idle local[32] (6.4x per 100x
# data).
# --------------------------------------------------------------------------
_C21_PRED_SQL = "o_orderpriority = '1-URGENT' AND o_totalprice >= 150000"
_C21_HEX_CHARS = 6  # raw hash range 16^6 = 2^24; positions are hash % m
_C21_M_SMALL = 1 << 20
_C21_M_LARGE = 1 << 24
_C21_SIZE_THRESHOLD = 100_000  # build keys above this -> the large filter


def _c21_m(n_build_keys: int) -> int:
    """Size the filter to its build side (what every production runtime
    filter does — Spark sizes by ndv estimate): at k=1 the false-positive
    rate is ~n/m, so m must grow with the build side or the filter
    silently degrades to a no-op. The position table stays <= min(n, m)
    int rows either way."""
    return _C21_M_SMALL if n_build_keys <= _C21_SIZE_THRESHOLD else _C21_M_LARGE


def _c21_hash(col: Column) -> Column:
    """24-bit hash of a key: first 6 hex chars of md5(key || '#b0'),
    parsed as hex via ONE conv() call. NOT the d11 _hexval ascii chain:
    that form generates ~6 nested substring/ascii/CASE trees whose
    whole-stage compilation measured 15-35 s PER UNIQUE STAGE here (the
    fact-table probe embeds the hash in several distinct stages, so a
    single invocation paid minutes of janino time; d11/t35 never noticed
    because their hash lives in one stable stage per session). DuckDB has
    no conv(), but parses '0x' || hex casts — the oracle twin."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit("#b0"))), 1, _C21_HEX_CHARS), 16, 10
    ).cast("bigint")


def _c21_oracle() -> str:
    def hash_expr() -> str:
        return (
            f"CAST(('0x' || substr(md5(k || '#b0'), 1, {_C21_HEX_CHARS}))"
            " AS BIGINT)"
        )

    # dynamic m via the msel scalar subquery — the oracle applies the same
    # build-count sizing rule as the Spark side; membership is a
    # row-preserving IN subquery (NOT an explode + grouped HAVING:
    # lineitem rows can be exact duplicates that a GROUP BY would collapse
    # while Spark's filter keeps each row)
    pos = f"(({hash_expr()}) % (SELECT m FROM msel))"

    return f"""
    WITH build AS (
      SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k FROM orders
      WHERE {_C21_PRED_SQL}
    ), msel AS (
      SELECT CASE WHEN COUNT(*) <= {_C21_SIZE_THRESHOLD} THEN {_C21_M_SMALL}
                  ELSE {_C21_M_LARGE} END AS m
      FROM build
    ), bits AS (
      SELECT DISTINCT {pos} AS pos FROM build
    ), probe AS (
      SELECT l_orderkey, l_returnflag, l_extendedprice, l_discount,
             CAST(l_orderkey AS VARCHAR) AS k
      FROM lineitem
    ), passed AS (
      SELECT l_orderkey, l_returnflag, l_extendedprice, l_discount
      FROM probe WHERE {pos} IN (SELECT pos FROM bits)
    ), audit AS (
      SELECT (SELECT COUNT(*) FROM probe) AS probe_rows_total,
             (SELECT COUNT(*) FROM passed) AS probe_rows_after_bloom,
             (SELECT COUNT(*) FROM build) AS n_build_keys
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(audit.probe_rows_total AS BIGINT) AS probe_rows_total,
           CAST(audit.probe_rows_after_bloom AS BIGINT) AS probe_rows_after_bloom,
           CAST(audit.n_build_keys AS BIGINT) AS n_build_keys
    FROM passed
    JOIN orders o ON passed.l_orderkey = o.o_orderkey AND {_C21_PRED_SQL}
    CROSS JOIN audit
    GROUP BY 1, 4, 5, 6
    """


@register(
    "c21_bloom_semijoin_reduction",
    _c21_oracle(),
    "runtime-filter semi-join reduction: a data-sized hash filter over "
    "the selective build side's keys prunes the probe map-side with one "
    "broadcast semi join before the shuffle join (position table bounded "
    "by min(n, m) ints even when the build keys cannot broadcast); the "
    "exact sort-merge join removes the false positives; before/after "
    "pruning audit in the output",
)
def c21_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    build = orders.filter(F.expr(_C21_PRED_SQL))
    bkeys = build.select(F.col("o_orderkey").cast("string").alias("k")).distinct()
    # ONE eager job up front: the build-key count sizes m (what Spark's
    # runtime filter does from its ndv estimate). Everything else stays a
    # single LAZY plan — an earlier draft eagerly localCheckpoint'd the
    # hashed build keys, and the fresh per-call RDD ids in the checkpoint
    # scan defeated the codegen cache on EVERY call (~50 s of repeated
    # janino compiles of the md5 stages per invocation; the md5+hexval
    # chain is expensive to compile, ~15 s per unique stage)
    n_build = bkeys.count()
    m = _c21_m(n_build)
    bits = bkeys.select((_c21_hash(F.col("k")) % m).alias("pos")).distinct()

    probe = li.withColumn("k", F.col("l_orderkey").cast("string"))
    marked = probe.select(
        "l_orderkey",
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
        (_c21_hash(F.col("k")) % m).alias("pos"),
    )
    # ONE broadcast left-semi join = the map-side prune; rows only drop
    # (bits is distinct), the stage stays whole-stage codegen'd
    passed = marked.join(F.broadcast(bits), "pos", "left_semi").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    # probe_rows_total comes from a bare count-star over the probe table
    # (Parquet metadata count, no hashing) so the audit adds only ONE
    # extra evaluation of the hashed probe (the after-filter count)
    audit = (
        li.agg(F.count(F.lit(1)).cast("bigint").alias("probe_rows_total"))
        .crossJoin(
            passed.agg(
                F.count(F.lit(1)).cast("bigint").alias("probe_rows_after_bloom")
            )
        )
        .withColumn("n_build_keys", F.lit(n_build).cast("bigint"))
    )
    # exact join forced to sort-merge: this is the regime the reduction
    # exists for (build side too big to broadcast); filter false
    # positives die here, so the grouped result is filter-independent
    joined = passed.join(
        build.select("o_orderkey").hint("merge"),
        passed["l_orderkey"] == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(audit))
        .select(
            "l_returnflag", "n_lineitems", "revenue_cents",
            "probe_rows_total", "probe_rows_after_bloom", "n_build_keys",
        )
    )


# --------------------------------------------------------------------------
# m24 — REAL WebVTT parse + cue-alignment audit (round 8): the subtitle
# pre-flight every subtitle-aligned speech corpus (the dominant source of
# paired audio/text at scale) runs before cutting audio at cue
# boundaries. Genuine WebVTT documents are synthesized (jittered starts,
# overlapping and out-of-order cues — the defects in real-world subs),
# re-parsed by a real parser, and audited per file: overlaps and
# out-of-order starts break naive cutters; raw speech-ms vs the
# merged-interval union quantifies how much audio a cutter can actually
# extract. Integer-ms arithmetic inside one Arrow map stage; the oracle
# replays the closed-form generator through a SQL gaps-and-islands
# interval merge.
# --------------------------------------------------------------------------
@register(
    "m24_vtt_cue_alignment",
    """
    WITH a AS (
      SELECT doc_id AS id, CAST(4 + doc_id % 8 AS INT) AS n
      FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
    ), cues AS (
      SELECT id, c,
             c * 2000 + ((id + c) % 5) * 600 + (c % 2) * 800 AS s,
             c * 2000 + ((id + c) % 5) * 600 + (c % 2) * 800
               + 1500 + ((id * 3 + c * 7) % 1000) AS e,
             LENGTH('cue' || c || ' doc' || id
                    || repeat(' la', CAST((id + c) % 4 AS INT))) AS chars
      FROM (SELECT id, UNNEST(generate_series(0, n - 1)) AS c FROM a)
    ), seq AS (
      SELECT id, s, e,
             LEAD(s) OVER (PARTITION BY id ORDER BY c) AS next_s
      FROM cues
    ), isl AS (
      SELECT id, s, e, c,
             CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                  THEN 1 ELSE 0 END AS brk
      FROM cues
      WINDOW w AS (PARTITION BY id ORDER BY s, e, c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), grp AS (
      -- ORDER BY must include c so both windows agree on tie order even if
      -- two cues ever shared identical (s, e) (ADVICE r08)
      SELECT id, s, e,
             SUM(brk) OVER (PARTITION BY id ORDER BY s, e, c
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS g
      FROM isl
    ), un AS (
      SELECT id, SUM(mx - mn) AS union_ms
      FROM (SELECT id, g, MAX(e) AS mx, MIN(s) AS mn FROM grp GROUP BY id, g)
      GROUP BY id
    )
    SELECT a.id,
           a.n AS n_cues,
           CAST((SELECT COUNT(*) FROM seq
                 WHERE seq.id = a.id AND seq.next_s < seq.e) AS INT)
             AS n_overlap_pairs,
           CAST((SELECT COUNT(*) FROM seq
                 WHERE seq.id = a.id AND seq.next_s < seq.s) AS INT)
             AS n_out_of_order,
           (SELECT CAST(SUM(e - s) AS BIGINT) FROM cues WHERE cues.id = a.id)
             AS speech_ms,
           CAST(un.union_ms AS BIGINT) AS union_ms,
           (SELECT CAST(SUM(chars) AS BIGINT) FROM cues WHERE cues.id = a.id)
             AS payload_chars
    FROM a JOIN un ON un.id = a.id
    """,
    "REAL WebVTT parse + cue-alignment audit: overlap/out-of-order cue "
    "census, raw speech-ms vs merged-interval union per subtitle file — "
    "the pre-flight before cutting audio at cue boundaries; oracle = "
    "closed-form generator replay + SQL gaps-and-islands",
)
def m24_vtt_cue_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    subs = MM.synthesize_webvtt(docs, "doc_id")
    return MM.vtt_cue_alignment_audit(subs, "id", "data")
