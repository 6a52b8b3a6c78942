"""Embedding similarity search (approximate-nearest-neighbor).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Small query set shipped into a numpy ``mapInPandas`` kernel over the
  candidate table; per-batch partial top-k keeps the shuffle at ~k·Q rows
  per partition.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path. Vectors
  are bucketed by sign-pattern; only same-bucket (plus probing) pairs are
  compared, turning the O(N·Q) cross join into a bucket-local join.

Everything computes in double precision (cast from float32 storage) so
results are reproducible and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact-path operators ship a driver-collected vector matrix into their
# kernels (a faiss-style flat index). Past this many vectors the collect
# itself is the failure mode at scale, so the guard raises with the LSH
# alternative to use instead. Overridable per call (tests use a tiny cap).
EXACT_PATH_MAX_VECTORS = 100_000


class ExactPathScaleError(ValueError):
    """Raised when an exact similarity path would collect more vectors to the
    driver than ``max_vectors`` allows. The message names the LSH-bucketed
    operator that handles the same query shape at scale."""


def _guard_exact_path(df: DataFrame, max_vectors: int, op: str, alternative: str) -> None:
    """Cheap count-guard before a driver-side collect. Costs one count job
    over a single-column projection (column-pruned scan) — negligible next
    to the collect it protects, and it turns the documented ~100k-vector
    contract into code instead of prose."""
    n = df.count()
    if n > max_vectors:
        raise ExactPathScaleError(
            f"{op}: {n} vectors exceed the exact-path driver-collect bound "
            f"({max_vectors}); use {alternative} for corpora this size"
        )


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — matches the oracle's summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def _seq_cosine_fns():
    """The ONE definition of the kernel-side cosine contract, as a factory
    (the returned closure is cloudpickle'd BY VALUE into worker closures —
    a module-level helper would need this package importable on executors,
    which the driver-harness sys.path setup does not provide).

    ``seq_cosine_matrix(a, b)``: (Na, D) × (Nb, D) float64 → (Na, Nb)
    cosine similarities, accumulating dot products and squared norms
    dimension-by-dimension (a j-loop of vectorized adds). That is the exact
    left-to-right IEEE sequence of the JVM ``F.aggregate`` fold and of
    DuckDB's ``list_cosine_similarity`` — the property every bit-exact
    similarity oracle in this module depends on. Zero vectors: norms are
    floored at 1e-300 (a no-op for any nonzero vector), so sims come back
    0.0 instead of NaN (NaN sort position differs across engines).

    Symmetric self-comparison (``b is None`` or ``b is a``) reuses the one
    norm accumulator instead of computing it twice — bit-identical output
    (the per-element products are the same IEEE sequence), just without the
    duplicated O(N·D) norm pass the r2 kernel consolidation introduced.
    """
    import numpy as np

    def seq_cosine_matrix(a, b=None):
        sym = b is None or b is a
        if sym:
            b = a
        dim = a.shape[1]
        acc = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
        an2 = np.zeros(a.shape[0], dtype=np.float64)
        bn2 = an2 if sym else np.zeros(b.shape[0], dtype=np.float64)
        for j in range(dim):
            acc += a[:, j : j + 1] * b[None, :, j]
            an2 += a[:, j] * a[:, j]
            if not sym:
                bn2 += b[:, j] * b[:, j]
        an = np.maximum(np.sqrt(an2), 1e-300)
        bn = an if sym else np.maximum(np.sqrt(bn2), 1e-300)
        # floor the PRODUCT too: 1e-300 * 1e-300 underflows to 0.0, so a
        # zero×zero pair would be 0/0 = NaN despite the per-norm floors
        return acc / np.maximum(an[:, None] * bn[None, :], 1e-300)

    return seq_cosine_matrix


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    max_vectors: int = EXACT_PATH_MAX_VECTORS,
) -> DataFrame:
    """Exact cosine top-k of every query against all candidates.

    Plan shape: collect the (small, guarded by ``max_vectors``) query set
    to the driver,
    ship it inside a numpy ``mapInPandas`` kernel over the candidate table,
    emit only each Arrow batch's per-query top-k — so the one shuffle (the
    final window keyed by query id) moves ~k·Q rows per partition, never
    the N×Q cross product. For large Q, swap to ``lsh_topk``.

    Floating-point contract: the kernel accumulates dot products and norms
    dimension-by-dimension (a loop of vectorized adds), which is the exact
    IEEE operation sequence of the left-to-right ``F.aggregate`` fold and of
    the DuckDB oracle — so values bit-match the previous JVM-HOF
    implementation while running ~10× faster (interpreted higher-order
    lambdas are never codegen'd; see operators/dedup.py for the same trade).
    """
    q_proj = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    _guard_exact_path(
        queries.select(query_id), max_vectors, "brute_force_topk", "lsh_topk"
    )
    q_rows = q_proj.collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_vecs = [list(r["q_vec"]) for r in q_rows]
    kk = int(k)
    seq_cos = _seq_cosine_fns()

    def kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        qm = np_w.asarray(q_vecs, dtype=np_w.float64)  # (Q, D)
        qid = np_w.asarray(q_ids)
        for pdf in batches:
            if not len(pdf) or not len(qid):
                continue
            ids = pdf["neighbor_id"].to_numpy()
            cm = np_w.array(list(pdf["c_vec"]), dtype=np_w.float64)  # (B, D)
            sims = seq_cos(cm, qm)  # (B, Q)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qid)):
                col = sims[:, qi]
                mask = ids != qid[qi]
                cand_ids, cand_sims = ids[mask], col[mask]
                take = min(kk, cand_ids.size)
                if not take:
                    continue
                # batch-local top-k, ties broken by neighbor_id asc
                order = np_w.lexsort((cand_ids, -cand_sims))[:take]
                out_q.extend([qid[qi]] * take)
                out_n.extend(cand_ids[order])
                out_s.extend(cand_sims[order])
            yield pd_w.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    spark = candidates.sparkSession
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).repartition(spark.sparkContext.defaultParallelism)
    scored = c.mapInPandas(kernel, "query_id bigint, neighbor_id bigint, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rnk")
    )


def mips_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    max_vectors: int = EXACT_PATH_MAX_VECTORS,
) -> DataFrame:
    """Exact maximum-inner-product top-k (MIPS) — the recommender-system
    retrieval semantics, where two-tower models rank by raw dot product and
    a long vector IS a strong match (cosine's normalization would erase the
    popularity/magnitude signal the model trained into the norms).

    Same plan shape and guard as :func:`brute_force_topk`: broadcast the
    small query set into a numpy ``mapInPandas`` kernel over the candidate
    table, emit per-batch top-k, one final window shuffle of ~k·Q rows.
    The dot products accumulate dimension-by-dimension (the
    ``_seq_cosine_fns`` IEEE contract minus the norms), matching DuckDB's
    ``list_inner_product`` fold exactly — so even this approximate-free
    kernel is bit-oracle-checkable."""
    q_proj = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    _guard_exact_path(
        queries.select(query_id), max_vectors, "mips_topk", "lsh_topk"
    )
    q_rows = q_proj.collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_vecs = [list(r["q_vec"]) for r in q_rows]
    kk = int(k)

    def kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        qm = np_w.asarray(q_vecs, dtype=np_w.float64)  # (Q, D)
        qid = np_w.asarray(q_ids)
        for pdf in batches:
            if not len(pdf) or not len(qid):
                continue
            ids = pdf["neighbor_id"].to_numpy()
            cm = np_w.array(list(pdf["c_vec"]), dtype=np_w.float64)  # (B, D)
            # dim-by-dim accumulation: the left-to-right IEEE sequence of
            # DuckDB's list_inner_product (same contract as seq_cosine)
            acc = np_w.zeros((cm.shape[0], qm.shape[0]), dtype=np_w.float64)
            for j in range(cm.shape[1]):
                acc += cm[:, j : j + 1] * qm[None, :, j]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qid)):
                col = acc[:, qi]
                mask = ids != qid[qi]
                cand_ids, cand_dots = ids[mask], col[mask]
                take = min(kk, cand_ids.size)
                if not take:
                    continue
                order = np_w.lexsort((cand_ids, -cand_dots))[:take]
                out_q.extend([qid[qi]] * take)
                out_n.extend(cand_ids[order])
                out_s.extend(cand_dots[order])
            yield pd_w.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "dot": out_s}
            )

    spark = candidates.sparkSession
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).repartition(spark.sparkContext.defaultParallelism)
    scored = c.mapInPandas(kernel, "query_id bigint, neighbor_id bigint, dot double")
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("dot", 4).alias("dot"), "rnk")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via an LCG (reproducible
    across runs/executors without RNG state)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            # map to [-1, 1)
            row.append(state / float(1 << 62) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit i = sign(vec · plane_i)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, p) > 0, F.lit(2**i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket + bit
    return bucket


def recommended_lsh_planes(n_vectors: int, target_bucket: int = 1024) -> int:
    """Plane count for :func:`bucketed_neardup_pairs` at a given corpus
    size. The per-bucket kernel materializes a (N/2^p)² similarity matrix,
    so p must GROW WITH log2(N) to hold per-task memory constant: a plane
    count that is fine at 20k vectors (p=4 → 1.2k/bucket → 12 MB matrices)
    is a 5 GB/task hazard at 200k (measured in the round-6 100× scale
    experiment, SURVEY §6.2). p = ceil(log2(N / target_bucket)); the
    default 1024-vector buckets cost ~8 MB per task matrix."""
    import math

    return max(1, math.ceil(math.log2(max(2.0, n_vectors / target_bucket))))


def bucketed_neardup_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within hyperplane-LSH buckets, scored by a
    per-bucket numpy kernel (``applyInPandas``): normalize → one matrix
    multiply → pairs above threshold. Replaces O(pairs × dim) interpreted
    per-pair expressions with a vectorized BLAS call per bucket — measured
    ~10× faster — and is exactly the kernel shape a 100 TB run shards by
    bucket across executors (bucket count, via ``n_planes``, bounds the
    per-task matrix size).

    ``n_planes`` must scale with corpus size — per-bucket work is
    (N/2^p)², quadratic in bucket occupancy. Size it with
    :func:`recommended_lsh_planes` (p ≈ log2(N/1024)); the constants in
    the registered e02/g07 queries are tuned for the fixture corpora and
    recall-checked there, not for an arbitrary N."""
    planes = _hyperplanes(dim, n_planes)
    thr = float(threshold)
    seq_cos = _seq_cosine_fns()  # the module's one bit-exact cosine kernel

    def kernel(pdf):
        import numpy as np
        import pandas as pd_w

        ids = pdf["id"].to_numpy()
        m = np.array(list(pdf["v"]), dtype=np.float64)
        sims = seq_cos(m, m)
        ia, ib = np.triu_indices(len(ids), k=1)
        # enforce id_a < id_b regardless of within-bucket row order
        lo, hi = np.minimum(ids[ia], ids[ib]), np.maximum(ids[ia], ids[ib])
        keep = sims[ia, ib] >= thr
        return pd_w.DataFrame(
            {
                "id_a": lo[keep],
                "id_b": hi[keep],
                "sim": np.round(sims[ia, ib][keep], 4),
            }
        )

    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    pairs = v.groupBy("bucket").applyInPandas(kernel, "id_a bigint, id_b bigint, sim double")
    # a pair can share several buckets → dedup on the pair key
    return pairs.dropDuplicates(["id_a", "id_b"])


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: compare only within the same hyperplane
    bucket. Recall is tunable via ``n_planes`` (fewer planes → bigger
    buckets → higher recall, more compute). The join is an equi-join on
    bucket id → ordinary shuffle-hash join, scales linearly."""
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("bucket", lsh_bucket(F.col("q_vec"), planes))
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("bucket", lsh_bucket(F.col("c_vec"), planes))
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed bucket search
# ---------------------------------------------------------------------------


def _train_centroids_np(sample, n_centroids: int, iters: int = 5):
    """Deterministic mini k-means on a driver-side sample (numpy).

    IVF trains its coarse quantizer on a bounded sample in every real system
    (faiss trains on ~100k vectors regardless of corpus size) — the collect
    here is capped by the caller, not proportional to data size. Fixed
    init (first k sample rows) + fixed iteration count keeps centroids
    reproducible across runs and cluster sizes."""
    import numpy as np

    m = np.asarray(sample, dtype=np.float64)
    cents = m[:n_centroids].copy()
    for _ in range(iters):
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_cap: int = 4096,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via an inverted-file index.

    Structure: (1) train centroids on a deterministic bounded sample;
    (2) assign every candidate to its nearest centroid — one Arrow pass,
    list partitioned by centroid id; (3) each query probes its ``n_probe``
    nearest centroids; (4) per-(centroid) numpy kernel scores query×member
    pairs; (5) global window top-k per query. The expensive compare is
    bucket-local — the same equi-join-on-list-id shape faiss shards across
    machines — so cost scales with corpus/n_centroids × n_probe, not the
    full cross product.

    Exactness contract: with ``n_probe == n_centroids`` the scored set is
    the whole corpus and the kernel cosine is the ``_seq_cosine_fns``
    IEEE sequence with (sim desc, id asc) tie-breaks — output is
    BIT-identical to ``brute_force_topk`` regardless of where k-means put
    the centroids, which is what lets the trained path carry the exact
    oracle (s04) while partial probing stays a recall-tested
    approximation.
    """
    # orderBy before limit → TakeOrdered: the training sample is the same
    # rows regardless of partitioning/scan order (a bare limit() samples
    # whatever partition responds first, making centroids run-dependent)
    stride_sample = (
        candidates.select(
            F.col(cand_id).alias("k"), _as_double(F.col(vec_col)).alias("v")
        )
        .orderBy("k")
        .limit(train_cap)
        .collect()
    )
    cents = _train_centroids_np([r["v"] for r in stride_sample], n_centroids)
    cents_list = [[float(x) for x in row] for row in cents]
    np_k, np_probe = k, n_probe

    def assign_batches(batches):
        import numpy as np_w
        import pandas as pd_w

        c = np_w.asarray(cents_list)
        for pdf in batches:
            m = np_w.array(list(pdf["v"]), dtype=np_w.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd_w.DataFrame(
                {"id": pdf["id"], "v": pdf["v"], "list_id": d.argmin(axis=1).astype(int)}
            )

    def probe_batches(batches):
        import numpy as np_w
        import pandas as pd_w

        c = np_w.asarray(cents_list)
        for pdf in batches:
            m = np_w.array(list(pdf["v"]), dtype=np_w.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            near = np_w.argsort(d, axis=1)[:, :np_probe]
            ids, vs, lids = [], [], []
            for i in range(len(pdf)):
                for lid in near[i]:
                    ids.append(pdf["id"].iloc[i])
                    vs.append(pdf["v"].iloc[i])
                    lids.append(int(lid))
            yield pd_w.DataFrame({"id": ids, "v": vs, "list_id": lids})

    seq_cos = _seq_cosine_fns()

    def score_group(pdf):
        import numpy as np_w
        import pandas as pd_w

        qs = pdf[pdf["side"] == "q"]
        cs = pdf[pdf["side"] == "c"]
        if qs.empty or cs.empty:
            return pd_w.DataFrame(
                {"query_id": [], "neighbor_id": [], "sim": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "sim": "float64"})
        qm = np_w.array(list(qs["v"]), dtype=np_w.float64)
        cm = np_w.array(list(cs["v"]), dtype=np_w.float64)
        # seq_cos = the brute_force_topk / DuckDB list_cosine_similarity
        # IEEE sequence, so with n_probe == n_centroids this path is
        # BIT-identical to exact search (s04's oracle identity); lexsort
        # breaks sim ties by neighbor_id asc, matching the global window
        sims = seq_cos(cm, qm)  # (C, Q)
        out_q, out_c, out_s = [], [], []
        qids = qs["id"].to_numpy()
        cids = cs["id"].to_numpy()
        # per-query local top-k inside this list (global k resolved later);
        # a global top-k neighbor precedes < k candidates in the total
        # (sim desc, id asc) order, hence < k within its own list — so the
        # union of per-list top-k always contains the global top-k
        for i in range(len(qids)):
            col = sims[:, i]
            mask = cids != qids[i]
            cand_ids, cand_sims = cids[mask], col[mask]
            take = min(np_k, cand_ids.size)
            if not take:
                continue
            order = np_w.lexsort((cand_ids, -cand_sims))[:take]
            out_q.extend([qids[i]] * take)
            out_c.extend(cand_ids[order])
            out_s.extend(cand_sims[order])
        return pd_w.DataFrame({"query_id": out_q, "neighbor_id": out_c, "sim": out_s})

    q = queries.select(
        F.col(query_id).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).mapInPandas(probe_batches, "id bigint, v array<double>, list_id int")
    c = candidates.select(
        F.col(cand_id).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).mapInPandas(assign_batches, "id bigint, v array<double>, list_id int")

    tagged = q.withColumn("side", F.lit("q")).unionByName(
        c.withColumn("side", F.lit("c"))
    )
    scored = tagged.groupBy("list_id").applyInPandas(
        score_group, "query_id bigint, neighbor_id bigint, sim double"
    )
    # a (query, neighbor) pair can appear via several probed lists
    dedup = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        dedup.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        # rank over RAW sims, round only the emitted value — the
        # brute_force_topk output contract
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rnk")
    )


def ivf_fixed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with a caller-supplied (fixed) coarse quantizer.

    The trained path (:func:`ivf_topk`) learns centroids with k-means, which
    makes its output SQL-irreproducible; real systems train the quantizer
    offline anyway (faiss ships index factories exactly so the quantizer is
    an *input*). This variant takes the centroids as literals, so every
    stage is deterministic and the whole operator is oracle-checkable:

    - assignment: each candidate joins the inverted list of its
      max-cosine centroid (ties → lower centroid id);
    - probing: each query expands to its ``n_probe`` highest-cosine
      centroids (one row per probed list);
    - scoring: cosine within probed lists only → equi-join on list id,
      never a cross product; global top-k per query by window.

    All three stages run as Arrow numpy kernels whose dot/norm accumulation
    is dimension-sequential (a j-loop of vectorized adds) — the exact IEEE
    sequence of the DuckDB oracle's ``list_cosine_similarity`` (proven
    bit-exact by s01/e01/e02), so assignment, probing, and ranking agree
    with :func:`ivf_fixed_oracle_sql` bit-for-bit while running ~10× faster
    than the interpreted JVM-HOF fold this replaced (higher-order lambdas
    are never codegen'd; K centroids × D dims per row adds up).
    """
    cents_list = [[float(x) for x in c] for c in centroids]
    np_probe = int(n_probe)
    seq_cos = _seq_cosine_fns()  # the module's one bit-exact cosine kernel

    def _cent_sims(m, np_w):
        # (B×D) vs (K×D) centroid cosine via the shared kernel
        return seq_cos(m, np_w.asarray(cents_list, dtype=np_w.float64))

    def assign_kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        for pdf in batches:
            if not len(pdf):
                continue
            m = np_w.array(list(pdf["v"]), dtype=np_w.float64)
            sims = _cent_sims(m, np_w)
            # argmax returns the FIRST max → lowest centroid id on ties,
            # matching the oracle's ORDER BY sim DESC, cid ASC ... rk = 1
            yield pd_w.DataFrame(
                {
                    "id": pdf["id"],
                    "v": pdf["v"],
                    "list_id": sims.argmax(axis=1).astype(int),
                }
            )

    def probe_kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        for pdf in batches:
            if not len(pdf):
                continue
            m = np_w.array(list(pdf["v"]), dtype=np_w.float64)
            sims = _cent_sims(m, np_w)
            ids, vs, lids = [], [], []
            for i in range(len(pdf)):
                # stable (-sim, cid) order == ORDER BY sim DESC, cid ASC
                order = np_w.lexsort(
                    (np_w.arange(sims.shape[1]), -sims[i])
                )[:np_probe]
                for lid in order:
                    ids.append(pdf["id"].iloc[i])
                    vs.append(pdf["v"].iloc[i])
                    lids.append(int(lid))
            yield pd_w.DataFrame({"id": ids, "v": vs, "list_id": lids})

    def score_group(pdf):
        import numpy as np_w
        import pandas as pd_w

        qs = pdf[pdf["side"] == "q"]
        cs = pdf[pdf["side"] == "c"]
        empty = pd_w.DataFrame({"query_id": [], "neighbor_id": [], "sim": []}).astype(
            {"query_id": "int64", "neighbor_id": "int64", "sim": "float64"}
        )
        if qs.empty or cs.empty:
            return empty
        qm = np_w.array(list(qs["v"]), dtype=np_w.float64)
        cm = np_w.array(list(cs["v"]), dtype=np_w.float64)
        sims = seq_cos(qm, cm)
        qids = qs["id"].to_numpy()
        cids = cs["id"].to_numpy()
        keep_q, keep_c = np_w.nonzero(qids[:, None] != cids[None, :])
        return pd_w.DataFrame(
            {
                "query_id": qids[keep_q],
                "neighbor_id": cids[keep_c],
                "sim": sims[keep_q, keep_c],
            }
        )

    spark = candidates.sparkSession
    c = (
        candidates.select(
            F.col(cand_id).alias("id"), _as_double(F.col(vec_col)).alias("v")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(assign_kernel, "id bigint, v array<double>, list_id int")
    )
    q = queries.select(
        F.col(query_id).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).mapInPandas(probe_kernel, "id bigint, v array<double>, list_id int")
    # each candidate lives in exactly one list and probed lists are distinct,
    # so a (query, neighbor) pair appears at most once — no dedup needed
    tagged = q.withColumn("side", F.lit("q")).unionByName(
        c.withColumn("side", F.lit("c"))
    )
    scored = tagged.groupBy("list_id").applyInPandas(
        score_group, "query_id bigint, neighbor_id bigint, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rnk")
    )


def ivf_fixed_oracle_sql(
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB SQL reproducing :func:`ivf_fixed_topk` exactly — centroids are
    literal rows, assignment/probing rank by the same bit-exact
    ``list_cosine_similarity`` with the same centroid-id tie-break."""
    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(centroids)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents(cid, c) AS (VALUES {cent_rows}),
    assign AS (
      SELECT vec_id, e, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_cosine_similarity(e, c) DESC, cid)
               AS rk
      FROM v CROSS JOIN cents),
    cand AS (SELECT vec_id, e, cid FROM assign WHERE rk = 1),
    probe AS (SELECT vec_id, e, cid FROM assign
              WHERE rk <= {n_probe} AND {query_pred}),
    pairs AS (
      SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(p.e, c.e) AS sim
      FROM probe p JOIN cand c ON p.cid = c.cid AND p.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {k}
    """


def exact_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_vectors: int = EXACT_PATH_MAX_VECTORS,
) -> DataFrame:
    """Exact all-pairs cosine near-dup pairs (id_a < id_b, sim >= threshold).

    Kernel shape: the full (normalized-by-hand) vector matrix rides into a
    numpy ``mapInPandas`` closure (a flat index, faiss-style — a few MB up
    to ~100k vectors); each Arrow batch multiplies against it and emits only
    surviving pairs. Replaces the interpreted JVM HOF cosine over the N²/2
    broadcast join, which at sf0.1 (5k vectors, 12.5M pairs) costs ~60s vs
    ~2s here. Past ``max_vectors`` (default ~100k) the guard raises
    :class:`ExactPathScaleError` pointing at the LSH-bucketed
    :func:`bucketed_neardup_pairs` / e02 instead — this is the exact
    correctness baseline, like s01 for top-k.

    Floating-point contract: dot products and norms accumulate
    dimension-by-dimension (vectorized adds in a j-loop) — the left-to-right
    IEEE sequence of the DuckDB oracle's ``list_cosine_similarity``.
    """
    _guard_exact_path(
        df.select(id_col), max_vectors, "exact_neardup_pairs", "bucketed_neardup_pairs"
    )
    rows = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).collect()
    all_ids = [r["id"] for r in rows]
    all_vecs = [list(r["v"]) for r in rows]
    thr = float(threshold)

    seq_cos = _seq_cosine_fns()  # the module's one bit-exact cosine kernel

    def kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        cm = np_w.asarray(all_vecs, dtype=np_w.float64)  # (N, D)
        cids = np_w.asarray(all_ids)
        for pdf in batches:
            if not len(pdf):
                continue
            bm = np_w.array(list(pdf["v"]), dtype=np_w.float64)  # (B, D)
            bids = pdf["id"].to_numpy()
            sims = seq_cos(bm, cm)
            keep_b, keep_c = np_w.nonzero(
                (sims >= thr) & (bids[:, None] < cids[None, :])
            )
            yield pd_w.DataFrame(
                {
                    "id_a": bids[keep_b],
                    "id_b": cids[keep_c],
                    "sim": np_w.round(sims[keep_b, keep_c], 4),
                }
            )

    spark = df.sparkSession
    src = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(kernel, "id_a bigint, id_b bigint, sim double")


def bucketed_neardup_oracle_sql(
    threshold: float, n_planes: int = 4, dim: int = 64
) -> str:
    """DuckDB SQL reproducing :func:`bucketed_neardup_pairs` exactly: the
    hyperplanes are deterministic literals (LCG — see :func:`_hyperplanes`),
    bucket assignment is a sign-pattern over literal dot products, and the
    per-bucket kernel accumulates dimension-sequentially, i.e. in
    ``list_cosine_similarity``'s exact IEEE order."""
    planes = _hyperplanes(dim, n_planes)
    bucket = " + ".join(
        f"CASE WHEN list_dot_product(e, [{', '.join(repr(v) for v in plane)}]) > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e, ({bucket}) AS bucket FROM v)
    SELECT a.vec_id AS id_a, bb.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, bb.e), 4) AS sim
    FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
    WHERE list_cosine_similarity(a.e, bb.e) >= {threshold}
    """


def lsh_topk_oracle_sql(
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB SQL reproducing :func:`lsh_topk` exactly — the bucketing uses
    the same literal hyperplanes and the JVM cosine fold equals
    ``list_cosine_similarity``'s summation order, so even the approximate
    path is deterministic and oracle-checkable."""
    planes = _hyperplanes(dim, n_planes)
    bucket = " + ".join(
        f"CASE WHEN list_dot_product(e, [{', '.join(repr(v) for v in plane)}]) > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e, ({bucket}) AS bucket FROM v),
    q AS (SELECT * FROM b WHERE {query_pred}),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.e, c.e) AS sim
      FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM pairs)
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------


def pq_codebook(
    m_sub: int = 8, k_codes: int = 16, subdim: int = 8
) -> list[list[list[float]]]:
    """Deterministic PQ codebook: ``m_sub`` subspaces x ``k_codes`` codewords
    x ``subdim`` dims. Real systems train codebooks offline with k-means
    (faiss ``IndexPQ``); like :func:`ivf_fixed_topk`'s quantizer, the
    codebook here is an *input*, generated from a Knuth-multiplicative
    integer lattice mapped onto exact dyadic rationals (n/2048 and 0.25 are
    exact doubles), so the identical values are reproducible inside a SQL
    oracle with integer arithmetic alone — no RNG, no transcendentals."""
    cb = []
    for s in range(m_sub):
        rows = []
        for j in range(k_codes):
            row = []
            for d in range(subdim):
                idx = (s * k_codes + j) * subdim + d
                row.append(((idx * 2654435761) % 1024) / 2048.0 - 0.25)
            rows.append(row)
        cb.append(rows)
    return cb


def pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 5,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    max_vectors: int = EXACT_PATH_MAX_VECTORS,
) -> DataFrame:
    """PQ-ADC top-k: quantize candidates to ``m_sub`` byte codes, score with
    per-query lookup tables — faiss ``IndexPQ.search`` re-expressed on
    Spark.

    Plan shape: the (small, guarded) query set becomes per-query LUTs
    ``lut[s][j] = dist(q_s, codebook[s][j])`` shipped into one
    ``mapInPandas`` kernel over the candidate table; each Arrow batch
    encodes candidates (argmin over codewords per subspace, ties -> lower
    code id), gathers LUT entries, and emits only its per-query top-k —
    the one shuffle (final window by query id) moves ~k.Q rows per
    partition and the full-precision vectors never leave the scan. At
    100 TB the candidate side streams: codes are M bytes per vector vs
    4D bytes raw (32x compression at D=64, M=8), which is the entire
    point of PQ. Compose with :func:`ivf_fixed_topk`'s coarse quantizer
    for IVFPQ when even scanning codes is too much.

    Determinism contract: subspace distances accumulate
    dimension-sequentially (the module's j-loop IEEE sequence, equal to a
    left-associative ``+`` chain in SQL), then are floored to integer
    nano-units (``floor(dist * 1e9)``) BEFORE the cross-subspace sum — so
    the ADC score is an int64 whose summation order is free, immune to the
    float-associativity drift that plagues cross-engine aggregation. The
    oracle (:func:`pq_oracle_sql`) reproduces encode, LUT, and ranking
    bit-for-bit; ties rank by neighbor_id ascending.
    """
    cb = [[[float(x) for x in row] for row in sub] for sub in codebook]
    m_sub = len(cb)
    kk = int(k)
    q_proj = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    _guard_exact_path(queries.select(query_id), max_vectors, "pq_topk", "lsh_topk")
    q_rows = q_proj.collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_vecs = [list(r["q_vec"]) for r in q_rows]
    subdists = _pq_dist_fns(cb)  # the ONE bit-exact subspace-distance kernel

    def kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        qid = np_w.asarray(q_ids)
        qm = np_w.asarray(q_vecs, dtype=np_w.float64)  # (Q, D)

        # per-query integer LUTs, built once per task: (Q, M, K) int64
        ilut = np_w.stack(
            [
                np_w.floor(subdists(qm, s) * 1e9).astype(np_w.int64)
                for s in range(m_sub)
            ],
            axis=1,
        ) if len(qid) else None
        for pdf in batches:
            if not len(pdf) or ilut is None:
                continue
            ids = pdf["neighbor_id"].to_numpy()
            cm = np_w.array(list(pdf["c_vec"]), dtype=np_w.float64)
            # encode: argmin -> first minimum -> lowest code id on ties
            codes = np_w.stack(
                [subdists(cm, s).argmin(axis=1) for s in range(m_sub)], axis=1
            )  # (B, M)
            adc = np_w.zeros((len(qid), len(ids)), dtype=np_w.int64)
            for s in range(m_sub):
                adc += ilut[:, s, :][:, codes[:, s]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qid)):
                mask = ids != qid[qi]
                c_ids, sc = ids[mask], adc[qi][mask]
                take = min(kk, c_ids.size)
                if not take:
                    continue
                order = np_w.lexsort((c_ids, sc))[:take]
                out_q.extend([qid[qi]] * take)
                out_n.extend(c_ids[order])
                out_s.extend(sc[order])
            yield pd_w.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_dist": out_s}
            )

    spark = candidates.sparkSession
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).repartition(spark.sparkContext.defaultParallelism)
    scored = c.mapInPandas(
        kernel, "query_id bigint, neighbor_id bigint, adc_dist bigint"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select("query_id", "neighbor_id", "adc_dist", "rnk")
    )


def pq_oracle_sql(
    m_sub: int = 8,
    k_codes: int = 16,
    subdim: int = 8,
    k: int = 5,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB SQL reproducing :func:`pq_topk` with the
    :func:`pq_codebook` lattice — codebook from integer arithmetic, subspace
    distances as a left-associative ``+`` chain (the kernel's j-loop IEEE
    sequence), ADC as an order-free BIGINT sum of floored nano-unit
    distances, ties by code id then neighbor_id."""
    terms = " + ".join(
        f"(v[s*{subdim}+{d + 1}]-cw[{d + 1}])*(v[s*{subdim}+{d + 1}]-cw[{d + 1}])"
        for d in range(subdim)
    )
    return f"""
    WITH cbook AS (
      SELECT CAST(s AS INT) AS s, CAST(j AS INT) AS j,
             list_transform(range({subdim}),
                            d -> (((s*{k_codes}+j)*{subdim}+d) * 2654435761)
                                 % 1024 / 2048.0 - 0.25) AS cw
      FROM range({m_sub}) t1(s), range({k_codes}) t2(j)),
    vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dists AS (
      SELECT vec_id, s, j, {terms} AS dist
      FROM vecs, cbook),
    codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT vec_id, s, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist ASC, j ASC) AS rn
        FROM dists) WHERE rn = 1),
    qlut AS (
      SELECT vec_id AS query_id, s, j, CAST(floor(dist * 1e9) AS BIGINT) AS idist
      FROM dists WHERE {query_pred}),
    scores AS (
      SELECT ql.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(ql.idist) AS BIGINT) AS adc_dist
      FROM codes c JOIN qlut ql ON ql.s = c.s AND ql.j = c.code
      WHERE c.vec_id != ql.query_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
      FROM scores) WHERE rnk <= {k}
    """


def _pq_dist_fns(codebook):
    """Factory for the PQ subspace-distance kernel (pickled by value into
    worker closures, like :func:`_seq_cosine_fns`). Returns
    ``subdists(mat, s) -> (N, K)`` squared-L2 distances of subvector ``s``
    against all codewords, accumulated dimension-sequentially — the exact
    IEEE sequence of the oracle's left-associative ``+`` chain."""
    import numpy as np

    cbm = np.asarray(codebook, dtype=np.float64)  # (M, K, SUB)
    k_codes, subdim = cbm.shape[1], cbm.shape[2]

    def subdists(mat, s):
        o = s * subdim
        acc = np.zeros((mat.shape[0], k_codes), dtype=np.float64)
        for d in range(subdim):
            diff = mat[:, o + d : o + d + 1] - cbm[s][None, :, d]
            acc = acc + diff * diff
        return acc

    return subdists


def _ivfpq_kernels(
    centroids: list[list[float]],
    codebook: list[list[list[float]]],
    n_probe: int,
):
    """Shared worker kernels for the IVFPQ family (pickled BY VALUE —
    everything they touch is built inside this factory): assign+encode
    (candidates -> (id, list_id, codes)), probe (queries -> n_probe
    (id, vec, list) rows), score (per-list LUT gather over codes)."""
    cents_list = [[float(x) for x in c] for c in centroids]
    cb = [[[float(x) for x in row] for row in sub] for sub in codebook]
    m_sub = len(cb)
    np_probe = int(n_probe)
    seq_cos = _seq_cosine_fns()
    pq_dists = _pq_dist_fns(cb)

    def assign_encode_kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        cents = np_w.asarray(cents_list, dtype=np_w.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np_w.array(list(pdf["v"]), dtype=np_w.float64)
            sims = seq_cos(m, cents)
            codes = np_w.stack(
                [pq_dists(m, s).argmin(axis=1) for s in range(m_sub)], axis=1
            )
            yield pd_w.DataFrame(
                {
                    "id": pdf["id"],
                    "list_id": sims.argmax(axis=1).astype(int),
                    "codes": list(codes),
                }
            )

    def probe_kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        cents = np_w.asarray(cents_list, dtype=np_w.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np_w.array(list(pdf["v"]), dtype=np_w.float64)
            sims = seq_cos(m, cents)
            ids, vs, lids = [], [], []
            for i in range(len(pdf)):
                order = np_w.lexsort((np_w.arange(sims.shape[1]), -sims[i]))[
                    :np_probe
                ]
                for lid in order:
                    ids.append(pdf["id"].iloc[i])
                    vs.append(pdf["v"].iloc[i])
                    lids.append(int(lid))
            yield pd_w.DataFrame({"id": ids, "v": vs, "list_id": lids})

    def score_group(pdf):
        import numpy as np_w
        import pandas as pd_w

        qs = pdf[pdf["side"] == "q"]
        cs = pdf[pdf["side"] == "c"]
        empty = pd_w.DataFrame(
            {"query_id": [], "neighbor_id": [], "adc_dist": []}
        ).astype(
            {"query_id": "int64", "neighbor_id": "int64", "adc_dist": "int64"}
        )
        if qs.empty or cs.empty:
            return empty
        qm = np_w.array(list(qs["v"]), dtype=np_w.float64)
        codes = np_w.array(list(cs["codes"]), dtype=np_w.int64)
        qids = qs["id"].to_numpy()
        cids = cs["id"].to_numpy()
        ilut = np_w.stack(
            [
                np_w.floor(pq_dists(qm, s) * 1e9).astype(np_w.int64)
                for s in range(m_sub)
            ],
            axis=1,
        )
        adc = np_w.zeros((len(qids), len(cids)), dtype=np_w.int64)
        for s in range(m_sub):
            adc += ilut[:, s, :][:, codes[:, s]]
        keep_q, keep_c = np_w.nonzero(qids[:, None] != cids[None, :])
        return pd_w.DataFrame(
            {
                "query_id": qids[keep_q],
                "neighbor_id": cids[keep_c],
                "adc_dist": adc[keep_q, keep_c],
            }
        )

    return assign_encode_kernel, probe_kernel, score_group


def ivfpq_encode(
    candidates: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[list[float]]],
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The ENCODE stage of the IVFPQ index: one Arrow pass over candidates
    emits ``(id, list_id, codes)`` — coarse max-cosine list assignment +
    PQ code per subspace. The full-precision vector dies here; what the
    index persists is M bytes of code per vector. This is the table a
    vector store writes once and appends daily batches to (s16)."""
    assign_encode_kernel, _, _ = _ivfpq_kernels(centroids, codebook, n_probe=1)
    spark = candidates.sparkSession
    return (
        candidates.select(
            F.col(cand_id).alias("id"), _as_double(F.col(vec_col)).alias("v")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            assign_encode_kernel, "id bigint, list_id int, codes array<int>"
        )
    )


def ivfpq_search_encoded(
    queries: DataFrame,
    encoded: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 4,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SEARCH stage of the IVFPQ index over an already-encoded
    ``(id, list_id, codes)`` table (e.g. read back from the persisted
    inverted lists): queries expand to ``n_probe`` (id, vec, list) rows;
    scoring is ``groupBy(list_id).applyInPandas`` — an equi-join on list
    id, never a cross product, with each group building its queries' LUTs
    locally (8x16 doubles per query — nothing broadcast, nothing
    driver-side)."""
    _, probe_kernel, score_group = _ivfpq_kernels(centroids, codebook, n_probe)
    kk = int(k)
    q = queries.select(
        F.col(query_id).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).mapInPandas(probe_kernel, "id bigint, v array<double>, list_id int")
    tagged = q.withColumn("side", F.lit("q")).withColumn(
        "codes", F.lit(None).cast("array<int>")
    ).unionByName(
        encoded.select("id", "list_id", "codes")
        .withColumn("side", F.lit("c"))
        .withColumn("v", F.lit(None).cast("array<double>"))
    )
    scored = tagged.groupBy("list_id").applyInPandas(
        score_group, "query_id bigint, neighbor_id bigint, adc_dist bigint"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select("query_id", "neighbor_id", "adc_dist", "rnk")
    )


def ivfpq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 4,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ top-k (faiss ``IVFx,PQy`` with ``by_residual=False``): coarse
    quantizer prunes WHICH candidates are scored (probed inverted lists
    only), PQ-ADC decides HOW each survivor is scored (integer LUT
    gathers over 8-byte codes). The two indexes this composes —
    :func:`ivf_fixed_topk`'s max-cosine assignment and :func:`pq_topk`'s
    nano-unit ADC — are each bit-exact against their oracles, so the
    composition is too.

    Round 9 factored the stages into :func:`ivfpq_encode` and
    :func:`ivfpq_search_encoded` (identical kernels — the composition
    here is the same plan as before); s16 persists the encode output as
    a partitioned inverted-list table and appends daily batches to it.
    At 100 TB this is the faiss billion-scale recipe verbatim: prune
    lists, scan codes.
    """
    encoded = ivfpq_encode(
        candidates, centroids, codebook, cand_id=cand_id, vec_col=vec_col
    )
    return ivfpq_search_encoded(
        queries,
        encoded,
        centroids,
        codebook,
        k=k,
        n_probe=n_probe,
        query_id=query_id,
        vec_col=vec_col,
    )


def ivfpq_scores_cte_sql(
    centroids: list[list[float]],
    m_sub: int = 8,
    k_codes: int = 16,
    subdim: int = 8,
    n_probe: int = 4,
    query_pred: str = "vec_id < 10",
) -> str:
    """The CTE chain of :func:`ivfpq_oracle_sql` up to ``scores`` =
    (query_id, neighbor_id, adc_dist), with ``v`` = (vec_id, DOUBLE[] v)
    also in scope — reusable by composite oracles (s12's exact-refine
    stage re-ranks the same candidate set)."""
    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(centroids)
    )
    terms = " + ".join(
        f"(v[s*{subdim}+{d + 1}]-cw[{d + 1}])*(v[s*{subdim}+{d + 1}]-cw[{d + 1}])"
        for d in range(subdim)
    )
    return f"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents(cid, c) AS (VALUES {cent_rows}),
    ass AS (
      SELECT vec_id, v, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_cosine_similarity(v, c) DESC, cid)
               AS rk
      FROM v CROSS JOIN cents),
    cand_list AS (SELECT vec_id, cid FROM ass WHERE rk = 1),
    probe AS (SELECT vec_id, cid FROM ass WHERE rk <= {n_probe} AND {query_pred}),
    cbook AS (
      SELECT CAST(s AS INT) AS s, CAST(j AS INT) AS j,
             list_transform(range({subdim}),
                            d -> (((s*{k_codes}+j)*{subdim}+d) * 2654435761)
                                 % 1024 / 2048.0 - 0.25) AS cw
      FROM range({m_sub}) t1(s), range({k_codes}) t2(j)),
    dists AS (SELECT vec_id, s, j, {terms} AS dist FROM v, cbook),
    codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT vec_id, s, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist ASC, j ASC) AS rn
        FROM dists) WHERE rn = 1),
    qlut AS (
      SELECT vec_id AS query_id, s, j, CAST(floor(dist*1e9) AS BIGINT) AS idist
      FROM dists WHERE {query_pred}),
    pairs AS (
      SELECT p.vec_id AS query_id, cl.vec_id AS neighbor_id
      FROM probe p JOIN cand_list cl ON p.cid = cl.cid AND p.vec_id <> cl.vec_id),
    scores AS (
      SELECT pr.query_id, pr.neighbor_id, CAST(SUM(ql.idist) AS BIGINT) AS adc_dist
      FROM pairs pr
      JOIN codes c ON c.vec_id = pr.neighbor_id
      JOIN qlut ql ON ql.query_id = pr.query_id AND ql.s = c.s AND ql.j = c.code
      GROUP BY 1, 2)"""


def ivfpq_oracle_sql(
    centroids: list[list[float]],
    m_sub: int = 8,
    k_codes: int = 16,
    subdim: int = 8,
    k: int = 5,
    n_probe: int = 4,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB SQL reproducing :func:`ivfpq_topk`: the ivf_fixed assignment
    CTEs (literal centroids, max-cosine, cid tie-break) restrict which
    pairs the pq CTEs (lattice codebook, nano-unit integer ADC) score."""
    cte = ivfpq_scores_cte_sql(
        centroids,
        m_sub=m_sub,
        k_codes=k_codes,
        subdim=subdim,
        n_probe=n_probe,
        query_pred=query_pred,
    )
    return f"""
    WITH {cte}
    SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
      FROM scores) WHERE rnk <= {k}
    """


def mmr_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 3,
    lam: float = 0.5,
    pool: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k: greedily select
    argmax lam*rel(c) - (1-lam)*max_{s in selected} cos(c, s) from a
    ``pool``-sized relevance candidate set.

    Returns (rank, vec_id, relevance, mmr_score) with RAW doubles (callers
    round). Every cosine is the fold-order-matched :func:`cosine` (bit-equal
    to DuckDB ``list_cosine_similarity``) and every argmax tie-breaks on
    vec_id, so the selection is deterministic across engines.

    Scale: the selected set stays a <=k-row broadcast; the only corpus-wide
    work is the candidate pool. Here the pool is brute-force relevance
    (baseline); at 100 TB swap in the s02/s06 ANN candidates — the MMR
    re-rank itself is O(k * pool) regardless of corpus size.
    """
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    qv = v.filter(F.col("vec_id") == query_vec_id).select(F.col("e").alias("qe"))
    w_rel = Window.orderBy(F.desc("rel"), F.asc("vec_id"))
    cand = (
        v.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .withColumn("rel", cosine(F.col("e"), F.col("qe")))
        .withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") <= pool)
        .select("vec_id", "e", "rel")
    )
    w_score = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    first = (
        cand.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") == 1)
        .select(
            F.lit(1).cast("int").alias("rank"),
            "vec_id",
            "e",
            "rel",
            F.col("rel").alias("score"),
        )
    )
    selected = first
    for step in range(2, k + 1):
        sel_e = selected.select(
            F.col("vec_id").alias("s_id"), F.col("e").alias("s_e")
        )
        pen = (
            cand.join(sel_e.select("s_id"), cand["vec_id"] == F.col("s_id"), "left_anti")
            .crossJoin(F.broadcast(sel_e))
            .withColumn("sim", cosine(F.col("e"), F.col("s_e")))
            .groupBy("vec_id")
            .agg(F.max("sim").alias("pen"))
        )
        nxt = (
            cand.join(pen, "vec_id")
            .withColumn("score", lam * F.col("rel") - (1 - lam) * F.col("pen"))
            .withColumn("rn", F.row_number().over(w_score))
            .filter(F.col("rn") == 1)
            .select(
                F.lit(step).cast("int").alias("rank"),
                "vec_id",
                "e",
                "rel",
                "score",
            )
        )
        selected = selected.unionByName(nxt)
    return selected.select(
        "rank",
        "vec_id",
        F.col("rel").alias("relevance"),
        F.col("score").alias("mmr_score"),
    )


def hard_negative_topk(
    anchors: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    anchor_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_anchors: int = 4096,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor, the
    top-k most-similar candidates with a DIFFERENT label (and a different
    id) — the near-miss negatives that make embedding models learn, per the
    standard dense-retrieval recipe (mine the highest-scoring wrong answers,
    not random ones).

    Plan shape mirrors :func:`brute_force_topk`: the anchor batch is small
    by construction (a training batch, guarded by ``max_anchors``) and
    ships inside a numpy ``mapInPandas`` kernel over the candidate table;
    each Arrow batch emits only its per-anchor top-k, so the one shuffle
    (the final per-anchor window) moves ~k·A rows per partition — never the
    N×A score matrix, and the corpus never leaves the scan stage. At 100 TB
    the corpus side streams map-side; mining for MORE anchors shards the
    anchor set across repeated passes (or swaps in the s02/s06 ANN
    candidates as the pool).

    Floating-point contract: the kernel is :func:`_seq_cosine_fns`'s
    dimension-by-dimension accumulation — the exact IEEE sequence of DuckDB
    ``list_cosine_similarity`` — so scores bit-match the oracle.
    """
    a_proj = anchors.select(
        F.col(anchor_id).alias("a_id"),
        F.col(label_col).alias("a_label"),
        _as_double(F.col(vec_col)).alias("a_vec"),
    )
    _guard_exact_path(
        anchors.select(anchor_id),
        max_anchors,
        "hard_negative_topk",
        "per-batch anchor sharding (mine k negatives per training batch)",
    )
    a_rows = a_proj.collect()
    a_ids = [r["a_id"] for r in a_rows]
    a_labels = [r["a_label"] for r in a_rows]
    a_vecs = [list(r["a_vec"]) for r in a_rows]
    kk = int(k)
    seq_cos = _seq_cosine_fns()

    def kernel(batches):
        import numpy as np_w
        import pandas as pd_w

        am = np_w.asarray(a_vecs, dtype=np_w.float64)  # (A, D)
        aid = np_w.asarray(a_ids)
        alab = np_w.asarray(a_labels)
        for pdf in batches:
            if not len(pdf) or not len(aid):
                continue
            ids = pdf["negative_id"].to_numpy()
            labs = pdf["negative_label"].to_numpy()
            cm = np_w.array(list(pdf["c_vec"]), dtype=np_w.float64)  # (B, D)
            sims = seq_cos(cm, am)  # (B, A)
            out = {"anchor_id": [], "anchor_label": [], "negative_id": [],
                   "negative_label": [], "sim": []}
            for ai in range(len(aid)):
                col = sims[:, ai]
                mask = (ids != aid[ai]) & (labs != alab[ai])
                n_ids, n_labs, n_sims = ids[mask], labs[mask], col[mask]
                take = min(kk, n_ids.size)
                if not take:
                    continue
                # batch-local partial top-k, ties broken by negative_id asc
                order = np_w.lexsort((n_ids, -n_sims))[:take]
                out["anchor_id"].extend([aid[ai]] * take)
                out["anchor_label"].extend([alab[ai]] * take)
                out["negative_id"].extend(n_ids[order])
                out["negative_label"].extend(n_labs[order])
                out["sim"].extend(n_sims[order])
            yield pd_w.DataFrame(out)

    spark = candidates.sparkSession
    c = candidates.select(
        F.col(cand_id).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        _as_double(F.col(vec_col)).alias("c_vec"),
    ).repartition(spark.sparkContext.defaultParallelism)
    scored = c.mapInPandas(
        kernel,
        "anchor_id bigint, anchor_label int, negative_id bigint, "
        "negative_label int, sim double",
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), F.asc("negative_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            F.round("sim", 4).alias("sim"),
            "rnk",
        )
    )


def lsh_bucket_occupancy(
    df: DataFrame,
    n_planes: int,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-bucket occupancy audit for the hyperplane-LSH partitioner — the
    pre-flight check the 100× scale experiment says to run BEFORE the
    bucketed kernel: per bucket, the member count, the candidate-pair work
    C(occ, 2) the kernel would enumerate, and the occ²·8-byte similarity
    matrix a task would materialize. One groupBy on the bucket id (the
    exact partitioning the kernel itself shuffles on); if any
    ``est_task_bytes`` is above budget, raise ``n_planes`` per
    :func:`recommended_lsh_planes` instead of discovering the 5 GB task
    matrix in production.
    """
    planes = _hyperplanes(dim, n_planes)
    v = df.select(_as_double(F.col(vec_col)).alias("v")).withColumn(
        "bucket", lsh_bucket(F.col("v"), planes)
    )
    occ = v.groupBy("bucket").agg(F.count(F.lit(1)).alias("occupancy"))
    return occ.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("occupancy").cast("bigint").alias("occupancy"),
        # exact integer div (not floor-of-double-division): above ~2^27
        # occupancy the double product loses ulps and floor can be off by
        # one vs the oracle's exact bigint // — the huge-bucket regime
        # this audit exists to flag
        F.expr("occupancy * (occupancy - 1) div 2")
        .cast("bigint")
        .alias("candidate_pairs"),
        (F.col("occupancy") * F.col("occupancy") * 8)
        .cast("bigint")
        .alias("est_task_bytes"),
    )


def lsh_occupancy_oracle_sql(n_planes: int, dim: int = 64) -> str:
    """DuckDB SQL twin of :func:`lsh_bucket_occupancy` — same literal LCG
    hyperplanes and sign-pattern bucket id as
    :func:`bucketed_neardup_oracle_sql`."""
    planes = _hyperplanes(dim, n_planes)
    bucket = " + ".join(
        f"CASE WHEN list_dot_product(e, [{', '.join(repr(v) for v in plane)}]) > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT ({bucket}) AS bucket FROM v),
    occ AS (SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS occupancy
            FROM b GROUP BY bucket)
    SELECT bucket, occupancy,
           CAST(occupancy * (occupancy - 1) // 2 AS BIGINT) AS candidate_pairs,
           CAST(occupancy * occupancy * 8 AS BIGINT) AS est_task_bytes
    FROM occ
    """


# ---------------------------------------------------------------------------
# Projection-tree ANN (annoy-family): balanced median-split space partition
# ---------------------------------------------------------------------------

def projection_plane(level: int, dim: int = 64) -> list[int]:
    """Deterministic integer projection direction for one tree level:
    components in [-1000, 1000] derived from md5 bytes (the same
    public-hash trick as ``sampling.hash_bucket`` / t35's weight table),
    inlined as literals on both engines so the plane needs no runtime
    hashing."""
    import hashlib

    out = []
    for i in range(dim):
        b = int(hashlib.md5(f"rp{level}|{i}|s15".encode()).hexdigest()[:2], 16)
        out.append((b * 157) % 2001 - 1000)
    return out


_PT_QUANT = 1000  # per-component quantization: iv_i = floor(x_i * 1000)
_PT_COARSE = 4096  # split thresholds live on floor(proj / 4096)


def _pt_int_vec(vec: Column) -> Column:
    """Integer-quantized copy of a float vector: floor(x * 1000) per
    component. Every downstream dot product is then an exact bigint sum —
    order-free, so no IEEE accumulation-order pact with the oracle is
    needed anywhere in this operator."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * _PT_QUANT).cast("bigint")
    )


def _pt_int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def projection_tree_topk(
    df: DataFrame,
    levels: int = 3,
    k: int = 5,
    query_pred: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Projection-tree ANN (the annoy / RP-tree family, Dasgupta & Freund
    2008): recursively split the corpus at the MEDIAN of a projection, so
    leaves stay balanced no matter how the data is distributed — the
    property hyperplane LSH (s02/e02) cannot promise. ``levels`` median
    splits produce ``2^levels`` near-equal leaves; each query searches only
    its own leaf (annoy's search for indexed points).

    Spark-first plan, per level:
    - projection: exact bigint dot of the quantized vector against a fixed
      literal direction (map-side, no shuffle);
    - median: q101's scalable census walk — group by (node,
      floor(proj/4096)) first (partial-agg collapse to a bounded census:
      |proj| <= dim·2e6 keeps the coarse domain under ~64k values), then
      one prefix-sum window over the tiny census, NEVER a per-node sort of
      the corpus;
    - split: broadcast-join the <= 2^level one-row thresholds back and
      append '0'/'1' to the node path.
    Each level's assignment is eagerly localCheckpoint'd (tracked), the
    repo's standard iterative-refinement posture (e07 k-means, g08 star
    contraction): without it the lazy lineage re-plans every prior level
    twice per round.

    Search: queries (already assigned to leaves) equi-join their leaf's
    vectors — candidate work is Q · N/2^levels, bounded by leaf size, never
    Q · N — then exact integer-dot top-k with (score DESC, id ASC)
    tie-break. Output carries the leaf path and leaf occupancy so the
    balance property is itself oracle-checked.
    """
    from aws_data_engineering_spark.operators.checkpoints import (
        release_checkpoints,
        tracked_local_checkpoint,
    )

    if query_pred is None:
        query_pred = F.col(id_col) < 10
    spark = df.sparkSession
    assigned = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        _pt_int_vec(F.col(vec_col)).alias("iv"),
        F.lit("").alias("leaf"),
        query_pred.alias("is_q"),
    )
    own: set[int] = set()
    try:
        for level in range(levels):
            plane = F.array(*[F.lit(h) for h in projection_plane(level, dim)])
            a = assigned.withColumn(
                "cp",
                F.floor(_pt_int_dot(F.col("iv"), plane) / F.lit(_PT_COARSE)).cast(
                    "bigint"
                ),
            )
            a = tracked_local_checkpoint(a, own)
            census = a.groupBy("leaf", "cp").agg(F.count(F.lit(1)).alias("cnt"))
            wcum = Window.partitionBy("leaf").orderBy("cp")
            wall = Window.partitionBy("leaf")
            walk = census.select(
                "leaf",
                "cp",
                F.sum("cnt").over(wcum).alias("cum"),
                F.sum("cnt").over(wall).alias("n"),
                (F.sum("cnt").over(wcum) - F.col("cnt")).alias("prev"),
            )
            pos = F.floor((F.col("n") + 1) / 2).cast("bigint")
            med = walk.groupBy("leaf").agg(
                F.max(
                    F.when((F.col("prev") < pos) & (F.col("cum") >= pos), F.col("cp"))
                ).alias("med_cp")
            )
            assigned = (
                a.join(F.broadcast(med), "leaf")
                .withColumn(
                    "leaf",
                    F.concat(
                        F.col("leaf"),
                        F.when(F.col("cp") <= F.col("med_cp"), F.lit("0")).otherwise(
                            F.lit("1")
                        ),
                    ),
                )
                .select("id", "iv", "leaf", "is_q")
            )
        assigned = tracked_local_checkpoint(assigned, own)
        leaf_n = assigned.groupBy("leaf").agg(
            F.count(F.lit(1)).cast("bigint").alias("leaf_n")
        )
        qs = assigned.filter(F.col("is_q")).select(
            F.col("id").alias("query_id"), F.col("iv").alias("qv"), "leaf"
        )
        pairs = qs.join(assigned, "leaf").filter(F.col("query_id") != F.col("id"))
        scored = pairs.select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "leaf",
            _pt_int_dot(F.col("qv"), F.col("iv")).alias("score_units"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score_units"), F.asc("neighbor_id")
        )
        out = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .join(F.broadcast(leaf_n), "leaf")
            .select("query_id", "neighbor_id", "score_units", "rnk", "leaf", "leaf_n")
        )
        # materialize the result BEFORE the finally releases the per-level
        # blocks its plan still references (the qdigest pattern: the final
        # block stays until GC, exactly the tracked intermediates die)
        return out.localCheckpoint(eager=True)
    finally:
        release_checkpoints(spark, own)


def projection_tree_oracle_sql(
    levels: int = 3,
    k: int = 5,
    query_pred: str = "vec_id < 10",
    dim: int = 64,
) -> str:
    """DuckDB SQL twin of :func:`projection_tree_topk`: the same literal
    integer planes, the same floor-quantized vectors, medians via explicit
    row-rank (value at ascending rank (n+1)//2 — identical to the census
    walk's pick), the same '0'/'1' path building, and the same exact
    bigint-dot ranking. Every per-level CTE is MATERIALIZED so DuckDB does
    not re-inline the whole prefix per level (the q100 lesson)."""
    iv = (
        "list_transform(e, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    )
    parts = [
        "WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, "
        f"{iv} AS iv, '' AS leaf FROM embeddings WHERE embedding IS NOT NULL)"
    ]
    prev = "v"
    for level in range(levels):
        plane = projection_plane(level, dim)
        lits = ", ".join(str(h) for h in plane)
        parts.append(
            f"p{level} AS MATERIALIZED (\n"
            f"  SELECT vec_id, e, iv, leaf,\n"
            f"         CAST(FLOOR(CAST(list_dot_product(iv, [{lits}]) AS DOUBLE)"
            f" / 4096.0) AS BIGINT) AS cp\n"
            f"  FROM {prev})"
        )
        parts.append(
            f"m{level} AS (\n"
            f"  SELECT leaf, cp AS med_cp FROM (\n"
            f"    SELECT leaf, cp,\n"
            f"           ROW_NUMBER() OVER (PARTITION BY leaf ORDER BY cp) AS rk,\n"
            f"           COUNT(*) OVER (PARTITION BY leaf) AS n\n"
            f"    FROM p{level})\n"
            f"  WHERE rk = (n + 1) // 2)"
        )
        parts.append(
            f"a{level} AS MATERIALIZED (\n"
            f"  SELECT vec_id, e, iv,\n"
            f"         p.leaf || CASE WHEN p.cp <= m.med_cp THEN '0' ELSE '1' END"
            f" AS leaf\n"
            f"  FROM p{level} p JOIN m{level} m USING (leaf))"
        )
        prev = f"a{level}"
    parts.append(
        f"leaf_n AS (SELECT leaf, CAST(COUNT(*) AS BIGINT) AS leaf_n"
        f" FROM {prev} GROUP BY leaf)"
    )
    parts.append(
        f"pairs AS (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.leaf,\n"
        f"         CAST(list_dot_product(q.iv, c.iv) AS BIGINT) AS score_units\n"
        f"  FROM {prev} q JOIN {prev} c USING (leaf)\n"
        f"  WHERE ({query_pred.replace('vec_id', 'q.vec_id')})"
        f" AND q.vec_id <> c.vec_id)"
    )
    parts.append(
        "ranked AS (\n"
        "  SELECT query_id, neighbor_id, leaf, score_units,\n"
        "         ROW_NUMBER() OVER (PARTITION BY query_id\n"
        "                            ORDER BY score_units DESC, neighbor_id)"
        " AS rnk\n"
        "  FROM pairs)"
    )
    sql = ",\n".join(parts)
    return f"""
    {sql}
    SELECT query_id, neighbor_id, score_units, CAST(rnk AS INT) AS rnk,
           r.leaf, leaf_n
    FROM ranked r JOIN leaf_n USING (leaf)
    WHERE rnk <= {k}
    """
