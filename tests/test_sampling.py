"""Deterministic sampling / split / contamination operator tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aws_data_engineering_spark.operators import dedup as D
from aws_data_engineering_spark.operators import sampling as P


def _py_bucket(key: str, salt: str) -> int:
    return int(hashlib.md5((key + salt).encode()).hexdigest()[:2], 16)


def test_split_thresholds_cumulative():
    assert P.split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1}) == [
        ("train", 204),
        ("val", 230),
        ("test", 256),
    ]


def test_split_thresholds_rejects_bad_fractions():
    with pytest.raises(ValueError):
        P.split_thresholds({})
    with pytest.raises(ValueError):
        P.split_thresholds({"a": 0.5, "b": 0.2})


def test_hash_bucket_matches_reference_md5(spark):
    df = spark.range(0, 200).withColumn("bucket", P.hash_bucket("id", "s1"))
    for row in df.collect():
        assert row["bucket"] == _py_bucket(str(row["id"]), "s1")


def test_split_assignment_total_and_deterministic(spark):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.range(0, 1000).withColumn("split", P.split_assignment("id", fr))
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000  # every row assigned
    assert set(counts) == {"train", "val", "test"}
    # md5 buckets are near-uniform: train ≈ 204/256 ±5%
    assert 700 < counts["train"] < 900
    # identical assignment on re-run and after repartition
    again = (
        spark.range(0, 1000)
        .repartition(7)
        .withColumn("split", P.split_assignment("id", fr))
    )
    assert sorted(df.collect()) == sorted(again.collect())


def test_deterministic_sample_is_stable_subset(spark):
    df = spark.range(0, 1000)
    s_half = P.deterministic_sample(df, "id", 0.5, "z")
    s_quarter = P.deterministic_sample(df, "id", 0.25, "z")
    half_ids = {r["id"] for r in s_half.collect()}
    quarter_ids = {r["id"] for r in s_quarter.collect()}
    # smaller rate selects a strict subset of the larger (same salt) — the
    # property that lets a pipeline grow a sample without reshuffling rows
    assert quarter_ids <= half_ids
    assert 400 < len(half_ids) < 600
    with pytest.raises(ValueError):
        P.deterministic_sample(df, "id", 1.5)


def test_mixture_sample_per_key_rates(spark):
    rows = [(i, "keep_all" if i % 2 == 0 else "drop_all") for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, src string")
    out = P.mixture_sample(df, "id", "src", {"keep_all": 1.0, "drop_all": 0.0})
    got = out.groupBy("src").count().collect()
    assert {r["src"]: r["count"] for r in got} == {"keep_all": 200}
    # unlisted key honors default_rate
    extra = spark.createDataFrame([(i, "other") for i in range(256)], "id bigint, src string")
    kept = P.mixture_sample(extra, "id", "src", {"keep_all": 1.0}, default_rate=0.5).count()
    assert 90 < kept < 166


def test_ngram_contamination_planted(spark):
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )
    cands = spark.createDataFrame(
        [
            # shares the 5-grams "alpha beta gamma delta epsilon" and
            # "beta gamma delta epsilon zeta" with the benchmark doc
            (10, "alpha beta gamma delta epsilon zeta eta"),
            # no 5-gram overlap
            (11, "one two three four five six seven"),
            # shares exactly one 5-gram
            (12, "x alpha beta gamma delta epsilon y"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: r["n_shared_grams"]
        for r in D.ngram_contamination(cands, bench, "doc_id", "text", 5).collect()
    }
    assert out == {10: 2, 12: 1}  # doc 11 clean → absent


def test_contamination_short_doc_whole_text_gram(spark):
    # docs shorter than n collapse to a single whole-text shingle — a short
    # candidate matches only if its full normalized text appears in the
    # benchmark's gram set
    bench = spark.createDataFrame([(1, "tiny doc")], "doc_id bigint, text string")
    cands = spark.createDataFrame(
        [(2, "tiny doc"), (3, "other doc")], "doc_id bigint, text string"
    )
    out = {
        r["id"]: r["n_shared_grams"]
        for r in D.ngram_contamination(cands, bench, "doc_id", "text", 5).collect()
    }
    assert out == {2: 1}


def test_redact_pii_planted(spark):
    from aws_data_engineering_spark.operators import text as T

    rows = [
        (1, "contact me at alice@example.com or +1 (555) 123-4567 ok"),
        (2, "ssn 123-45-6789 should vanish"),
        (3, "clean text stays untouched"),
    ]
    df = spark.createDataFrame(rows, "id int, body string")
    out = {
        r["id"]: (r["red"], r["n_pii"])
        for r in df.select(
            "id",
            T.redact_pii("body").alias("red"),
            T.pii_match_count("body").alias("n_pii"),
        ).collect()
    }
    assert out[1][0] == "contact me at [REDACTED] or [REDACTED] ok"
    assert out[1][1] == 2
    assert out[2][0] == "ssn [REDACTED] should vanish"
    # ssn also matches the phone pattern's digit run -> 2 raw pattern hits
    assert out[2][1] == 2
    assert out[3] == ("clean text stays untouched", 0)


def test_sequence_packing_semantics(spark):
    """Concat-then-chunk: offsets are per-group prefix sums; pack_id is the
    chunk holding the first token; n_chunks counts boundary crossings;
    empty docs span zero chunks."""
    rows = [
        # group a: tokens 6, 3, 0, 5 with budget 4
        ("a", 1, 6),  # start 0, pack 0, spans chunks 0-1 -> 2
        ("a", 2, 3),  # start 6, occupies 6..8 -> crosses into chunk 2 -> 2
        ("a", 3, 0),  # start 9, zero tokens -> 0 chunks
        ("a", 4, 5),  # start 9, spans 9..13 -> chunks 2-3 -> 2
        # group b packs independently from offset 0
        ("b", 1, 4),  # start 0, exactly one chunk
        ("b", 2, 1),  # start 4, chunk 1
    ]
    df = spark.createDataFrame(rows, "g string, i int, toks int")
    out = {
        (r["g"], r["i"]): (r["start_offset"], r["pack_id"], r["n_chunks"])
        for r in P.sequence_packing(
            df, "toks", budget=4, order_col="i", group_col="g"
        ).collect()
    }
    assert out[("a", 1)] == (0, 0, 2)
    assert out[("a", 2)] == (6, 1, 2)
    assert out[("a", 3)] == (9, 2, 0)
    assert out[("a", 4)] == (9, 2, 2)
    assert out[("b", 1)] == (0, 0, 1)
    assert out[("b", 2)] == (4, 1, 1)
    with pytest.raises(ValueError):
        P.sequence_packing(df, "toks", budget=0)


def test_epoch_upsample_edge_epochs(spark):
    """n_epochs < 1 (or NULL) means DROP: the guarded fan-out must emit
    nothing for 0 / negative / null weights (a bare sequence(1, 0) would
    descend and emit TWO copies — ADVICE r05), and exactly n copies with
    deterministic md5 sample keys for n >= 1."""
    df = spark.createDataFrame(
        [(1, 0), (2, 2), (3, -1), (4, None), (5, 1)],
        "id bigint, n_epochs int",
    )
    out = P.epoch_upsample(df, "id", F.col("n_epochs"), salt="s").collect()
    got = sorted((r["id"], r["copy_idx"]) for r in out)
    assert got == [(2, 1), (2, 2), (5, 1)]
    keys = {(r["id"], r["copy_idx"]): r["sample_key"] for r in out}
    for (i, c), k in keys.items():
        assert k == hashlib.md5(f"{i}:{c}s".encode()).hexdigest()


def test_minhash_guard_bucket_refuses_planted_skew(spark):
    """The uncapped default must REFUSE a duplication-heavy corpus (the
    100× experiment's d04 failure mode) instead of launching the
    quadratic-pair enumerate: 70 identical docs overflow every band bucket
    past guard_bucket=64, so the job dies at the census stage with a
    message naming the capped registered alternative. guard_bucket=None is
    the explicit escape hatch for the duplication-audit use-case, and the
    capped form keeps working under the same skew."""
    import pytest

    twin = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, twin) for i in range(1, 71)], "doc_id bigint, text string"
    )
    with pytest.raises(Exception, match="d17_capped_minhash_pairs"):
        D.minhash_candidate_pairs(docs, "doc_id", "text").collect()
    # the escape hatch enumerates all C(70,2) pairs
    forced = D.minhash_candidate_pairs(
        docs, "doc_id", "text", guard_bucket=None
    ).collect()
    assert len(forced) == 70 * 69 // 2
    # the capped form collapses the cluster instead of enumerating it
    assert (
        D.minhash_candidate_pairs(docs, "doc_id", "text", max_bucket=2).count()
        == 0
    )
    # under-guard corpora are row-identical to the unguarded plan
    small = spark.createDataFrame(
        [(i, twin) for i in range(1, 6)], "doc_id bigint, text string"
    )
    guarded = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(small, "doc_id", "text").collect()
    }
    unguarded = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(
            small, "doc_id", "text", guard_bucket=None
        ).collect()
    }
    assert guarded == unguarded


def test_minhash_max_bucket_valve(spark):
    """Planted skew: a 5-twin exact-duplicate group fills every band bucket
    past the cap (no pairs may come out of it), while a distinct 2-doc
    near-dup pair survives. Uncapped, the twin group alone emits C(5,2)=10
    pairs — the quadratic-in-duplication behavior the valve exists to stop."""
    twin = "the quick brown fox jumps over the lazy dog again and again"
    pair_a = "completely different content about spark shuffle partitioning"
    pair_b = "completely different content about spark shuffle partitioning ok"
    rows = [(i, twin) for i in range(1, 6)]
    rows += [(10, pair_a), (11, pair_b)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    uncapped = D.minhash_candidate_pairs(docs, "doc_id", "text").collect()
    capped = D.minhash_candidate_pairs(
        docs, "doc_id", "text", max_bucket=2
    ).collect()

    twin_ids = set(range(1, 6))
    assert sum(1 for r in uncapped if r["id_a"] in twin_ids) == 10
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert not any(a in twin_ids for a, _ in got), got
    # the legit near-dup pair must survive the cap (if banding caught it)
    un_pairs = {(r["id_a"], r["id_b"]) for r in uncapped}
    assert got == un_pairs - {(a, b) for a, b in un_pairs if a in twin_ids}


def test_minhash_cap_model_property(spark):
    """Model property on a random-ish corpus: capped pairs must be exactly
    the uncapped pairs reachable through some under-cap band bucket —
    computed from the signature table itself, independent of the operator's
    join."""
    import random

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = []
    for i in range(1, 25):
        # clusters of similar docs: base pattern + small mutation
        base = vocab[: 4 + (i % 3)]
        words = list(base) * 3
        if i % 4 == 0:
            words[rng.randrange(len(words))] = vocab[-1]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    cap = 3

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(docs, "doc_id", "text").collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(
            docs, "doc_id", "text", max_bucket=cap
        ).collect()
    }
    assert capped <= uncapped

    # independent model: bucket membership from the signature expression
    sig_rows = docs.select(
        "doc_id", D.minhash_signature("text").alias("sig")
    ).collect()
    buckets: dict = {}
    for r in sig_rows:
        for band in range(8):
            key = (band, tuple(r["sig"][band * 4 : band * 4 + 4]))
            buckets.setdefault(key, []).append(r["doc_id"])
    want = set()
    for members in buckets.values():
        if len(members) <= cap:
            for a in members:
                for b in members:
                    if a < b:
                        want.add((a, b))
    assert capped == want


def test_curriculum_phase_thresholds(spark):
    """Fixed-threshold phase assignment: strict < at every boundary, last
    phase catches everything >= the top threshold."""
    df = spark.createDataFrame(
        [(1, 10), (2, 179), (3, 180), (4, 299), (5, 300), (6, 419), (7, 420), (8, 9999)],
        "id bigint, d int",
    )
    out = df.select(
        "id", P.curriculum_phase("d", (180, 300, 420)).alias("p")
    ).collect()
    got = {r["id"]: r["p"] for r in out}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}


def test_curriculum_schedule_fanout_and_keys(spark):
    """Phase-p rows appear in epochs p..n_epochs exactly once each; rows in
    a phase beyond n_epochs are DROPPED (empty-array guard — the
    descending-sequence bug class p13 guards); sample keys are the
    documented md5."""
    # thresholds (10, 20) -> 3 phases; n_epochs=2 -> phase-3 rows vanish
    df = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 25)], "id bigint, d int"
    )
    out = P.curriculum_schedule(
        df, "id", "d", thresholds=(10, 20), n_epochs=2, salt="s"
    ).collect()
    got = sorted((r["id"], r["phase"], r["epoch"]) for r in out)
    assert got == [(1, 1, 1), (1, 1, 2), (2, 2, 2)]
    for r in out:
        assert r["sample_key"] == hashlib.md5(
            f"{r['id']}:{r['epoch']}s".encode()
        ).hexdigest()


def test_curriculum_schedule_rejects_bad_epochs(spark):
    df = spark.createDataFrame([(1, 5)], "id bigint, d int")
    with pytest.raises(ValueError):
        P.curriculum_schedule(df, "id", "d", thresholds=(10,), n_epochs=0)


def _waterfill_ref(caps: dict[str, int], budget: int) -> dict[str, int]:
    """Reference integer waterfill: sort asc, first infeasible prefix
    fixes level = (B - cum_prev) // remaining."""
    items = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
    n, cum, alloc = len(items), 0, {}
    level = None
    for idx, (src, c) in enumerate(items):
        rem = n - idx
        if level is None and cum + c * rem <= budget:
            alloc[src] = c
            cum += c
        else:
            if level is None:
                level = (budget - cum) // rem
            alloc[src] = min(c, level)
    return alloc


def test_waterfill_planted_skew(spark, tmp_path):
    """Skewed planted corpus (one giant source, several small): the
    registered p15 query must reproduce the reference waterfill exactly,
    with small sources granted in full and the giant truncated to the
    level."""
    from aws_data_engineering_spark.plans.registry import QUERIES, queries

    queries()
    rows, caps = [], {}
    doc_id = 0
    for src, n_tok in [("tiny", 5), ("small", 20), ("mid", 40), ("huge", 400)]:
        caps[src] = n_tok
        text = " ".join(f"w{i}" for i in range(n_tok))
        rows.append((doc_id, text, "en", src, len(text)))
        doc_id += 1
    import pyarrow as pa
    import pyarrow.parquet as pq

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

    total = sum(caps.values())  # 465
    budget = total * 9 // 10  # 418
    expected = _waterfill_ref(caps, budget)
    got = {
        r["source"]: (r["allocation"], r["is_full"])
        for r in QUERIES["p15_token_budget_waterfill"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert {s: a for s, (a, _) in got.items()} == expected
    # small sources full, the giant truncated
    assert got["tiny"][1] and got["small"][1] and got["mid"][1]
    assert not got["huge"][1]
    assert sum(expected.values()) <= budget
    assert budget - sum(expected.values()) < len(caps)
