"""Round-8 adversarial cross-engine sweep: Unicode case folding.

Spark/Java ``lower()`` is context-sensitive Unicode — U+0130 İ lowers to
'i' + COMBINING DOT ABOVE (two codepoints) and a word-final Σ lowers to ς —
while DuckDB's ``lower()`` maps İ to plain 'i' and always emits σ. Python
``str.lower`` matches Java. Before round 8 unified every token-identity
case fold to the engine-portable ASCII A-Z translate
(operators/text.py ascii_lower / ascii_lower_sql / ASCII_FOLD_TABLE), this
planted corpus flipped four live queries: t10 (token strings), t35 (hashed
grams), d03 (md5 fingerprints), d06 (simhash token hashes). Fixture
corpora are pure ASCII, so the unification changed no fixture outputs —
this sweep is what keeps the class closed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_data_engineering_spark.plans.registry import QUERIES, queries

queries()  # load registrations


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


# Turkish dotted capital İ, Greek final-sigma contexts, capital sharp S,
# fullwidth forms, titlecase digraph ǅ — every known seam between Java
# (context-sensitive Unicode), Python (same), and DuckDB (not) lowercasing.
_UNICODE_CASE_ROWS = [
    (1, "İSTANBUL ticket İÇİN details okay", "tr", "web"),
    (2, "ΣΟΦΟΣ ΣΑΣ words ΟΔΟΣ end", "el", "web"),
    (3, "STRAẞE crossing STRASSE walk", "de", "web"),
    (4, "ＦＵＬＬＷＩＤＴＨ ＴＥＸＴ here now", "ja", "web"),
    (5, "ǅungla Ǆ mixed titlecase words", "hr", "web"),
    (6, "normal ascii CONTROL text for pairs", "en", "web"),
    (7, "normal ascii CONTROL text for pairs ok", "en", "web"),
]

_SWEEP_QUERIES = [
    "t01_text_stats", "t02_quality_scores", "t03_token_counts_by_source",
    "t05_token_length_stats", "t07_repetition_signals", "t10_top_tokens",
    "t12_collapse_repeated_tokens", "t13_vocab_coverage",
    "t15_unigram_logprob", "t16_tfidf_top_terms", "t17_gopher_quality_rules",
    "t18_bigram_logprob", "t19_lexical_diversity", "t20_dsir_importance",
    "t23_pmi_collocations", "t25_zipf_fit", "t26_readability_by_lang",
    "t27_charclass_entropy", "t30_bm25_topk", "t31_kneser_ney_bigram",
    "t32_langid_ngram_profile", "t33_heaps_law_fit", "t34_lang_jsd_matrix",
    "t35_hashed_ngram_quality", "t06_winnowing_fingerprints",
    "d01_exact_dedup_groups", "d03_fingerprint_dedup",
    "d05_ngram_jaccard_pairs", "d06_simhash",
    "d12_duplicate_shingle_fraction",
]


@pytest.mark.parametrize("name", _SWEEP_QUERIES)
def test_text_queries_unicode_case_parity(spark, tmp_path, name):
    from tests.oracle_utils import compare

    _write_docs(tmp_path, _UNICODE_CASE_ROWS)
    q = QUERIES[name]
    compare(q.spark(spark, str(tmp_path)), q.oracle, str(tmp_path))


def test_ascii_fold_contract():
    """The three-engine fold definitions agree and touch ONLY A-Z."""
    import duckdb

    from aws_data_engineering_spark.operators.text import (
        ASCII_FOLD_TABLE,
        ASCII_LOWERED,
        ASCII_UPPER,
        ascii_lower_sql,
    )

    assert ASCII_UPPER == "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    assert ASCII_LOWERED == "abcdefghijklmnopqrstuvwxyz"
    probe = "İSTANBUL Mix ΣΑΣ STRAẞE Ａz09"
    py = probe.translate(ASCII_FOLD_TABLE)
    duck = duckdb.sql(
        f"SELECT {ascii_lower_sql('?')}", params=[probe]
    ).fetchone()[0]
    assert py == duck == "İstanbul mix ΣΑΣ straẞe Ａz09"
    # the fold must NOT equal unicode lower on the seam chars
    assert py != probe.lower()


# ---------------------------------------------------------------------------
# Property test for the round-8 vectorized session fold (streams._session_
# fold_fn): the numpy gaps-and-islands rewrite must agree with the obvious
# per-row reference on arbitrary batch splits of arbitrary event sequences.
# ---------------------------------------------------------------------------
class _FakeState:
    """Minimal stand-in for pyspark's GroupState."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _reference_sessions(ts_us_sorted, vals, gap_us):
    """Per-row reference fold: list of closed (start, last, n, total) plus
    the open tail."""
    closed, cur = [], None
    for t, v in zip(ts_us_sorted, vals):
        if cur is None:
            cur = [t, t, 1, float(v)]
        elif t - cur[1] > gap_us:
            closed.append(tuple(cur))
            cur = [t, t, 1, float(v)]
        else:
            cur[1], cur[2], cur[3] = t, cur[2] + 1, cur[3] + float(v)
    return closed, tuple(cur) if cur else None


def _drive_fold(fn, batches):
    """Feed time-ordered batches of (ts_us, event_id, value) through fn,
    collecting closed sessions; then fire the timeout."""
    import pandas as pd

    state = _FakeState()
    out = []
    for batch in batches:
        if not batch:
            continue
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([b[0] for b in batch], unit="us"),
                "event_id": [b[1] for b in batch],
                "value": [b[2] for b in batch],
            }
        )
        for emitted in fn((7,), iter([pdf]), state):
            out.extend(
                (int(r.session_start.value // 1000), int(r.session_end.value // 1000),
                 int(r.n_events), float(r.session_value))
                for r in emitted.itertuples()
            )
    state.hasTimedOut = True
    for emitted in fn((7,), iter([]), state):
        out.extend(
            (int(r.session_start.value // 1000), int(r.session_end.value // 1000),
             int(r.n_events), float(r.session_value))
            for r in emitted.itertuples()
        )
    assert not state.exists, "timeout must clear state"
    return out


def test_session_fold_matches_reference_property():
    """Random event sequences, random batch splits (time-ordered across
    batches, shuffled within a batch): the vectorized fold's emitted
    sessions == the per-row reference's closed+open sessions."""
    import random

    from aws_data_engineering_spark.streaming.streams import _session_fold_fn

    gap_min = 30
    gap_us = gap_min * 60 * 1_000_000
    for seed in range(40):
        rng = random.Random(seed)
        n = rng.randint(1, 60)
        # event times: mixture of small (< gap) and large (> gap) steps,
        # including exact-gap ties (boundary: == gap does NOT split)
        t, ts = 1_600_000_000_000_000, []
        for _ in range(n):
            step = rng.choice(
                [0, 1, 999, gap_us, gap_us + 1, gap_us * 3, 60_000_000]
            )
            t += step
            ts.append(t)
        vals = [float(rng.randint(0, 50000)) for _ in range(n)]  # int cents
        rows = [(ts[i], i, vals[i]) for i in range(n)]
        # split into time-ordered batches; shuffle WITHIN each batch
        k = rng.randint(1, min(4, n + 1))
        cuts = sorted(rng.sample(range(n + 1), k - 1)) if k > 1 else []
        batches, prev = [], 0
        for c in cuts + [n]:
            b = rows[prev:c]
            rng.shuffle(b)
            batches.append(b)
            prev = c
        got = sorted(_drive_fold(_session_fold_fn(gap_min), batches))
        ref_closed, ref_open = _reference_sessions(ts, vals, gap_us)
        want = list(ref_closed) + ([ref_open] if ref_open else [])
        want = sorted((s, l, c, round(tot, 2)) for (s, l, c, tot) in want)
        assert got == want, f"seed={seed}\ngot={got}\nwant={want}"


# ---------------------------------------------------------------------------
# Edge cases for the round-8 queries: s11's fusion when one arm is empty,
# t35 on degenerate documents.
# ---------------------------------------------------------------------------
def _write_embeddings(tmp_path, n=12, dim=8):
    vecs = []
    for i in range(n):
        # deterministic, non-degenerate vectors
        vecs.append([((i * 7 + j * 3) % 13) / 13.0 + 0.1 for j in range(dim)])
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))


def test_s11_fusion_with_empty_sparse_arm(spark, tmp_path):
    """No document matches the BM25 terms -> the sparse ranking is empty
    and every fused row comes from the dense arm alone (s_rnk all NULL);
    the full-outer fusion and the oracle must agree exactly."""
    from tests.oracle_utils import compare

    rows = [
        (i, f"nothing relevant here doc{i} filler words", "en", "web")
        for i in range(1, 13)
    ]
    _write_docs(tmp_path, rows)
    _write_embeddings(tmp_path)
    q = QUERIES["s11_rrf_hybrid_retrieval"]
    df = q.spark(spark, str(tmp_path))
    got = df.collect()
    assert len(got) > 0
    assert all(r["s_rnk"] is None for r in got), "sparse arm should be empty"
    compare(df, q.oracle, str(tmp_path))


def test_t35_degenerate_documents(spark, tmp_path):
    """Empty text, single-token text, and a doc that is ONLY whitespace:
    gram construction (unigrams + bigrams) must agree cross-engine on all
    of them — the bigram comprehension and the Spark zip_with/slice must
    both emit zero bigrams for <2 tokens."""
    from tests.oracle_utils import compare

    rows = [
        (1, "", "en", "a"),
        (2, "solo", "en", "a"),
        (3, "   ", "en", "b"),
        (4, "two tokens", "en", "b"),
        (5, "ordinary document with several tokens inside", "en", "c"),
    ]
    _write_docs(tmp_path, rows)
    q = QUERIES["t35_hashed_ngram_quality"]
    compare(q.spark(spark, str(tmp_path)), q.oracle, str(tmp_path))


# ---------------------------------------------------------------------------
# Round-8 sweep #2: LEADING/TRAILING exotic whitespace (the trim seam).
# The three engines' native trims all differ — Spark F.trim strips 0x20
# spaces only, DuckDB's 1-arg trim strips Unicode space-class chars (NBSP,
# U+3000) but NOT \t/\n/\x0b/\f/\r, Python str.strip() strips full Unicode
# whitespace. Round 7's sweep planted only INTERIOR whitespace, so this
# corpus flipped 13 live queries (incl. plain leading ASCII tabs) before
# every compared trim moved to the ASCII-6 contract
# (text.ascii_trim / ascii_trim_sql / .strip(" \t\n\x0b\f\r")).
# ---------------------------------------------------------------------------
_EDGE_WS_ROWS = [
    (1, "\xa0leading nbsp text here", "en", "web"),
    (2, "trailing ideographic space　", "en", "web"),
    (3, "\x0bleading vertical tab words", "en", "web"),
    (4, "\t\tleading ascii tabs fine", "en", "web"),
    (5, "\xa0\xa0double nbsp lead and trail\xa0", "en", "web"),
    (6, "normal control text for pairs", "en", "web"),
    (7, "normal control text for pairs ok", "en", "web"),
]

_EDGE_WS_QUERIES = _SWEEP_QUERIES + [
    "t08_pandas_udf_tokens", "t09_udtf_tokenize", "t11_arrow_native_stats",
]


@pytest.mark.parametrize("name", _EDGE_WS_QUERIES)
def test_text_queries_edge_whitespace_parity(spark, tmp_path, name):
    from tests.oracle_utils import compare

    _write_docs(tmp_path, _EDGE_WS_ROWS)
    q = QUERIES[name]
    compare(q.spark(spark, str(tmp_path)), q.oracle, str(tmp_path))


def test_ascii_trim_contract():
    """The three-engine ASCII-6 trim definitions agree, strip exactly the
    tokenizer class, and differ from every native trim on the seam."""
    import duckdb

    from aws_data_engineering_spark.operators.text import (
        ASCII_WS,
        ascii_trim_sql,
    )

    assert ASCII_WS == " \t\n\x0b\f\r"
    probe = "\xa0\t keep me　\n\x0b"
    py = probe.strip(ASCII_WS)
    duck = duckdb.sql(
        f"SELECT {ascii_trim_sql('?')}", params=[probe]
    ).fetchone()[0]
    assert py == duck == "\xa0\t keep me　".strip(" \t")  # NBSP/IDEO kept
    assert py == "\xa0\t keep me　"
    assert py != probe.strip()  # unicode strip would eat NBSP/IDEO too


# ---------------------------------------------------------------------------
# Round-8 additions #2 (s13 / t36 / q102) — edge semantics pinned cross-engine.
# ---------------------------------------------------------------------------
def _write_events(tmp_path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_s13_label_isolation_and_short_slices(spark, tmp_path):
    """A label whose only member is the query itself yields NO rows for
    that query (filtered search never leaks across the filter key), and a
    label with fewer than K+1 members yields fewer than K rows — both
    engines must agree on the short result."""
    from tests.oracle_utils import compare

    vecs = []
    labels = []
    # label 0: only vec 0 (a query) -> no candidates for it
    # label 1: vecs 1 (query) + 10, 11 -> 2 neighbors (< K=5)
    # label 2: vecs 2 (query) + 12..17 -> full K
    for i in range(18):
        vecs.append([((i * 5 + j * 2) % 11) / 11.0 + 0.2 for j in range(8)])
        labels.append(0 if i == 0 else (1 if i in (1, 10, 11) else 2))
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(18)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    q = QUERIES["s13_ann_label_filtered_topk"]
    df = q.spark(spark, str(tmp_path))
    got = df.collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert 0 not in by_q, "label-isolated query must return nothing"
    assert len(by_q[1]) == 2, "short label slice must yield < K rows"
    assert all(r["label"] == 1 for r in by_q[1])
    compare(df, q.oracle, str(tmp_path))


def test_t36_duplicate_doc_has_zero_novelty(spark, tmp_path):
    """An exact duplicate with a HIGHER doc_id introduces nothing (every
    gram's min-doc attribution points at the original); the original owns
    100% of its grams; an empty doc's single ''-gram attributes to the
    lowest empty doc_id. Cross-engine exact."""
    from tests.oracle_utils import compare

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "orig"),
        (2, "alpha beta gamma delta epsilon zeta", "en", "dup"),
        (3, "", "en", "empty"),
        (4, "  ", "en", "empty2"),
        (5, "alpha beta gamma NEW tokens here", "en", "partial"),
    ]
    _write_docs(tmp_path, rows)
    q = QUERIES["t36_crossdoc_ngram_novelty"]
    df = q.spark(spark, str(tmp_path))
    by_src = {r["source"]: r for r in df.collect()}
    assert by_src["orig"]["novel_grams"] == by_src["orig"]["total_grams"]
    assert by_src["dup"]["novel_grams"] == 0
    assert by_src["empty"]["novel_grams"] == 1  # '' gram, lowest empty doc
    assert by_src["empty2"]["novel_grams"] == 0  # same '' gram, higher id
    assert 0 < by_src["partial"]["novel_grams"] < by_src["partial"]["total_grams"]
    compare(df, q.oracle, str(tmp_path))


def test_q102_cohort_edges(spark, tmp_path):
    """Single-event users are their own cohort at offset 0 with
    retention_ppm exactly 1_000_000; a user active across a year boundary
    lands in the right week offsets (Monday-start date_trunc('week') must
    agree between Spark and DuckDB across Jan 1); NULL-ts events form a
    NULL cohort row identically in both engines."""
    import datetime

    from tests.oracle_utils import compare

    d = datetime.datetime
    rows = [
        # user 1: one event only -> cohort=its week, offset 0 only
        (1, d(2024, 3, 5, 10, 0), 1, "view", 1.0, None),
        # user 2: active Dec 29 2023 (Fri, week of Mon Dec 25) and
        # Jan 3 2024 (Wed, week of Mon Jan 1) -> offsets 0 and 1
        (2, d(2023, 12, 29, 8, 0), 2, "view", 1.0, None),
        (3, d(2024, 1, 3, 9, 0), 2, "click", 1.0, None),
        # user 3: three weeks of activity incl. a gap (offsets 0, 2)
        (4, d(2024, 3, 4, 7, 0), 3, "view", 1.0, None),
        (5, d(2024, 3, 18, 7, 0), 3, "view", 1.0, None),
        # user 4: NULL ts only -> NULL cohort row
        (6, None, 4, "view", 1.0, None),
    ]
    _write_events(tmp_path, rows)
    q = QUERIES["q102_retention_cohorts"]
    df = q.spark(spark, str(tmp_path))
    got = {(r["cohort_week"], r["week_offset"]): r for r in df.collect()}
    assert got[("2023-12-25", 0)]["retention_ppm"] == 1_000_000
    assert got[("2023-12-25", 1)]["n_users"] == 1  # year-boundary offset
    assert got[("2024-03-04", 0)]["n_users"] == 2  # users 1 and 3
    assert got[("2024-03-04", 2)]["retention_ppm"] == 500_000
    assert (None, None) in got  # NULL-ts cohort row survives identically
    compare(df, q.oracle, str(tmp_path))


def test_gif_lzw_codec_roundtrip_property():
    """The GIF89a encoder/decoder pair must be exact inverses across the
    LZW regimes: random frames (width growth), a 40k-pixel frame crossing
    the 4096-code dictionary reset, and an all-same-pixel frame (the
    KwKwK corner where the decoder sees a code one past its table)."""
    import random

    from aws_data_engineering_spark.operators.multimodal import (
        GIF_N_COLORS,
        _gif_worker_fns,
    )

    enc, dec = _gif_worker_fns()
    palette = [((j * 17) % 256, (j * 29) % 256, (j * 43) % 256)
               for j in range(GIF_N_COLORS)]
    rng = random.Random(7)
    for _ in range(50):
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        frames = [
            bytes(rng.randrange(16) for _ in range(w * h))
            for _ in range(rng.randint(1, 4))
        ]
        w2, h2, pal2, fr2 = dec(enc(w, h, frames, palette))
        assert (w2, h2, pal2, fr2) == (w, h, palette, frames)
    big = bytes((k * k + 7 * k) % 16 for k in range(200 * 200))
    assert dec(enc(200, 200, [big], palette))[3] == [big]
    mono = bytes([5]) * 997
    assert dec(enc(997, 1, [mono], palette))[3] == [mono]
