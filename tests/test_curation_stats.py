"""Unit semantics for the corpus-curation rollups: CCNet perplexity
bucketing (textstats.perplexity_buckets), the per-source corpus report
(textstats.corpus_report), and the per-conversation rollup
(sessions.conversation_stats). The DuckDB twins are exercised by
tests/test_contract_parity.py; these pin the operator semantics on
hand-built frames where the expected values are computable by eye.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from beats_spark.operators.sessions import conversation_stats
from beats_spark.operators.textstats import corpus_report, perplexity_buckets


def test_perplexity_buckets_equal_tiers_and_tie_cohesion(spark):
    # 9 docs in three fluency tiers: 3 of corpus-common tokens (low
    # surprisal), 3 mixed, 3 of hapax soup (high surprisal). Within a
    # tier the docs are token-identical => identical surprisal_milli,
    # so tie cohesion is also exercised: a tier can never straddle a
    # bucket boundary.
    common = "the the the the the the the the"
    mixed = "the the the the rare%d_a rare%d_b rare%d_c rare%d_d"
    soup = "x%d_1 x%d_2 x%d_3 x%d_4 x%d_5 x%d_6 x%d_7 x%d_8"
    rows = []
    for i in range(3):
        rows.append((i, common))
        rows.append((10 + i, mixed % (i, i, i, i)))
        rows.append((20 + i, soup % ((i,) * 8)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(df, "text", "doc_id", n_buckets=3)
    got = {r.doc_id: (r.bucket, r.surprisal_milli) for r in out.collect()}
    assert len(got) == 9
    # equal-count tiers, lowest surprisal = head (CCNet keeps head)
    assert {got[i][0] for i in range(3)} == {"head"}
    assert {got[10 + i][0] for i in range(3)} == {"middle"}
    assert {got[20 + i][0] for i in range(3)} == {"tail"}
    # monotone: head milli < middle milli < tail milli
    assert got[0][1] < got[10][1] < got[20][1]


def test_perplexity_buckets_n5_labels(spark):
    # doc i mixes i hapax tokens with (10 - i) corpus-common ones:
    # 10 docs, 10 strictly increasing surprisal_milli values
    df = spark.createDataFrame(
        [
            (
                i,
                " ".join([f"u{i}_{k}" for k in range(i)] + ["the"] * (10 - i)),
            )
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    out = perplexity_buckets(df, "text", "doc_id", n_buckets=5)
    labels = {r.bucket for r in out.collect()}
    assert labels <= {"b1", "b2", "b3", "b4", "b5"}
    assert "b1" in labels and "b5" in labels


def test_corpus_report_dup_rate_and_means(spark):
    df = spark.createDataFrame(
        [
            # source a: 4 docs, one exact dup pair (normalized), langs en/de
            (1, "Hello   World", "en", "a"),
            (2, "hello world", "en", "a"),  # dup of 1 after normalize
            (3, "unique one", "de", "a"),
            (4, "unique two", "en", "a"),
            # source b: 2 docs, no dups, single lang
            (5, "alpha", "fr", "b"),
            (6, "beta", "fr", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r.source: r
        for r in corpus_report(df, "source", "text", lang_col="lang").collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n_docs, a.n_unique, a.n_langs) == (4, 3, 2)
    assert a.dup_rate_milli == (4 - 3) * 1000 // 4 == 250
    # "Hello   World"=13 + "hello world"=11 + "unique one"=10 + "unique two"=10
    assert a.total_chars == 44 and a.mean_chars_milli == 44 * 1000 // 4
    assert (b.n_docs, b.n_unique, b.n_langs, b.dup_rate_milli) == (2, 2, 1, 0)


def test_conversation_stats_span_and_roles(spark):
    t0 = datetime.datetime(2024, 6, 1, 10, 0, 0, 250500)
    rows = [
        ("c1", t0, "user", "hi"),
        ("c1", t0 + datetime.timedelta(seconds=5), "assistant", "hello!"),
        ("c1", t0 + datetime.timedelta(seconds=9, microseconds=999), "user", "ok"),
        ("c2", t0, "user", "solo"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, role string, text string")
    out = {r.conv_id: r for r in conversation_stats(df, "conv_id", "ts", "text", "role").collect()}
    c1, c2 = out["c1"], out["c2"]
    assert c1.n_turns == 3 and c1.n_roles == 2
    # exact micro diff 9_000_999us floored to ms
    assert c1.span_ms == 9000
    assert c1.total_chars == len("hi") + len("hello!") + len("ok") == 10
    assert c1.chars_per_turn_milli == 10 * 1000 // 3
    assert (c2.n_turns, c2.span_ms, c2.n_roles) == (1, 0, 1)


def test_perplexity_buckets_rejects_single_bucket(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "the the")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(df, n_buckets=1)


def test_perplexity_buckets_excludes_tokenless_docs(spark):
    df = spark.createDataFrame(
        [(1, "the the the"), (2, ""), (3, "   "), (4, "rare1 rare2 rare3")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in perplexity_buckets(df, n_buckets=2).collect()}
    assert got == {1, 4}  # documented: token-less docs are not ranked


def test_fuzzy_decontaminate_planted_paraphrase(spark):
    """A truncated/paraphrased copy of a train doc is flagged; an
    unrelated doc is not; output jaccard is the exact value."""
    from beats_spark.operators.textstats import fuzzy_decontaminate

    base = "the quick brown fox jumps over the lazy dog and then runs far away home"
    train = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different content about spark physical plans and shuffles joining"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        # first 12 of 15 words: jaccard of 5-shingles = 8/11
        [(100, "the quick brown fox jumps over the lazy dog and then runs")],
        "doc_id long, text string",
    )
    rows = fuzzy_decontaminate(train, evals, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["train_id"], r["eval_id"]) == (1, 100)
    assert abs(r["jaccard"] - 8 / 11) < 1e-12


def test_fuzzy_decontaminate_below_threshold_excluded(spark):
    from beats_spark.operators.textstats import fuzzy_decontaminate

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    # shares a 5-gram (so it IS a candidate) but jaccard 1/11 < 0.5
    evals = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon one two three four five six")],
        "doc_id long, text string",
    )
    assert fuzzy_decontaminate(train, evals, threshold=0.5).count() == 0


def test_tokenizer_fertility_cjk_vs_latin(spark):
    """CJK prices ~1 char per BPE-ish token but many chars per
    whitespace token; Latin prose sits near word length for both."""
    from beats_spark.operators.textstats import tokenizer_fertility

    df = spark.createDataFrame(
        [
            (1, "你好世界再见 世界你好"),   # 10 CJK chars + 1 space, 2 ws tokens
            (2, "plain english words here"),
        ],
        "doc_id long, text string",
    )
    out = {r["dominant_script"]: r for r in tokenizer_fertility(df).collect()}
    cjk, lat = out["cjk"], out["latin"]
    assert cjk["sum_tokens_ws"] == 2 and cjk["sum_tokens_bpe"] == 10
    assert cjk["chars_per_ws_token_milli"] == 11 * 1000 // 2
    assert cjk["chars_per_bpe_token_milli"] == 11 * 1000 // 10
    assert lat["sum_tokens_ws"] == 4 and lat["sum_tokens_bpe"] == 4
    assert lat["chars_per_ws_token_milli"] == 24 * 1000 // 4


def test_tokenizer_fertility_null_and_empty_text(spark):
    """NULL/empty texts land in the 'none' stratum with zero token
    sums and the guarded division returns sum_chars*1000 (÷1)."""
    from beats_spark.operators.textstats import tokenizer_fertility

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = tokenizer_fertility(df).collect()
    assert len(rows) == 1 and rows[0]["dominant_script"] == "none"
    r = rows[0]
    assert r["n_docs"] == 3 and r["sum_chars"] == 3
    # NULL text contributes NULL token counts (sum skips), blank rows 0
    assert (r["sum_tokens_ws"] or 0) == 0
    assert r["chars_per_ws_token_milli"] == 3000


def test_fuzzy_decontaminate_ignores_null_and_blank_text(spark):
    """NULL/whitespace-only docs must not 'contaminate' each other:
    shingles() degenerates to [''] for them (jaccard 1.0) while the
    DuckDB oracle produces [] — the operator excludes them on both
    engines, and a blank doc is semantically not a benchmark leak."""
    from beats_spark.operators.textstats import fuzzy_decontaminate

    train = spark.createDataFrame(
        [(1, None), (2, "  \n "), (3, "real content words here five six seven")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(9, ""), (10, None), (11, "\t")],
        "doc_id long, text string",
    )
    assert fuzzy_decontaminate(train, evals, threshold=0.3).count() == 0


def test_fuzzy_decontaminate_rejects_bad_banding(spark):
    import pytest

    from beats_spark.operators.textstats import fuzzy_decontaminate

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        fuzzy_decontaminate(df, df, num_hashes=16, bands=64)
