"""Deterministic byte-level BPE: encoder properties, Spark/pure-Python
exact twin (the rows-only gate for pack_sequences_bpe), and the
packing integration."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from beats_spark.functions.bpe import PRETOK, encode, token_count


def test_pretokenizer_partitions_any_string():
    """PRETOK must PARTITION the string (every char in exactly one
    piece) — the lossless-tokens property rides on it."""
    for t in [
        "plain words", "  leading", "trailing   ", "a_b__c",
        "tabs\tand\nnewlines\r\n", "mixed 12ab34 !!?", "'tis 'll 'd",
        "日本語 text 混在 mixed", "🎉 emoji 🎉🎉", "", " ", " nbsp",
    ]:
        assert "".join(PRETOK.findall(t)) == t, repr(t)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_encode_roundtrip_property(t):
    toks = encode(t)
    assert b"".join(toks).decode("utf-8") == t


def test_token_count_edges():
    assert token_count(None) == 0
    assert token_count("") == 0
    assert token_count("hello") >= 1


def test_bpe_prices_cjk_and_code_better_than_whitespace(spark):
    """The motivating defect: whitespace counts see a CJK paragraph as
    ~1 token; BPE prices it by content."""
    cjk = "形態素解析は難しい問題ですが分散処理で高速化できます" * 3
    assert token_count(cjk) > 10
    # code: dense punctuation must count as multiple tokens
    code = "x=[i*2 for i in range(10) if i%2==0]"
    assert token_count(code) > 10


def test_spark_udf_matches_pure_python_exactly(spark):
    """The oracle gate: the Arrow pandas UDF must agree token-for-token
    with the pure-Python encoder over the whole sf0.001 documents
    table (plus planted CJK/code/NULL rows)."""
    from beats_spark.functions.bpe import bpe_token_count, bpe_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" 日本語テスト")))
        .when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 11 == 0, F.lit("if err != nil { return }"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    got = planted.select(
        "doc_id", "text",
        bpe_token_count(F.col("text")).alias("n"),
        bpe_tokens(F.col("text")).alias("toks"),
    ).collect()
    assert len(got) == 500
    for r in got:
        want = [] if r["text"] is None else [
            b.decode("latin-1") for b in encode(r["text"])
        ]
        assert r["toks"] == want, r["doc_id"]
        assert r["n"] == len(want), r["doc_id"]


def test_pack_sequences_bpe_matches_python_twin(spark):
    """pack_sequences(token_counter='bpe') must produce the exact
    bucket/offset/window assignment a pure-Python replay computes."""
    import hashlib

    from beats_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            docs, budget=64, n_buckets=8, token_counter="bpe"
        ).collect()
    }
    rows = sorted(
        (r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()
    )
    # twin replay: md5 bucket, running offsets, window indexes
    def bucket(doc_id: int) -> int:
        # sample_hash: md5("s{seed}|" || key) first 15 hex digits
        h = hashlib.md5(f"s0|{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) % 8

    streams: dict[int, int] = {}
    for doc_id, text in rows:
        b = bucket(doc_id)
        tc = token_count(text)
        start = streams.get(b, 0)
        end = start + max(tc, 1)
        streams[b] = start + tc + 1
        r = out[doc_id]
        assert (r["bucket"], r["tok_count"], r["start_off"]) == (b, tc, start), doc_id
        assert (r["pack_first"], r["pack_last"]) == (start // 64, (end - 1) // 64), doc_id


def test_merges_table_is_frozen():
    """The checked-in table must never change silently: pin its length
    and the first ranks (retraining is an explicit, reviewed act —
    round 5 retrained to 12k merges over the enlarged seed corpus)."""
    from beats_spark.functions.bpe_merges import MERGES

    assert len(MERGES) == 12000
    assert MERGES[:3] == [(b"e", b"r"), (b"i", b"n"), (b" ", b"s")]
    for a, b in MERGES[:50]:
        assert isinstance(a, bytes) and isinstance(b, bytes)


def test_fast_trainer_matches_naive():
    """The incremental heap/index trainer must reproduce the naive
    full-recount trainer's merge sequence EXACTLY (same argmin, same
    lexicographic tie-break) — on a corpus small enough to run the
    naive one, covering overlap runs ('aaaa'), multi-byte text, and
    count collisions."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from train_bpe import train, train_naive

    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "aaaa aaaaa aa aaa baaab",
        "def f(x):\n    return x + 1\n" * 2,
        "日本語のテキストです。" * 2,
        "errors err error erring erred",
        "abab ababab abababab",
    ]
    assert train(texts, 400) == train_naive(texts, 400)
