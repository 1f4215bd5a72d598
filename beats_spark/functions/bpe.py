"""Deterministic byte-level BPE tokenizer (fixed checked-in merges).

Why: the packing/token-budget path (operators/sampling.pack_sequences)
and token statistics previously meant WHITESPACE tokens, which
misprices CJK (no spaces ⇒ one "token" per line) and code (dense
punctuation). This module supplies a real subword count: byte-level
BPE in the public GPT-2 style (Sennrich et al. 2016; Radford et al.
2019's byte-level variant) with a fixed merges table checked in as
data (bpe_merges.py, built once by scripts/train_bpe.py), so every
host tokenizes identically forever.

Vocabulary scale: the checked-in table holds 12,000 merges trained on
a deterministic ~3.6 MB seed corpus (sf0.1 documents + seeded
morphological English prose, multi-language code, log/NDJSON lines,
and CJK lexeme text — scripts/train_bpe.py). Measured fertility on
held-out English prose is ~3.1 chars/token — the regime of real
production tokenizers — so absolute token budgets priced with this
table are realistic, not the lower bounds the earlier 849-merge
fixture table produced. A production deployment would swap in its
model's actual merges file; everything downstream (pack_sequences,
budget math, the exact pure-Python twin) is table-agnostic.

Design:
- Pre-tokenizer: a GPT-2-shaped regex partition of the text (letters /
  digits / punctuation runs with an attached leading space, whitespace
  runs). It PARTITIONS the string — every char lands in exactly one
  piece — so token sequences are lossless (round-trip property tested).
- Encoder: greedy lowest-rank merge loop per piece over UTF-8 bytes
  (byte alphabet ⇒ no OOV, any script tokenizes). Per-process
  lru_cache on pieces: real corpora repeat words heavily, so the
  amortized cost per row is a dict lookup.
- Spark surface: Arrow pandas UDFs (batch transfer, no per-row Python)
  returning the token count / the token strings (latin-1 rendering of
  the token bytes — a lossless 1:1 byte↔char map, so array<string>
  round-trips exactly).

The reference has no tokenizer (libbeat ships none); this is an
engine addition for the training-data layer. Not SQL-expressible
(iterative ranked merges), so contract queries over it are rows-only
with an in-suite exact twin: the pure-Python encoder below IS the
oracle, compared value-for-value against the UDF output in
tests/test_bpe.py.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column

# Partition-of-the-string pre-tokenizer (GPT-2 shape, stdlib-re form):
# contractions, " ?letters", " ?digits", " ?punctuation", underscores,
# then whitespace-not-before-nonspace / whitespace runs.
PRETOK = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|_+|\s+(?!\S)|\s+",
    re.UNICODE,
)

_RANKS: dict[tuple[bytes, bytes], int] | None = None


def _ranks() -> dict[tuple[bytes, bytes], int]:
    global _RANKS
    if _RANKS is None:
        from beats_spark.functions.bpe_merges import MERGES

        _RANKS = {pair: i for i, pair in enumerate(MERGES)}
    return _RANKS


@lru_cache(maxsize=65536)
def _encode_piece(piece: str) -> tuple[bytes, ...]:
    """Greedy BPE over one pre-token: repeatedly merge the present
    pair with the LOWEST rank until none of the table's pairs remain
    (the standard encode loop of the public GPT-2 tokenizer)."""
    ranks = _ranks()
    sym: list[bytes] = [bytes([b]) for b in piece.encode("utf-8")]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        merged = sym[best_i] + sym[best_i + 1]
        # merge ALL occurrences of this exact pair left-to-right
        out: list[bytes] = []
        i = 0
        a, b = sym[best_i], sym[best_i + 1]
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


def encode(text: str) -> list[bytes]:
    """text → BPE token byte-strings (pure Python; the oracle twin)."""
    if not text:
        return []
    toks: list[bytes] = []
    for piece in PRETOK.findall(text):
        toks.extend(_encode_piece(piece))
    return toks


def token_count(text: str | None) -> int:
    return 0 if text is None else len(encode(text))


def _make_count_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        return s.map(token_count)

    return _count


def _make_tokens_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _toks(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: []
            if t is None
            else [b.decode("latin-1") for b in encode(t)]
        )

    return _toks


def bpe_token_count(col: Column) -> Column:
    """array-free token COUNT column (long); NULL text → 0."""
    return _make_count_udf()(col)


def bpe_tokens(col: Column) -> Column:
    """token strings column (array<string>, latin-1 byte rendering);
    NULL text → empty array."""
    return _make_tokens_udf()(col)
