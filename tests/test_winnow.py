"""Robust winnowing (textstats.winnow_fingerprint_sql / winnow_pairs):
pure-Python twin equality, the window-coverage guarantee the algorithm
is named for, edge cases, offset-invariant matching, and the posting
cap. Reference: Schleimer, Wilkerson & Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from beats_spark.operators.textstats import (
    _WINNOW_POS_MOD,
    add_winnow_fingerprints,
    winnow_fingerprint_sql,
    winnow_pairs,
)

SPAN = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the miller watches from the old stone bridge in the rain"
)

DOCS = [
    (0, SPAN),
    (1, "a completely different document about winnowing guarantees"),
    (2, "leading context first and then " + SPAN + " plus a suffix tail"),
    (3, ""),
    (4, None),
    (5, "tiny"),
    (6, "  MIXED   Case \t and   spaced  " + SPAN.upper() + "  "),
]


def py_winnow(text, k=24, w=8, max_chars=4000):
    """Independent reimplementation — plain loops, no arrays-of-arrays."""
    nt = re.sub(r"\s+", " ", (text or "").lower()).strip()[:max_chars]
    if len(nt) < k:
        return []
    enc = [
        (int(hashlib.md5(nt[p : p + k].encode()).hexdigest()[:10], 16) << 20)
        + p
        for p in range(len(nt) - k + 1)
    ]
    ww = min(w, len(enc))
    sel = {min(enc[i : i + ww]) for i in range(max(len(enc) - w + 1, 1))}
    return sorted(sel)


def _spark_fps(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = add_winnow_fingerprints(df, **kw).select("doc_id", "winnow_fps")
    return {r.doc_id: sorted(r.winnow_fps) for r in out.collect()}


def test_matches_pure_python(spark):
    got = _spark_fps(spark, DOCS)
    for doc_id, text in DOCS:
        assert got[doc_id] == py_winnow(text), doc_id


def test_duckdb_twin_identical(spark):
    import duckdb
    import pandas as pd

    got = _spark_fps(spark, DOCS)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    sql = winnow_fingerprint_sql("text", dialect="duckdb")
    for doc_id, fps in con.execute(f"SELECT doc_id, {sql} FROM t").fetchall():
        assert sorted(fps) == got[doc_id], doc_id


def test_window_coverage_guarantee(spark):
    """Every window of w consecutive k-gram positions must contain at
    least one selected fingerprint — the density contract that makes a
    shared substring of length >= k + w - 1 impossible to miss."""
    k, w = 24, 8
    got = _spark_fps(spark, DOCS, k=k, w=w)
    for doc_id, text in DOCS:
        nt = re.sub(r"\s+", " ", (text or "").lower()).strip()[:4000]
        if len(nt) < k:
            assert got[doc_id] == []
            continue
        positions = sorted(c % _WINNOW_POS_MOD for c in got[doc_id])
        n_pos = len(nt) - k + 1
        for start in range(max(n_pos - w + 1, 1)):
            window = range(start, min(start + w, n_pos))
            assert any(p in window for p in positions), (doc_id, start)


def test_offset_invariant_hashes(spark):
    """The same span at different byte offsets shares interior HASHES
    (position-stripped codes) even though the encoded positions differ."""
    got = _spark_fps(spark, DOCS, hashes_only=True)
    shared_02 = set(got[0]) & set(got[2])
    assert len(shared_02) >= 10
    # normalization: case + whitespace variants are the same span
    assert len(set(got[0]) & set(got[6])) >= 10
    # unrelated doc shares nothing
    assert not set(got[0]) & set(got[1])


def test_pairs_and_posting_cap(spark):
    rows = [(i, SPAN) for i in range(5)]
    rows.append((9, "nothing in common with the others at all here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(df, min_shared=2, max_bucket=1000).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert got == {(a, b) for a in range(5) for b in range(a + 1, 5)}
    # identical docs ⇒ EVERY hash sits in a 5-doc posting: max_bucket=4
    # drops the postings whole and no pair can form
    assert winnow_pairs(df, min_shared=2, max_bucket=4).count() == 0


def test_bad_params_rejected():
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprint_sql("text", k=1)
    with pytest.raises(ValueError):
        winnow_fingerprint_sql("text", max_chars=1 << 20)
    with pytest.raises(ValueError):
        winnow_fingerprint_sql("text", dialect="postgres")


def test_decontaminate_flags_every_source(spark):
    """Pasted-benchmark recall: an eval doc cut from a corpus doc's
    first 200 chars MUST flag that source doc (winnowing guarantee —
    the shared span is far longer than k + w - 1)."""
    from pyspark.sql import functions as F

    from beats_spark.operators.textstats import winnow_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 17 == 4).select(
        (F.col("doc_id") + 500000).alias("eval_id"),
        F.substring(F.col("text"), 1, 200).alias("text"),
    )
    flagged = {
        r.doc_id: r for r in winnow_decontaminate(docs, ev).collect()
    }
    sources = [r.doc_id for r in docs.where("doc_id % 17 = 4").collect()]
    for d in sources:
        assert d in flagged, d
        assert flagged[d].n_eval_partners >= 1


def test_decontaminate_flag_join_broadcasts(spark):
    """The eval fingerprint set rides a BroadcastHashJoin — the
    corpus side never shuffles toward the benchmark."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from beats_spark.operators.textstats import winnow_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.limit(5).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    out = winnow_decontaminate(docs, ev)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
