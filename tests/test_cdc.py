"""Content-defined chunking (dedup.cdc_chunk_sql / cdc_shared_stats):
engine identity, exact tiling/contiguity, offset-invariant interior
sharing, edge cases, and the sharing rollup. Reference: LBFS
(Muthitacharoen et al., SOSP 2001)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.operators.dedup import cdc_chunk_sql, cdc_shared_stats

# aperiodic: a repeated ("x " * N) span would collapse its identical
# chunks into one hash and hide sharing (learned in smoke)
SHARED = " ".join(f"w{i}token{(i * 37) % 91}" for i in range(60))

ROWS = [
    (0, "prefix A " + SHARED + " suffix A"),
    (1, "a completely different longer prefix here " + SHARED + " tail"),
    (2, "unrelated content with nothing shared at all in it whatsoever"),
    (3, ""),
    (4, None),
    (5, "tiny"),
]


def _spark_chunks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sql = cdc_chunk_sql("text", dialect="spark")
    out = df.select("doc_id", F.expr(sql).alias("c")).collect()
    return {r.doc_id: sorted(tuple(c) for c in (r.c or [])) for r in out}


def test_engines_identical_and_tiling(spark):
    got = _spark_chunks(spark, ROWS)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    dsql = cdc_chunk_sql("text", dialect="duckdb")
    for did, cs in con.execute(f"SELECT doc_id, {dsql} FROM t").fetchall():
        want = sorted(
            (c["chunk_idx"], c["start_pos"], c["chunk_len"], c["chunk_md5"])
            for c in (cs or [])
        )
        assert want == got[did], did
    for did, text in ROWS:
        cs = sorted(got[did], key=lambda c: c[1])
        assert sum(c[2] for c in cs) == len((text or "")[:8000]), did
        pos = 1
        for c in cs:
            assert c[1] == pos, did
            pos += c[2]
    # empty/NULL chunk to nothing; shorter-than-gram is one whole chunk
    assert got[3] == [] and got[4] == []
    assert len(got[5]) == 1 and got[5][0][2] == 4


def test_offset_invariant_interior_chunks(spark):
    got = _spark_chunks(spark, ROWS)
    h = {d: {c[3] for c in got[d]} for d in (0, 1, 2)}
    assert len(h[0] & h[1]) >= 3  # shared span, different offsets
    assert not (h[0] & h[2])


def test_shared_stats_rollup(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = {r.doc_id: r for r in cdc_shared_stats(df).collect()}
    # both span carriers report the same shared chunk count and the
    # shared chars approximate the span length
    assert out[0].n_shared_chunks == out[1].n_shared_chunks >= 3
    assert out[0].chars_shared > len(SHARED) // 2
    assert out[2].n_shared_chunks == 0 and out[2].chars_shared == 0
    assert 3 not in out and 4 not in out  # chunkless docs emit no row


def test_bad_params():
    with pytest.raises(ValueError):
        cdc_chunk_sql("text", gram=1)
    with pytest.raises(ValueError):
        cdc_chunk_sql("text", mask_bits=0)
    with pytest.raises(ValueError):
        cdc_chunk_sql("text", dialect="postgres")
