"""Incremental (continuous-ingestion) dedup: within-batch collapse +
anti-join against the persistent content index, and the fuzzy twin
(MinHash band index + hashed-shingle verify)."""

from __future__ import annotations

from beats_spark.operators.dedup import (
    content_index,
    incremental_dedup,
    incremental_neardup,
    neardup_index,
    shingle_index,
)


def test_incremental_dedup(spark):
    corpus = spark.createDataFrame(
        [(1, "old doc one"), (2, "old doc two")], "doc_id long, text string"
    )
    idx = content_index(corpus)
    batch = spark.createDataFrame(
        [
            (10, "fresh doc"),
            (11, "Fresh   DOC"),      # within-batch dup (normalized)
            (12, "old doc one"),      # already indexed -> dropped
            (13, "OLD doc TWO  "),    # indexed after normalization
            (14, "another fresh"),
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(batch, idx)
    assert {r.doc_id for r in out.collect()} == {10, 14}
    # second wave: index grows by the survivors; re-sending them drops
    idx2 = idx.unionByName(content_index(out)).distinct()
    again = incremental_dedup(batch, idx2)
    assert again.count() == 0


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_incremental_neardup_drops_near_matches_keeps_fresh(spark):
    corpus = _mk(spark, [(1, _BASE), (2, "totally different historical content here now")])
    bidx, sidx = neardup_index(corpus), shingle_index(corpus)
    batch = _mk(
        spark,
        [
            (10, _BASE + " lambda"),          # near-dup of 1 (J=6/7)
            (11, "completely fresh new document about other things entirely"),
            (12, _BASE),                      # verbatim replay of 1
            (13, None),                       # blank: excluded, survives
            (14, "   \n  "),
        ],
    )
    out = incremental_neardup(batch, bidx, sidx, threshold=0.7)
    assert {r.doc_id for r in out.collect()} == {11, 13, 14}


def test_incremental_neardup_threshold_is_exact_jaccard(spark):
    # 10-word base → 6 shingles; a one-word change mid-doc rewrites 5
    # of them: J = 1/11 << 0.7 even though several bands may collide —
    # the exact verify stage must keep it
    corpus = _mk(spark, [(1, _BASE)])
    changed = _BASE.replace("epsilon", "CHANGED")
    batch = _mk(spark, [(20, changed)])
    out = incremental_neardup(
        batch, neardup_index(corpus), shingle_index(corpus), threshold=0.7
    )
    assert {r.doc_id for r in out.collect()} == {20}


def test_incremental_neardup_index_evolution_and_restart(spark):
    """Three ingest waves with the index APPENDED between them must
    equal the from-scratch sequential computation; re-running a wave
    against the same index (a crash/restart replay) is idempotent."""
    w1 = _mk(spark, [(1, _BASE), (2, "first wave other doc with its own words")])
    w2 = _mk(
        spark,
        [
            (10, _BASE + " lambda"),               # near-dup of wave-1 #1
            (11, "second wave fresh doc about streams and buffers in the engine ok"),
        ],
    )
    w3 = _mk(
        spark,
        [
            # near-dup of the WAVE-2 survivor: only caught if wave 2's
            # survivors were appended to the index (the evolution step)
            (20, "second wave fresh doc about streams and buffers in the engine yes"),
            (21, "third wave genuinely new content unlike anything prior"),
        ],
    )
    bidx, sidx = neardup_index(w1), shingle_index(w1)
    s2 = incremental_neardup(w2, bidx, sidx, threshold=0.7)
    assert {r.doc_id for r in s2.collect()} == {11}
    # restart replay of wave 2 against the UN-evolved index: same result
    s2_again = incremental_neardup(w2, bidx, sidx, threshold=0.7)
    assert {r.doc_id for r in s2_again.collect()} == {11}
    # evolve the index with wave-2 survivors (parquet-append shape)
    bidx2 = bidx.unionByName(neardup_index(s2))
    sidx2 = sidx.unionByName(shingle_index(s2))
    s3 = incremental_neardup(w3, bidx2, sidx2, threshold=0.7)
    assert {r.doc_id for r in s3.collect()} == {21}
    # without the evolution, doc 20 would wrongly survive
    s3_stale = incremental_neardup(w3, bidx, sidx, threshold=0.7)
    assert {r.doc_id for r in s3_stale.collect()} == {20, 21}


def test_neardup_index_shapes(spark):
    docs = _mk(spark, [(1, _BASE), (2, None)])
    bidx = neardup_index(docs, bands=16, num_hashes=64)
    rows = bidx.collect()
    assert set(bidx.columns) == {"doc_id", "band", "sig"}
    assert len(rows) == 16 and {r.doc_id for r in rows} == {1}  # blank excluded
    sidx = shingle_index(docs)
    srows = sidx.collect()
    assert len(srows) == 1 and len(srows[0].sh) == 6  # 10 words, n=5


def test_content_index_is_distinct_keys(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "SAME"), (3, "other")], "doc_id long, text string"
    )
    idx = content_index(docs)
    assert idx.count() == 2 and set(idx.columns) == {"_ck", "_ck2"}
