"""Incremental (continuous-ingestion) dedup: within-batch collapse +
anti-join against the persistent content index."""

from __future__ import annotations

from beats_spark.operators.dedup import (
    content_index,
    incremental_dedup,
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


def test_content_index_is_distinct_keys(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "SAME"), (3, "other")], "doc_id long, text string"
    )
    idx = content_index(docs)
    assert idx.count() == 2 and set(idx.columns) == {"_ck", "_ck2"}
