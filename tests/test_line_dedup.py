"""Line-level cross-corpus dedup semantics (operators/dedup.py)."""

from __future__ import annotations

from beats_spark.operators.dedup import line_level_dedup


def test_boilerplate_removed_unique_kept(spark):
    df = spark.createDataFrame(
        [
            (1, "HEADER\nalpha body\nFOOTER"),
            (2, "HEADER\nbeta body\nFOOTER"),
            (3, "gamma body"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_level_dedup(df).collect()}
    assert rows[1].text == "alpha body"
    assert rows[2].text == "beta body"
    assert rows[3].text == "gamma body"
    assert rows[1].n_lines == 3 and rows[1].n_kept == 1 and rows[1].n_removed == 2


def test_trim_identical_matching_and_blank_preserved(spark):
    df = spark.createDataFrame(
        [
            (1, "FOOT  \n\nkeep one"),  # trailing spaces still match FOOT
            (2, "FOOT\n\nkeep two"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_level_dedup(df).collect()}
    # blank line preserved (leading, since FOOT was removed)
    assert rows[1].text == "\nkeep one"
    assert rows[2].text == "\nkeep two"


def test_doc_reduced_to_empty(spark):
    df = spark.createDataFrame(
        [(1, "SAME"), (2, "SAME"), (3, "SAME\nextra")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_level_dedup(df).collect()}
    assert rows[1].text == "" and rows[1].n_kept == 0 and rows[1].n_removed == 1
    assert rows[3].text == "extra"


def test_min_docs_threshold(spark):
    df = spark.createDataFrame(
        [(1, "dup\na1"), (2, "dup\na2")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_level_dedup(df, min_docs=3).collect()}
    # appears in only 2 docs < min_docs=3 -> kept
    assert rows[1].text == "dup\na1"


def test_order_preserved_across_removals(spark):
    df = spark.createDataFrame(
        [(1, "a\nX\nb\nX\nc"), (2, "X")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_level_dedup(df).collect()}
    assert rows[1].text == "a\nb\nc"
