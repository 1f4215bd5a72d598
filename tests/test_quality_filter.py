"""Composed Gopher-rules corpus filter (textstats.quality_filter)."""

from __future__ import annotations

from beats_spark.operators.textstats import quality_filter

GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs to the "
    "river where it drinks some water before resting in the shade of a "
    "tall tree for the afternoon with its friends"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in quality_filter(df).collect()}


def test_clean_doc_kept(spark):
    rows = _run(spark, [(1, GOOD)])
    assert rows[1].keep and rows[1].reasons == ""


def test_each_rule_fires(spark):
    rows = _run(
        spark,
        [
            (1, GOOD),
            (2, "tiny doc"),  # too_short
            (3, ("spam ham " * 30).strip()),  # repetition family
            (4, ("12345 67 " * 25).strip()),  # digit_soup
            (5, "line one of the doc\nline one of the doc\nline one of the doc\nthe end is here now"),
        ],
    )
    assert "too_short" in rows[2].reasons
    assert "top2gram" in rows[3].reasons and "dup5gram" in rows[3].reasons
    assert "digit_soup" in rows[4].reasons
    assert "dup_lines" in rows[5].reasons
    assert not rows[3].keep and not rows[4].keep


def test_reasons_sorted_and_joined(spark):
    rows = _run(spark, [(1, ("12345 67 " * 25).strip())])
    parts = rows[1].reasons.split(",")
    assert parts == sorted(parts) and len(parts) >= 2


def test_keep_filter_one_liner(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, "tiny doc")], "doc_id long, text string"
    )
    kept = quality_filter(df).where("keep").collect()
    assert [r.doc_id for r in kept] == [1]
