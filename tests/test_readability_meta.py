"""readability_stats (textstats.py) and meta_robots (html.py):
hand-computed scores, NULL/blank edges, attribute-order and quoting
variants, directive flag semantics."""

from __future__ import annotations

from beats_spark.operators.html import meta_robots
from beats_spark.operators.textstats import readability_stats


def _read(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in readability_stats(df).collect()}


def test_readability_hand_computed(spark):
    # "the cat sat. it ran!" -> words 5, sentence runs 2,
    # syllables: e/a/a/i/a -> 5
    got = _read(spark, [(1, "the cat sat. it ran!")])[1]
    assert (got["n_words"], got["n_sentences"], got["n_syllables"]) == (5, 2, 5)
    w, s, syl = 5, 2, 5
    assert got["flesch_milli"] == 206835 - (1015 * w) // s - (84600 * syl) // w
    assert got["fk_grade_milli"] == (390 * w) // s + (11800 * syl) // w - 15590


def test_readability_edges(spark):
    got = _read(spark, [(1, ""), (2, "   "), (3, None), (4, "headline no dot")])
    # blank: zero words, sentence floor 1, zero syllables
    assert (got[1]["n_words"], got[1]["n_sentences"], got[1]["n_syllables"]) == (0, 1, 0)
    assert got[1]["flesch_milli"] == 206835
    assert got[2]["n_words"] == 0
    # NULL text: NULL counts/scores except the floored sentence count
    assert got[3]["n_words"] is None
    assert got[3]["n_sentences"] == 1
    assert got[3]["flesch_milli"] is None
    # headline: one sentence by the floor rule
    assert got[4]["n_sentences"] == 1
    assert got[4]["n_words"] == 3


def _robots(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    return {r.doc_id: r.asDict() for r in meta_robots(df).collect()}


def test_meta_robots_variants(spark):
    got = _robots(
        spark,
        [
            (1, '<html><meta name="robots" content="noindex, follow"></html>'),
            (2, "<meta content='NOFOLLOW' name='ROBOTS'>"),
            (3, '<META NAME="ROBOTS" CONTENT="NONE">'),
            (4, '<meta name="viewport" content="width=device-width">'),
            (5, "no meta at all"),
            (6, None),
            (7, '<meta name="robots" content="">'),
        ],
    )
    assert got[1] == {
        "doc_id": 1, "has_meta": True, "directives": "noindex,follow",
        "noindex": True, "nofollow": False,
    }
    # content-first order + uppercase
    assert (got[2]["has_meta"], got[2]["directives"], got[2]["nofollow"]) == (
        True, "nofollow", True,
    )
    # 'none' implies both
    assert (got[3]["noindex"], got[3]["nofollow"]) == (True, True)
    for d in (4, 5):
        assert got[d]["has_meta"] is False
        assert got[d]["directives"] == ""
        assert got[d]["noindex"] is False and got[d]["nofollow"] is False
    assert got[6]["has_meta"] is None or got[6]["has_meta"] is False
    # matched tag with empty content: present but directive-free
    assert (got[7]["has_meta"], got[7]["directives"], got[7]["noindex"]) == (
        True, "", False,
    )


def test_doc_structure_hand_built(spark):
    from beats_spark.operators.textstats import doc_structure_stats

    md = (
        "# h1\n## h2\n- a\n- b\n* c\n```\nx=1\n```\n```\nunclosed\n"
        "> q1\n> q2\n| a | b |\n|c|d|\nsee [one](u1) and [two](u2)\n"
        "####### not a heading (7 hashes)\nplain line"
    )
    df = spark.createDataFrame(
        [(1, md), (2, "plain prose only"), (3, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in doc_structure_stats(df).collect()}
    assert got[1] == {
        "doc_id": 1,
        "n_headings": 2,
        # 3 tick runs -> 1 complete fence pair (unclosed truncates)
        "n_fences": 1,
        "n_list_items": 3,
        "n_links": 2,
        "n_table_rows": 2,
        "n_quotes": 2,
        # structured lines: 2 headings + 3 list + 2 table + 2 quotes
        # = 9 of 17 lines
        "structured_milli": 9000 // 17,
    }
    assert got[2]["structured_milli"] == 0 and got[2]["n_fences"] == 0
    assert got[3]["n_headings"] is None
