"""HTML → text extraction: behavior battery, Spark/DuckDB battery
lockstep (the oracle twin), and the CCNet-composition front door."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain
from beats_spark.operators.html import html_steps_sql, html_to_text

CASES = [
    # (html, expected extracted text)
    ("<html><head><title>T</title><style>p{color:red}</style></head>"
     "<body><p>Hello <b>world</b></p><div>line2</div></body></html>",
     "T\nHello world\nline2"),
    ("<script>var x = '<p>not text</p>';</script>"
     "<p>kept &amp; decoded &lt;tag&gt;</p>", "kept & decoded <tag>"),
    ("<!-- comment --><ul><li>a</li><li>b</li></ul>", "a\nb"),
    ("text with &nbsp; spaces &quot;quoted&quot; &#39;single&#39; &amp;lt;",
     "text with spaces \"quoted\" 'single' &lt;"),
    ("<P CLASS='x'>upper</P><BR/><img src='y.png'>inline<span>span</span>",
     "upper\ninlinespan"),
    ("no markup at all", "no markup at all"),
    ("<div><div><div>nested</div></div></div>", "nested"),
    ("", ""),
    ("multi\n\n\n\nnewlines<br><br><br>after", "multi\nnewlines\nafter"),
    ("<table><tr><td>c1</td><td>c2</td></tr></table>", "c1\nc2"),
    ("a < b but not a tag > c", "a < b but not a tag > c"),
    ("<!DOCTYPE html><p>doc</p>", "doc"),
]


def test_extraction_battery(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, html string"
    )
    got = {r["i"]: r["t"]
           for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i][0], got[i])


def test_spark_and_duckdb_battery_agree(spark):
    """html_steps_sql IS the oracle: both engines must produce
    byte-identical text over the battery plus NULL."""
    rows = [(i, h) for i, (h, _) in enumerate(CASES)] + [(99, None)]
    df = spark.createDataFrame(rows, "i int, html string")
    got = {r["i"]: r["t"]
           for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()}
    con = duckdb.connect()
    vals = ",".join(
        f"({i}, {'NULL' if h is None else chr(39) + h.replace(chr(39), chr(39) * 2) + chr(39)})"
        for i, h in rows
    )
    con.execute(f"CREATE TABLE c AS SELECT * FROM (VALUES {vals}) t(i, html)")
    want = dict(con.execute(f"SELECT i, {html_steps_sql('html')} FROM c").fetchall())
    assert got == want


def test_processor_form_tags_null(spark):
    df = spark.createDataFrame([(1, "<p>x</p>"), (2, None)], "id int, html string")
    out = build_chain([{"extract_html_text": {}}])(df)
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["text"] == "x" and r[1]["flags"] is None
    assert r[2]["text"] is None and "html_extract_error" in r[2]["flags"]


def test_composition_with_line_dedup(spark):
    """Shared chrome lines (title/nav/footer) vanish in the composed
    front door; unique article bodies survive."""
    from beats_spark.operators.dedup import line_level_dedup
    from beats_spark.operators.html import extract_html_text

    pages = [
        (i,
         "<html><head><title>My Site</title></head><body>"
         "<nav><li>Home</li><li>About</li></nav>"
         f"<article><p>unique body number {i} with words</p></article>"
         "<footer>(c) 2024 Site</footer></body></html>")
        for i in range(6)
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    ext = extract_html_text(df, "html", "text").select("doc_id", "text")
    out = {r["doc_id"]: r for r in line_level_dedup(ext, min_docs=2).collect()}
    for i in range(6):
        assert out[i]["text"] == f"unique body number {i} with words", out[i]
        assert out[i]["n_removed"] == 4  # title, 2 nav items, footer


def test_extract_links_resolution_battery(spark):
    from beats_spark.operators.html import extract_links

    html = (
        '<a href="https://abs.example.com/x">a</a>'
        "<A HREF='/root.html'>b</A>"
        "<a class=\"z\" href=rel/page.html>c</a>"
        '<a href="//cdn.example.net/lib.js">d</a>'
        '<a href="#frag">e</a>'
        '<a href="javascript:void(0)">f</a>'
        '<a href="MAILTO:x@y.z">g</a>'
        '<a href="https://abs.example.com/x">dup</a>'
        '<a href="sub.html#sec">h</a>'
    )
    df = spark.createDataFrame(
        [
            (1, html, "http://H7.Example.com:8080/dir/page.html?q=1"),
            (2, '<a href="https://abs.example.com/y">i</a><a href="rel.html">j</a>',
             "not a url"),
            (3, "<p>no links</p>", "http://a.example.com/"),
        ],
        "doc_id long, html string, url string",
    )
    out = extract_links(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.link)
    assert by_doc[1] == {
        "https://abs.example.com/x",
        "http://H7.Example.com:8080/root.html",
        "http://H7.Example.com:8080/dir/rel/page.html",
        "http://cdn.example.net/lib.js",
        "http://H7.Example.com:8080/dir/sub.html#sec",
    }
    # canonical drops the fragment and lowercases the host
    canon = {r.canonical_link for r in out if r.doc_id == 1}
    assert "http://h7.example.com:8080/dir/sub.html" in canon
    # non-URL base: absolute links survive, relatives are dropped
    assert by_doc[2] == {"https://abs.example.com/y"}
    # no links -> no rows
    assert 3 not in by_doc


def test_extract_links_resolution_matches_urljoin(spark):
    """Independent oracle: on the documented subset (no dot segments,
    no empty/fragment-only hrefs — those drop by design), resolution
    must agree with Python's RFC-3986 urljoin for every (base, href)
    combination."""
    from itertools import product
    from urllib.parse import urljoin

    from beats_spark.operators.html import extract_links

    bases = [
        "http://h.example.com/a/b/c.html",
        "https://x.org/",
        "http://u:p@h.net:8080/d/",
        "ftp://f.example.net/pub/x",
        "http://q.example.com/a?q=1",
    ]
    hrefs = [
        "p.html",
        "q/r.html",
        "/root",
        "//cdn.net/x",
        "https://abs.io/z",
        "x?y=1&a=2",
        "?page=2",
    ]
    rows = [
        (i, f'<a href="{h}">l</a>', b)
        for i, (b, h) in enumerate(product(bases, hrefs))
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string, url string")
    got = {r.doc_id: r.link for r in extract_links(df).collect()}
    for i, (b, h) in enumerate(product(bases, hrefs)):
        assert got[i] == urljoin(b, h), (b, h, got[i])


def test_anchor_stats_grammar_and_rollup(spark):
    """Pairs extract from double-quoted anchors only; nested markup
    and relative targets are skipped; fragments fold; text
    whitespace-normalizes; top anchor ties break lexicographically."""
    from beats_spark.operators.html import anchor_stats

    rows = [
        (1, '<a href="https://t.example/a">Read More</a>'
            '<a href="https://t.example/a#frag"> read\n more </a>'),
        (2, '<a href="https://t.example/a">read more</a>'
            "<a href='https://t.example/a'>single-quoted skipped</a>"),
        (3, '<a href="https://t.example/a"><b>nested skipped</b></a>'
            '<a href="/rel.html">relative skipped</a>'
            '<a href="https://t.example/b">beta</a>'),
        (4, '<a href="https://t.example/b">alpha</a>'),
        (5, '<A HREF="https://t.example/b">alpha</A>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r.target: r for r in anchor_stats(df).collect()}
    a = out["https://t.example/a"]
    # doc1 contributes 2 (fragment folds), doc2 contributes 1
    assert a.n_refs == 3 and a.n_docs == 2
    # "read more" normalized twice vs "Read More" once
    assert a.top_anchor == "read more" and a.top_anchor_refs == 2
    b = out["https://t.example/b"]
    assert b.n_refs == 3 and b.n_docs == 3
    # alpha(2) beats beta(1); case-insensitive <A HREF> matched
    assert b.top_anchor == "alpha" and b.top_anchor_refs == 2
    assert set(out) == {"https://t.example/a", "https://t.example/b"}


def test_anchor_stats_tie_breaks_lexicographically(spark):
    from beats_spark.operators.html import anchor_stats

    df = spark.createDataFrame(
        [
            (1, '<a href="https://t.example/x">zeta</a>'),
            (2, '<a href="https://t.example/x">alpha</a>'),
        ],
        "doc_id long, html string",
    )
    r = anchor_stats(df).collect()[0]
    assert r.top_anchor == "alpha" and r.top_anchor_refs == 1
