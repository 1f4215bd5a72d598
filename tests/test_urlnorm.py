"""URL canonicalization unit battery (operators/urlnorm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.base import build_chain
from beats_spark.operators.urlnorm import canonicalize_url, url_dedup

CASES = [
    # scheme + host case, default port
    ("HTTP://WWW.Example.COM:80/a", "http://www.example.com/a"),
    ("https://Host.io:443/x", "https://host.io/x"),
    ("https://host.io:8443/x", "https://host.io:8443/x"),  # non-default kept
    ("http://h:443/x", "http://h:443/x"),  # not http's default -> kept
    ("ftp://h:21/f", "ftp://h/f"),
    # path normalization
    ("http://h//a//b/", "http://h/a/b"),
    ("http://h/", "http://h/"),
    ("http://h", "http://h/"),
    ("http://h/a/", "http://h/a"),
    # query: trackers dropped, params sorted, fragment dropped
    ("http://h/p?b=2&a=1", "http://h/p?a=1&b=2"),
    ("http://h/p?utm_source=tw&a=1&fbclid=zz", "http://h/p?a=1"),
    ("http://h/p?utm_campaign=x", "http://h/p"),
    ("http://h/p?a=1#frag", "http://h/p?a=1"),
    ("http://h/p#frag", "http://h/p"),
    # param values preserved byte-for-byte (only order/trackers change)
    ("http://h/p?q=A%20B&z=1", "http://h/p?q=A%20B&z=1"),
    # empty params dropped
    ("http://h/p?&a=1&", "http://h/p?a=1"),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, url, want) for i, (url, want) in enumerate(CASES)],
        "id long, url string, want string",
    )


def test_canonicalization_battery(frame):
    got = frame.withColumn("canon", canonicalize_url(F.col("url"))).collect()
    for r in got:
        assert r.canon == r.want, f"{r.url!r}: {r.canon!r} != {r.want!r}"


def test_non_url_is_null(spark):
    df = spark.createDataFrame(
        [("not a url",), ("relative/path?a=1",), ("",)], "url string"
    )
    out = df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    assert all(r.c is None for r in out)


def test_url_dedup_keeper(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTP://h/a?b=2&a=1"),
            (2, "http://h:80/a/?a=1&b=2&utm_source=x"),
            (3, "http://h/other"),
            (4, "plain text"),
        ],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in url_dedup(df).collect()}
    assert rows[1].canonical_url == rows[2].canonical_url == "http://h/a?a=1&b=2"
    assert rows[1].n_dupes == rows[2].n_dupes == 2
    assert rows[1].is_keeper and not rows[2].is_keeper
    assert rows[3].n_dupes == 1 and rows[3].is_keeper
    assert rows[4].canonical_url is None and rows[4].is_keeper


def test_processor_tags_non_url(spark):
    df = spark.createDataFrame([("nope",), ("http://h/x",)], "url string")
    out = build_chain([{"canonicalize_url": {"field": "url", "target": "c"}}])(df)
    rows = sorted(out.collect(), key=lambda r: r.url)
    assert rows[0].url == "http://h/x" and rows[0].c == "http://h/x"
    assert rows[0].flags is None
    assert rows[1].c is None and "url_canonical_error" in (rows[1].flags or [])


def test_url_filter_suffix_exact_and_pattern(spark):
    from beats_spark.operators.urlnorm import url_filter

    rows = [
        (1, "http://sub.ads.example.com/x"),      # parent-suffix block
        (2, "http://ads.example.com.evil.org/x"), # NOT a suffix match
        (3, "http://h7.media.net/x"),             # exact-host block
        (4, "http://deep.h7.media.net/x"),        # subdomain of exact host
        (5, "http://user:pw@ADS.example.com:8080/x"),  # userinfo+port+case
        (6, "http://clean.example.com/casino/slots"),  # pattern block
        (7, "http://clean.example.com/ok"),
        (8, "not a url at all"),
        (9, "http://ads.example.com./x"),   # trailing-dot FQDN evasion
        (10, "http://ads.example.com:/x"),  # empty-port evasion
        (11, None),                         # NULL url
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("ads.example.com",), ("h7.media.net",)], "domain string"
    )
    out = {
        r.doc_id: r
        for r in url_filter(df, bl, patterns=[r"/casino/"]).collect()
    }
    assert out[1].blocked_domain and not out[1].keep
    assert not out[2].blocked_domain and out[2].keep
    assert out[3].blocked_domain
    assert out[4].blocked_domain  # suffix walk reaches h7.media.net
    assert out[5].host == "ads.example.com" and out[5].blocked_domain
    assert out[6].blocked_pattern and not out[6].blocked_domain
    assert not out[6].keep
    assert out[7].keep
    assert out[8].host == "" and out[8].keep  # non-URL: content passes own it
    # one-character evasions normalize back onto the blocklist
    assert out[9].host == "ads.example.com" and out[9].blocked_domain
    assert out[10].host == "ads.example.com" and out[10].blocked_domain
    assert out[11].host == "" and out[11].keep  # NULL url = non-URL row


def test_canonicalize_url_idempotent_property(spark):
    """canon(canon(x)) == canon(x): canonical output must be a fixed
    point, over generated URLs covering every rule (case, default and
    non-default ports, dup slashes, trailing slash, trackers, param
    order, fragments) plus non-URL junk."""
    from itertools import product

    from beats_spark.operators.urlnorm import canonicalize_url

    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["A.Example.COM", "x.y", "h7.example.com."]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "//a//b/", "/p/q.html"]
    queries = ["", "?b=2&a=1", "?utm_source=x&z=9", "#frag", "?a=1#f"]
    urls = [
        f"{s}://{h}{po}{pa}{q}"
        for s, h, po, pa, q in product(schemes, hosts, ports, paths, queries)
    ] + ["not a url", "", "relative/path"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, u string")
    rows = df.select(
        "u",
        canonicalize_url(F.col("u")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, (r.u, r.c1, r.c2)


def test_canonicalize_url_ignores_question_mark_in_fragment(spark):
    """A '?' inside the fragment is not a query: both spellings of the
    same resource must canonicalize identically (the unanchored regex
    previously resurrected fragment content as a query)."""
    from beats_spark.operators.urlnorm import canonicalize_url

    df = spark.createDataFrame(
        [(1, "http://h/p#?a=b"), (2, "http://h/p"), (3, "http://h/p?x=1#?a=b")],
        "id long, url string",
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got[1] == got[2] == "http://h/p"
    assert got[3] == "http://h/p?x=1"


def test_resolve_redirects_chains_cycles_conflicts(spark):
    import pytest

    from beats_spark.operators.urlnorm import resolve_redirects

    edges = [
        # chain a -> b -> c -> T
        ("a", "b"), ("b", "c"), ("c", "T"),
        # 2-cycle x <-> y, plus a feeder into it
        ("x", "y"), ("y", "x"), ("f", "x"),
        # conflicting canonicals: min target wins ("m" -> "A")
        ("m", "Z"), ("m", "A"),
        # self-loop is dropped as a non-edge -> s never appears
        ("s", "s"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.src: r for r in resolve_redirects(df).collect()}
    assert set(got) == {"a", "b", "c", "x", "y", "f", "m"}
    assert (got["a"].terminal, got["a"].hops, got["a"].looped) == ("T", 3, False)
    assert (got["b"].terminal, got["b"].hops) == ("T", 2)
    assert (got["c"].terminal, got["c"].hops) == ("T", 1)
    for k in ("x", "y", "f"):
        assert got[k].looped and got[k].terminal is None and got[k].hops is None
    assert (got["m"].terminal, got["m"].looped) == ("A", False)
    with pytest.raises(ValueError):
        resolve_redirects(df, max_rounds=1)
