"""Crawl-loop operators (operators/crawl.py): incremental frontier
merge and sitemap ingestion; plus the tool-usage rollup
(sessions.tool_stats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.crawl import frontier_update, parse_sitemap


def test_frontier_update_merge(spark):
    frontier = spark.createDataFrame(
        [("http://a.com/1",), ("http://a.com/2",)], "url string"
    )
    new = spark.createDataFrame(
        [
            ("http://a.com/2", 5),   # already in frontier -> dropped
            ("http://a.com/3", 2),
            ("http://a.com/3", 1),   # duplicate link: ranks sum to 3
            ("http://b.com/1", 9),
            ("http://b.com/2", 1),   # seen -> dropped
            ("junk not a url", 1),   # host '' bypasses the cap window
        ],
        "canonical_link string, n_refs int",
    )
    seen = spark.createDataFrame([("http://b.com/2",)], "url string")
    out = frontier_update(
        frontier, new, seen, rank_col="n_refs", max_per_host=10
    )
    rows = {(r.url, r.host, r.is_new) for r in out.collect()}
    assert rows == {
        ("http://a.com/1", "a.com", False),
        ("http://a.com/2", "a.com", False),
        ("http://a.com/3", "a.com", True),
        ("http://b.com/1", "b.com", True),
        ("junk not a url", "", True),
    }


def test_frontier_update_per_host_cap(spark):
    frontier = spark.createDataFrame([("http://z.org/seed",)], "url string")
    new = spark.createDataFrame(
        [(f"http://trap.com/{i:03d}", 100 - i) for i in range(50)]
        + [("http://ok.org/x", 1)],
        "canonical_link string, n_refs int",
    )
    out = frontier_update(frontier, new, rank_col="n_refs", max_per_host=3)
    added = sorted(r.url for r in out.collect() if r.is_new and r.host == "trap.com")
    # highest rank = lowest index; cap keeps the top 3
    assert added == ["http://trap.com/000", "http://trap.com/001", "http://trap.com/002"]
    assert {r.url for r in out.collect() if r.host == "ok.org"} == {"http://ok.org/x"}


def test_frontier_update_without_rank_counts_refs(spark):
    frontier = spark.createDataFrame([("http://x.com/f",)], "url string")
    new = spark.createDataFrame(
        [("http://x.com/a",), ("http://x.com/a",), ("http://x.com/b",)],
        "canonical_link string",
    )
    out = frontier_update(frontier, new, max_per_host=1)
    # without rank_col the in-degree (count) ranks: /a (2 refs) wins
    assert {r.url for r in out.collect() if r.is_new} == {"http://x.com/a"}


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://e.com/a?x=1&amp;y=2 </loc>
    <lastmod>2026-01-05</lastmod>
  </url>
  <url><loc>http://e.com/b</loc></url>
  <url><lastmod>2026-03-01</lastmod></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>http://e.com/maps/one.xml</loc><lastmod>2026-02-02T10:00:00Z</lastmod></sitemap>
  <sitemap><loc>http://e.com/maps/two.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap(spark):
    df = spark.createDataFrame(
        [(1, SITEMAP), (2, SITEMAP_INDEX), (3, "<urlset></urlset>")],
        "doc_id long, sitemap_xml string",
    )
    rows = {
        (r.doc_id, r.kind, r.loc, r.lastmod)
        for r in parse_sitemap(df).collect()
    }
    assert rows == {
        (1, "url", "http://e.com/a?x=1&y=2", "2026-01-05"),  # entity + trim
        (1, "url", "http://e.com/b", ""),
        (2, "sitemap", "http://e.com/maps/one.xml", "2026-02-02T10:00:00Z"),
        (2, "sitemap", "http://e.com/maps/two.xml", ""),
    }  # loc-less entry and empty doc emit nothing


def test_parse_sitemap_zero_shuffle_plan(spark):
    from tests.test_plan_shapes import plan_of

    df = spark.createDataFrame([(1, SITEMAP)], "doc_id long, sitemap_xml string")
    assert "Exchange" not in plan_of(parse_sitemap(df))


def test_tool_stats(spark):
    from beats_spark.operators.sessions import tool_stats

    df = spark.createDataFrame(
        [
            ("c1", 0, "search"),
            ("c1", 2, "search"),
            ("c1", 4, "calc"),
            ("c2", 1, "search"),
            ("c2", 3, None),      # not a call
            ("c2", 5, "none"),    # sentinel: not a call
        ],
        "conv_id string, turn_idx int, tool string",
    )
    got = {
        r.tool: (r.n_calls, r.n_convs, r.mean_pos_milli)
        for r in tool_stats(df).collect()
    }
    assert got == {
        "search": (3, 2, 1000),  # positions 0,2,1 -> mean 1.000
        "calc": (1, 1, 4000),
    }


def test_host_pagerank_hand_computed(spark):
    from beats_spark.operators.crawl import host_pagerank

    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("A", "B")],
        "src_host string, dst_host string",
    )  # duplicate A->B counts once
    got = {
        r.host: r.score
        for r in host_pagerank(edges, iterations=2).collect()
    }
    # iter1: in A=1000000 B=500000 C=1500000
    #   -> A=1000000 B=575000 C=1425000
    # iter2: in A=1425000 B=500000 C=1075000
    assert got == {"A": 1361250, "B": 575000, "C": 1063750}


def test_host_pagerank_dangling_leaks(spark):
    from beats_spark.operators.crawl import host_pagerank

    edges = spark.createDataFrame(
        [("A", "B")], "src_host string, dst_host string"
    )
    got = {r.host: r.score for r in host_pagerank(edges, iterations=2).collect()}
    # B has no outlinks: its mass leaks, A settles at the base rank
    assert got == {"A": 150000, "B": 277500}


def test_host_pagerank_deterministic_any_partitioning(spark):
    from beats_spark.operators.crawl import host_pagerank

    edges = spark.createDataFrame(
        [(f"h{i % 7}", f"h{(3 * i + 1) % 7}") for i in range(40)],
        "src_host string, dst_host string",
    )
    a = {r.host: r.score for r in host_pagerank(edges).collect()}
    b = {
        r.host: r.score
        for r in host_pagerank(edges.repartition(13)).collect()
    }
    assert a == b and len(a) == 7


def _waterfill_twin(hosts, budget):
    """Pure-Python max-min fair allocation: hosts = [(host, demand, cap)]."""
    eff = {h: min(d, c) if c is not None else d for h, d, c in hosts}
    order = sorted(eff, key=lambda h: (eff[h], h))
    n = len(order)
    alloc, s, k = {}, 0, 0
    for i, h in enumerate(order, 1):
        if s + eff[h] * (n - i + 1) <= budget:
            alloc[h] = eff[h]
            s += eff[h]
            k = i
        else:
            break
    rest, m = budget - s, n - k
    for j, h in enumerate(order[k:], 1):
        alloc[h] = rest // m + (1 if j <= rest % m else 0)
    return alloc


def test_crawl_budget_matches_waterfill_twin(spark):
    from beats_spark.operators.crawl import crawl_budget

    hosts = [
        ("a.com", 100, 40), ("b.com", 3, None), ("c.com", 50, 50),
        ("d.com", 0, 10), ("e.com", 7, 5), ("f.com", 60, 200),
        ("g.com", 12, 12), ("h.com", 45, 30),
    ]
    df = spark.createDataFrame(hosts, "host string, demand long, cap long")
    for budget in (0, 10, 60, 120, 1000):
        out = {r.host: r for r in
               crawl_budget(df, budget, n_buckets=3).collect()}
        want = _waterfill_twin(hosts, budget)
        got = {h: out[h].allocated for h in want}
        assert got == want, (budget, got, want)
        total = sum(got.values())
        total_eff = sum(min(d, c) if c is not None else d for _, d, c in hosts)
        assert total == min(budget, total_eff), budget
        for h, d, c in hosts:
            assert got[h] <= (min(d, c) if c is not None else d)
    # budget=1000 >= total eff: everything saturated
    out = {r.host: r for r in crawl_budget(df, 1000).collect()}
    assert all(r.saturated for r in out.values())
    assert out["b.com"].allocated == 3  # NULL cap = uncapped


def test_crawl_budget_rejects_negative(spark):
    import pytest

    from beats_spark.operators.crawl import crawl_budget

    df = spark.createDataFrame([("a", 1, 1)], "host string, demand long, cap long")
    with pytest.raises(ValueError):
        crawl_budget(df, -1)


def test_recrawl_priority_scoring_and_host_cap(spark):
    from beats_spark.operators.crawl import recrawl_priority

    NOW = 2_000_000_000_000_000  # µs
    rows = [
        # host a: three urls — changed-often wins over old-but-static
        ("a", "u/fresh-changer", NOW - 100 * 1_000_000, 10, 10),
        ("a", "u/old-static", NOW - 10_000 * 1_000_000, 10, 0),
        ("a", "u/unfetched", NOW - 50 * 1_000_000, 0, 0),
        # host b: future last_fetch clamps age to 0; rate clamps at 1e6
        ("b", "u/future", NOW + 10 ** 9, 1, 1),
        ("b", "u/over-rate", NOW - 1_000_000, 1, 5),
    ]
    df = spark.createDataFrame(
        rows, "host string, url string, last_fetch_us long,"
              " n_fetches long, n_changes long"
    )
    out = {r.url: r for r in
           recrawl_priority(df, NOW, per_host_cap=2).collect()}
    f = out["u/fresh-changer"]
    assert f.age_s == 100 and f.change_rate_ppm == 1_000_000
    assert f.priority == 100 * (1_000_000 + 10_000)
    s = out["u/old-static"]
    assert s.age_s == 10_000 and s.change_rate_ppm == 0
    assert s.priority == 10_000 * 10_000
    assert out["u/unfetched"].change_rate_ppm == 0
    # cap: host a keeps top-2 due, third not due
    dues = sorted((r.host_rank, u) for u, r in out.items() if r.host == "a")
    assert [out[u].due for _, u in dues] == [True, True, False]
    assert out["u/future"].age_s == 0 and out["u/future"].priority == 0
    assert out["u/over-rate"].change_rate_ppm == 1_000_000  # clamped


def test_recrawl_priority_rejects_bad_params(spark):
    import pytest

    from beats_spark.operators.crawl import recrawl_priority

    df = spark.createDataFrame(
        [("a", "u", 0, 1, 0)],
        "host string, url string, last_fetch_us long, n_fetches long, n_changes long",
    )
    with pytest.raises(ValueError):
        recrawl_priority(df, 0, per_host_cap=0)
    with pytest.raises(ValueError):
        recrawl_priority(df, 0, base_ppm=-1)
