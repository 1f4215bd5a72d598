"""Property tests: connected components vs a union-find reference,
and the PII battery vs Python's re module (three regex engines must
agree on the Java∩RE2 subset: Spark/Java here, DuckDB/RE2 in the
oracle gate, Python/re in this test)."""

import random
import re

import pytest
from pyspark.sql import functions as F

from beats_spark.operators import dedup
from beats_spark.operators.redact import PII_CATEGORIES, add_pii_redaction


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # path-compress everything to its root, then map node -> min of
    # its component (root is not guaranteed minimal under rank-less
    # union, so group explicitly)
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.mark.parametrize("seed", [7, 99])
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n_nodes, n_edges = 120, 90  # sparse: many small components + chains
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find_components(edges)
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == want


def test_connected_components_long_chain(spark):
    # a 12-node path is the worst case per node count: labels travel
    # one hop per round, so this needs ~12 rounds (well under the
    # default max_iter) and exercises the checkpoint_every path.
    edges = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(13)}


_PII_SAMPLES = [
    "plain text only",
    "a@b.co",
    "x@y.org then 10.0.0.1",
    "ssn 999-12-3456, phone 800-555-0000, card 4000 1234 5678 9010",
    "dots.in.middle@sub.domain.io trailing",
    "v1.2.3.4 version-ish string",
    "edge 1.2.3.4.5 run-on quad",
    "123-45-6789123 too long tail",
    "a@b.c single-letter tld stays",
]


@pytest.mark.parametrize("seed", [3, 17])
def test_redact_battery_agrees_with_python_re(spark, seed):
    rng = random.Random(seed)
    rows = []
    for _ in range(60):
        parts = rng.sample(_PII_SAMPLES, k=rng.randrange(1, 4))
        rows.append((" ".join(parts),))
    df = spark.createDataFrame(rows, "text string")
    got = [
        r["text"] for r in add_pii_redaction(df, "text").collect()
    ]
    want = []
    for (text,) in rows:
        out = text
        for _name, pattern, mask in PII_CATEGORIES:
            out = re.sub(pattern, mask, out)
        want.append(out)
    assert got == want
