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


# -- substring_dedup vs a pure-Python reference ----------------------------


def _py_substring_dedup(docs: dict[int, str], n: int):
    """Reference: dict of doc_id -> text (already whitespace-normal).
    Returns doc_id -> (n_tokens, kept_token_list)."""
    toks = {d: t.split(" ") for d, t in docs.items()}
    occ = {}
    for d in sorted(toks):
        tl = toks[d]
        for i in range(len(tl) - n + 1):
            occ.setdefault(" ".join(tl[i : i + n]), []).append((d, i))
    removed = {d: set() for d in toks}
    for positions in occ.values():
        if len(positions) < 2:
            continue
        keeper = min(positions)
        for d, i in positions:
            if (d, i) != keeper:
                removed[d].update(range(i, i + n))
    return {
        d: (
            len(tl),
            [t for j, t in enumerate(tl) if j not in removed[d]],
        )
        for d, tl in toks.items()
    }


@pytest.mark.parametrize("seed", [3, 41])
def test_substring_dedup_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]  # small vocab → natural repeats
    n = 5
    docs = {}
    for d in range(40):
        length = rng.randrange(1, 40)
        docs[d] = " ".join(rng.choice(vocab) for _ in range(length))
    # plant structure: verbatim copies and shared spans
    docs[100] = docs[0]
    docs[101] = docs[1] + " " + docs[1]
    want = _py_substring_dedup(docs, n)
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {
        r.doc_id: r for r in dedup.substring_dedup(df, n=n).collect()
    }
    assert set(got) == set(want)
    for d, (n_tok, kept) in want.items():
        assert got[d].n_tokens == n_tok, d
        assert got[d].n_kept == len(kept), (d, got[d], kept)
        assert got[d].text == " ".join(kept), d
