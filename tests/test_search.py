"""BM25 full-text search (operators/search.py). Cross-engine value
parity for the contract query runs in test_oracle_parity.py; these
tests pin the semantics the oracle can't isolate — ranking order,
tie handling, query-term dedup, absent terms — plus the plan shape
(query vocabulary broadcast BEFORE the postings shuffle; never a
corpus-side cross join)."""

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.search import bm25_search


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 'cat' rare (2 docs), 'dog' everywhere
        (1, "cat dog dog dog"),
        (2, "cat cat dog"),
        (3, "dog dog dog dog"),
        (4, "dog bird"),
        (5, "bird bird bird dog"),
        (6, ""),  # empty doc still counts toward N / avgdl
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rare_term_outranks_common(corpus):
    out = bm25_search(corpus, [("q", "cat")], k=10)
    got = [(r.doc_id, r.rank) for r in out.orderBy("rank").collect()]
    # only the two cat docs match; doc 2 (tf=2, shorter) ranks first
    assert [d for d, _ in got] == [2, 1]
    assert [r for _, r in got] == [1, 2]


def test_tf_saturation_and_doc_id_ties(corpus):
    out = bm25_search(corpus, [("q", "dog")], k=10).collect()
    by_doc = {r.doc_id: r for r in out}
    # every dog doc matches; higher tf-per-length scores higher
    assert set(by_doc) == {1, 2, 3, 4, 5}
    assert by_doc[3].score_milli >= by_doc[4].score_milli
    # deterministic ranks: strictly increasing 1..5 with doc-id
    # tiebreak inside equal scores
    ranks = sorted((r.rank, r.doc_id) for r in out)
    assert [r for r, _ in ranks] == [1, 2, 3, 4, 5]
    scores = [by_doc[d].score_milli for _, d in ranks]
    assert scores == sorted(scores, reverse=True)


def test_k_caps_results_per_query(corpus):
    out = bm25_search(corpus, [("q", "dog"), ("p", "bird")], k=2)
    counts = {
        r.query_id: r.n
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"q": 2, "p": 2}


def test_absent_and_duplicate_terms(corpus):
    out = bm25_search(
        corpus, [("miss", "unicorn"), ("dup", "cat cat cat")], k=10
    )
    rows = out.collect()
    assert not [r for r in rows if r.query_id == "miss"]
    # duplicate query terms count once: same scores as single 'cat'
    single = {
        (r.doc_id, r.score_milli)
        for r in bm25_search(corpus, [("q", "cat")], k=10).collect()
    }
    dup = {(r.doc_id, r.score_milli) for r in rows if r.query_id == "dup"}
    assert dup == single


def test_multi_term_scores_add(corpus):
    both = {
        r.doc_id: r.score_milli
        for r in bm25_search(corpus, [("q", "cat bird")], k=10).collect()
    }
    cat = {
        r.doc_id: r.score_milli
        for r in bm25_search(corpus, [("q", "cat")], k=10).collect()
    }
    bird = {
        r.doc_id: r.score_milli
        for r in bm25_search(corpus, [("q", "bird")], k=10).collect()
    }
    for d, s in both.items():
        assert s == cat.get(d, 0) + bird.get(d, 0)


def test_plan_broadcasts_query_vocab_no_corpus_cross_join(corpus):
    out = bm25_search(corpus, [("q", "cat dog")], k=3)
    plan = plan_of(out)
    # the token stream meets the query vocabulary via broadcast
    assert "BroadcastHashJoin" in plan
    # the only nested-loop is the broadcast 1-row totals frame
    assert "CartesianProduct" not in plan


def test_rejects_bad_args(corpus):
    with pytest.raises(ValueError, match="at least one"):
        bm25_search(corpus, [], k=3)
    with pytest.raises(ValueError, match="k must be"):
        bm25_search(corpus, [("q", "cat")], k=0)


# -------------------------------------------------------- keyword_extract


def test_keywords_rare_term_beats_common_at_equal_tf(spark):
    from beats_spark.operators.search import keyword_extract

    # 8 docs; 'rare' in 1, 'common' in all — equal tf inside doc 1
    rows = [(1, "rare common")] + [(i, "common filler%d" % i) for i in range(2, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = keyword_extract(df, k=2).collect()
    d1 = sorted(
        [(r.rank, r.tok) for r in out if r.doc_id == 1]
    )
    assert d1[0] == (1, "rare")
    assert d1[1][1] == "common"


def test_keywords_k_cap_tie_break_and_empty_docs(spark):
    from beats_spark.operators.search import keyword_extract
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, "b a c d"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = keyword_extract(df, k=2).collect()
    assert {r.doc_id for r in out} == {1}
    got = [(r.rank, r.tok) for r in sorted(out, key=lambda r: r.rank)]
    # all tf=1, same idf -> alphabetical tie-break, capped at k
    assert got == [(1, "a"), (2, "b")]
    with _pt.raises(ValueError, match="k must be"):
        keyword_extract(df, k=0)


# ---------------------------------------------------------- phrase_search


def test_phrase_overlap_counting_and_order(spark):
    from beats_spark.operators.search import phrase_search

    df = spark.createDataFrame(
        [
            (1, "a a a b"),      # 'a a' overlaps twice
            (2, "a b a b"),      # 'a b' twice, non-adjacent a a absent
            (3, "b a"),          # reversed order must NOT match 'a b'
        ],
        "doc_id long, text string",
    )
    out = phrase_search(df, [("aa", "a a"), ("ab", "a b")], k=10).collect()
    got = {(r.query_id, r.doc_id): r.n_matches for r in out}
    assert got == {("aa", 1): 2, ("ab", 1): 1, ("ab", 2): 2}


def test_phrase_single_term_and_missing(spark):
    from beats_spark.operators.search import phrase_search

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y")], "doc_id long, text string"
    )
    out = phrase_search(df, [("x1", "x"), ("miss", "x z")], k=10).collect()
    got = {(r.query_id, r.doc_id): (r.n_matches, r.rank) for r in out}
    assert got == {("x1", 1): (2, 1)}


def test_phrase_rejects_bad_args(spark):
    from beats_spark.operators.search import phrase_search
    import pytest as _pt

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError, match="at least one"):
        phrase_search(df, [])
    with _pt.raises(ValueError, match="no tokens"):
        phrase_search(df, [("q", "   ")])
    with _pt.raises(ValueError, match="k must be"):
        phrase_search(df, [("q", "x")], k=0)


def test_phrase_plan_no_cartesian(spark):
    from beats_spark.operators.search import phrase_search

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    out = phrase_search(df, [("q", "x y")], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_phrase_nonbreaking_space_stays_one_token(spark):
    # U+00A0 is NOT Java \s: the engine tokenizes 'hash\xa0join' as
    # ONE token, and the driver-side phrase parser must agree —
    # Python str.split() would fracture it and the phrase could
    # never match a document that literally contains it.
    from beats_spark.operators.search import phrase_search, phrase_tokens

    assert phrase_tokens("hash\xa0join x") == ["hash\xa0join", "x"]
    df = spark.createDataFrame(
        [(1, "hash\xa0join x"), (2, "hash join x")],
        "doc_id long, text string",
    )
    out = phrase_search(df, [("q", "hash\xa0join x")], k=5).collect()
    assert {(r.doc_id, r.n_matches) for r in out} == {(1, 1)}


def test_rrf_rerank_fusion_semantics(spark):
    from beats_spark.operators.search import rrf_rerank

    # candidates: q1 ranks docs 1,2,3 lexically; embeddings make the
    # cosine order 3,2,1 (probe == doc 3's vector) — RRF must fuse
    # symmetric opposites into a tie broken by doc id
    cand = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)],
        "query_id string, doc_id long, rank long",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.8, 0.6]),
            (3, [0.0, 1.0]),
            (9, [0.0, 1.0]),  # probe vector == doc 3 direction
        ],
        "vec_id long, embedding array<float>",
    )
    out = rrf_rerank(cand, emb, {"q1": 9}, k=3).collect()
    got = {r.doc_id: (r.rrf_micro, r.rank) for r in out}
    # r1/r2 pairs: doc1 (1,3), doc2 (2,2), doc3 (3,1)
    s13 = 1000000 // 61 + 1000000 // 63
    s22 = 2 * (1000000 // 62)
    assert got[1][0] == s13 and got[3][0] == s13 and got[2][0] == s22
    # fused scores: docs 1 and 3 tie above doc 2; id breaks the tie
    assert got[1][1] == 1 and got[3][1] == 2 and got[2][1] == 3

    import pytest

    with pytest.raises(ValueError):
        rrf_rerank(cand, emb, {})
    with pytest.raises(ValueError):
        rrf_rerank(cand, emb, {"q1": 777})
