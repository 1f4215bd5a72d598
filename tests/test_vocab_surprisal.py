"""Vocabulary build + integer-exact unigram surprisal
(operators/textstats.py)."""

from __future__ import annotations

from beats_spark.operators.textstats import unigram_surprisal, vocab_top_k


def test_vocab_counts_and_rank(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a cat"),
        ],
        "doc_id long, text string",
    )
    rows = vocab_top_k(df, k=3).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert rows[0].tok == "the" and rows[0].n_occurrences == 3 and rows[0].n_docs == 2
    # sat(2) beats cat(2) on the token tie-break? No: alphabetical -> cat
    assert rows[1].tok == "cat" and rows[1].n_occurrences == 2 and rows[1].n_docs == 2
    assert rows[2].tok == "sat" and rows[2].n_occurrences == 2 and rows[2].n_docs == 2


def test_vocab_normalization(spark):
    df = spark.createDataFrame(
        [(1, "The   THE the"), (2, "")], "doc_id long, text string"
    )
    rows = vocab_top_k(df, k=10).collect()
    assert len(rows) == 1
    assert rows[0].tok == "the" and rows[0].n_occurrences == 3 and rows[0].n_docs == 1


def test_vocab_plan_is_distributed_topk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = vocab_top_k(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_surprisal_math(spark):
    # corpus: "aa aa aa bb"  -> T=4, fl2(T)=2
    # counts: aa=3 (fl2=1), bb=1 (fl2=0)
    df = spark.createDataFrame(
        [(1, "aa aa aa"), (2, "bb")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    # doc1: 3 tokens, sum = 3*2 - 3*1 = 3; milli = 1000
    assert rows[1].n_tokens == 3 and rows[1].surprisal_sum == 3
    assert rows[1].surprisal_milli == 1000
    # doc2: 1 token, sum = 1*2 - 0 = 2; milli = 2000 (rarer token -> higher)
    assert rows[2].n_tokens == 1 and rows[2].surprisal_sum == 2
    assert rows[2].surprisal_milli == 2000


def test_surprisal_orders_gibberish_above_boilerplate(spark):
    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, common) for i in range(20)] + [(99, "zxqv wkjh qpmf")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.surprisal_milli for r in unigram_surprisal(df).collect()}
    assert out[99] > out[0]


def test_bigram_surprisal_transition_signal(spark):
    """A doc whose transitions all repeat corpus-wide scores lower
    than a doc of unique transitions over the same vocabulary."""
    from beats_spark.operators.textstats import bigram_surprisal
    import pyspark.sql.functions as F

    rows = (
        # ten docs sharing one formulaic sentence → transitions common
        [(i, "the cat sat on the mat") for i in range(10)]
        # one doc with the same words, shuffled → transitions unique
        + [(100, "mat the on sat cat the"), (101, "x")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert out[0].n_bigrams == 5 and out[100].n_bigrams == 5
    assert out[100].surprisal_milli > out[0].surprisal_milli
    # single-token doc: zero bigrams, zero surprisal, still present
    assert out[101].n_bigrams == 0 and out[101].surprisal_sum == 0
    # determinism across partitioning
    again = {r.doc_id: tuple(r) for r in bigram_surprisal(df.repartition(5)).collect()}
    assert again == {k: tuple(v) for k, v in out.items()}


def test_vocab_coverage_curve(spark):
    from beats_spark.operators.textstats import vocab_coverage

    # vocabulary: a x4, b x3, c x2, d x1  (10 occurrences, 4 types)
    rows = [(1, "a a a a b b"), (2, "b c c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.k: r for r in
           vocab_coverage(df, cutoffs=(1, 2, 99), n_buckets=2).collect()}
    assert (got[1].eff_k, got[1].covered, got[1].total) == (1, 4, 10)
    assert got[1].coverage_ppm == 400_000
    assert (got[2].eff_k, got[2].covered) == (2, 7)
    # cutoff beyond the vocabulary clamps to every type
    assert (got[99].eff_k, got[99].covered, got[99].coverage_ppm) == (
        4, 10, 1_000_000,
    )

    import pytest

    with pytest.raises(ValueError):
        vocab_coverage(df, cutoffs=())


def test_signal_mi_independence_and_identity(spark):
    import pytest

    from beats_spark.operators.textstats import signal_mi

    # x uniform over {0,1}, y == x (perfect dependence), z independent
    rows = [(i % 2, i % 2, (i // 2) % 2) for i in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {(r.sig_a, r.sig_b): r.mi_milli for r in
           signal_mi(df, ["x", "y", "z"]).collect()}
    # identical signals: fl2-MI = fl2(64)+fl2(32)-fl2(32)-fl2(32)
    # per cell = 6+5-5-5 = 1 bit exactly (all counts powers of two,
    # floors exact)
    assert got[("x", "y")] == 1000
    # independent pairs: fl2(64)+fl2(16)-fl2(32)-fl2(32) = 0 exactly
    assert got[("x", "z")] == 0
    assert got[("y", "z")] == 0
    with pytest.raises(ValueError):
        signal_mi(df, ["x"])


def test_collocations_pmi(spark):
    import pytest

    from beats_spark.operators.textstats import collocations

    # "foo bar" always together (5 times, each in its own doc, with
    # filler so the words never pair with anything else); "the the"
    # frequent but independent filler
    docs = [(i, "foo bar " + "the " * 10) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = collocations(df, k=5, min_count=5).collect()
    got = {r.bigram: r for r in out}
    assert out[0].bigram == "foo bar"  # top PMI
    # exact fl2 algebra: nab=5, N=55, na("foo")=5, nb("bar")=5
    assert got["foo bar"].pmi_fl2 == 2 + 5 - 2 - 2
    assert got["foo bar"].n_ab == 5
    # filler bigram exists but scores below the collocation
    assert "the the" in got and got["the the"].pmi_fl2 < got["foo bar"].pmi_fl2
    with pytest.raises(ValueError):
        collocations(df, k=0)


def test_source_concentration_gini(spark):
    from beats_spark.operators.textstats import source_concentration

    # perfectly balanced: Gini 0
    even = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 10)], "source string, n_chars long"
    )
    r = source_concentration(even, weight_col="n_chars").collect()[0]
    assert (r.n_groups, r.total, r.gini_micro) == (3, 30, 0)
    assert r.top_share_ppm == 1_000_000 // 3
    # maximally concentrated pair: Gini -> 1/2 for n=2 (one holds all)
    skew = spark.createDataFrame(
        [("a", 100), ("b", 0)], "source string, n_chars long"
    )
    r2 = source_concentration(skew, weight_col="n_chars").collect()[0]
    # sum|xi-xj| over ordered pairs = 200; 200/(2*2*100) = 1/2
    assert r2.gini_micro == 500_000 and r2.top_share_ppm == 1_000_000
    # doc-count weighting (weight_col=None)
    cnt = source_concentration(even).collect()[0]
    assert cnt.total == 3 and cnt.gini_micro == 0
