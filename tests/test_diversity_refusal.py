"""Unit semantics for the round-5 audit rollups: the assistant
refusal-rate audit (chat.refusal_stats), distinct-n corpus diversity
(textstats.ngram_diversity) and the contamination matrix
(textstats.contamination_matrix). The DuckDB twins run in
tests/test_contract_parity.py; these pin the operator semantics on
hand-built frames where the expected values are computable by eye.
"""

from __future__ import annotations

from beats_spark.operators.chat import refusal_stats
from beats_spark.operators.textstats import contamination_matrix, ngram_diversity

TURN_SCHEMA = "role string, text string, tool string"


def test_refusal_stats_counts_priority_and_ppm(spark):
    rows = [
        # tool A: 2 'cannot', 1 apology+can't compound (priority =>
        # apology, the first battery entry), 1 normal => 3/4 refusals
        ("assistant", "I cannot do that.", "A"),
        ("assistant", "No: I cannot comply.", "A"),
        ("assistant", "I'm sorry, but I can't help.", "A"),
        ("assistant", "Sure, here you go.", "A"),
        # tool B: no refusals, one NULL text (denominator only)
        ("assistant", "Done.", "B"),
        ("assistant", None, "B"),
        # user refusal text must be excluded entirely
        ("user", "I cannot believe this works", "A"),
    ]
    out = refusal_stats(spark.createDataFrame(rows, TURN_SCHEMA))
    got = {r.tool: r.asDict() for r in out.collect()}
    assert got["A"]["n_assistant"] == 4
    assert got["A"]["n_refusals"] == 3
    assert got["A"]["refusal_ppm"] == 750000
    assert (got["A"]["top_marker"], got["A"]["top_marker_n"]) == ("cannot", 2)
    assert got["B"]["n_assistant"] == 2
    assert got["B"]["n_refusals"] == 0
    assert got["B"]["refusal_ppm"] == 0
    assert got["B"]["top_marker"] is None
    assert got["B"]["top_marker_n"] == 0


def test_refusal_stats_tie_breaks_alphabetically(spark):
    rows = [
        ("assistant", "I won't do that.", "C"),
        ("assistant", "I cannot do that.", "C"),
    ]
    out = refusal_stats(spark.createDataFrame(rows, TURN_SCHEMA)).collect()
    assert len(out) == 1
    # counts tie 1-1 => smaller tag wins ('cannot' < 'wont')
    assert (out[0].top_marker, out[0].top_marker_n) == ("cannot", 1)
    assert out[0].n_refusals == 2


def test_ngram_diversity_counts_and_short_doc_rule(spark):
    rows = [(1, "a a a", "s1"), (2, "a  B", "s1"), (3, None, "s1"), (4, "  ", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source, r.n): (r.n_grams, r.n_distinct, r.distinct_ppm)
        for r in ngram_diversity(df, "text", "source").collect()
    }
    # normalization lowercases + collapses whitespace; NULL/blank
    # docs excluded. unigrams: a a a a b => 5 total / 2 distinct
    assert got[("s1", 1)] == (5, 2, 400000)
    # bigrams: 'a a' x2 + 'a b' => 3 / 2
    assert got[("s1", 2)] == (3, 2, 666666)
    # trigrams: 'a a a' + short-doc whole text 'a b' => 2 / 2
    assert got[("s1", 3)] == (2, 2, 1000000)


def test_contamination_matrix_flags_only_leaking_cells(spark):
    leak = "the quick brown fox jumps over the lazy dog again and again"
    clean = "entirely unrelated content with no shared thirty-two-char window"
    train = spark.createDataFrame(
        [(1, "src1", leak), (2, "src2", clean)],
        "doc_id long, source string, text string",
    )
    ev = spark.createDataFrame(
        [(10, "dev", leak)], "doc_id long, split string, text string"
    )
    out = contamination_matrix(train, ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.train_group, r.eval_group) == ("src1", "dev")
    assert (r.n_train_docs, r.n_eval_docs, r.n_pairs) == (1, 1, 1)
    assert r.shared_windows >= 1


def test_contamination_matrix_clean_corpus_is_empty(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    b = "one two three four five six seven eight nine ten eleven twelve"
    train = spark.createDataFrame(
        [(1, "src1", a)], "doc_id long, source string, text string"
    )
    ev = spark.createDataFrame(
        [(10, "dev", b)], "doc_id long, split string, text string"
    )
    assert contamination_matrix(train, ev).count() == 0
