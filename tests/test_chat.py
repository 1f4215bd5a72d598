"""Conversation curation operators (operators/chat.py): validity
gate, chat-template rendering with loss-mask spans, context-window
truncation, speaker anonymization."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.chat import (
    anonymize_speakers,
    render_chat,
    truncate_context,
    validate_conversations,
)

_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _turns(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _reasons(spark, rows, **kw):
    out = validate_conversations(_turns(spark, rows), **kw)
    return {r.conv_id: (r.reasons, r.keep, r.n_turns) for r in out.collect()}


def test_validate_clean_conversation(spark):
    got = _reasons(
        spark,
        [
            ("c1", 0, "system", "be nice"),
            ("c1", 1, "user", "hi"),
            ("c1", 2, "assistant", "hello"),
        ],
    )
    assert got["c1"] == ("", True, 3)


def test_validate_each_rule_tags(spark):
    rows = [
        # empty turn (whitespace-only)
        ("c_empty", 0, "user", "hi"),
        ("c_empty", 1, "assistant", "   "),
        # bad role
        ("c_role", 0, "user", "hi"),
        ("c_role", 1, "bot", "beep"),
        ("c_role", 2, "assistant", "ok"),
        # no assistant turn AND ends on user
        ("c_dangle", 0, "user", "hi"),
        ("c_dangle", 1, "user", "anyone?"),
        # opens with assistant (not in opening_roles)
        ("c_open", 0, "assistant", "unprompted"),
        ("c_open", 1, "user", "?"),
        ("c_open", 2, "assistant", "answer"),
    ]
    got = _reasons(spark, rows)
    assert got["c_empty"] == ("empty_turn", False, 2)
    assert got["c_role"] == ("bad_role", False, 3)
    assert got["c_dangle"] == ("dangling_turn,missing_required", False, 2)
    assert got["c_open"] == ("bad_opening", False, 3)


def test_validate_null_text_and_role(spark):
    got = _reasons(spark, [("c", 0, None, None), ("c", 1, "assistant", "ok")])
    assert got["c"][0] == "bad_opening,bad_role,empty_turn"
    assert got["c"][1] is False


def test_validate_alternation_and_max_turns(spark):
    rows = [
        ("c", 0, "user", "a"),
        ("c", 1, "assistant", "b"),
        ("c", 2, "assistant", "c"),  # repeated role
        ("c", 3, "user", "d"),
        ("c", 4, "assistant", "e"),
    ]
    # default: repeats allowed
    assert _reasons(spark, rows)["c"][0] == ""
    assert (
        _reasons(spark, rows, strict_alternation=True)["c"][0] == "repeated_role"
    )
    assert _reasons(spark, rows, max_turns=4)["c"][0] == "too_many_turns"


def test_validate_order_cols_decide_first_last(spark):
    # rows arrive shuffled; (turn_idx) order decides opening/closing
    rows = [
        ("c", 2, "assistant", "end"),
        ("c", 0, "user", "start"),
        ("c", 1, "assistant", "mid"),
    ]
    assert _reasons(spark, rows)["c"] == ("", True, 3)
    # reversed order column flips the verdict: opens assistant, ends user
    out = validate_conversations(
        _turns(spark, rows).withColumn("neg", -F.col("turn_idx")),
        order_cols=("neg",),
    )
    assert out.collect()[0].reasons == "bad_opening,dangling_turn"


def test_render_chat_exact(spark):
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello!"),
        ("c1", 2, "user", "bye"),
        ("c2", 0, "assistant", None),  # NULL text still occupies a block
    ]
    out = {
        r.conv_id: r
        for r in render_chat(_turns(spark, rows)).collect()
    }
    c1 = out["c1"]
    assert c1.rendered == "<|user|>hi<|end|>\n<|assistant|>hello!<|end|>\n<|user|>bye<|end|>"
    # the assistant payload 'hello!' starts after '<|user|>hi<|end|>\n<|assistant|>'
    start = len("<|user|>hi<|end|>\n<|assistant|>")
    assert c1.loss_spans == f"{start}:{start + len('hello!')}"
    assert c1.rendered[start : start + len("hello!")] == "hello!"
    assert (c1.n_turns, c1.n_loss_turns) == (3, 1)
    c2 = out["c2"]
    assert c2.rendered == "<|assistant|><|end|>"
    assert c2.loss_spans == "13:13"  # empty payload, offsets still aligned
    assert (c2.n_turns, c2.n_loss_turns) == (1, 1)


def test_render_chat_spans_self_consistent(transcripts):
    """Property over the synth corpus: slicing `rendered` at every
    loss span must reproduce exactly the assistant turns' texts, in
    turn order."""
    rendered = render_chat(transcripts)
    spans = rendered.where(F.col("loss_spans") != "").select(
        "conv_id",
        F.col("rendered"),
        F.posexplode(F.split("loss_spans", ",")).alias("k", "span"),
    )
    sliced = spans.select(
        "conv_id",
        "k",
        F.expr(
            "substring(rendered, cast(split(span, ':')[0] as int) + 1, "
            "cast(split(span, ':')[1] as int) - cast(split(span, ':')[0] as int))"
        ).alias("got"),
    )
    w_texts = transcripts.where(F.col("role") == "assistant").select(
        "conv_id",
        "text",
        F.struct("turn_idx").alias("_o"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.col("_o").asc())
    expected = w_texts.select(
        "conv_id",
        (F.row_number().over(w) - 1).alias("k"),
        F.col("text").alias("want"),
    )
    joined = sliced.join(expected, ["conv_id", "k"], "full")
    bad = joined.where(
        F.col("got").isNull()
        | F.col("want").isNull()
        | (F.col("got") != F.col("want"))
    ).count()
    assert bad == 0


def test_truncate_context_suffix(spark):
    rows = [
        ("c", 0, "user", "a b c d"),   # 4 toks
        ("c", 1, "assistant", "a b c"),  # 3
        ("c", 2, "user", "a b"),       # 2
        ("c", 3, "assistant", "a"),    # 1
    ]
    out = truncate_context(_turns(spark, rows), budget=3)
    got = {r.turn_idx: (r.suffix_toks, r.kept) for r in out.collect()}
    assert got == {0: (10, False), 1: (6, False), 2: (3, True), 3: (1, True)}


def test_truncate_context_pin_first(spark):
    rows = [
        ("c", 0, "system", "a b c d"),  # 4 toks, pinned
        ("c", 1, "user", "a b c"),      # 3
        ("c", 2, "assistant", "a"),     # 1
    ]
    out = truncate_context(_turns(spark, rows), budget=5, pin_first=True)
    got = {r.turn_idx: r.kept for r in out.collect()}
    # remaining budget 5-4=1: only the last turn fits, first is pinned
    assert got == {0: True, 1: False, 2: True}
    # whole conversation fits: everything kept
    out2 = truncate_context(_turns(spark, rows), budget=100, pin_first=True)
    assert all(r.kept for r in out2.collect())


def test_truncate_context_flags_not_filters(spark):
    rows = [("c", 0, "user", "one two three")]
    out = truncate_context(_turns(spark, rows), budget=1)
    r = out.collect()[0]
    assert r.kept is False and r.tok_count == 3  # row survives, flagged


def test_anonymize_speakers_first_appearance(spark):
    rows = [
        ("c1", 0, "alice", "hi"),
        ("c1", 1, "bob", "hey"),
        ("c1", 2, "alice", "bye"),
        ("c2", 0, "bob", "solo"),  # numbering restarts per conversation
        ("c2", 1, None, "ghost"),  # NULL speaker -> NULL alias
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, speaker string, text string"
    )
    out = anonymize_speakers(df)
    got = {(r.conv_id, r.turn_idx): r.speaker_alias for r in out.collect()}
    assert got[("c1", 0)] == "speaker_1"
    assert got[("c1", 1)] == "speaker_2"
    assert got[("c1", 2)] == "speaker_1"
    assert got[("c2", 0)] == "speaker_1"
    assert got[("c2", 1)] is None
    assert out.count() == len(rows)  # no row lost or duplicated


def test_single_exchange_plans(spark, transcripts):
    """validate/render/truncate are ONE hash shuffle on the key."""
    from tests.test_plan_shapes import plan_of

    assert plan_of(validate_conversations(transcripts)).count("Exchange") == 1
    assert plan_of(render_chat(transcripts)).count("Exchange") == 1
    assert plan_of(truncate_context(transcripts, budget=64)).count("Exchange") == 1


def test_render_chat_unicode_span_property(spark):
    """Loss spans are CHARACTER offsets: random multibyte/emoji/CJK
    texts must slice back out of the rendered string exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text_st = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), min_codepoint=32
        ),
        min_size=0,
        max_size=30,
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(text_st, min_size=1, max_size=5))
    def check(texts):
        rows = [
            ("c", i, "assistant" if i % 2 else "user", t)
            for i, t in enumerate(texts)
        ]
        r = render_chat(_turns(spark, rows)).collect()[0]
        spans = [s for s in r.loss_spans.split(",") if s]
        want = [t for i, t in enumerate(texts) if i % 2]
        assert len(spans) == len(want)
        for span, t in zip(spans, want):
            a, b = map(int, span.split(":"))
            assert r.rendered[a:b] == t

    check()


def test_flag_boilerplate_turns(spark):
    from beats_spark.operators.chat import flag_boilerplate_turns

    rows = [
        ("c1", 0, "assistant", "How can I help?"),
        ("c2", 0, "assistant", "  how   can i HELP? "),  # same normalized
        ("c3", 0, "assistant", "How can I help?"),
        ("c1", 1, "user", "explain monads"),
        ("c1", 2, "assistant", None),  # NULL text: never boilerplate
        ("c1", 3, "user", "How can I help?"),  # same conv as c1 turn 0
    ]
    out = flag_boilerplate_turns(_turns(spark, rows), min_convs=3)
    got = {(r.conv_id, r.turn_idx): (r.turn_convs, r.is_boilerplate) for r in out.collect()}
    assert got[("c1", 0)] == (3, True)   # c1,c2,c3 share it (c1 twice = once)
    assert got[("c2", 0)] == (3, True)
    assert got[("c1", 3)] == (3, True)
    assert got[("c1", 1)] == (1, False)
    assert got[("c1", 2)] == (0, False)
    assert out.count() == len(rows)


def test_best_of_n_rank_and_ties(spark):
    """Top-n by score desc, deterministic tie-break ascending; n
    larger than the pool keeps everything ranked."""
    import pytest

    from beats_spark.operators.chat import best_of_n

    df = spark.createDataFrame(
        [
            ("p1", 1, 50), ("p1", 2, 90), ("p1", 3, 90), ("p1", 4, 10),
            ("p2", 5, 7),
        ],
        "prompt string, cand long, score long",
    )
    top2 = {
        (r.prompt, r.cand): r.bon_rank
        for r in best_of_n(df, "prompt", "score", "cand", n=2).collect()
    }
    # tie at 90 broken by cand asc: 2 before 3; the 50 never appears
    assert top2 == {("p1", 2): 1, ("p1", 3): 2, ("p2", 5): 1}

    all_ranked = best_of_n(df, "prompt", "score", "cand", n=99).collect()
    assert len(all_ranked) == 5
    with pytest.raises(ValueError):
        best_of_n(df, "prompt", "score", "cand", n=0)


def test_truncate_context_pin_first_with_null_text_turns(spark):
    """NULL-text turns price 0 tokens; with pin_first a NULL first
    turn must NOT collapse the budget to 0 (the F.greatest-skips-NULLs
    clamp trap) and trailing NULL turns get kept=True, never NULL."""
    from beats_spark.operators.chat import truncate_context

    df = spark.createDataFrame(
        [
            ("c1", 0, None),            # pinned system turn, NULL text
            ("c1", 1, "a b c d"),       # 4 tokens
            ("c1", 2, "e f"),           # 2 tokens
            ("c1", 3, None),            # trailing NULL turn
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["turn_idx"]: r for r in truncate_context(
        df, budget=3, pin_first=True
    ).collect()}
    # budget 3, pinned first costs 0 -> suffix of whole turns fitting 3
    # tokens = turns 2 (2 toks) and 3 (0 toks); turn 1 (4 toks) drops
    assert out[0]["kept"] is True
    assert out[1]["kept"] is False
    assert out[2]["kept"] is True
    assert out[3]["kept"] is True
    assert all(r["kept"] is not None for r in out.values())


def test_render_chat_duplicate_order_keys_spans_stay_aligned(spark):
    """Two rows sharing (conv_id, turn_idx): the offset window and the
    rendered assembly must use the SAME tie-break, so loss spans still
    point at exactly the assistant text."""
    from beats_spark.operators.chat import render_chat

    df = spark.createDataFrame(
        [("c1", 0, "assistant", "zeta"), ("c1", 0, "user", "alpha")],
        "conv_id string, turn_idx int, role string, text string",
    )
    row = render_chat(df).collect()[0]
    rendered, spans = row["rendered"], row["loss_spans"]
    for span in spans.split(","):
        s, e = map(int, span.split(":"))
        assert rendered[s:e] == "zeta", (rendered, spans)


def test_preference_length_stats_buckets_and_counts(spark):
    """Hand-built pairs: margin 1 → bucket 0, margins 4..7 → bucket 2,
    margin 1024 → bucket 10; chosen-longer / rejected-longer / equal
    counts and the signed length-diff sum must be exact."""
    from beats_spark.operators.chat import preference_length_stats

    rows = [
        ("aaaa", "bb", 1),       # bucket 0, chosen longer (+2)
        ("a", "bbb", 1),         # bucket 0, rejected longer (-2)
        ("aa", "bb", 4),         # bucket 2, equal
        ("aaaaa", "b", 7),       # bucket 2, chosen longer (+4)
        ("aaa", "bbbbbb", 1024), # bucket 10, rejected longer (-3)
    ]
    df = spark.createDataFrame(
        rows, "chosen string, rejected string, margin_micro long"
    )
    got = {
        r["margin_bucket"]: r
        for r in preference_length_stats(df).collect()
    }
    assert set(got) == {0, 2, 10}
    b0, b2, b10 = got[0], got[2], got[10]
    assert (b0["n_pairs"], b0["chosen_longer"], b0["rejected_longer"], b0["len_equal"]) == (2, 1, 1, 0)
    assert b0["sum_len_diff"] == 0
    assert (b2["n_pairs"], b2["chosen_longer"], b2["len_equal"]) == (2, 1, 1)
    assert b2["sum_len_diff"] == 4
    assert (b10["n_pairs"], b10["rejected_longer"], b10["sum_len_diff"]) == (1, 1, -3)


def test_preference_length_stats_degenerate_margins(spark):
    """Margin 0 (sub-micro score gap) and negative margins land in
    bucket -1 — never in bucket 0 (which would alias margin-1 pairs)
    and never, via two's-complement bin(), in the top bucket."""
    from beats_spark.operators.chat import preference_length_stats

    df = spark.createDataFrame(
        [("aa", "b", 0), ("a", "bb", -5), ("ccc", "d", 1)],
        "chosen string, rejected string, margin_micro long",
    )
    got = {r["margin_bucket"]: r for r in preference_length_stats(df).collect()}
    assert set(got) == {-1, 0}
    assert got[-1]["n_pairs"] == 2 and got[0]["n_pairs"] == 1


def test_context_overflow_stats(spark):
    import pytest

    from beats_spark.operators.chat import context_overflow_stats

    # conv 1: 10 tokens; conv 2: 50 tokens; conv 3: 100 tokens
    rows = [(1, 10), (2, 20), (2, 30), (3, 100)]
    df = spark.createDataFrame(rows, "conv_id long, n_toks long")
    got = {r.budget: r for r in
           context_overflow_stats(df, budgets=(16, 64)).collect()}
    b16 = got[16]
    assert (b16.n_convs, b16.n_over, b16.tokens_total) == (3, 2, 160)
    # losses: conv2 50-16=34, conv3 100-16=84
    assert b16.tokens_lost == 118 and b16.loss_ppm == 118 * 1_000_000 // 160
    b64 = got[64]
    assert (b64.n_over, b64.tokens_lost) == (1, 36)
    assert b64.over_ppm == 1_000_000 // 3
    with pytest.raises(ValueError):
        context_overflow_stats(df, budgets=(0,))
