"""event_transitions (analytics.py) and prefix_cache_stats (chat.py):
hand-built sequence correctness, start-state semantics, integer
probability invariants, and depth-participation rules."""

from __future__ import annotations

import datetime as dt

import pytest

from beats_spark.operators.analytics import event_transitions
from beats_spark.operators.chat import prefix_cache_stats

T0 = dt.datetime(2024, 1, 1)


def _ev(rows):
    return [
        (uid, T0 + dt.timedelta(seconds=i), i, t)
        for i, (uid, t) in enumerate(rows)
    ]


EV_SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"


def test_transitions_hand_built(spark):
    # user 1: a b a b ; user 2: a a
    rows = _ev([(1, "a"), (1, "b"), (1, "a"), (1, "b"), (2, "a"), (2, "a")])
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r.prev_type, r.event_type): (r.n_transitions, r.p_milli)
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("_start_", "a"): (2, 1000),
        ("a", "b"): (2, 666),
        ("a", "a"): (1, 333),
        ("b", "a"): (1, 1000),
    }


def test_transition_probabilities_bounded(spark):
    import random

    rng = random.Random(7)
    rows = _ev([(rng.randrange(5), "t" + str(rng.randrange(4))) for _ in range(400)])
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = event_transitions(df).collect()
    by_prev = {}
    for r in out:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        total_p = sum(r.p_milli for r in rs)
        # floor division: the row probabilities sum to ≤ 1000 and
        # within len(rs) of it
        assert 1000 - len(rs) < total_p <= 1000, prev
        assert all(0 < r.p_milli <= 1000 for r in rs)
    # every key contributes exactly one _start_ transition
    assert sum(r.n_transitions for r in out if r.prev_type == "_start_") == 5


TURN_SCHEMA = "conv_id long, ts timestamp, turn_id long, tok string"


def test_prefix_share_hand_built(spark):
    # convs 1,2 share first 2 toks; conv 3 diverges at tok 2;
    # conv 4 has a single turn
    rows = []
    seqs = {1: ["s", "u", "a"], 2: ["s", "u", "b"], 3: ["s", "x"], 4: ["s"]}
    for conv, toks in seqs.items():
        for i, t in enumerate(toks):
            rows.append((conv, T0 + dt.timedelta(seconds=i), i, t))
    df = spark.createDataFrame(rows, TURN_SCHEMA)
    got = {
        r.k: (r.n_convs, r.n_prefixes, r.n_shared_convs, r.turns_saved)
        for r in prefix_cache_stats(df, depths=(1, 2, 3)).collect()
    }
    assert got == {
        # k=1: all 4 convs open with 's' — one group of 4
        1: (4, 1, 4, 3),
        # k=2: convs 1,2 share 's>u'; conv 3 is 's>x'; conv 4 too short
        2: (3, 2, 2, 2),
        # k=3: convs 1,2 diverge at tok 3
        3: (2, 2, 0, 0),
    }


def test_prefix_share_bad_depths():
    with pytest.raises(ValueError):
        prefix_cache_stats(None, depths=())
    with pytest.raises(ValueError):
        prefix_cache_stats(None, depths=(0, 2))


def test_depth_survival_hand_built(spark):
    from beats_spark.operators.sessions import depth_survival

    # convs of lengths 1, 1, 2, 3, 3, 3  (depth 2 present; no conv of
    # length > 3)
    rows = []
    for conv, n in [(1, 1), (2, 1), (3, 2), (4, 3), (5, 3), (6, 3)]:
        rows += [(conv, i) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id long, turn_id long")
    got = {r.depth: r for r in depth_survival(df).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].n_reaching, got[1].n_ending) == (6, 2)
    assert (got[2].n_reaching, got[2].n_ending) == (4, 1)
    assert (got[3].n_reaching, got[3].n_ending) == (3, 3)
    assert got[1].continue_ppm == 4 * 1_000_000 // 6
    assert got[3].continue_ppm == 0
