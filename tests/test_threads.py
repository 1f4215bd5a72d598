"""linearize_threads (chat.py): hand-built forest correctness, orphan
tagging, cycle fail-fast, and doubling-vs-naive equality on a random
deterministic forest."""

from __future__ import annotations

import pytest

from beats_spark.operators.chat import linearize_threads

SCHEMA = "conv_id long, turn_id long, parent_id long, tok string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = linearize_threads(df)
    return {
        (r.conv_id, r.turn_id): (r.depth, r.path, r.orphaned)
        for r in out.collect()
    }


def test_hand_built_forest(spark):
    # conv 1:  1 ── 2 ── 3          (3 is a leaf)
    #               └── 4 ── 5     (5 is a leaf; 4 branches from 2)
    # conv 2:  1 alone (root leaf)
    rows = [
        (1, 1, None, "sys"),
        (1, 2, 1, "user"),
        (1, 3, 2, "asst"),
        (1, 4, 2, "asst2"),
        (1, 5, 4, "user2"),
        (2, 1, None, "solo"),
    ]
    got = _run(spark, rows)
    assert got == {
        (1, 3): (3, "sys>user>asst", False),
        (1, 5): (4, "sys>user>asst2>user2", False),
        (2, 1): (1, "solo", False),
    }


def test_orphan_tagged_not_dropped(spark):
    # parent 99 never exists: the chain ends there, flagged
    rows = [(1, 2, 99, "a"), (1, 3, 2, "b")]
    got = _run(spark, rows)
    assert got == {(1, 3): (2, "a>b", True)}


def test_cycle_fails_fast(spark):
    rows = [(1, 1, 2, "a"), (1, 2, 1, "b")]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="cyclic"):
        linearize_threads(df).collect()


def test_matches_naive_walk_on_random_forest(spark):
    # deterministic pseudo-random forest: 4 convs x 40 turns, each
    # turn's parent jumps back 1..6 turns by an LCG mix
    rows = []
    for conv in range(4):
        for i in range(1, 41):
            if i == 1:
                parent = None
            else:
                jump = ((conv * 40 + i) * 1103515245 + 12345) % 6 + 1
                parent = max(i - jump, 1)
            rows.append((conv, i, parent, f"t{i}"))
    got = _run(spark, rows)

    by_conv = {}
    for conv, tid, parent, tok in rows:
        by_conv.setdefault(conv, {})[tid] = (parent, tok)
    expected = {}
    for conv, turns in by_conv.items():
        children = {p for p, _ in turns.values() if p is not None}
        for tid in turns:
            if tid in children:
                continue
            path, cur, depth = [], tid, 0
            while cur is not None:
                parent, tok = turns[cur]
                path.append(tok)
                depth += 1
                cur = parent
            expected[(conv, tid)] = (depth, ">".join(reversed(path)), False)
    assert got == expected


def test_max_rounds_guard(spark):
    rows = [(1, i, i - 1 if i > 1 else None, "x") for i in range(1, 20)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="doubling rounds"):
        linearize_threads(df, max_rounds=2).collect()
