"""multiline_join_distributed ≡ multiline_join — frame equality across
every mode, with chunk_lines small enough that events straddle chunk
boundaries constantly. The distributed form's claim is exactly 'same
answers, parallel reducers', so the windowed form (itself pinned to
the reference corpus in tests/test_multiline.py) is the oracle."""

import random

import pytest
from pyspark.sql import functions as F

from beats_spark.sources.lines import multiline_join, multiline_join_distributed


def _corpus(spark, seed=7, n_files=5, n_lines=400):
    """Deterministic mixed corpus: stack-trace heads, indented
    continuations, backslash continuations, START/END framing, noise."""
    rng = random.Random(seed)
    rows = []
    for f in range(n_files):
        for i in range(n_lines):
            r = rng.random()
            if r < 0.3:
                line = f"head {f}.{i}"
            elif r < 0.55:
                line = f"  at frame {i}"
            elif r < 0.65:
                line = f"cont {i} \\"
            elif r < 0.75:
                line = f"START {i}"
            elif r < 0.85:
                line = f"END {i}"
            else:
                line = f"noise {i}"
            rows.append((f"file{f}", i, line))
    return spark.createDataFrame(rows, "file string, line_no long, line string")


CONFIGS = [
    dict(mode="pattern", pattern=r"^\s", match="after"),
    dict(mode="pattern", pattern=r"^head", negate=True, match="after"),
    dict(mode="pattern", pattern=r"\\$", match="before"),
    dict(mode="pattern", pattern=r"^START", negate=True, match="after",
         flush_pattern=r"^END"),
    dict(mode="pattern", pattern=r"^\s", match="after", max_lines=2),
    dict(mode="pattern", pattern=r"^\s", match="after", skip_newline=True),
    dict(mode="pattern", pattern=r"^\s", match="after", separator="|"),
    dict(mode="count", count_lines=3),
    dict(mode="count", count_lines=7, max_lines=4),
    dict(mode="while_pattern", pattern=r"^  at"),
    dict(mode="while_pattern", pattern=r"^noise", negate=True),
]


def _collect(df):
    return sorted(
        (r.file, r.line_no, r.message, r.n_lines, r.truncated)
        for r in df.collect()
    )


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: "-".join(
    f"{k}={v}" for k, v in c.items()))
def test_distributed_equals_windowed(spark, cfg):
    lines = _corpus(spark)
    want = _collect(multiline_join(lines, **cfg))
    got = _collect(multiline_join_distributed(lines, chunk_lines=4, **cfg))
    assert got == want
    assert len(want) > 10


def test_single_file_many_chunks(spark):
    # one file only — the exact shape the windowed form serializes on
    rows = [("big", i, ("  cont" if i % 3 else f"head {i}")) for i in range(500)]
    lines = spark.createDataFrame(rows, "file string, line_no long, line string")
    cfg = dict(mode="pattern", pattern=r"^\s", match="after")
    want = _collect(multiline_join(lines, **cfg))
    got = _collect(multiline_join_distributed(lines, chunk_lines=8, **cfg))
    assert got == want


def test_event_spanning_many_whole_chunks(spark):
    # a single event longer than several chunks: head + 40 continuations
    # with chunk_lines=4 → the event covers 10+ chunks end to end.
    rows = [("f", 0, "head 0")] + [("f", i, "  c") for i in range(1, 41)] + [
        ("f", 41, "head 1")
    ]
    lines = spark.createDataFrame(rows, "file string, line_no long, line string")
    got = _collect(
        multiline_join_distributed(
            lines, chunk_lines=4, mode="pattern", pattern=r"^\s", match="after"
        )
    )
    assert [g[3] for g in got] == [41, 1]  # n_lines per event


def test_leading_orphan_continuations(spark):
    # continuations before any head form the group-0 message in both
    rows = [("f", 0, "  orphan a"), ("f", 1, "  orphan b"), ("f", 2, "head"),
            ("f", 3, "  c")]
    lines = spark.createDataFrame(rows, "file string, line_no long, line string")
    cfg = dict(mode="pattern", pattern=r"^\s", match="after")
    assert _collect(multiline_join_distributed(lines, chunk_lines=2, **cfg)) == \
        _collect(multiline_join(lines, **cfg))


def test_chunk_boundary_lag_exactness(spark):
    # before-mode: the continuation decision reads the PREVIOUS line;
    # place the continuation marker exactly at a chunk tail.
    rows = [("f", 0, "a \\"), ("f", 1, "b"), ("f", 2, "c \\"), ("f", 3, "d \\"),
            ("f", 4, "e"), ("f", 5, "f")]
    lines = spark.createDataFrame(rows, "file string, line_no long, line string")
    cfg = dict(mode="pattern", pattern=r"\\$", match="before")
    for chunk in (2, 3):
        assert _collect(multiline_join_distributed(lines, chunk_lines=chunk, **cfg)) \
            == _collect(multiline_join(lines, **cfg))


def test_invalid_config(spark):
    lines = _corpus(spark, n_files=1, n_lines=4)
    with pytest.raises(ValueError):
        multiline_join_distributed(lines, mode="pattern", pattern=None)
    with pytest.raises(ValueError):
        multiline_join_distributed(lines, chunk_lines=1, mode="count", count_lines=2)
    with pytest.raises(ValueError):
        multiline_join_distributed(lines, mode="nope")


def test_plan_has_no_per_file_window(spark):
    # the whole point: no Window partitioned by file alone. All window
    # specs must include the chunk column; assembly is a hash agg.
    lines = _corpus(spark, n_files=1)
    out = multiline_join_distributed(
        lines, chunk_lines=64, mode="pattern", pattern=r"^\s", match="after"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln.lower() and "_chunk" not in ln:
            # the only file-keyed window allowed is the tiny per-chunk
            # offsets frame, which windows over _chunk ordering
            assert "_n_new" in ln or "_chunk" in ln, ln
