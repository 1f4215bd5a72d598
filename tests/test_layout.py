"""Z-order layout (operators/layout.py). Cross-engine value parity
for zorder_stats runs in test_oracle_parity.py; here: interleave
correctness against a pure-Python Morton reference, bucket/NULL
semantics, the locality claim vs a time-sorted layout, and the plan
shape (broadcast min/max, no cartesian product)."""

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.layout import (
    bucket_sql,
    zorder_interleave_sql,
    zorder_key,
    zorder_layout_stats,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_reference(spark):
    pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pts, "xb long, yb long").withColumn(
        "zkey", F.expr(zorder_interleave_sql("xb", "yb", 8, "spark"))
    )
    for r in df.collect():
        assert r.zkey == _morton(r.xb, r.yb, 8), (r.xb, r.yb)


def test_interleave_duckdb_dialect_agrees(spark):
    import duckdb

    expr = zorder_interleave_sql("xb", "yb", 8, "duckdb")
    got = duckdb.sql(
        f"SELECT {expr} AS z FROM (VALUES (170::BIGINT, 85::BIGINT)) t(xb, yb)"
    ).fetchone()[0]
    assert got == _morton(170, 85, 8)


def test_buckets_cover_range_and_nulls_fold_to_zero(spark):
    df = spark.createDataFrame(
        [(0, 10), (500, 20), (1000, None)], "x long, y long"
    )
    out = zorder_key(df, "x", "y", bits=4).collect()
    by_x = {r.x: r for r in out}
    # min lands in bucket 0, max stays under 2^bits
    assert by_x[0].x_bucket == 0
    assert 0 <= by_x[1000].x_bucket < 16
    assert by_x[1000].x_bucket >= by_x[500].x_bucket
    # NULL y folds to bucket 0, row is kept
    assert by_x[1000].y_bucket == 0
    assert len(out) == 3


def test_zorder_prunes_key_predicates_time_sort_cannot(spark):
    # The pruning claim that justifies the layout: a KEY predicate
    # (y) touches few z-ordered files — each covers a small y range —
    # but every time-sorted file, because a time sort gives each file
    # the full key range. Time predicates prune comparably on both.
    rows = [(t, t % 61) for t in range(4096)]
    df = spark.createDataFrame(rows, "t long, k long")
    bits, n_files = 6, 16
    zst = zorder_layout_stats(df, "t", "k", bits=bits, n_files=n_files).collect()
    assert sum(r.n_rows for r in zst) == 4096
    # time-sorted layout: same file count, assignment by time bucket
    keyed = zorder_key(df, "t", "k", bits=bits)
    lin = (
        keyed.withColumn(
            "file_id", F.expr(f"x_bucket div {max(64 // n_files, 1)}")
        )
        .groupBy("file_id")
        .agg(
            F.min("x_bucket").alias("x_min"),
            F.max("x_bucket").alias("x_max"),
            F.min("y_bucket").alias("y_min"),
            F.max("y_bucket").alias("y_max"),
        )
        .collect()
    )
    assert len(lin) == n_files

    def touched(stats, lo, hi, dim):
        a, b = (dim + "_min"), (dim + "_max")
        return sum(
            1 for r in stats if getattr(r, a) <= hi and getattr(r, b) >= lo
        )

    # y point-ish predicate: z prunes hard, time sort reads everything
    z_y = touched(zst, 30, 33, "y")
    lin_y = touched(lin, 30, 33, "y")
    assert lin_y == n_files
    assert z_y <= lin_y // 2, (z_y, lin_y)
    # x slab: both layouts prune to a minority of files
    assert touched(zst, 0, 15, "x") < len(zst)
    assert touched(lin, 0, 15, "x") < len(lin)


def test_plan_has_no_cartesian_product(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    out = zorder_layout_stats(df, "x", "y", bits=4, n_files=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="bits"):
        zorder_key(df, "x", "y", bits=0)
    with pytest.raises(ValueError, match="n_files"):
        zorder_layout_stats(df, "x", "y", bits=4, n_files=0)
    with pytest.raises(ValueError, match="dialect"):
        zorder_interleave_sql("a", "b", 8, "postgres")
    with pytest.raises(ValueError, match="dialect"):
        bucket_sql("a", "mn", "mx", 8, "postgres")


def test_shard_plan_matches_serial_cumsum_any_buckets(spark):
    """The two-pass distributed prefix sum equals the serial running
    total at every bucket count, including the degenerate 1-bucket
    case; shard = offset div shard_bytes with first-byte ownership."""
    from beats_spark.operators.layout import shard_plan

    rows = [(i, "x" * ((i * 37) % 100 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sizes = {i: len(t) for i, t in rows}
    offsets, acc = {}, 0
    for i in sorted(sizes):
        offsets[i] = acc
        acc += sizes[i]
    from pyspark.sql import functions as F

    for nb in (1, 3, 8):
        out = {
            r.doc_id: r
            for r in shard_plan(
                df, F.octet_length("text"), shard_bytes=500,
                order_col="doc_id", n_buckets=nb,
            ).collect()
        }
        assert len(out) == 200
        for i in sorted(sizes):
            assert out[i].offset_bytes == offsets[i], (nb, i)
            assert out[i].shard == offsets[i] // 500
    # multiple shards actually produced, and shards are contiguous
    shards = [out[i].shard for i in sorted(sizes)]
    assert shards == sorted(shards) and shards[-1] > 5


def test_shard_plan_null_sizes_and_bad_params(spark):
    import pytest
    from pyspark.sql import functions as F

    from beats_spark.operators.layout import shard_plan

    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "defg")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in shard_plan(
        df, F.octet_length("text"), shard_bytes=4, n_buckets=2
    ).collect()}
    assert out[2].offset_bytes == 3  # NULL size folds to 0
    assert out[3].offset_bytes == 3
    with pytest.raises(ValueError):
        shard_plan(df, F.octet_length("text"), shard_bytes=0)
    with pytest.raises(ValueError):
        shard_plan(df, F.octet_length("text"), shard_bytes=4, n_buckets=0)
