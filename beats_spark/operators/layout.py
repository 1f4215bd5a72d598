"""Multi-dimensional data layout — Z-order (Morton) clustering keys
and the file-level locality stats that justify them.

Why this exists at 100 TB: a transcript/event table is filtered by
BOTH time and key (conv/user/service). Files sorted by time alone
answer time predicates with tight file pruning but scan everything
for a key predicate; Z-ordering interleaves the bits of both
dimensions so every file covers a small RECTANGLE of the
(time × key) space and min/max file statistics (parquet footers,
Iceberg manifest ranges) prune on either dimension. This is the
layout strategy behind Delta OPTIMIZE ZORDER BY and Iceberg's
sort-order rewrites (public docs); the implementation here is the
standard Morton construction, not derived from any reference code.

Everything is integer and engine-portable:

- dimension buckets: ``bucket = (v - min) div w`` with
  ``w = (max - min) div 2^bits + 1`` — w is chosen so the bucket
  never reaches 2^bits (no clamp branch) and the division never
  overflows (no ``(v-min) * 2^bits`` product, which would overflow
  int64 for µs ranges × 16-bit grids);
- the Morton key: OR of per-bit shifts, emitted as ONE SQL
  expression string by :func:`zorder_interleave_sql` in BOTH
  dialects from the same loop, so the operator and its DuckDB
  oracle cannot drift (the html_steps_sql discipline);
- NULL coordinates fold to bucket 0 (NULLs-first convention) so a
  layout never drops rows.

Scale shape: one column-pruned min/max aggregate pass (1 row,
broadcast back), one projection for buckets + key, and a
``groupBy(file_id)`` whose cardinality is the FILE count — map-side
combined, so the shuffle moves ~n_files rows per task regardless of
data size. Writing the physical layout is then
``df.repartitionByRange(n_files, zkey).sortWithinPartitions(zkey)``
— a range shuffle on an 8-byte key; this module computes the key
and PROVES the locality claim (per-file bounding boxes) rather than
hiding it inside a write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_interleave_sql(
    x: str, y: str, bits: int, dialect: str
) -> str:
    """The Morton-interleave expression for two ``bits``-bit bucket
    columns, in ``spark`` or ``duckdb`` SQL. x occupies even bit
    positions, y odd. One string, same loop for both dialects."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(
                f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})"
            )
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def bucket_sql(
    v: str, vmin: str, vmax: str, bits: int, dialect: str
) -> str:
    """Engine-portable bucket: (v - min) div w, with w sized so the
    result is always < 2^bits and nothing multiplies past int64.
    The only dialect difference is the integer-division operator
    (Spark ``div``, DuckDB ``//`` — both truncate toward zero on
    the non-negative operands here)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    d = "div" if dialect == "spark" else "//"
    # outer coalesce: an ALL-NULL dimension (min/max NULL) still
    # lands every row in bucket 0 — the docstring's "a layout never
    # drops rows" guarantee; emitted in both dialects so the oracle
    # replays it
    return (
        f"coalesce((coalesce({v}, {vmin}) - {vmin}) {d} "
        f"((({vmax} - {vmin}) {d} {1 << bits}) + 1), 0)"
    )


def zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
) -> DataFrame:
    """Attach ``x_bucket``, ``y_bucket`` and the Morton ``zkey`` to
    every row. ``x_col``/``y_col`` must be integer columns (convert
    timestamps with ``unix_micros`` first); NULLs land in bucket 0.

    One aggregate pass for the min/max frame (1 row, broadcast via
    crossJoin), one projection for the key — no data shuffle.
    """
    if bits < 1 or bits > 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mm = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    xb = bucket_sql(x_col, "_xmin", "_xmax", bits, "spark")
    yb = bucket_sql(y_col, "_ymin", "_ymax", bits, "spark")
    keyed = (
        df.crossJoin(F.broadcast(mm))
        .withColumn("x_bucket", F.expr(xb).cast("long"))
        .withColumn("y_bucket", F.expr(yb).cast("long"))
        .withColumn(
            "zkey",
            F.expr(
                zorder_interleave_sql("x_bucket", "y_bucket", bits, "spark")
            ).cast("long"),
        )
    )
    return keyed.drop("_xmin", "_xmax", "_ymin", "_ymax")


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Per-file locality statistics for a Z-ordered layout: rows are
    assigned to files by fixed-width zkey ranges (``file_id = zkey
    div cells_per_file`` — deterministic, shuffle-free assignment;
    a physical write would use repartitionByRange for even sizes),
    and each file reports its row count and (x, y) bucket bounding
    box — exactly the min/max statistics a scan planner prunes on.

    Returns ``(file_id, n_rows, x_min, x_max, y_min, y_max)``.
    The pruning claim is measurable from the output: Σ per-file
    bbox area ≪ n_files × full-grid area (pinned in tests against
    a time-sorted layout, whose y ranges span the whole grid).
    """
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    total_cells = 1 << (2 * bits)
    # ceil, so file_id < n_files even when n_files doesn't divide the
    # grid (floor would spill max-zkey rows into an (n_files+1)-th file)
    cells_per_file = max(-(-total_cells // n_files), 1)
    keyed = zorder_key(df, x_col, y_col, bits)
    return (
        keyed.withColumn(
            "file_id", F.expr(f"zkey div {cells_per_file}").cast("long")
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x_bucket").alias("x_min"),
            F.max("x_bucket").alias("x_max"),
            F.min("y_bucket").alias("y_min"),
            F.max("y_bucket").alias("y_max"),
        )
    )


def shard_plan(
    df: DataFrame,
    size_col,
    shard_bytes: int,
    order_col: str = "doc_id",
    n_buckets: int = 256,
    persist: bool = True,
) -> DataFrame:
    """Size-balanced contiguous shard plan: every row gets its global
    byte ``offset_bytes`` (sum of all earlier rows' sizes in
    ``order_col`` order) and ``shard = offset_bytes div shard_bytes``
    — the write plan that turns a curated corpus into ~equal-sized
    output files/tar shards in a deterministic order (WebDataset /
    training-shard convention: capped file sizes, stable order, and a
    byte-addressable manifest).

    The interesting part is HOW the running total is computed: a
    global ``SUM() OVER (ORDER BY ...)`` window is a single-partition
    sort — the one-core bottleneck that stops working the moment the
    corpus doesn't fit one machine. This is the standard two-pass
    distributed prefix sum instead:

    1. range-bucket rows on ``order_col`` (``repartitionByRange`` —
       buckets are ordered, contiguous key ranges);
    2. per-bucket running sum (window PARTITIONED by bucket — every
       bucket sorts in parallel);
    3. bucket totals (``n_buckets`` rows) get their own prefix sum on
       a single partition — bounded by ``n_buckets``, never by data —
       and broadcast back as per-bucket offsets;
    4. ``offset = bucket_offset + within_bucket_offset``.

    The output is a pure function of (key order, sizes): bucket
    BOUNDARIES don't appear in it, so range-sampling wobble can't
    change the answer — but ``order_col`` must be unique (ties could
    split across buckets in arbitrary order). Two corpus shuffles
    (range + bucket-window); the frame is persisted by default
    because the bucket-totals pass and the window pass both consume
    the range exchange and Spark recomputes shared subtrees
    (CLAUDE.md: ReuseExchange does not fire here) — streaming callers
    pass ``persist=False`` and manage their own caching.

    Shard semantics: a row whose span crosses a boundary belongs to
    the shard its FIRST byte lands in, so shards can overshoot by at
    most one row — the convention that keeps assignment a pure
    projection of the offset (writers that must hard-cap bytes split
    the straddling row downstream).
    """
    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    out = (
        running_prefix(
            df,
            [order_col],
            size_col,
            n_buckets=n_buckets,
            persist=persist,
            prefix_col="offset_bytes",
            rank_col="_sp_rank",
        )
        .withColumn(
            "shard", F.expr(f"offset_bytes div {int(shard_bytes)}").cast("long")
        )
        .drop("_sp_rank")
    )
    return out


def running_prefix(
    df: DataFrame,
    order_cols: list,
    size_col,
    n_buckets: int = 256,
    persist: bool = True,
    prefix_col: str = "prefix_sum",
    rank_col: str = "rank",
) -> DataFrame:
    """The reusable two-pass distributed prefix: adds ``prefix_col``
    (EXCLUSIVE running sum of ``size_col`` in ``order_cols`` order)
    and ``rank_col`` (1-based global position) without ever sorting
    the data on one partition.

    Pattern (the shard_plan pipeline, factored for reuse):
    range-bucket on the order key → per-bucket window (running sum +
    row_number, every bucket in parallel) → ``n_buckets``-row bucket
    totals get their own prefix on a bounded single partition →
    broadcast back as (sum, count) offsets. Output is a pure function
    of (order, sizes) — bucket boundaries cancel out — but the
    combined ``order_cols`` must be a unique key (ties could split
    across buckets in arbitrary order). NULL sizes fold to 0.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    d = (
        df.withColumn("_rp_sz", F.coalesce(size.cast("long"), F.lit(0)))
        .repartitionByRange(n_buckets, *[F.col(c) for c in order_cols])
        .withColumn("_rp_b", F.spark_partition_id())
    )
    if persist:
        d = d.persist()
    from pyspark.sql import Window

    w_in = Window.partitionBy("_rp_b").orderBy(*order_cols)
    totals = d.groupBy("_rp_b").agg(
        F.sum("_rp_sz").alias("_rp_tot"), F.count(F.lit(1)).alias("_rp_cnt")
    )
    w_b = Window.orderBy("_rp_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_rp_b",
        F.coalesce(F.sum("_rp_tot").over(w_b), F.lit(0)).alias("_rp_boff"),
        F.coalesce(F.sum("_rp_cnt").over(w_b), F.lit(0)).alias("_rp_coff"),
    )
    return (
        d.withColumn(
            "_rp_inoff",
            F.coalesce(
                F.sum("_rp_sz").over(
                    w_in.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("_rp_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_rp_b")
        .withColumn(
            prefix_col, (F.col("_rp_boff") + F.col("_rp_inoff")).cast("long")
        )
        .withColumn(
            rank_col, (F.col("_rp_coff") + F.col("_rp_rn")).cast("long")
        )
        .drop("_rp_b", "_rp_sz", "_rp_inoff", "_rp_rn", "_rp_boff", "_rp_coff")
    )
