"""Corpus snapshot diff — added / removed / changed / unchanged
between two versions of a document table.

A continuously-ingested corpus (the incremental_dedup /
incremental_neardup index in operators/dedup.py) is re-released as
versioned snapshots; the ops question every release asks is "what
changed since v1?" — the registrar-diff idea libbeat applies to file
states (/root/reference/filebeat/registrar/registrar.go keeps
per-source offsets and compares against the previous checkpoint,
generalized here from files to documents).

Scale shape: each side is reduced to (id, md5(text), n_chars) BEFORE
the join, so the full-outer join shuffles ~50 B/doc — the text column
never moves. md5 (not xxhash64) keeps the fingerprint portable to the
DuckDB oracle. One shuffle per side + the join; the rollup output is
≤4 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff status between two snapshots.

    Returns (id_col, status, old_chars, new_chars) with status in
    {'added', 'removed', 'changed', 'unchanged'}; char counts are
    ``length(text)`` on each side (0 for the absent side, so the
    rollup's deltas stay integer and NULL-free). NULL text hashes to a
    sentinel distinct from every md5 hex digest, so NULL↔NULL is
    'unchanged' and NULL↔text is 'changed' (md5(NULL) would be NULL
    and NULL <> x is NULL — the SQL trap)."""

    def side(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.coalesce(F.md5(F.col(text_col)), F.lit("<null>")).alias(
                f"{prefix}_h"
            ),
            F.coalesce(F.length(text_col), F.lit(0))
            .cast("long")
            .alias(f"{prefix}_chars"),
        )

    o, n = side(old, "old"), side(new, "new")
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_h").isNull(), F.lit("added"))
        .when(F.col("new_h").isNull(), F.lit("removed"))
        .when(F.col("old_h") != F.col("new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col(id_col),
        status.alias("status"),
        F.coalesce("old_chars", F.lit(0)).cast("long").alias("old_chars"),
        F.coalesce("new_chars", F.lit(0)).cast("long").alias("new_chars"),
    )


def corpus_diff_stats(diff: DataFrame) -> DataFrame:
    """Release-note rollup of :func:`corpus_diff`: per status, the doc
    count, both sides' char totals and the signed char delta — all
    64-bit integer, so the oracle reproduces every value exactly."""
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("old_chars").alias("old_chars"),
        F.sum("new_chars").alias("new_chars"),
        F.sum(F.col("new_chars") - F.col("old_chars")).alias("delta_chars"),
    )


def corpus_diff_sql(
    old_sql: str,
    new_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The identical diff + rollup as DuckDB CTEs (same md5
    fingerprint, same NULL sentinel, same status battery)."""
    return f"""
WITH o AS (
  SELECT {id_col}, coalesce(md5({text_col}), '<null>') AS h,
         coalesce(length({text_col}), 0)::BIGINT AS chars
  FROM ({old_sql})
), n AS (
  SELECT {id_col}, coalesce(md5({text_col}), '<null>') AS h,
         coalesce(length({text_col}), 0)::BIGINT AS chars
  FROM ({new_sql})
), d AS (
  SELECT coalesce(o.{id_col}, n.{id_col}) AS {id_col},
         CASE WHEN o.h IS NULL THEN 'added'
              WHEN n.h IS NULL THEN 'removed'
              WHEN o.h <> n.h THEN 'changed'
              ELSE 'unchanged' END AS status,
         coalesce(o.chars, 0)::BIGINT AS old_chars,
         coalesce(n.chars, 0)::BIGINT AS new_chars
  FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
)
SELECT status, count(*)::BIGINT AS n_docs,
       sum(old_chars)::BIGINT AS old_chars,
       sum(new_chars)::BIGINT AS new_chars,
       sum(new_chars - old_chars)::BIGINT AS delta_chars
FROM d GROUP BY status
"""


def quality_drift(
    v1: DataFrame,
    v2: DataFrame,
    key_col: str = "source",
    score_col: str = "score_milli",
    n_bins: int = 16,
    lo: int = -16_000,
    hi: int = 32_000,
) -> DataFrame:
    """Per-group distribution drift between two corpus snapshots —
    the release-gate companion to corpus_diff (which answers "which
    docs changed"; this answers "did the QUALITY PROFILE move"): each
    side's integer score column is histogrammed into ``n_bins`` equal
    buckets over [lo, hi) (outliers clamp into the edge bins), the
    histograms are normalized to exact integer ppm per group, and the
    drift is the L1 distance Σ|ppm₁−ppm₂| ∈ [0, 2·10⁶] — total
    variation ×2, the standard data-drift monitor statistic.

    Emits per group: ``n_v1``, ``n_v2``, ``l1_ppm``. Groups present
    on one side only drift against the empty histogram (l1 = 10⁶ when
    the populated side is non-empty). All arithmetic is integer-exact
    (ppm via div on counts), so the monitor is oracle-checkable.

    Scale shape: each side reduces to a ≤ |groups|·n_bins count frame
    BEFORE anything joins (one map-side-combined groupBy per side on
    10¹²-row corpora shuffles partial counts only); the histogram
    join, per-group totals, and the L1 rollup all run on those
    bounded frames. Clamping uses CASE, not least/greatest — NULL
    scores stay NULL and are dropped with a count (never silently
    resurrected as the clamp bound, CLAUDE.md).
    """
    if n_bins < 1 or hi <= lo:
        raise ValueError(f"bad histogram spec n_bins={n_bins} [{lo}, {hi})")
    span = hi - lo

    def hist(df: DataFrame, cnt_name: str) -> DataFrame:
        s = F.col(score_col).cast("long")
        # truncation-toward-zero == floor here: (s - lo) >= 0 after
        # the lower clamp, so div is safe on every engine
        raw = F.expr(
            f"cast((cast({score_col} as long) - {lo}) * {n_bins} "
            f"div {span} as long)"
        )
        b = (
            F.when(s.isNull(), F.lit(None).cast("long"))
            .when(s < lo, F.lit(0))
            .when(s >= hi, F.lit(n_bins - 1))
            .otherwise(raw)
        )
        return (
            df.select(F.col(key_col).alias("_k"), b.alias("_bin"))
            .where(F.col("_bin").isNotNull())
            .groupBy("_k", "_bin")
            .agg(F.count(F.lit(1)).cast("long").alias(cnt_name))
        )

    h1, h2 = hist(v1, "_c1"), hist(v2, "_c2")
    merged = h1.join(h2, ["_k", "_bin"], "full_outer").select(
        "_k",
        "_bin",
        F.coalesce("_c1", F.lit(0)).alias("_c1"),
        F.coalesce("_c2", F.lit(0)).alias("_c2"),
    )
    totals = merged.groupBy("_k").agg(
        F.sum("_c1").cast("long").alias("n_v1"),
        F.sum("_c2").cast("long").alias("n_v2"),
    )
    ppm = merged.join(totals, "_k").select(
        "_k",
        F.expr(
            "abs(cast(_c1 * 1000000 div "
            "(case when n_v1 >= 1 then n_v1 else 1 end) as long) "
            "- cast(_c2 * 1000000 div "
            "(case when n_v2 >= 1 then n_v2 else 1 end) as long))"
        ).alias("_d"),
    )
    out = ppm.groupBy("_k").agg(F.sum("_d").cast("long").alias("l1_ppm"))
    return (
        totals.join(out, "_k")
        .select(F.col("_k").alias(key_col), "n_v1", "n_v2", "l1_ppm")
    )
