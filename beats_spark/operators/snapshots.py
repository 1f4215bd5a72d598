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
