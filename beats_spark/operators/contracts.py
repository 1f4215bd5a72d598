"""Schema-contract auditing for semi-structured ingest.

A log pipeline at 10¹² events/day does not get to assume its producers
keep their payloads stable: fields appear, vanish, and silently change
type between deploys, and the first symptom downstream is a parse stage
tagging half the corpus. The reference ships the *reactive* half of
this story — ``decode_json_fields`` tags events whose payload fails to
parse (/root/reference/libbeat/processors/actions/decode_json_fields.go)
and the monitoring counters expose per-processor failure totals — but
has no *proactive* profile of what the payloads look like batch over
batch. These operators are that profile: the daily data-contract audit
a 100 TB ingest runs before anyone trusts the parsed columns.

Both operators are pure Catalyst: top-level keys come from
``json_object_keys`` and per-key value classes from Spark 4's variant
path reader (``schema_of_variant(try_variant_get(try_parse_json(x),
'$.' || key))``) — JVM-side end to end, no Python in the row path.
Engine type names are folded to a six-class taxonomy shared with the
DuckDB oracle (num/str/bool/arr/obj/null; Spark DECIMAL/BIGINT/DOUBLE
and DuckDB UBIGINT/BIGINT/DOUBLE all read "num"), so the dominant-class
vote is engine-portable. Keys are addressed as ``'$.' || key``; keys
containing ``.`` / ``[`` would mis-path in both engines identically —
documented limitation, fine for machine-emitted telemetry keys.

Scale shape: one scan feeds two aggregates — per-batch row stats and
the exploded (batch, key, class) profile — both of which partial-combine
map-side down to (batches × keys × classes) rows, a bounded dimension
grid (thousands) regardless of corpus size. The baseline join and the
batches × base-keys grid are tiny broadcast dimensions. No corpus-scale
shuffle leaves the aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Portable value-class taxonomy with fixed tie-break ranks. The
# dominant class per (batch, key) is argmax(count) with ties resolved
# to the HIGHEST rank; both engines compute it as
# max(count·8 + rank) — a single integer max, no engine-ordered
# argmax/first semantics anywhere.
CLASS_RANK: dict[str, int] = {
    "null": 0,
    "bool": 1,
    "num": 2,
    "str": 3,
    "arr": 4,
    "obj": 5,
    "other": 6,
}

# Spark schema_of_variant(type) → class. Everything parse_json can
# yield from plain JSON text is covered; 'other' is a safety bucket.
_SPARK_CLASS_CASE = (
    "CASE WHEN vt = 'VOID' THEN 'null' "
    "WHEN vt = 'BOOLEAN' THEN 'bool' "
    "WHEN vt IN ('BIGINT', 'DOUBLE', 'FLOAT') OR vt LIKE 'DECIMAL%' THEN 'num' "
    "WHEN vt = 'STRING' THEN 'str' "
    "WHEN vt LIKE 'ARRAY%' THEN 'arr' "
    "WHEN vt LIKE 'OBJECT%' THEN 'obj' "
    "ELSE 'other' END"
)


def _rank_case(cls_expr: str) -> str:
    """SQL CASE mapping a class name to its tie-break rank (shared
    verbatim by the Spark plan and the DuckDB oracle generator so the
    two cannot drift)."""
    arms = " ".join(
        f"WHEN {cls_expr} = '{name}' THEN {rank}" for name, rank in CLASS_RANK.items()
    )
    return f"CASE {arms} ELSE {CLASS_RANK['other']} END"


def _decode_case(enc_expr: str) -> str:
    """SQL CASE decoding ``enc % 8`` back to the class name."""
    arms = " ".join(
        f"WHEN ({enc_expr}) % 8 = {rank} THEN '{name}'"
        for name, rank in CLASS_RANK.items()
    )
    return f"CASE {arms} ELSE 'other' END"


def _valid_object(json_col: str) -> Column:
    """True when the column holds a well-formed JSON *object* — the
    only shape the key profile reads. ``json_object_keys`` returns
    NULL for malformed text, non-object JSON, and NULL input alike,
    which is exactly the contract boundary we want."""
    return F.json_object_keys(F.col(json_col)).isNotNull()


def json_schema_profile(df: DataFrame, json_col: str, batch_col: str) -> DataFrame:
    """Per-(batch, key) payload profile: presence count and dominant
    value class.

    Output: ``batch, key, present, enc`` where ``enc = max(count·8 +
    rank)`` over the key's observed classes — callers decode the
    dominant class via ``enc % 8`` (:func:`_decode_case`) and its count
    via ``enc div 8``. Kept encoded so :func:`schema_drift` compares
    dominance with plain integer equality on ``enc % 8``.

    One corpus-scale scan; the explode multiplies rows by keys-per-event
    (bounded, narrow) and the aggregate partial-combines to
    |batches × keys| rows before the only shuffle. The variant parse +
    per-key type read is the compute-dense stage, so the scan is
    spread() to cluster parallelism first (no-op on a real multi-split
    scan; rescues the one-file small-scan case).
    """
    from beats_spark.operators.scale import spread

    keyed = (
        spread(df.select(F.col(batch_col).alias("batch"), F.col(json_col).alias("_j")))
        .where(_valid_object("_j"))
        .select(
            "batch",
            F.explode(F.json_object_keys(F.col("_j"))).alias("key"),
            F.col("_j"),
        )
        .select(
            "batch",
            "key",
            F.expr(
                "schema_of_variant(try_variant_get(try_parse_json(_j), "
                "concat('$.', key)))"
            ).alias("vt"),
        )
        .select("batch", "key", F.expr(_SPARK_CLASS_CASE).alias("cls"))
    )
    per_class = keyed.groupBy("batch", "key", "cls").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rank = F.expr(_rank_case("cls"))
    return per_class.groupBy("batch", "key").agg(
        F.sum("cnt").alias("present"),
        F.max(F.col("cnt") * F.lit(8) + rank).alias("enc"),
    )


def batch_payload_stats(df: DataFrame, json_col: str, batch_col: str) -> DataFrame:
    """Per-batch contract health counters: total rows, rows holding a
    valid JSON object (``n_valid``), rows holding *text that is not a
    valid object* (``malformed`` — the decode_json_fields tag rate),
    and NULL payloads (``n_null_props``). One tiny shuffle."""
    j = F.col(json_col)
    valid = _valid_object(json_col)
    return df.groupBy(F.col(batch_col).alias("batch")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(j.isNotNull() & ~valid, 1).otherwise(0)).alias("malformed"),
        F.sum(F.when(j.isNull(), 1).otherwise(0)).alias("n_null_props"),
    )


def schema_drift(
    df: DataFrame,
    json_col: str,
    batch_col: str,
    base_batch: int,
) -> DataFrame:
    """Batch-over-baseline schema-drift report for a JSON payload
    column.

    For every batch ≠ ``base_batch`` and every key seen in that batch
    OR in the baseline, reports::

        batch, key,
        cls                 dominant class this batch ('absent' if gone)
        base_cls            dominant class in the baseline ('absent' if new)
        present             rows carrying the key this batch
        rows                rows in the batch (all payload shapes)
        presence_ppm        floor(present · 10⁶ / max(n_valid, 1))
        base_ppm            the baseline's presence_ppm for the key
        presence_delta_ppm  presence_ppm − base_ppm (signed)
        new_key             key absent from the baseline
        dropped_key         baseline key absent from this batch
        type_changed        both present and dominant classes differ
        malformed           batch rows whose payload text is not a
                            valid JSON object

    ``base_batch`` is explicit (not inferred via a min() pass) so the
    report is deterministic under re-partitioning and cheap to re-run
    against a pinned golden baseline. Presence rates are integer ppm
    over the batch's *valid-object* rows — malformed rows are reported
    beside, not silently folded into the denominator.

    Scale: the profile and batch stats are the only corpus-scale
    passes (each one shuffle, map-side combined to dimension-grid
    size); the batches × baseline-keys grid is an explicitly bounded
    broadcast crossJoin (the repo's standard totals pattern) and every
    subsequent join is dimension-sized.
    """
    profile = json_schema_profile(df, json_col, batch_col)
    stats = batch_payload_stats(df, json_col, batch_col)
    # The profile feeds both the baseline slice and the per-batch side;
    # ReuseExchange does not fire for shared aggregate subtrees under
    # joins (CLAUDE.md), and the upstream is a corpus-scale scan.
    profile = profile.persist()

    base_lit = F.lit(base_batch)
    base_stats = stats.where(F.col("batch") == base_lit).select(
        F.greatest(F.col("n_valid"), F.lit(1)).alias("_base_valid")
    )
    base = (
        profile.where(F.col("batch") == base_lit)
        .crossJoin(F.broadcast(base_stats))
        .select(
            F.col("key"),
            F.expr(_decode_case("enc")).alias("base_cls"),
            F.expr("present * 1000000 div _base_valid").alias("base_ppm"),
        )
    )

    batches = stats.where(F.col("batch") != base_lit)
    # Bounded dimension grid: |batches| × |baseline keys|.
    grid = batches.select("batch").crossJoin(F.broadcast(base))

    cur = profile.where(F.col("batch") != base_lit)
    joined = grid.join(cur, ["batch", "key"], "full_outer")
    out = joined.join(
        F.broadcast(batches.select("batch", "rows", "n_valid", "malformed")),
        "batch",
        "inner",
    )

    present = F.coalesce(F.col("present"), F.lit(0))
    ppm = F.expr("coalesce(present, 0) * 1000000 div greatest(n_valid, 1)")
    base_ppm = F.coalesce(F.col("base_ppm"), F.lit(0))
    new_key = F.col("base_cls").isNull()
    dropped = F.col("enc").isNull() & F.col("base_cls").isNotNull()
    cur_cls = F.when(F.col("enc").isNull(), F.lit("absent")).otherwise(
        F.expr(_decode_case("enc"))
    )
    base_cls = F.coalesce(F.col("base_cls"), F.lit("absent"))
    changed = (
        F.col("enc").isNotNull()
        & F.col("base_cls").isNotNull()
        & (cur_cls != F.col("base_cls"))
    )
    return out.select(
        F.col("batch"),
        F.col("key"),
        cur_cls.alias("cls"),
        base_cls.alias("base_cls"),
        present.cast("long").alias("present"),
        F.col("rows").cast("long").alias("rows"),
        ppm.cast("long").alias("presence_ppm"),
        base_ppm.cast("long").alias("base_ppm"),
        (ppm - base_ppm).cast("long").alias("presence_delta_ppm"),
        new_key.alias("new_key"),
        dropped.alias("dropped_key"),
        changed.alias("type_changed"),
        F.col("malformed").cast("long").alias("malformed"),
    )


def schema_drift_sql(
    planted_cte: str,
    json_expr: str = "props",
    batch_expr: str = "batch",
    base_batch: int = 0,
) -> str:
    """DuckDB twin of :func:`schema_drift`, generated from the same
    CLASS_RANK tables and rank/decode CASE builders as the Spark plan
    (the quality_model discipline: one source of truth, two dialects).

    ``planted_cte`` is a complete ``ev AS (...)`` CTE body yielding the
    input frame with columns ``{batch_expr}`` and ``{json_expr}``.
    DuckDB reads value classes via ``json_type(j, '$.' || key)`` —
    UBIGINT/BIGINT/DOUBLE fold to 'num' exactly as Spark's
    BIGINT/DECIMAL/DOUBLE do, and a SQL-NULL type (JSON null under a
    dynamic path) folds to 'null' matching Spark's VOID.
    """
    duck_class = (
        "CASE WHEN jt IS NULL OR jt = 'NULL' THEN 'null' "
        "WHEN jt = 'BOOLEAN' THEN 'bool' "
        "WHEN jt IN ('UBIGINT', 'BIGINT', 'DOUBLE') THEN 'num' "
        "WHEN jt = 'VARCHAR' THEN 'str' "
        "WHEN jt = 'ARRAY' THEN 'arr' "
        "WHEN jt = 'OBJECT' THEN 'obj' "
        "ELSE 'other' END"
    )
    return f"""
WITH ev AS ({planted_cte}),
s AS (
  SELECT {batch_expr} AS batch, {json_expr} AS j,
         (CASE WHEN {json_expr} IS NOT NULL AND json_valid({json_expr})
               THEN json_type({json_expr}) END) = 'OBJECT' AS is_obj
  FROM ev
),
bstats AS (
  SELECT batch,
         count(*)::BIGINT AS rows,
         sum(CASE WHEN coalesce(is_obj, FALSE) THEN 1 ELSE 0 END)::BIGINT AS n_valid,
         sum(CASE WHEN j IS NOT NULL AND NOT coalesce(is_obj, FALSE)
                  THEN 1 ELSE 0 END)::BIGINT AS malformed
  FROM s GROUP BY batch
),
k AS (
  -- filter BEFORE the lateral unnest: json_keys raises on malformed
  -- text, and DuckDB evaluates the unnest source for every input row
  SELECT so.batch, t.key AS key, json_type(so.j, '$.' || t.key) AS jt
  FROM (SELECT batch, j FROM s WHERE coalesce(is_obj, FALSE)) so,
       unnest(json_keys(so.j)) AS t(key)
),
kc AS (
  SELECT batch, key, {duck_class} AS cls FROM k
),
pc AS (
  SELECT batch, key, cls, count(*)::BIGINT AS cnt FROM kc GROUP BY 1, 2, 3
),
p AS (
  SELECT batch, key, sum(cnt)::BIGINT AS present,
         max(cnt * 8 + ({_rank_case('cls')}))::BIGINT AS enc
  FROM pc GROUP BY 1, 2
),
base AS (
  SELECT p.key, {_decode_case('p.enc')} AS base_cls,
         (p.present * 1000000 // greatest(b.n_valid, 1))::BIGINT AS base_ppm
  FROM p JOIN bstats b ON b.batch = p.batch
  WHERE p.batch = {int(base_batch)}
),
grid AS (
  SELECT b.batch, base.key, base.base_cls, base.base_ppm
  FROM (SELECT batch FROM bstats WHERE batch != {int(base_batch)}) b, base
),
cur AS (SELECT * FROM p WHERE batch != {int(base_batch)}),
joined AS (
  SELECT coalesce(grid.batch, cur.batch) AS batch,
         coalesce(grid.key, cur.key) AS key,
         grid.base_cls, grid.base_ppm, cur.present, cur.enc
  FROM grid FULL OUTER JOIN cur
    ON grid.batch = cur.batch AND grid.key = cur.key
)
SELECT j.batch, j.key,
       CASE WHEN j.enc IS NULL THEN 'absent'
            ELSE {_decode_case('j.enc')} END AS cls,
       coalesce(j.base_cls, 'absent') AS base_cls,
       coalesce(j.present, 0)::BIGINT AS present,
       b.rows,
       (coalesce(j.present, 0) * 1000000 // greatest(b.n_valid, 1))::BIGINT
         AS presence_ppm,
       coalesce(j.base_ppm, 0)::BIGINT AS base_ppm,
       ((coalesce(j.present, 0) * 1000000 // greatest(b.n_valid, 1))
         - coalesce(j.base_ppm, 0))::BIGINT AS presence_delta_ppm,
       j.base_cls IS NULL AS new_key,
       (j.enc IS NULL AND j.base_cls IS NOT NULL) AS dropped_key,
       (j.enc IS NOT NULL AND j.base_cls IS NOT NULL AND
        ({_decode_case('j.enc')}) != j.base_cls) AS type_changed,
       b.malformed
FROM joined j JOIN bstats b ON b.batch = j.batch
"""
