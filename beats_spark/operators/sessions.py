"""Session / conversation assembly operators.

The reference guarantees per-client publish-order ACKs
(libbeat/publisher/pipeline/pipeline.go:49-64) but has no session
semantics; a transcript pipeline needs them: stable per-conversation
ordering, gap-based sessionization, and turn→document assembly for
training corpora. All are Window/groupBy compositions — one shuffle
keyed on the entity id, skew handled by AQE (a hot key's rows still
form ONE session stream, that's inherent to the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_order(
    df: DataFrame,
    key_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Stamp ``turn_rank`` = row_number over (key, order) — the stable
    turn ordering the per-turn-equality contract compares under.

    PRECONDITION (load-bearing): ``order_cols`` must be unique within
    each key. row_number over tied keys is partition-order-dependent —
    duplicate (conv_id, turn_idx) rows (double ingest, multi-source
    merge) would get ranks that differ across runs and cluster sizes,
    breaking the per-turn-equality contract this column anchors. The
    transcript schema guarantees the uniqueness (the reference's
    publish-order contract is per-client sequential); deduplicate
    first (exact_dedup on (key, order, text)) if your source does not.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    return df.withColumn("turn_rank", F.row_number().over(w))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_minutes``.

    ``session_idx`` is the 0-based running count of session starts per
    key (lag + conditional cumulative sum over one Window — a single
    shuffle on the key)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    # microsecond-exact gap, not unix_timestamp: that truncates to
    # whole seconds, so a 1800.9 s gap at gap_minutes=30 would NOT
    # split here while a fractional-epoch oracle says it does —
    # sub-second-precision streams silently sessionize differently.
    # Also TIMESTAMP_NTZ-safe (same idiom as conversation_stats).
    # The lag is materialized first: window exprs can't nest inside
    # the running sum (CLAUDE.md).
    staged = df.withColumn("_prev_ts", F.lag(ts_col).over(w))
    gap_us = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, `{ts_col}`)")
    is_start = (
        F.col("_prev_ts").isNull()
        | (gap_us > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return staged.withColumn(
        "session_idx", F.sum(is_start).over(running) - 1
    ).drop("_prev_ts")


def assemble_documents(
    df: DataFrame,
    key_col: str = "conv_id",
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("turn_idx",),
    sep: str = "\n",
    role_col: str | None = None,
) -> DataFrame:
    """Turn rows → one training document per conversation: texts joined
    in stable order, optionally prefixed ``role: ``.

    Plan: groupBy(key).agg(sort_array(collect_list(struct(order, text))))
    → array_join; one shuffle of (key, text) pairs with map-side
    combine. The struct sort keys make the result independent of
    partitioning — deterministic at any parallelism."""
    # coalesce, not bare concat: concat is NULL-propagating, so a turn
    # with role=NULL but real text would render a NULL payload that
    # array_join silently SKIPS — the document loses the turn with no
    # flag while n_turns still counts it (same '' convention as
    # render_chat: the slot survives, offsets and counts stay honest)
    text = F.coalesce(F.col(text_col), F.lit(""))
    payload = (
        F.concat(F.coalesce(F.col(role_col), F.lit("")), F.lit(": "), text)
        if role_col
        else text
    )
    packed = F.struct(*[F.col(c) for c in order_cols], payload.alias("_t"))
    agg = df.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(packed)), lambda s: s.getField("_t")
            ),
            sep,
        ).alias("document"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    return agg


def conversation_stats(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    text_col: str = "text",
    role_col: str | None = None,
) -> DataFrame:
    """Per-conversation curation rollup — the transcript-side twin of
    ``textstats.corpus_report``: before assembling turns into training
    documents, a curator filters conversations that are too short, too
    long, single-role, or temporally degenerate (a burst of turns with
    no elapsed time is usually a replayed log, not a dialogue).

    Per key: ``n_turns``, ``span_ms`` (last-turn minus first-turn
    timestamp in integer milliseconds), ``total_chars`` of turn text,
    ``chars_per_turn_milli`` (mean × 1000, exact integer division),
    and with ``role_col`` the distinct role count ``n_roles``.

    Scale shape: ONE groupBy(key) with map-side partial aggregation —
    min/max/sum/count combine locally, so the shuffle carries one
    partial row per (task, key), not the turns. A hot conversation
    still aggregates correctly (partials merge); no window, no sort.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        # exact microsecond diff floored to ms: timezone-free (works on
        # TIMESTAMP_NTZ, which unix_millis rejects) and engine-portable
        # (DuckDB date_diff('microsecond') is the same exact count)
        F.expr(
            f"timestampdiff(MICROSECOND, min(`{ts_col}`), max(`{ts_col}`))"
            " div 1000"
        ).alias("span_ms"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("total_chars"),
    ]
    if role_col is not None:
        aggs.append(F.countDistinct(F.col(role_col)).alias("n_roles"))
    return (
        df.groupBy(key_col)
        .agg(*aggs)
        .withColumn(
            "chars_per_turn_milli",
            F.expr("total_chars * 1000 div greatest(n_turns, 1)"),
        )
    )


def tool_stats(
    df: DataFrame,
    tool_col: str = "tool",
    key_col: str = "conv_id",
    pos_col: str = "turn_idx",
    none_values: tuple[str, ...] = ("none", ""),
) -> DataFrame:
    """Per-tool usage rollup over agent transcripts: how often each
    tool is called, across how many conversations, and where in the
    conversation it tends to appear — the signals a curator uses to
    spot degenerate tool loops and dead tools before assembling
    training documents. Rows whose tool is NULL or in ``none_values``
    are not tool calls and are ignored.

    Per tool: ``n_calls``, ``n_convs`` (distinct conversations), and
    ``mean_pos_milli`` = mean ``pos_col`` × 1000 as an exact integer
    division (engine-portable, no float).

    Scale shape: one groupBy(tool) with map-side partial aggregation;
    the distinct-conversation count rekeys on (tool, conv) first —
    two small shuffles of (tool, conv) pairs, never the turn text.
    """
    calls = df.where(
        F.col(tool_col).isNotNull() & ~F.col(tool_col).isin(*none_values)
    )
    return (
        calls.groupBy(F.col(tool_col).alias("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.countDistinct(F.col(key_col)).alias("n_convs"),
            F.sum(F.col(pos_col)).cast("long").alias("_pos_sum"),
        )
        .withColumn(
            "mean_pos_milli", F.expr("_pos_sum * 1000 div greatest(n_calls, 1)")
        )
        .drop("_pos_sum")
    )


def depth_survival(
    df: DataFrame,
    key_col: str = "conv_id",
) -> DataFrame:
    """Conversation-depth survival curve — the abandonment profile a
    transcript product team reads (where do dialogues die?) and a
    curation pass uses to pick truncation depths that keep p99 of
    real conversations intact.

    One row per OCCURRING terminal depth d (a depth no conversation
    ends at has n_ending 0 and the same n_reaching as its successor —
    the sparse encoding): ``n_reaching`` (conversations with ≥ d
    turns), ``n_ending`` (exactly d), ``continue_ppm`` =
    (n_reaching − n_ending)·10⁶ div n_reaching — the per-turn
    survival hazard complement, exact integers.

    Scale shape: ONE corpus-scale groupBy(key) reduces 10¹² turns to
    one count per conversation (map-side combined); the depth
    histogram and its suffix-sum window run on the ≤ max-depth row
    frame — the bounded-frame window is free, the corpus never sees
    a window. (Suffix sums over an UNBOUNDED depth domain would be
    the shard_plan prefix machinery; conversation depth is bounded
    by context windows in practice, so the plain window is the right
    tier.)
    """
    from pyspark.sql import Window

    per_conv = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    hist = per_conv.groupBy("_n").agg(
        F.count(F.lit(1)).cast("long").alias("n_ending")
    )
    w = Window.orderBy(F.col("_n").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.withColumn("n_reaching", F.sum("n_ending").over(w).cast("long"))
        .select(
            F.col("_n").alias("depth"),
            "n_reaching",
            "n_ending",
            F.expr(
                "cast((n_reaching - n_ending) * 1000000 "
                "div n_reaching as long)"
            ).alias("continue_ppm"),
        )
    )
