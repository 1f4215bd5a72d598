"""Conversation curation for training corpora — the trainer-facing
steps between turn rows and packed sequences.

The reference pipeline has no chat semantics (libbeat publishes
opaque events; see sessions.py for the ordering guarantees it does
have); these operators implement the standard public SFT-corpus
practice over the transcript shape from BASELINE.json's input_hint
(conv_id, turn_idx, role, text, tool, ts):

- ``validate_conversations`` — per-conversation structural gate
  (empty turns, unknown roles, missing assistant turn, bad opening
  role, dangling user turn, broken alternation), reason-tagged in the
  same keep/reasons shape as textstats.quality_filter.
- ``render_chat`` — deterministic chat-template rendering
  (``<|role|>text<|end|>`` blocks) plus LOSS-MASK SPANS: character
  offsets of every target-role payload in the rendered string, the
  column an SFT trainer needs to mask non-assistant tokens.
- ``truncate_context`` — longest-suffix-of-whole-turns context-window
  fit (optionally pinning the opening system turn), the turn-boundary
  truncation rule used when a conversation exceeds the model context.
- ``anonymize_speakers`` — stable first-appearance pseudonyms per
  conversation (speaker_1, speaker_2, …), the transcript-side
  companion of operators/redact.py's content PII pass.

Scale shape: every operator is one hash shuffle on the conversation
key (window + groupBy reuse the same partitioning), except
``anonymize_speakers`` which aggregates the tiny (conv, speaker)
frame and joins it back. No Python UDFs anywhere — all pure Catalyst
expressions, ANSI-safe on NULL/blank text and roles. A hot
conversation is inherently one stream (same argument as sessions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_struct(order_cols: tuple[str, ...]) -> Column:
    return F.struct(*[F.col(c) for c in order_cols])


def _order_asc(order_cols: tuple[str, ...]) -> list[Column]:
    return [F.col(c).asc() for c in order_cols]


def validate_conversations(
    df: DataFrame,
    key_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("turn_idx",),
    allowed_roles: tuple[str, ...] = ("system", "user", "assistant", "tool"),
    required_role: str | None = "assistant",
    opening_roles: tuple[str, ...] = ("system", "user"),
    dangling_roles: tuple[str, ...] = ("user",),
    strict_alternation: bool = False,
    max_turns: int | None = None,
) -> DataFrame:
    """Per-conversation structural validity gate.

    Returns one row per conversation: ``n_turns``, ``reasons``
    (comma-joined sorted rule tags, '' = clean) and ``keep`` — the
    quality_filter contract, so the two gates compose into one
    reject-rate report. Rules (each contributes its tag when hit):

    - ``empty_turn``    — any turn with NULL or whitespace-only text
    - ``bad_role``      — any role outside ``allowed_roles`` (NULL too)
    - ``missing_required`` — no turn with ``required_role``
    - ``bad_opening``   — first turn's role not in ``opening_roles``
    - ``dangling_turn`` — last turn's role in ``dangling_roles``
      (a conversation that ends on a user prompt has no target)
    - ``repeated_role`` — consecutive same-role turns
      (only when ``strict_alternation``)
    - ``too_many_turns`` — more than ``max_turns`` turns (when set)

    Plan: one groupBy on the key; the alternation lag Window (same
    key, so Spark reuses the hash partitioning — ONE Exchange total)
    is built ONLY when ``strict_alternation`` asks for it: the window
    costs a per-partition sort pass, and paying it for a flag the
    default config discards is wasted work on the hot corpus-gate
    path. min_by/max_by on the order struct pick first/last roles
    without a second sort pass.
    """
    role = F.col(role_col)
    text = F.col(text_col)
    ordk = _order_struct(order_cols)
    if strict_alternation:
        w = Window.partitionBy(key_col).orderBy(*_order_asc(order_cols))
        rep = (
            F.lag(role).over(w).isNotNull() & (F.lag(role).over(w) == role)
        ).cast("int")
    else:
        rep = F.lit(0)
    flagged = df.select(
        F.col(key_col),
        ordk.alias("_ord"),
        role.alias("_role"),
        (text.isNull() | (F.trim(text) == "")).cast("int").alias("_empty"),
        (role.isNull() | ~role.isin(*allowed_roles)).cast("int").alias("_badrole"),
        (
            (role == required_role).cast("int")
            if required_role is not None
            else F.lit(1)
        ).alias("_req"),
        rep.alias("_rep"),
    )
    agg = flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("_empty").alias("_any_empty"),
        F.max("_badrole").alias("_any_badrole"),
        F.max("_req").alias("_has_req"),
        F.max("_rep").alias("_any_rep"),
        F.min_by("_role", F.col("_ord")).alias("_first_role"),
        F.max_by("_role", F.col("_ord")).alias("_last_role"),
    )
    tags = [
        F.when(F.col("_any_empty") == 1, F.lit("empty_turn")),
        F.when(F.col("_any_badrole") == 1, F.lit("bad_role")),
        F.when(F.col("_has_req") == 0, F.lit("missing_required")),
        F.when(
            ~F.coalesce(
                F.col("_first_role").isin(*opening_roles), F.lit(False)
            ),
            F.lit("bad_opening"),
        ),
        F.when(
            F.coalesce(F.col("_last_role").isin(*dangling_roles), F.lit(False)),
            F.lit("dangling_turn"),
        ),
    ]
    if strict_alternation:
        tags.append(F.when(F.col("_any_rep") == 1, F.lit("repeated_role")))
    if max_turns is not None:
        tags.append(F.when(F.col("n_turns") > max_turns, F.lit("too_many_turns")))
    reasons = F.array_sort(
        F.filter(F.array(*tags), lambda t: t.isNotNull())
    )
    return (
        agg.withColumn("reasons", F.array_join(reasons, ","))
        .withColumn("keep", F.col("reasons") == "")
        .select(key_col, "n_turns", "reasons", "keep")
    )


def render_chat(
    df: DataFrame,
    key_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("turn_idx",),
    sep: str = "\n",
    open_prefix: str = "<|",
    open_suffix: str = "|>",
    close_tok: str = "<|end|>",
    loss_role: str = "assistant",
) -> DataFrame:
    """Render each conversation into one training string with
    loss-mask spans.

    Each turn becomes ``<|role|>text<|end|>``; turns are joined with
    ``sep`` in stable order. ``loss_spans`` is ``"start:end"`` pairs
    (comma-joined, in turn order) — the CHARACTER offsets of every
    ``loss_role`` turn's text payload inside ``rendered``, i.e. the
    spans an SFT trainer unmasks. NULL role/text render as '' (the
    row still occupies a block, so offsets stay aligned with n_turns).

    Plan: per-turn piece + exclusive running length over one Window,
    then groupBy the SAME key (sort_array(collect_list(struct)) makes
    assembly partition-independent) — ONE Exchange. Offsets are plain
    column arithmetic; the rendered string is built once by
    array_join, never by iterative concat.
    """
    role = F.coalesce(F.col(role_col), F.lit(""))
    text = F.coalesce(F.col(text_col), F.lit(""))
    piece = F.concat(
        F.lit(open_prefix), role, F.lit(open_suffix), text, F.lit(close_tok)
    )
    # the offset window's order must be EXACTLY the order sort_array
    # gives the assembled pieces — struct(_o, _p) compares the order
    # key then the piece string — so the piece string joins the
    # orderBy as the tie-break: duplicate order keys (dirty data the
    # validity gate does not flag) would otherwise let the offsets sum
    # in one order while the rendered string assembles in another,
    # silently unmasking the wrong characters
    w = (
        Window.partitionBy(key_col)
        .orderBy(*_order_asc(order_cols), piece)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    piece_off = F.coalesce(
        F.sum(F.length(piece) + F.lit(len(sep))).over(w), F.lit(0)
    )
    text_start = piece_off + F.lit(len(open_prefix) + len(open_suffix)) + F.length(
        role
    )
    text_end = text_start + F.length(text)
    span = F.concat(
        text_start.cast("string"), F.lit(":"), text_end.cast("string")
    )
    ordk = _order_struct(order_cols)
    per_turn = df.select(
        F.col(key_col),
        F.struct(ordk.alias("_o"), piece.alias("_p")).alias("_piece"),
        # collect_list drops NULLs — non-loss turns vanish from spans.
        # the piece string rides along as the same tie-break the
        # rendered assembly uses, so span order == render order even
        # under duplicate order keys
        F.when(
            F.col(role_col) == loss_role,
            F.struct(ordk.alias("_o"), piece.alias("_p"), span.alias("_s")),
        ).alias("_span"),
        F.when(F.col(role_col) == loss_role, 1).otherwise(0).alias("_is_loss"),
    )
    return per_turn.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("_piece")), lambda s: s.getField("_p")
            ),
            sep,
        ).alias("rendered"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("_span")), lambda s: s.getField("_s")
            ),
            ",",
        ).alias("loss_spans"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_is_loss").cast("long").alias("n_loss_turns"),
    )


def truncate_context(
    df: DataFrame,
    budget: int,
    key_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    text_col: str = "text",
    token_counter: str = "whitespace",
    pin_first: bool = False,
) -> DataFrame:
    """Fit each conversation into a ``budget``-token context window by
    keeping the longest SUFFIX of whole turns (chat history truncates
    from the front; answers need the most recent turns). With
    ``pin_first`` the opening turn (system prompt) is always kept and
    its tokens are charged against the budget first.

    Returns every turn row (key, order cols, ``tok_count``,
    ``suffix_toks`` = tokens from this turn to the end, ``kept``) —
    a flag column, not a filter, so the caller can audit drop rates
    before filtering (the tag-and-continue discipline).

    Plan: one Window partition on the key; ``pin_first`` needs the
    row_number materialized before the reverse running sum (window
    functions can't nest), still the same single Exchange.
    ``token_counter="bpe"`` prices in subword tokens via the Arrow
    UDF (functions/bpe.py) — same tradeoff as pack_sequences.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if token_counter == "whitespace":
        from beats_spark.operators.textstats import token_count_whitespace

        toks = token_count_whitespace(F.col(text_col))
    elif token_counter == "bpe":
        from beats_spark.functions.bpe import bpe_token_count

        toks = bpe_token_count(F.col(text_col))
    else:
        raise ValueError(f"unknown token_counter {token_counter!r}")
    asc = Window.partitionBy(key_col).orderBy(*_order_asc(order_cols))
    # NULL text prices 0 tokens: token_count_whitespace(NULL) is NULL
    # under ANSI, and letting it flow would hit the F.greatest-skips-
    # NULLs trap below (budget - NULL → NULL → greatest resurrects 0,
    # dropping the WHOLE history), skip rows in the suffix sum, and
    # emit kept=NULL on trailing NULL turns — the clamp bug CLAUDE.md
    # documents, caught here by review before it shipped
    base = df.withColumn(
        "tok_count", F.coalesce(toks.cast("long"), F.lit(0))
    ).withColumns(
        {
            "_rn": F.row_number().over(asc),
            "_first_tok": F.first(F.col("tok_count")).over(asc),
        }
    )
    desc = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if pin_first:
        # suffix sums exclude the pinned first turn; its cost comes out
        # of the budget instead (exact: no double charge when the
        # suffix reaches all the way back)
        eff = F.when(F.col("_rn") == 1, F.lit(0)).otherwise(F.col("tok_count"))
        remaining = F.greatest(
            F.lit(budget) - F.col("_first_tok"), F.lit(0)
        )
        suffix = F.sum(eff).over(desc)
        kept = (F.col("_rn") == 1) | (suffix <= remaining)
    else:
        suffix = F.sum(F.col("tok_count")).over(desc)
        kept = suffix <= budget
    return (
        base.withColumn("suffix_toks", suffix.cast("long"))
        .withColumn("kept", kept)
        .drop("_rn", "_first_tok")
    )


def anonymize_speakers(
    df: DataFrame,
    key_col: str = "conv_id",
    speaker_col: str = "speaker",
    order_cols: tuple[str, ...] = ("turn_idx",),
    alias_prefix: str = "speaker_",
) -> DataFrame:
    """Stable per-conversation speaker pseudonyms: the first distinct
    speaker to appear becomes ``speaker_1``, the next ``speaker_2``, …
    — the order a reader encounters them, reproducible at any
    parallelism. NULL speakers get the alias NULL (they are not a
    speaker; content-level PII is operators/redact.py's job).

    Plan: aggregate first-appearance order on the TINY (conv, speaker)
    frame (one shuffle of that frame, map-side combined), rank it with
    row_number per conversation, join back on (conv, speaker) — a
    plain equi-join, so NULL speakers never match (alias NULL). The
    join key includes the conversation, so AQE can pick the strategy;
    the turn frame itself is never windowed.
    """
    firsts = (
        df.filter(F.col(speaker_col).isNotNull())
        .groupBy(F.col(key_col), F.col(speaker_col))
        .agg(F.min(_order_struct(order_cols)).alias("_first_ord"))
    )
    rank_w = Window.partitionBy(key_col).orderBy(
        F.col("_first_ord").asc(), F.col(speaker_col).asc()
    )
    aliases = firsts.select(
        F.col(key_col),
        F.col(speaker_col),
        F.concat(
            F.lit(alias_prefix), F.row_number().over(rank_w).cast("string")
        ).alias("speaker_alias"),
    )
    return df.join(aliases, on=[key_col, speaker_col], how="left")


def flag_boilerplate_turns(
    df: DataFrame,
    key_col: str = "conv_id",
    text_col: str = "text",
    min_convs: int = 3,
) -> DataFrame:
    """Turn-level boilerplate detection — the transcript twin of the
    CCNet line pass (dedup.line_level_dedup): a turn whose normalized
    text (lowercased, whitespace-collapsed, trimmed) appears in at
    least ``min_convs`` DISTINCT conversations is template chrome
    (canned greetings, boilerplate refusals, tool banners), not
    dialogue. Adds ``turn_convs`` (distinct conversations sharing the
    turn text; NULL-text turns get 0) and ``is_boilerplate`` — a flag,
    not a filter (tag-and-continue; filter or mask downstream).

    Scale shape: the frequency frame shuffles 16-byte md5 keys plus
    the conv id — never the turn text — with map-side distinct
    partials; the join back is key-hashed and AQE-planned. Identical
    to the line-pass cost class.
    """
    norm = F.md5(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    )
    freq = (
        df.select(F.col(key_col), norm.alias("_k"))
        .where(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.countDistinct(F.col(key_col)).alias("turn_convs"))
    )
    return (
        df.withColumn("_k", norm)
        .join(freq, "_k", "left")
        .withColumn("turn_convs", F.coalesce(F.col("turn_convs"), F.lit(0)))
        .withColumn("is_boilerplate", F.col("turn_convs") >= min_convs)
        .drop("_k")
    )


def preference_pairs(
    df: DataFrame,
    key_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    score_col: str = "score",
    order_cols: tuple[str, ...] = ("turn_idx",),
    response_role: str = "assistant",
    prompt_role: str = "user",
    min_candidates: int = 2,
) -> DataFrame:
    """Preference-pair (DPO/RLHF reward-modeling) construction: within
    each conversation, rank the ``response_role`` turns by score and
    emit one (prompt, chosen, rejected) row pairing the best-scored
    response against the worst. Conversations with fewer than
    ``min_candidates`` responses, or whose best and worst scores tie,
    produce no pair (a tied pair carries no preference signal).

    The prompt is the first ``prompt_role`` turn in conversation
    order — the standard single-prompt framing; multi-context pairing
    composes upstream via render_chat on the prefix.

    Ties inside the ranking break deterministically on ``order_cols``
    (earliest turn wins the 'chosen' slot, latest the 'rejected') so
    the output is stable across partitionings and engines.

    Output: key, prompt, chosen, rejected, chosen_score,
    rejected_score, margin_micro (floor((chosen-rejected)*1e6) —
    integer, IEEE-exact cross-engine), n_candidates.

    Scale: one hash shuffle on the conversation key; both rank
    windows and the final groupBy reuse that partitioning, and the
    prompt lookup is the same key again (self-joins co-located, AQE
    keeps them shuffle-free after the first Exchange). Shuffle rows
    carry only candidate turns, not whole conversations; a hot
    conversation is one stream (sessions.py argument).
    """
    if min_candidates < 2:
        raise ValueError("min_candidates must be >= 2 (a pair needs two)")
    key, score = F.col(key_col), F.col(score_col)
    asc = _order_asc(order_cols)
    desc = [F.col(c).desc() for c in order_cols]
    cand = df.where(
        (F.col(role_col) == response_role)
        & score.isNotNull()
        & F.col(text_col).isNotNull()
    )
    w_best = Window.partitionBy(key_col).orderBy(score.desc(), *asc)
    w_worst = Window.partitionBy(key_col).orderBy(score.asc(), *desc)
    ranked = cand.select(
        key_col,
        score_col,
        text_col,
        F.row_number().over(w_best).alias("_rb"),
        F.row_number().over(w_worst).alias("_rw"),
    )
    pairs = ranked.groupBy(key_col).agg(
        F.max(F.when(F.col("_rb") == 1, F.col(text_col))).alias("chosen"),
        F.max(F.when(F.col("_rb") == 1, score)).alias("chosen_score"),
        F.max(F.when(F.col("_rw") == 1, F.col(text_col))).alias("rejected"),
        F.max(F.when(F.col("_rw") == 1, score)).alias("rejected_score"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    w_prompt = Window.partitionBy(key_col).orderBy(*asc)
    prompts = (
        df.where(F.col(role_col) == prompt_role)
        .select(key_col, text_col, F.row_number().over(w_prompt).alias("_rn"))
        .where(F.col("_rn") == 1)
        .select(key, F.col(text_col).alias("prompt"))
    )
    return (
        pairs.where(
            (F.col("n_candidates") >= min_candidates)
            & (F.col("chosen_score") > F.col("rejected_score"))
        )
        .join(prompts, key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("prompt"), F.lit("")).alias("prompt"),
            "chosen",
            "rejected",
            "chosen_score",
            "rejected_score",
            F.floor(
                (F.col("chosen_score") - F.col("rejected_score")) * 1e6
            ).cast("long").alias("margin_micro"),
            "n_candidates",
        )
    )


def best_of_n(
    df: DataFrame,
    key_col: str,
    score_col: str,
    tie_col: str,
    n: int = 1,
    rank_col: str = "bon_rank",
) -> DataFrame:
    """Rejection sampling (best-of-n): keep the top ``n`` candidates
    per key by descending score.

    The standard RFT/rejection-sampling data step: a policy emits N
    candidate responses per prompt, a reward signal scores them, and
    only the best survive into the fine-tuning set (Touvron et al.
    2023, Llama 2 §3.2.3). This is the keep step — compose it with
    any integer scorer in this repo (quality_classifier,
    quality_score, surprisal) as the reward.

    Ties are broken deterministically by ``tie_col`` ascending, so the
    same corpus yields the same winners on every run and every cluster
    size (the repo-wide determinism rule). Output keeps every input
    column plus ``rank_col`` (1 = best).

    Scale: one hash shuffle on ``key_col`` and a per-key window sort —
    the group is the candidate set for one prompt (N ≈ 4–64), so no
    skew concern; the window never sees more than N rows per key.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(key_col).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    return ranked.filter(F.col(rank_col) <= n)


def preference_length_stats(
    pairs: DataFrame,
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    margin_col: str = "margin_micro",
) -> DataFrame:
    """Length-bias audit over preference pairs — the standard RLHF
    dataset diagnostic: reward models trained on pairs where the
    longer response systematically wins learn length, not quality
    (the verbosity-bias failure mode), so a curation pipeline checks
    the chosen-longer rate BEFORE training, stratified by preference
    margin (bias concentrated in low-margin pairs is mostly
    annotator tie-breaking; bias at high margins contaminates the
    signal itself).

    Per floor-log2 margin bucket (``length(bin(m)) − 1``, the
    engine-agnostic integer idiom from textstats; margins ≤ 0 —
    sub-micro score gaps floor to 0, and caller-supplied frames may
    carry negatives — land in bucket −1 rather than polluting bucket
    0 or, via two's-complement bin(), masquerading as the
    highest-confidence stratum): pair count,
    chosen-longer / rejected-longer / equal-length counts, and the
    summed char-length difference (chosen − rejected). Lengths are
    CHARACTER counts — the bias shows at any monotone length measure,
    and chars need no tokenizer in the audit loop.

    Scale: one projection over the pairs frame + a groupBy on ≤64
    buckets — nothing corpus-scale shuffles."""
    cl = F.length(F.col(chosen_col))
    rl = F.length(F.col(rejected_col))
    return (
        pairs.select(
            F.expr(
                f"CASE WHEN {margin_col} <= 0 THEN -1 "
                f"ELSE length(bin({margin_col})) - 1 END"
            ).alias("margin_bucket"),
            cl.alias("_cl"),
            rl.alias("_rl"),
        )
        .groupBy("margin_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("_cl") > F.col("_rl")).cast("long")).alias("chosen_longer"),
            F.sum((F.col("_cl") < F.col("_rl")).cast("long")).alias("rejected_longer"),
            F.sum((F.col("_cl") == F.col("_rl")).cast("long")).alias("len_equal"),
            F.sum(F.col("_cl") - F.col("_rl")).cast("long").alias("sum_len_diff"),
        )
    )


# Ordered refusal-marker battery: (tag, lowercase phrase). Order is the
# match priority — a turn matching several phrases is attributed to the
# FIRST battery entry it contains (deterministic, engine-portable).
# Phrases are the standard public refusal-audit markers (the set every
# RLHF curation writeup greps for); callers pass their own battery for
# domain-specific audits.
REFUSAL_MARKERS: tuple[tuple[str, str], ...] = (
    ("apology", "i'm sorry"),
    ("cannot", "i cannot"),
    ("cant", "i can't"),
    ("wont", "i won't"),
    ("unable", "unable to"),
    ("as_an_ai", "as an ai"),
)


def refusal_stats(
    turns: DataFrame,
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    markers: tuple[tuple[str, str], ...] = REFUSAL_MARKERS,
) -> DataFrame:
    """Assistant refusal-rate audit per tool/category — the SFT-corpus
    diagnostic run before training: a tool whose assistant turns are
    mostly refusals teaches the model to refuse that tool, so curation
    pipelines measure per-category refusal rates (and WHICH phrase
    dominates) before mixing.

    Per ``tool_col`` value over assistant turns only: turn count,
    refusal count (first-matching marker from the ordered battery —
    plain lowercase substring containment, no regex, so the test is
    byte-identical on any engine), integer-ppm refusal rate
    (``n_refusals*1e6 div n_assistant`` — exact int division, no
    float), and the dominant marker with its count (ties broken by
    marker tag ascending; NULL/0 when the tool has no refusals).
    NULL text never matches (SQL three-valued logic keeps it out of
    every branch), mirroring libbeat's contains-condition semantics
    (/root/reference/libbeat/conditions/matcher.go).

    Scale shape: ONE events-scale partial-aggregated groupBy down to
    the tiny (tool × marker) frame, then window totals + dominant-
    marker pick over that frame under a single tool-key exchange —
    single-pass so the corpus-scale aggregate is never recomputed
    (the shared-aggregate-subtree-under-join pitfall in CLAUDE.md:
    ReuseExchange does not fire for a totals ⋈ top split)."""
    low = F.lower(F.col(text_col))
    marker: Column = F.lit(None).cast("string")
    for tag, phrase in reversed(markers):
        marker = F.when(F.locate(phrase, low) > 0, F.lit(tag)).otherwise(marker)
    per = (
        turns.where(F.col(role_col) == "assistant")
        .select(F.col(tool_col).alias("tool"), marker.alias("marker"))
        .groupBy("tool", "marker")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    is_ref = F.col("marker").isNotNull()
    w_tool = Window.partitionBy("tool")
    # refusal rows rank first (best n, then tag); a tool with no
    # refusals surfaces its NULL-marker row at rn=1 instead
    w_ord = Window.partitionBy("tool").orderBy(
        F.asc(~is_ref), F.desc("n"), F.asc("marker")
    )
    return (
        per.withColumn("n_assistant", F.sum("n").over(w_tool).cast("long"))
        .withColumn(
            "n_refusals",
            F.sum(F.when(is_ref, F.col("n")).otherwise(0)).over(w_tool).cast("long"),
        )
        .withColumn("rn", F.row_number().over(w_ord))
        .where(F.col("rn") == 1)
        .select(
            "tool",
            "n_assistant",
            "n_refusals",
            F.expr("CAST(n_refusals * 1000000 DIV n_assistant AS BIGINT)").alias(
                "refusal_ppm"
            ),
            F.when(is_ref, F.col("marker")).alias("top_marker"),
            F.when(is_ref, F.col("n")).otherwise(0).cast("long").alias(
                "top_marker_n"
            ),
        )
    )


def linearize_threads(
    df: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "turn_id",
    parent_col: str = "parent_id",
    tok_col: str = "tok",
    sep: str = ">",
    max_rounds: int = 48,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Branched-transcript linearization: multi-branch conversations
    (regenerated answers, tool retries, tree-of-thought sampling)
    store turns as (id, parent) forests; an SFT corpus needs
    root-to-leaf PATHS. Emits one row per LEAF turn — ``conv_col``,
    ``id_col`` (the leaf), ``depth`` (turns on the path), ``path``
    (``sep``-joined ``tok_col`` values root→leaf), ``orphaned``
    (true when the chain hits a dangling parent pointer — the turn
    row lost to a crash-truncated log; the partial path is kept and
    tagged, never dropped: tag-and-continue, libbeat semantics).

    Spark-first scale shape — POINTER DOUBLING (parallel list
    ranking), not per-level descent: the state row of every turn
    starts as (ptr=parent, path=own tok, depth=1) and each round
    jumps through the pointed-to node's CURRENT pointer, prepending
    its accumulated prefix. After r rounds a path covers 2^r
    ancestors, so a depth-D forest finishes in ceil(log2 D)
    self-joins — 7 rounds for 100-turn threads, 14 for 10k-turn ones
    — where naive recursion (the DuckDB oracle's recursive CTE) runs
    D sequential passes. Each round is one (conv, id)-keyed shuffle
    of id/ptr/path state rows; convergence (no live pointers) is read
    off the SAME action that materializes the round's persist, the
    connected_components discipline, and lineage is truncated with a
    localCheckpoint every ``checkpoint_every`` rounds. Path bytes
    grow toward the rendered-conversation size — the same order a
    transcript pipeline shuffles anyway; keep ``tok_col`` a turn KEY
    (role / type tag), not the full text, and join text back by leaf
    id downstream if needed.
    """
    conv, tid = F.col(conv_col), F.col(id_col)
    state = df.select(
        conv.alias("_conv"),
        tid.alias("_id"),
        F.col(parent_col).alias("_ptr"),
        F.col(tok_col).cast("string").alias("_path"),
        F.lit(1).cast("long").alias("_depth"),
        F.lit(False).alias("_orphaned"),
    ).persist()
    live, n_total = state.agg(
        F.sum(F.col("_ptr").isNotNull().cast("long")),
        F.count(F.lit(1)),
    ).first()
    rounds = 0
    while live:
        rounds += 1
        if rounds > max_rounds:
            raise ValueError(
                f"linearize_threads: depth exceeds 2^{max_rounds} after "
                f"{max_rounds} doubling rounds — cyclic parent pointers?"
            )
        a, b = state.alias("a"), state.alias("b")
        nxt = (
            a.join(
                b,
                (F.col("a._conv") == F.col("b._conv"))
                & (F.col("a._ptr") == F.col("b._id")),
                "left",
            )
            .select(
                F.col("a._conv").alias("_conv"),
                F.col("a._id").alias("_id"),
                F.col("b._ptr").alias("_ptr"),
                F.when(
                    F.col("b._id").isNotNull(),
                    F.concat(
                        F.col("b._path"), F.lit(sep), F.col("a._path")
                    ),
                )
                .otherwise(F.col("a._path"))
                .alias("_path"),
                (
                    F.col("a._depth") + F.coalesce(F.col("b._depth"), F.lit(0))
                ).alias("_depth"),
                (
                    F.col("a._orphaned")
                    | F.coalesce(F.col("b._orphaned"), F.lit(False))
                    # live pointer with no matching node: dangling edge
                    | (F.col("a._ptr").isNotNull() & F.col("b._id").isNull())
                ).alias("_orphaned"),
            )
        )
        if rounds % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=False)
        nxt = nxt.persist()
        live, max_depth = nxt.agg(
            F.sum(F.col("_ptr").isNotNull().cast("long")),
            F.max("_depth"),
        ).first()
        state.unpersist()
        state = nxt
        # an acyclic path can never hold more turns than the input
        # has rows; a cycle doubles path bytes every round — fail
        # fast before the strings outgrow the executors
        if max_depth is not None and max_depth > n_total:
            raise ValueError(
                "linearize_threads: path depth exceeds the input row "
                "count — cyclic parent pointers"
            )
    # leaves: turns no other turn points at (per conversation)
    children = df.where(F.col(parent_col).isNotNull()).select(
        conv.alias("_conv"), F.col(parent_col).alias("_id")
    )
    out = state.join(children, ["_conv", "_id"], "left_anti").select(
        F.col("_conv").alias(conv_col),
        F.col("_id").alias(id_col),
        F.col("_depth").alias("depth"),
        F.col("_path").alias("path"),
        F.col("_orphaned").alias("orphaned"),
    )
    return out


def prefix_cache_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    id_col: str = "turn_id",
    tok_col: str = "tok",
    depths: tuple[int, ...] = (1, 2, 4, 8),
    sep: str = ">",
) -> DataFrame:
    """Cross-conversation shared-prefix profile — the KV-cache /
    system-prompt dedup economics of a transcript corpus: at each
    probe depth k, how many conversations share their first k turn
    tokens with another conversation, and how many prefix turns a
    prefix cache (or a dedup-at-pack pass) would save. Serving
    stacks (vLLM automatic prefix caching, SGLang RadixAttention)
    monetize exactly this statistic; corpora dominated by one
    system-prompt opening show near-total sharing at small k.

    Per depth k (only conversations with ≥ k turns participate):
    ``n_convs``, ``n_prefixes`` (distinct k-prefixes),
    ``n_shared_convs`` (convs whose k-prefix occurs >1 time),
    ``turns_saved`` (Σ over prefix groups of (count−1)·k — the turn
    instances a per-depth cache would not recompute; depths overlap
    by construction, so rows are per-k profiles, not addable).

    Scale shape: ONE conv-key shuffle builds the ordered token array
    (sort_array(collect_list) — map-side combined partials), every
    probe depth is sliced from that SAME array in one projection
    (array carries ≤ max(depths) short tokens after the slice), and
    one (k, prefix)-key shuffle of prefix strings feeds the final
    ≤ |depths|-row rollup — 3 shuffles TOTAL regardless of how many
    depths are probed, never one pass per depth (the many-tiny-
    shuffles trap, CLAUDE.md).
    """
    ks = sorted(set(int(k) for k in depths))
    if not ks or ks[0] < 1:
        raise ValueError(f"bad depths: {depths!r}")
    ordered = (
        df.select(
            F.col(conv_col).alias("_conv"),
            F.struct(
                F.col(ts_col).alias("o1"),
                F.col(id_col).alias("o2"),
                F.col(tok_col).cast("string").alias("tok"),
            ).alias("_s"),
        )
        .groupBy("_conv")
        .agg(
            F.transform(
                F.slice(F.sort_array(F.collect_list("_s")), 1, ks[-1]),
                lambda s: s["tok"],
            ).alias("_toks"),
            F.count(F.lit(1)).alias("_n_turns"),
        )
    )
    probes = ordered.select(
        "_conv",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("long").alias("k"),
                            F.when(
                                F.col("_n_turns") >= k,
                                F.concat_ws(
                                    sep, F.slice(F.col("_toks"), 1, k)
                                ),
                            ).alias("prefix"),
                        )
                        for k in ks
                    ]
                ),
                lambda x: x["prefix"].isNotNull(),
            )
        ).alias("_p"),
    ).select("_conv", F.col("_p.k").alias("k"), F.col("_p.prefix").alias("prefix"))
    groups = probes.groupBy("k", "prefix").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return (
        groups.groupBy("k")
        .agg(
            F.sum("_cnt").cast("long").alias("n_convs"),
            F.count(F.lit(1)).cast("long").alias("n_prefixes"),
            F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt")).otherwise(0))
            .cast("long")
            .alias("n_shared_convs"),
            F.sum((F.col("_cnt") - 1) * F.col("k"))
            .cast("long")
            .alias("turns_saved"),
        )
    )


def context_overflow_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    tok_col: str = "n_toks",
    budgets: tuple[int, ...] = (2048, 4096, 8192),
) -> DataFrame:
    """Context-budget overflow report — what each candidate context
    length costs in truncated data: per budget, how many
    conversations exceed it, and how many turn tokens fall outside
    (the amount truncate_context would cut corpus-wide). The
    capacity-planning complement to padding_stats: padding measures
    waste BELOW the budget, this measures loss ABOVE it.

    Emits per budget: ``budget``, ``n_convs``, ``n_over``,
    ``over_ppm``, ``tokens_total``, ``tokens_lost`` (Σ max(len −
    budget, 0) — CASE, not greatest: a NULL conv length must stay
    NULL, CLAUDE.md), ``loss_ppm``.

    Scale shape: ONE conv-key aggregate reduces the corpus to a
    per-conversation token total; all budgets ride a single explode
    over that reduced frame (|budgets|× a per-CONV frame — never the
    turns) into one ≤|budgets|-row rollup.
    """
    bs = sorted(set(int(b) for b in budgets))
    if not bs or bs[0] <= 0:
        raise ValueError(f"bad budgets: {budgets!r}")
    per_conv = df.groupBy(conv_col).agg(
        F.sum(F.col(tok_col).cast("long")).alias("_len")
    )
    probes = per_conv.select(
        "_len",
        F.explode(F.array(*[F.lit(b).cast("long") for b in bs])).alias(
            "budget"
        ),
    )
    g = probes.groupBy("budget").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum((F.col("_len") > F.col("budget")).cast("long"))
        .cast("long")
        .alias("n_over"),
        F.sum("_len").cast("long").alias("tokens_total"),
        F.sum(
            F.when(
                F.col("_len") > F.col("budget"),
                F.col("_len") - F.col("budget"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("tokens_lost"),
    )
    return g.select(
        "budget",
        "n_convs",
        "n_over",
        F.expr(
            "cast(n_over * 1000000 div "
            "(case when n_convs >= 1 then n_convs else 1 end) as long)"
        ).alias("over_ppm"),
        "tokens_total",
        "tokens_lost",
        F.expr(
            "cast(tokens_lost * 1000000 div "
            "(case when tokens_total >= 1 then tokens_total else 1 end)"
            " as long)"
        ).alias("loss_ppm"),
    )
