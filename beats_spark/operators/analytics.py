"""Event-stream analytics the observability stack downstream of a
Beats pipeline runs over routed events (the Kibana/Watcher question
set): ordered funnel conversion and cohort retention.

The reference ships events; these answer what the shipped events are
FOR. Both operators are pure DataFrame aggregations — conditional
min/count rollups keyed on the user — and both are engine-portable by
construction (microsecond integer timestamps, floor divisions, ppm
ratios as integers) so DuckDB oracles replay them exactly.

Reference anchor: libbeat delivers per-event documents whose analytic
contract is "counts and aggregates downstream match" (libbeat/
publisher/pipeline tests); the funnel/retention shapes are the
canonical downstream aggregates (Kleppmann, DDIA ch. 10 batch views).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400 * 1_000_000


def _epoch_us(ts: Column) -> Column:
    """Epoch microseconds as int64. Parquet event timestamps arrive
    TIMESTAMP_NTZ, which unix_micros refuses; the cast to TIMESTAMP
    interprets the naive value in the session zone — get_spark pins
    UTC, which is exactly how DuckDB's epoch_us reads a naive
    TIMESTAMP, so both engines see identical integers. try_cast, not
    cast: a string ts column with one malformed value must yield a
    NULL that flows into the existing NULL-min / NULL-filter handling
    instead of an ANSI crash (tag-and-continue, CLAUDE.md)."""
    return F.unix_micros(ts.try_cast("timestamp"))


def event_funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion: for each step k, how many users
    performed step 1, then step 2 at-or-after it, …, then step k
    at-or-after step k-1 (first-occurrence semantics: each step's
    timestamp is the user's EARLIEST such event, the standard
    open-funnel definition).

    Emits one row per step: ``step_idx`` (1-based), ``step``,
    ``n_users``, and ``conv_ppm`` = floor(n_users·10⁶ / step-1 users)
    (1_000_000 for the first step; 0-user funnels emit 0).

    Plan: ONE groupBy(user) computing a conditional min-timestamp per
    step (map-side combined, |steps| longs per user shuffled), then a
    single global rollup of the boolean reach flags — the per-user
    frame never leaves the executors except as |steps| counters per
    partition. At 10^12 events this is the cheapest shape that exists:
    the only wide exchange is keyed on user_id (hash-uniform) and
    carries |steps|·8 bytes per user.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    us = _epoch_us(F.col(ts_col))
    mins = [
        F.min(
            F.when(F.col(type_col) == s, us)
        ).alias(f"_t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(user_col).agg(*mins)
    # reached_k: every step 1..k present and ordered (ties allowed:
    # a click logged the same microsecond as the view still counts)
    reach_flags = []
    cond = None
    for i in range(len(steps)):
        this = F.col(f"_t{i}").isNotNull()
        if i > 0:
            this = this & (F.col(f"_t{i}") >= F.col(f"_t{i - 1}"))
        cond = this if cond is None else (cond & this)
        reach_flags.append(
            F.sum(cond.cast("long")).alias(f"_n{i}")
        )
    totals = per_user.agg(*reach_flags)
    rows = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.coalesce(F.col(f"_n{i}"), F.lit(0)).alias("n_users"),
                        F.coalesce(F.col("_n0"), F.lit(0)).alias("_base"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "step_idx",
        "step",
        "n_users",
        F.expr("n_users * 1000000 div greatest(_base, 1)").alias("conv_ppm"),
    )


def retention_cohorts(
    df: DataFrame,
    anchor_type: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    period_days: int = 7,
    max_periods: int = 4,
) -> DataFrame:
    """Cohort retention: users are cohorted by the week (or any
    ``period_days`` bucket) of their FIRST ``anchor_type`` event;
    for each cohort and period k ∈ [0, max_periods], count users with
    ANY event in [anchor + k·period, anchor + (k+1)·period).

    Emits (cohort_idx, period, n_active, retention_ppm): cohort_idx =
    floor(first-anchor epoch-µs / period-µs) — an integer bucket, not
    a calendar week, so Spark and any oracle agree without ISO-week
    semantics; retention_ppm = floor(n_active·10⁶ / cohort period-0
    count). Events BEFORE the user's anchor never count (pre-signup
    activity is not retention); period-0 is ≥ the anchor event itself
    so it is always non-zero for a non-empty cohort.

    Plan: groupBy(user) conditional-min for the anchor (one shuffle,
    8 bytes/user) → equi-join back on user (AQE decides broadcast vs
    shuffle by the user-frame size) → distinct (cohort, period, user)
    → count (second keyed shuffle) → the tiny (cohort × period) frame
    self-joins its own period-0 row for the ratio. Per-event state is
    one long; nothing text-sized ever shuffles.
    """
    if period_days <= 0 or max_periods < 0:
        raise ValueError("period_days must be > 0 and max_periods >= 0")
    p_us = period_days * _US_PER_DAY
    us = _epoch_us(F.col(ts_col))
    anchors = (
        df.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.min(us).alias("_anchor_us"))
    )
    ev = df.select(F.col(user_col), us.alias("_ev_us")).join(
        anchors, user_col
    )
    # pre-anchor events are excluded BEFORE the division: pre-signup
    # activity is not retention, and a negative (_ev_us - _anchor_us)
    # would otherwise truncate into period 0 alongside genuine
    # first-period activity (both Spark `div` and DuckDB `//`
    # truncate toward zero on integers — verified, the engines agree;
    # the filter is semantic, not a parity patch).
    # NULL ts → NULL comparison → row dropped (tag-and-exclude).
    staged = (
        ev.filter(F.col("_ev_us") >= F.col("_anchor_us"))
        .select(
            F.col(user_col),
            F.expr(f"_anchor_us div {p_us}").alias("cohort_idx"),
            F.expr(f"(_ev_us - _anchor_us) div {p_us}").alias("period"),
        )
        .filter(F.col("period") <= max_periods)
    )
    # persisted: both the output and the period-0 ratio side consume
    # this aggregate, and ReuseExchange does NOT fire for shared
    # aggregate subtrees under joins (CLAUDE.md) — without the cache
    # the whole events→anchors join + distinct would execute twice.
    # The frame is ≤ cohorts × periods rows, trivially cacheable.
    active = (
        staged.dropDuplicates(["cohort_idx", "period", user_col])
        .groupBy("cohort_idx", "period")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .persist()
    )
    # the period-0 frame is bounded by the number of cohorts (weeks
    # since launch) — provably tiny, so the explicit broadcast is safe
    # here, unlike unbounded candidate sets (CLAUDE.md)
    base = F.broadcast(
        active.filter(F.col("period") == 0).select(
            F.col("cohort_idx"), F.col("n_active").alias("_n0")
        )
    )
    return active.join(base, "cohort_idx").select(
        "cohort_idx",
        "period",
        "n_active",
        F.expr("n_active * 1000000 div greatest(_n0, 1)").alias(
            "retention_ppm"
        ),
    )


def turn_latency(
    df: DataFrame,
    key_col: str = "user_id",
    role_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Turn-gap latency per role transition: for every consecutive
    turn pair within a key (conversation / user stream), the gap in
    integer milliseconds, rolled up by the (prev_role → role)
    transition — the agent-latency profile of a transcripts pipeline
    (how long the assistant takes after a user turn; how long a tool
    round-trips) and the inter-arrival profile of a log stream.

    Emits per transition: ``prev_role``, ``role``, ``n_gaps``,
    ``sum_gap_ms``, ``max_gap_ms``, ``mean_gap_ms`` (floor integer).

    Determinism: the window orders by (epoch-µs, ``id_col``) — a bare
    ts ordering makes lag() tie-order-dependent and the whole result
    parallelism-dependent (§2.9 stable-ordering discipline). Rows
    whose timestamp fails to parse are excluded before the window
    (tag-and-exclude; the oracle applies the same filter).

    Scale: one hash shuffle on the key for the window sort (a
    conversation's turns — tens to thousands of rows — sort within
    their partition; no global sort), then a groupBy on the tiny
    transition key with full map-side combine. Window-skew exposure
    is bounded by the longest single conversation, not the corpus.
    """
    us = _epoch_us(F.col(ts_col))
    from pyspark.sql.window import Window

    staged = df.select(
        F.col(key_col).alias("_k"),
        F.col(role_col).alias("role"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
    ).filter(F.col("_us").isNotNull())
    w = Window.partitionBy("_k").orderBy("_us", "_id")
    gaps = (
        staged.select(
            F.lag("role").over(w).alias("prev_role"),
            "role",
            (F.col("_us") - F.lag("_us").over(w)).alias("_gap_us"),
        )
        .filter(F.col("prev_role").isNotNull())
        # pure integer division — gaps are non-negative by the window
        # ordering, so trunc == floor on both engines
        .select("prev_role", "role", F.expr("_gap_us div 1000").alias("gap_ms"))
    )
    return rollup_turn_gaps(gaps)


def rollup_turn_gaps(gaps: DataFrame) -> DataFrame:
    """Transition rollup over a (prev_role, role, gap_ms) frame — the
    verdict half of :func:`turn_latency`, factored out so the
    STREAMING gap extractor (streaming.pipeline.stream_turn_gaps)
    feeds the identical batch code (the batch/stream-identical-code
    discipline the curation tail and rate_anomaly follow)."""
    agg = gaps.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_ms").alias("sum_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
    )
    return agg.select(
        "prev_role",
        "role",
        "n_gaps",
        "sum_gap_ms",
        "max_gap_ms",
        F.expr("sum_gap_ms div greatest(n_gaps, 1)").alias("mean_gap_ms"),
    )


def heavy_hitters(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 3,
) -> DataFrame:
    """Exact per-group heavy hitters: the ``k`` most frequent values
    of ``value_col`` within each ``group_col``, with count, dense
    1-based rank (ties broken by value, deterministic on any engine
    and any parallelism), and integer-ppm share of the group's rows —
    the "which users dominate the error stream" rollup.

    NULL values are excluded before counting: Spark sorts NULLS FIRST
    under asc while DuckDB sorts them LAST, so a NULL inside the
    tie-break would make the rank engine-dependent (and a NULL heavy
    hitter answers no operational question anyway).

    Scale: one groupBy(group, value) with full map-side combine — the
    only shuffle over the raw events, keyed on the pair so hot groups
    still spread across reducers — then rank/total windows over the
    AGGREGATED frame, whose size is the distinct pair count, not the
    event count. Exact, not sketched: at 10^12 events the aggregate is
    |groups|·|values| rows; when value cardinality itself is too large
    for that, cap it upstream or accept a sketch — this operator's
    contract is exactness.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql.window import Window

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    wr = Window.partitionBy(group_col).orderBy(
        F.desc("n_events"), F.asc(value_col)
    )
    wt = Window.partitionBy(group_col)
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .withColumn("_total", F.sum("n_events").over(wt))
        .filter(F.col("rank") <= k)
        .select(
            F.col(group_col),
            F.col("rank"),
            F.col(value_col),
            F.col("n_events"),
            F.expr("n_events * 1000000 div greatest(_total, 1)").alias(
                "share_ppm"
            ),
        )
    )


def near_dup_turns(
    df: DataFrame,
    key_col: str = "user_id",
    role_col: str = "event_type",
    text_col: str = "props",
    ts_col: str = "ts",
    id_col: str = "event_id",
    cap: int = 64,
    threshold: int = 2,
) -> DataFrame:
    """Retry-loop detection: consecutive SAME-role turns within a
    conversation whose payloads are near-identical under edit
    distance — the "assistant repeating itself" / "client re-sending
    the same request" signal a transcripts pipeline filters on before
    training (near-verbatim retries add no information and skew the
    role mix).

    Per role: ``n_pairs`` (consecutive same-role pairs with both
    payloads present), ``n_near`` (edit distance ≤ ``threshold``),
    ``near_ppm`` (integer), ``sum_dist``/``max_dist``.

    Levenshtein is O(len²) per pair, so payloads are CAPPED to their
    first ``cap`` characters before comparison — at 100 TB an
    uncapped distance over 100 KB turns is a compute bomb, and a
    64-char prefix decides "near-identical retry" just as well
    (two texts equal for 64 chars then diverging are not retries the
    threshold would catch anyway, and the cap is part of the
    operator's contract, mirrored by the oracle). Non-ASCII
    codepoints are then PROJECTED to ``?`` on both engines: Spark's
    levenshtein counts codepoints while DuckDB's counts BYTES, so
    any multibyte character would silently diverge the oracle
    (levenshtein('café','cafe') = 1 vs 2); under the projection both
    engines see the same ASCII string, and a retry whose payloads
    differ only in WHICH non-ASCII char they contain still scores
    near-identical — acceptable for a retry detector, documented as
    contract.

    Determinism: the window orders by (epoch-µs, id) — §2.9 stable
    ordering. Pairs with either payload NULL are excluded
    (tag-and-exclude; levenshtein(NULL, x) is no distance).

    Plan: ONE hash shuffle on the conversation key for the window,
    then a groupBy on the tiny role key with full map-side combine —
    identical shape to turn_latency; skew bounded by the longest
    single conversation.
    """
    from pyspark.sql.window import Window

    us = _epoch_us(F.col(ts_col))
    staged = df.select(
        F.col(key_col).alias("_k"),
        F.col(role_col).alias("role"),
        F.col(id_col).alias("_id"),
        F.regexp_replace(
            F.substring(F.col(text_col), 1, cap), "[^\\x00-\\x7F]", "?"
        ).alias("_txt"),
        us.alias("_us"),
    ).filter(F.col("_us").isNotNull())
    w = Window.partitionBy("_k").orderBy("_us", "_id")
    pairs = (
        staged.select(
            "role",
            F.lag("role").over(w).alias("_prev_role"),
            F.lag("_txt").over(w).alias("_prev_txt"),
            "_txt",
        )
        .filter(
            (F.col("_prev_role") == F.col("role"))
            & F.col("_txt").isNotNull()
            & F.col("_prev_txt").isNotNull()
        )
        .select("role", F.levenshtein("_txt", "_prev_txt").alias("_d"))
    )
    agg = pairs.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("_d") <= threshold).cast("long")).alias("n_near"),
        F.sum("_d").alias("sum_dist"),
        F.max("_d").alias("max_dist"),
    )
    return agg.select(
        "role",
        "n_pairs",
        "n_near",
        F.expr("n_near * 1000000 div greatest(n_pairs, 1)").alias(
            "near_ppm"
        ),
        "sum_dist",
        "max_dist",
    )


def group_percentiles(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """EXACT per-group percentiles by nearest-rank SELECTION (not
    interpolation): for each group, sort the values and pick the
    element at 1-based index ``(n-1)·p div 100 + 1`` — the latency-
    percentile rollup (p50/p90/p99 per event type / tool / sink).

    Selection, not arithmetic: the emitted double is an element OF
    the data, bit-identical on any engine — the only way a float
    percentile passes the value-hash oracle discipline (interpolated
    quantiles and approx sketches are both engine-ordered). Ties in
    the value sort are broken by ``id_col`` so the selected element
    is deterministic at any parallelism (§2.9). NULL and NaN values
    are excluded first (NaN sorts last-greatest on both engines but
    poisons nothing if simply removed).

    Plan: one hash shuffle on the group for the window sort (same
    Exchange serves row_number and the partition count), then a
    groupBy(group) with conditional-max picks — no second pass over
    the raw frame. Exactness costs a per-group sort; at 10^12 rows
    per group prefer an approx sketch upstream, but THIS operator's
    contract is exact (heavy_hitters discipline).
    """
    from pyspark.sql.window import Window

    for p in percentiles:
        if not 0 <= p <= 100:
            raise ValueError(f"percentile out of range: {p}")
    staged = df.select(
        F.col(group_col),
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
    ).filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
    wo = Window.partitionBy(group_col).orderBy("_v", "_id")
    wp = Window.partitionBy(group_col)
    ranked = staged.select(
        F.col(group_col),
        "_v",
        F.row_number().over(wo).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n"),
    )
    picks = [
        F.max(
            F.when(
                F.col("_rn") == F.expr(f"(_n - 1) * {p} div 100 + 1"),
                F.col("_v"),
            )
        ).alias(f"p{p}")
        for p in percentiles
    ]
    return ranked.groupBy(group_col).agg(
        F.max("_n").alias("n_values"), *picks
    )


def active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    windows_days: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """Rolling distinct-actor counts (DAU/WAU/MAU shape): for every
    day PRESENT in the data and every window w, the number of
    distinct users with ≥1 event in the trailing w-day window
    [day-w+1, day]. Days are integer epoch-day buckets (µs floor
    division — no calendar semantics).

    Emits (window_days, day, n_active) long-format — one row per
    (window, day).

    Plan — distinct-first, THEN explode: the events reduce to the
    distinct (day, user) frame in one map-side-combined shuffle
    (the only pass over the raw data); each reduced row then fans
    out to its (window, observation-day) contributions in a SINGLE
    explode covering every window at once — Σw entries per row — so
    the whole multi-window answer is one distinct + one groupBy over
    the already-tiny frame, not a per-window branch (many small
    stages cost more than the work on a busy cluster). The naive
    per-day self-join over raw events would be w full scans. At
    10^12 events the reduced frame is |users|·|days| rows — bounded
    by actors, not traffic.
    """
    ws = sorted(set(int(w) for w in windows_days))
    if not ws or ws[0] < 1:
        raise ValueError(f"windows_days must be positive: {windows_days}")
    us = _epoch_us(F.col(ts_col))
    du = (
        df.select(
            F.col(user_col).alias("_u"), us.alias("_us")
        )
        .filter(F.col("_us").isNotNull() & F.col("_u").isNotNull())
        .withColumn("_day", F.expr(f"_us div {_US_PER_DAY}"))
        .select("_day", "_u")
        .distinct()
        .persist()
    )
    present = du.select(F.col("_day").alias("day")).distinct()
    contrib = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(w).alias("window_days"),
                    (F.col("_day") + F.lit(d)).alias("day"),
                )
                for w in ws
                for d in range(w)
            ]
        )
    )
    return (
        du.select(contrib.alias("_c"), "_u")
        .select("_c.window_days", "_c.day", "_u")
        .distinct()
        .groupBy("window_days", "day")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(present, "day")
        .select("window_days", "day", "n_active")
    )


def disorder_stats(
    df: DataFrame,
    key_col: str = "user_id",
    role_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Event-time disorder profile — the measurement that SIZES a
    streaming watermark: per role, how many rows arrive with an event
    time EARLIER than something already seen on their stream (arrival
    order = ``id_col``), and by how much. A watermark shorter than
    the observed ``max_late_ms`` drops rows;
    ``withWatermark(max_late_ms + margin)`` is the defensible
    setting, and ``late_ppm`` says what a tighter one would cost.

    Per role: ``n_events``, ``n_late`` (event time < running max of
    its stream's earlier arrivals), ``late_ppm``, ``max_late_ms``,
    ``sum_late_ms`` (integer ms, floor).

    Rows with unparseable timestamps or NULL ids are excluded
    (tag-and-exclude; an id-less row has no arrival position).

    Plan: one hash shuffle on the stream key for the running-max
    window (exclusive frame: unbounded preceding → 1 preceding), then
    the tiny role-keyed rollup with full map-side combine — the
    turn_latency shape exactly; skew bounded by the longest stream.
    """
    from pyspark.sql.window import Window

    us = _epoch_us(F.col(ts_col))
    staged = df.select(
        F.col(key_col).alias("_k"),
        F.col(role_col).alias("role"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
    ).filter(F.col("_us").isNotNull() & F.col("_id").isNotNull())
    # ties on id_col (double-ingested rows) are broken by event time
    # so the exclusive frame's content — and therefore n_late — is
    # deterministic at any parallelism and on any engine (the
    # stable_order uniqueness discipline, enforced instead of assumed)
    w = (
        Window.partitionBy("_k")
        .orderBy("_id", "_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = staged.select(
        "role",
        "_us",
        F.max("_us").over(w).alias("_prev_max"),
    ).select(
        "role",
        F.when(
            F.col("_us") < F.col("_prev_max"),
            F.col("_prev_max") - F.col("_us"),
        )
        .otherwise(F.lit(0))
        .alias("_late_us"),
    )
    agg = flagged.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("_late_us") > 0).cast("long")).alias("n_late"),
        F.max(F.expr("_late_us div 1000")).alias("max_late_ms"),
        F.sum(F.expr("_late_us div 1000")).alias("sum_late_ms"),
    )
    return agg.select(
        "role",
        "n_events",
        "n_late",
        F.expr("n_late * 1000000 div greatest(n_events, 1)").alias(
            "late_ppm"
        ),
        "max_late_ms",
        "sum_late_ms",
    )


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_items_per_group: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Market-basket pair mining: which items co-occur within a
    group — which tools fire in the same conversation, which event
    types share a user. Classic distributed co-occurrence (the
    Apriori pair-counting stage): per-group DISTINCT item sets, then
    each unordered pair emitted once (sorted-array construction, so
    ``item_a < item_b`` by build), counted across groups with an
    integer ppm support against the group universe.

    Returns ``(item_a, item_b, n_groups, support_ppm, rank)`` —
    rank by count desc then pair text asc (deterministic).
    ``support_ppm = n_groups(pair)·10⁶ div n_groups(total)`` —
    integer division, oracle-exact. NULL items are excluded; NULL
    GROUP keys are excluded too (Spark's groupBy would merge every
    orphan row into one fabricated basket, while SQL equi-joins and
    count(DISTINCT) drop NULLs — exclusion is both the honest
    semantics and the only engine-portable one); groups with only
    NULL items leave the universe entirely.

    Scale shape: ONE events-scale shuffle — ``collect_set`` with
    map-side partial aggregation dedups and gathers each group's
    item set in the same pass (no separate distinct). Pair
    generation is a JVM-side array transform over the sorted set
    (no self-join, no second data shuffle); groups wider than
    ``max_items_per_group`` are EXCLUDED before it runs (the
    standard basket cap — wide groups are catalogs, not baskets,
    and one 10⁵-item group would emit 5·10⁹ pairs). The cap is part
    of the operator contract, mirrored by the oracle; note wide
    groups still pay their collect_set buffer before the filter —
    the cap bounds pair blowup, not ingest memory. Pair counts
    aggregate on vocabulary-bounded keys, and the global rank
    window runs on that pair frame only (single-partition by
    design, like vocab_top_k's rank).
    """
    from pyspark.sql.window import Window

    if max_items_per_group < 2:
        raise ValueError(
            f"max_items_per_group must be >= 2, got {max_items_per_group}"
        )
    grouped = (
        df.filter(
            F.col(item_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("_g"))
        .agg(F.collect_set(F.col(item_col)).alias("_s"))
        .persist()  # feeds the universe count AND the pair explode
    )
    totals = grouped.agg(F.count(F.lit(1)).alias("_n_total"))
    pairs = (
        grouped.where(F.size("_s") <= max_items_per_group)
        .withColumn("_ss", F.array_sort("_s"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(_ss, (x, i) -> "
                    "transform(slice(_ss, i + 2, size(_ss)), "
                    "y -> struct(x AS item_a, y AS item_b))))"
                )
            ).alias("_p")
        )
        .select("_p.item_a", "_p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .where(F.col("n_groups") >= min_count)
    )
    w = Window.orderBy(
        F.desc("n_groups"), F.asc("item_a"), F.asc("item_b")
    )
    return (
        pairs.crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            F.col("n_groups").cast("long").alias("n_groups"),
            F.expr("n_groups * 1000000 div greatest(_n_total, 1)").alias(
                "support_ppm"
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def tool_loops(
    df: DataFrame,
    key_col: str = "conv_id",
    tool_col: str = "tool",
    order_cols: tuple[str, ...] = ("turn_idx",),
    min_repeats: int = 3,
) -> DataFrame:
    """Stuck-agent detection over transcripts: per conversation, the
    longest run of CONSECUTIVE identical tool calls and how many runs
    reach ``min_repeats`` — the "agent is retrying the same tool in a
    loop" signal an agent-transcript curation pipeline gates on
    before training (looping trajectories teach looping; the
    transcript twin of textstats' intra-doc repetition rules).

    Output per conversation: ``n_turns`` (non-NULL tool turns),
    ``max_run`` (longest run length), ``run_tool`` (its tool —
    earliest run wins ties, deterministically), ``n_loops`` (runs
    with length ≥ min_repeats). NULL tools are excluded (no call, no
    loop); a conversation whose every tool is NULL emits nothing.

    Run-length encoding is the CLAUDE.md two-pass window idiom
    (windows can't nest): materialize the boundary flag via lag, THEN
    the running sum over the same window — one shuffle on the
    conversation key; the run/conversation rollups that follow are
    conv-granularity frames. A hot conversation is inherently one
    stream (sessions.py argument).
    """
    if min_repeats < 2:
        raise ValueError("min_repeats must be >= 2 (one call is not a loop)")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    t = df.where(F.col(tool_col).isNotNull()).select(
        key_col, tool_col, *order_cols
    )
    flagged = t.withColumn(
        "_new_run",
        F.when(
            F.lag(tool_col).over(w).isNull()
            | (F.lag(tool_col).over(w) != F.col(tool_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = (
        flagged.withColumn("_run_id", F.sum("_new_run").over(w))
        .groupBy(key_col, "_run_id", tool_col)
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    # ties on run length break to the EARLIEST run — run_id is the
    # run's ordinal within the conversation, so it IS the start order
    # (monotone by construction), engine-portable with no struct min
    w_best = Window.partitionBy(key_col).orderBy(
        F.col("_len").desc(), F.col("_run_id").asc()
    )
    return (
        runs.withColumn("_rn", F.row_number().over(w_best))
        .groupBy(key_col)
        .agg(
            F.sum("_len").alias("n_turns"),
            F.max(F.when(F.col("_rn") == 1, F.col("_len"))).alias("max_run"),
            F.max(F.when(F.col("_rn") == 1, F.col(tool_col))).alias("run_tool"),
            F.sum((F.col("_len") >= min_repeats).cast("long")).alias("n_loops"),
        )
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    start_token: str = "_start_",
) -> DataFrame:
    """First-order Markov transition profile over per-key event
    sequences: for every (prev_type → type) pair, the transition
    count and its integer-milli probability among transitions OUT of
    prev_type. The first event of each key transitions from
    ``start_token``, so the initial-state distribution rides in the
    same frame — together they are the behavioral signature a
    transcript pipeline uses for agent-loop drift detection and for
    sampling synthetic sessions.

    Output: ``prev_type``, ``type_col``, ``n_transitions``,
    ``p_milli`` (= n·1000 div Σ n over prev_type — exact integer
    division, CLAUDE.md float discipline).

    Scale shape: ONE key-hash window shuffle (lag ordered by
    (ts, id) — tie-stable, the turn_latency discipline) reduces the
    corpus to the ≤ |types|² transition frame; the probability
    window runs over that reduced frame, not the events. Hot keys
    are one partition's stream — same exposure as every other
    per-key window in this module.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(type_col), 1, start_token).over(w)
    pairs = (
        df.select(
            F.col(key_col), F.col(ts_col), F.col(id_col), F.col(type_col)
        )
        .withColumn("prev_type", prev)
        .select("prev_type", F.col(type_col).alias("type"))
    )
    return rollup_transitions(pairs, out_type_col=type_col)


def rollup_transitions(
    pairs: DataFrame,
    prev_col: str = "prev_type",
    type_col: str = "type",
    out_type_col: str = "event_type",
) -> DataFrame:
    """Shared verdict stage for batch + streaming transition pairs
    (the rollup_turn_gaps discipline): (prev, type) rows → counts and
    integer-milli conditional probabilities. The groupBy input is
    already the reduced pair stream; the probability window runs on
    the ≤ |types|² aggregate frame."""
    trans = (
        pairs.select(
            F.col(prev_col).alias("prev_type"),
            F.col(type_col).alias(out_type_col),
        )
        .groupBy("prev_type", out_type_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    return trans.withColumn(
        "p_milli",
        F.expr(
            "cast(n_transitions * 1000 div "
            "sum(n_transitions) over (partition by prev_type) as long)"
        ),
    )


def decayed_engagement(
    df: DataFrame,
    now: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    max_halvings: int = 40,
) -> DataFrame:
    """Recency-weighted engagement per key — the freshness profile a
    sampling/ranking pass keys on (recent activity counts full, old
    history decays): each event contributes floor(value·10⁶) div
    2^(age_days div half_life_days) — an integer-exact power-of-two
    step decay, chosen over float exp(−λt) because the float sum is
    engine-ordered (CLAUDE.md float discipline); the step
    quantization is the price of exactness, the same monitoring-grade
    granularity the HDR buckets accept.

    ``now`` is an explicit timestamp literal (the recrawl_priority
    convention — no wall clock inside an oracle-checked operator).
    Future events (ts > now) clamp to age 0 — a CASE, not least()
    (NULL-skip trap); ages beyond ``max_halvings`` half-lives
    contribute 0, which also keeps pow(2, n) exact in the double it
    routes through. NULL ts/value rows contribute NULL terms that
    sum-skip (tag-and-exclude).

    Emits per key: ``n_events``, ``raw_micro`` (undecayed Σ),
    ``decayed_micro``. ONE map-side-combined groupBy — a hot key
    shuffles one partial row per task.
    """
    if half_life_days <= 0 or max_halvings <= 0:
        raise ValueError(
            f"bad decay spec half_life_days={half_life_days} "
            f"max_halvings={max_halvings}"
        )
    staged = df.select(
        F.col(key_col),
        F.floor(F.col(value_col) * F.lit(1_000_000))
        .cast("long")
        .alias("_v"),
        F.expr(
            f"timestampdiff(MICROSECOND, {ts_col}, timestamp'{now}')"
        ).alias("_age_us"),
    ).select(
        key_col,
        "_v",
        F.expr(
            "case when _age_us is null then null "
            "when _age_us < 0 then 0 "
            f"else _age_us div {_US_PER_DAY} div {half_life_days} end"
        ).alias("_halvings"),
    )
    decayed = F.expr(
        f"case when _halvings > {max_halvings} then 0 "
        "else _v div cast(power(2, _halvings) as bigint) end"
    )
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("_v").cast("long").alias("raw_micro"),
        F.sum(decayed).cast("long").alias("decayed_micro"),
    )


def burstiness(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Exact Fano factor (index of dispersion) of per-bucket event
    counts, per event type — the burstiness monitor: ~1000 milli for
    a Poisson arrival process, ≫1000 for bursty/batchy sources, <1000
    for throttled ones. The span grid runs from each type's first to
    last OCCUPIED bucket; empty interior buckets count as zeros via
    arithmetic (the grid is never materialized — no explode, no
    calendar join).

    fano_milli = (n·Σc² − (Σc)²)·1000 div (n·Σc) over the n-bucket
    grid, computed in decimal(38,0): at 10¹² events per type the
    count square overflows int64 mid-formula (the
    connected_components ANSI-overflow lesson), while DuckDB's
    HUGEINT mirrors the widened math exactly.

    Shuffles: one corpus-scale groupBy(type, bucket) with map-side
    combine, then a ≤|types|-row rollup. NULL timestamps are
    excluded with a tag-and-exclude filter.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    b_us = bucket_seconds * 1_000_000
    staged = df.select(
        F.col(type_col),
        _epoch_us(F.col(ts_col)).alias("_us"),
    ).where("_us is not null")
    occ = staged.select(
        type_col, F.expr(f"_us div {b_us}").alias("_b")
    ).groupBy(type_col, "_b").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    per = occ.groupBy(type_col).agg(
        F.sum("_c").cast("decimal(38,0)").alias("_t"),
        F.sum(F.col("_c") * F.col("_c")).cast("decimal(38,0)").alias("_sq"),
        (F.max("_b") - F.min("_b") + 1).cast("decimal(38,0)").alias("_n"),
        F.sum("_c").cast("long").alias("n_events"),
        (F.max("_b") - F.min("_b") + 1).cast("long").alias("n_buckets"),
    )
    return per.select(
        type_col,
        "n_buckets",
        "n_events",
        F.expr(
            "cast((_n * _sq - _t * _t) * 1000 div (_n * _t) as long)"
        ).alias("fano_milli"),
    )
