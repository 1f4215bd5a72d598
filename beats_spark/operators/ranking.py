"""Pairwise-preference ranking — Bradley-Terry strengths from duel
outcomes, integer-exact across engines.

The RLHF curation layer (operators/chat.py) mines preference PAIRS;
this module turns a corpus of pairwise outcomes into a global model
ranking — the Chatbot-Arena-style leaderboard computation, and the
signal a data pipeline needs to pick the teacher/judge model per
slice or to weight best_of_n candidates. Public method: the
Bradley-Terry model (Bradley & Terry 1952) fitted by the MM algorithm
(Hunter 2004, "MM algorithms for generalized Bradley-Terry models"):

    p_i  <-  W_i / sum_j ( n_ij / (p_i + p_j) )

with W_i = total wins of i and n_ij = duels between i and j. The MM
update is order-free (one sweep uses only the previous iterate), so
it maps to joins+groupBy directly — unlike sequential Elo, whose
answer depends on comparison order and which therefore cannot be a
deterministic distributed operator.

Arithmetic is fixed-point (micro-units, floor at every division,
DECIMAL(38,0)/HUGEINT intermediates) for the same reason as
crawl.host_pagerank: float division orders differ across engines, and
at 10^12 comparisons the win sums exceed double's 2^53 exact-integer
range. Scores are clamped at >= 1 micro-unit so an all-losses model
stays a valid denominator (the standard epsilon-smoothing, made exact).

Scale shape: the raw comparison corpus is aggregated ONCE into the
duel-count frame (one shuffle at corpus scale, 16 B/pair-key rows);
each MM iteration then runs on MODEL-PAIR granularity — two joins of
the duel frame against the (model, score) frame plus one groupBy,
the connected_components/host_pagerank cost class. ``iterations`` is
fixed and small; no convergence loop, no driver collect. The duel and
model frames are persisted: both feed every iteration, and
ReuseExchange does not fire for shared subtrees under joins
(CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duel_counts(
    comparisons: DataFrame, winner_col: str = "winner", loser_col: str = "loser"
) -> DataFrame:
    """Comparisons → per-unordered-pair sufficient statistics
    (``_a`` < ``_b``, ``_n`` duels, ``_wa`` wins by ``_a``): the ONE
    corpus-scale shuffle, and a MERGEABLE frame — counts from any
    number of waves/streams/backfills combine by groupBy-SUM, which is
    what the streaming leaderboard twin relies on. Ties/self-duels
    and NULL sides are dropped (a tie carries no preference signal —
    the preference_pairs convention)."""
    w, l = F.col(winner_col), F.col(loser_col)
    c = comparisons.where(w.isNotNull() & l.isNotNull() & (w != l)).select(
        w.alias("_w"), l.alias("_l")
    )
    return (
        c.select(
            F.least("_w", "_l").alias("_a"),
            F.greatest("_w", "_l").alias("_b"),
            (F.col("_w") <= F.col("_l")).cast("long").alias("_wa"),
        )
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_wa").alias("_wa"))
    )


def merge_duel_counts(counts: DataFrame) -> DataFrame:
    """The merge law: unioned count frames re-collapse by SUM."""
    return counts.groupBy("_a", "_b").agg(
        F.sum("_n").alias("_n"), F.sum("_wa").alias("_wa")
    )


def bradley_terry(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Comparisons (one row per duel outcome) → (model, strength,
    wins, n_duels): ``strength`` is the Bradley-Terry score in
    micro-units after ``iterations`` MM sweeps from a uniform start,
    bit-identical to the unrolled SQL oracle."""
    return bradley_terry_from_counts(
        duel_counts(comparisons, winner_col, loser_col), iterations, scale
    )


def bradley_terry_from_counts(
    counts: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    max_driver_pairs: int = 200_000,
) -> DataFrame:
    """MM sweeps over a (possibly merged) duel-count frame — the
    model-pair-granularity half of ``bradley_terry``, shared with the
    streaming twin so both paths produce identical integers.

    Two physical strategies, one semantics (the dsir_weights
    precedent — CLAUDE.md "many small stages cost more than the
    work"):

    - pair frame ≤ ``max_driver_pairs``: collect the sufficient
      statistic and run the sweeps as exact Python ints on the driver
      (all operands positive, so ``//`` == the engines' truncating
      div; Python ints are arbitrary-precision like DECIMAL(38,0)).
      A leaderboard's pair frame is M·(M-1)/2 for M models — a few
      thousand rows however large the comparison corpus — and the
      all-lazy form costs ~3 shuffles × iterations of flat stage
      scheduling for sub-second data (measured 16.6 s → ~2 s at
      sf0.1). This is a bounded, documented collect: the corpus-scale
      duel_counts aggregation has already reduced the data.
    - larger (someone ranks millions of entities — players, not
      models): the identical arithmetic as lazy joins, never
      collecting; 3 model-pair-granularity shuffles per sweep.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    s2 = scale * scale
    duels = counts.persist()
    n_pairs = duels.count()
    if n_pairs <= max_driver_pairs:
        rows = duels.collect()
        spark = counts.sparkSession
        duels.unpersist()
        pair_n = {(r["_a"], r["_b"]): int(r["_n"]) for r in rows}
        wins_d: dict[str, int] = {}
        nd: dict[str, int] = {}
        for r in rows:
            a, b, n, wa = r["_a"], r["_b"], int(r["_n"]), int(r["_wa"])
            wins_d[a] = wins_d.get(a, 0) + wa
            wins_d[b] = wins_d.get(b, 0) + (n - wa)
            nd[a] = nd.get(a, 0) + n
            nd[b] = nd.get(b, 0) + n
        p = {m: scale for m in nd}
        for _ in range(iterations):
            d = {m: 0 for m in p}
            for (a, b), n in pair_n.items():
                t = n * s2 // (p[a] + p[b])
                d[a] += t
                d[b] += t
            p = {m: max(wins_d[m] * s2 // max(d[m], 1), 1) for m in p}
        # model column type comes from the INPUT schema — integer-keyed
        # entity ids must not crash below the cap while working above it
        mt = counts.schema["_a"].dataType.simpleString()
        return spark.createDataFrame(
            [(m, p[m], wins_d[m], nd[m]) for m in sorted(p)],
            f"model {mt}, strength long, wins long, n_duels long",
        )
    wins = (
        duels.select(F.col("_a").alias("model"), F.col("_wa").alias("_k"))
        .unionByName(
            duels.select(
                F.col("_b").alias("model"), (F.col("_n") - F.col("_wa")).alias("_k")
            )
        )
        .groupBy("model")
        .agg(F.sum("_k").alias("wins"))
        .where(F.col("wins") > 0)
    )
    models = (
        duels.select(F.col("_a").alias("model"))
        .unionByName(duels.select(F.col("_b").alias("model")))
        .distinct()
        .join(wins, "model", "left")
        .select("model", F.coalesce("wins", F.lit(0)).cast("long").alias("wins"))
        .persist()
    )
    scores = models.select("model", F.lit(scale).cast("long").alias("_p"))
    for _ in range(iterations):
        joined = (
            duels.join(
                scores.select(F.col("model").alias("_a"), F.col("_p").alias("_pa")),
                "_a",
            )
            .join(
                scores.select(F.col("model").alias("_b"), F.col("_p").alias("_pb")),
                "_b",
            )
            # floor(n · scale² / (p_a + p_b)) — the n_ij/(p_i+p_j) term in
            # micro-units; DECIMAL(38,0) because n·scale² tops long at
            # ~9·10^6 duels per pair
            .select(
                "_a",
                "_b",
                F.expr(
                    f"CAST(_n AS DECIMAL(38,0)) * {s2} div (_pa + _pb)"
                ).alias("_t"),
            )
        )
        denom = (
            joined.select(F.col("_a").alias("model"), "_t")
            .unionByName(joined.select(F.col("_b").alias("model"), "_t"))
            .groupBy("model")
            .agg(F.sum("_t").alias("_d"))
        )
        scores = models.join(denom, "model", "left").select(
            "model",
            F.expr(
                f"greatest(CAST(wins AS DECIMAL(38,0)) * {s2} "
                f"div greatest(coalesce(_d, 0), 1), 1)"
            ).cast("long").alias("_p"),
        )
    return models.join(scores, "model").join(
        duels.select(F.col("_a").alias("model"), "_n")
        .unionByName(duels.select(F.col("_b").alias("model"), "_n"))
        .groupBy("model")
        .agg(F.sum("_n").alias("n_duels")),
        "model",
    ).select("model", F.col("_p").alias("strength"), "wins", "n_duels")


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str = "item",
    category_col: str = "category",
    n_raters: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971, "Measuring nominal scale agreement
    among many raters") — inter-rater agreement over a corpus of
    categorical ratings, the audit a labeling pipeline runs before
    trusting its raters (the complement of bradley_terry: BT ranks the
    MODELS, kappa validates the JUDGES).

    Input: one row per (item, rating); items not carrying exactly
    ``n_raters`` ratings are dropped (the standard fixed-panel
    formulation — partial panels are a different statistic). Output is
    ONE row: n_items, n_categories, total_ratings, pbar_micro
    (observed agreement P̄), pe_micro (chance agreement P̄ₑ) and
    kappa_micro, all floor-scaled integers.

    With N items, n raters, T = N·n ratings, n_ij the per-item
    category counts and C_j the category marginals:

        S1 = Σ n_ij² − T            P̄  = S1 / (T·(n−1))
        S2 = Σ C_j²                 P̄ₑ = S2 / T²
        κ  = (S1·T − S2·(n−1)) / ((n−1)·(T² − S2))

    (the textbook (P̄−P̄ₑ)/(1−P̄ₑ) with one factor of T cancelled so
    every intermediate fits DECIMAL(38,0)/HUGEINT up to T ≈ 10¹²
    ratings — S1·T·10⁶ ≤ n·T²·10⁶ ≈ 5·10³⁰). Divisions truncate
    toward zero on BOTH engines (Spark ``div``, DuckDB ``//`` —
    CLAUDE.md verified), so a negative kappa still matches exactly.
    The all-agreement degenerate case (S2 = T², P̄ₑ = 1, κ undefined)
    is greatest-clamped to denominator 1 and documented rather than
    NULLed.

    Scale shape: one corpus-scale shuffle (groupBy(item, category),
    map-side combine), one item-keyed Window pass to enforce the
    panel size, then two tiny aggregates over the persisted
    (item, category, n_ij) frame — which is ≤ N·k rows of integers,
    the only intermediate."""
    from pyspark.sql import Window

    n = int(n_raters)
    if n < 2:
        raise ValueError("fleiss_kappa needs n_raters >= 2")
    counts = (
        ratings.where(
            F.col(item_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .groupBy(item_col, category_col)
        .agg(F.count(F.lit(1)).alias("_nij"))
    )
    w = Window.partitionBy(item_col)
    # persist: the valid frame feeds BOTH global aggregates below and
    # ReuseExchange does not fire for shared subtrees (CLAUDE.md)
    valid = (
        counts.withColumn("_tot", F.sum("_nij").over(w))
        .where(F.col("_tot") == n)
        .persist()
    )
    a = valid.agg(
        F.sum(F.expr("_nij * _nij")).alias("_ssq"),
        F.sum("_nij").alias("_t"),
    )
    b = valid.groupBy(category_col).agg(F.sum("_nij").alias("_cj")).agg(
        F.sum(F.expr("CAST(_cj AS DECIMAL(38,0)) * _cj")).alias("_s2"),
        F.count(F.lit(1)).alias("_k"),
    )
    s = int(scale)
    return (
        a.crossJoin(b)
        .select(
            F.expr(f"_t div {n}").cast("long").alias("n_items"),
            F.col("_k").cast("long").alias("n_categories"),
            F.col("_t").cast("long").alias("total_ratings"),
            F.expr(
                f"CAST((CAST(_ssq AS DECIMAL(38,0)) - _t) * {s} "
                f"div (CAST(_t AS DECIMAL(38,0)) * {n - 1}) AS LONG)"
            ).alias("pbar_micro"),
            F.expr(
                f"CAST(_s2 * {s} "
                f"div (CAST(_t AS DECIMAL(38,0)) * _t) AS LONG)"
            ).alias("pe_micro"),
            F.expr(
                f"CAST(((CAST(_ssq AS DECIMAL(38,0)) - _t) * _t "
                f"- _s2 * {n - 1}) * {s} "
                f"div greatest({n - 1} * (CAST(_t AS DECIMAL(38,0)) * _t "
                f"- _s2), 1) AS LONG)"
            ).alias("kappa_micro"),
        )
    )


def fleiss_kappa_sql(
    ratings_sql: str,
    item: str = "item",
    category: str = "category",
    n_raters: int = 5,
    scale: int = 1_000_000,
) -> str:
    """The identical computation as DuckDB CTEs: HUGEINT arithmetic,
    the same cancelled-T formulation, ``//`` truncation and
    greatest-clamp in the same places."""
    n, s = int(n_raters), int(scale)
    return f"""
WITH r AS ({ratings_sql}),
counts AS (
  SELECT {item} AS it, {category} AS cat, count(*)::BIGINT AS nij
  FROM r WHERE {item} IS NOT NULL AND {category} IS NOT NULL
  GROUP BY 1, 2
),
valid AS (
  SELECT * FROM (
    SELECT it, cat, nij, sum(nij) OVER (PARTITION BY it) AS tot
    FROM counts
  ) WHERE tot = {n}
),
a AS (
  SELECT sum(nij::HUGEINT * nij) AS ssq, sum(nij)::HUGEINT AS t
  FROM valid
),
b AS (
  SELECT sum(cj::HUGEINT * cj) AS s2, count(*)::BIGINT AS k
  FROM (SELECT cat, sum(nij)::BIGINT AS cj FROM valid GROUP BY cat)
)
SELECT (t // {n})::BIGINT AS n_items,
       k AS n_categories,
       t::BIGINT AS total_ratings,
       ((ssq - t) * {s} // (t * {n - 1}))::BIGINT AS pbar_micro,
       (s2 * {s} // (t * t))::BIGINT AS pe_micro,
       (((ssq - t) * t - s2 * {n - 1}) * {s}
        // greatest({n - 1} * (t * t - s2), 1))::BIGINT AS kappa_micro
FROM a, b
"""


def bradley_terry_sql(
    comparisons_sql: str,
    winner: str = "winner",
    loser: str = "loser",
    iterations: int = 3,
    scale: int = 1_000_000,
) -> str:
    """The identical computation unrolled as DuckDB CTEs (the
    host_pagerank oracle discipline): HUGEINT arithmetic, ``//``
    floor-division (all operands positive, so truncation == floor on
    both engines), greatest-clamps in the same places."""
    s2 = scale * scale
    parts = [
        f"WITH comp AS ({comparisons_sql})",
        f"""c AS (
  SELECT {winner} AS w, {loser} AS l FROM comp
  WHERE {winner} IS NOT NULL AND {loser} IS NOT NULL AND {winner} <> {loser}
)""",
        """duels AS (
  SELECT least(w, l) AS a, greatest(w, l) AS b, count(*)::BIGINT AS n
  FROM c GROUP BY 1, 2
)""",
        """wins AS (SELECT w AS model, count(*)::BIGINT AS wins FROM c GROUP BY 1)""",
        """models AS (
  SELECT m.model, coalesce(wins.wins, 0)::BIGINT AS wins
  FROM (SELECT a AS model FROM duels UNION SELECT b FROM duels) m
  LEFT JOIN wins ON m.model = wins.model
)""",
        f"""s0 AS (SELECT model, {scale}::HUGEINT AS p FROM models)""",
    ]
    prev = "s0"
    for i in range(1, iterations + 1):
        parts.append(f"""t{i} AS (
  SELECT duels.a, duels.b,
         duels.n::HUGEINT * {s2} // (pa.p + pb.p) AS t
  FROM duels
  JOIN {prev} pa ON duels.a = pa.model
  JOIN {prev} pb ON duels.b = pb.model
)""")
        parts.append(f"""d{i} AS (
  SELECT model, sum(t) AS d FROM (
    SELECT a AS model, t FROM t{i} UNION ALL SELECT b, t FROM t{i}
  ) GROUP BY model
)""")
        parts.append(f"""s{i} AS (
  SELECT models.model,
         greatest(models.wins::HUGEINT * {s2}
                  // greatest(coalesce(d{i}.d, 0), 1), 1) AS p
  FROM models LEFT JOIN d{i} ON models.model = d{i}.model
)""")
        prev = f"s{i}"
    tail = f"""
SELECT models.model, {prev}.p::BIGINT AS strength, models.wins,
       nd.n_duels
FROM models
JOIN {prev} ON models.model = {prev}.model
JOIN (
  SELECT model, sum(n)::BIGINT AS n_duels FROM (
    SELECT a AS model, n FROM duels UNION ALL SELECT b, n FROM duels
  ) GROUP BY model
) nd ON models.model = nd.model
"""
    return ",\n".join(parts) + tail


def model_auc(
    df: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Exact AUC-ROC of an integer score against a boolean label via
    the Mann-Whitney rank-sum identity — the evaluation half the
    model operators (quality_classifier, dsir_weights, model_ranking)
    were missing: AUC = (Σ ranks of positives − n₊(n₊+1)/2) /
    (n₊·n₋), emitted as exact integer ppm.

    Deterministic-tie-break variant: ranks order by (score, id), so
    tied scores split by id instead of receiving the average rank —
    bias O(ties)/n against the textbook mid-rank AUC, zero for
    continuous scores, and both engines replay the SAME tie-break
    (the heavy_hitters determinism discipline). NULL scores/labels
    are excluded with the usual tag-and-exclude contract.

    100 TB shape: the global rank is layout.running_prefix (range-
    bucket → parallel per-bucket windows → n_buckets-row offset
    broadcast) — the naive RANK() OVER (ORDER BY score) is a single-
    partition corpus sort. After ranking: one map-side-combined
    global aggregate. Output: one row (n_pos, n_neg, auc_ppm).
    """
    from beats_spark.operators.layout import running_prefix

    base = df.select(
        F.col(id_col),
        F.col(score_col).cast("long").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).where("_s is not null and _y is not null")
    ranked = running_prefix(
        base,
        order_cols=["_s", id_col],
        size_col=F.lit(1),
        n_buckets=n_buckets,
    )
    agg = ranked.agg(
        F.sum(F.col("_y").cast("long")).alias("n_pos"),
        F.sum((~F.col("_y")).cast("long")).alias("n_neg"),
        F.sum(F.when(F.col("_y"), F.col("rank")).otherwise(0)).alias("_rpos"),
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.expr(
            "cast(case when n_pos = 0 or n_neg = 0 then null else "
            "(_rpos - n_pos * (n_pos + 1) div 2) * 1000000 "
            "div (n_pos * n_neg) end as long)"
        ).alias("auc_ppm"),
    )


def model_calibration(
    df: DataFrame,
    pred_col: str = "p_milli",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for an integer-milli probability column:
    bucket predictions into ``n_bins`` over [0, 1000], and per bucket
    report count, mean predicted milli, and empirical positive rate
    milli — the calibration audit for any score used as a sampling
    weight (a miscalibrated quality probability silently reweights
    the mixture). Exact integers; the 1000-milli edge clamps into
    the top bin (CASE, not least — the NULL-skip trap). One
    map-side-combined groupBy over ≤ n_bins keys.
    """
    if n_bins < 1 or 1000 % n_bins != 0:
        raise ValueError(f"n_bins must divide 1000, got {n_bins}")
    width = 1000 // n_bins
    p = F.col(pred_col).cast("long")
    b = (
        F.when(p.isNull(), F.lit(None).cast("long"))
        .when(p >= 1000, F.lit(n_bins - 1))
        .when(p < 0, F.lit(0))
        .otherwise(F.expr(f"cast({pred_col} as long) div {width}"))
    )
    staged = df.select(
        b.alias("bin"),
        p.alias("_p"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).where("bin is not null and _y is not null")
    g = staged.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_p").alias("_sp"),
        F.sum(F.col("_y").cast("long")).alias("_np"),
    )
    return g.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        F.expr("cast(_sp div n as long)").alias("mean_pred_milli"),
        F.expr("cast(_np * 1000 div n as long)").alias("frac_pos_milli"),
    )


def roc_points(
    df: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
    n_bins: int = 16,
    lo: int = -16_000,
    hi: int = 32_000,
) -> DataFrame:
    """Bucketed ROC curve — the operating-point view model_auc's
    scalar hides: for each score-bucket threshold ("classify
    positive at or above this bucket"), the exact integer TPR/FPR in
    ppm. A curation gate is DEPLOYED at one threshold; this is the
    table that picks it. Same histogram spec as quality_drift (CASE
    edge clamps, never least/greatest on the NULL path); NULL
    scores/labels tag-and-exclude.

    Emits per bucket b (ascending): ``bin``, ``n_pos``/``n_neg`` in
    the bucket, ``tp``/``fp`` (positives/negatives at or ABOVE b —
    DESC suffix sums over the ≤n_bins frame, the depth_survival
    move), ``tpr_ppm``, ``fpr_ppm``. One corpus-scale
    map-side-combined groupBy; everything else runs on ≤n_bins rows.
    """
    if n_bins < 1 or hi <= lo:
        raise ValueError(f"bad histogram spec n_bins={n_bins} [{lo}, {hi})")
    span = hi - lo
    s = F.col(score_col).cast("long")
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
    staged = df.select(
        b.alias("bin"), F.col(label_col).cast("boolean").alias("_y")
    ).where("bin is not null and _y is not null")
    g = staged.groupBy("bin").agg(
        F.sum(F.col("_y").cast("long")).cast("long").alias("n_pos"),
        F.sum((~F.col("_y")).cast("long")).cast("long").alias("n_neg"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    cum = g.select(
        "bin",
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(w).cast("long").alias("tp"),
        F.sum("n_neg").over(w).cast("long").alias("fp"),
        F.sum("n_pos").over(wt).cast("long").alias("_tpos"),
        F.sum("n_neg").over(wt).cast("long").alias("_tneg"),
    )
    return cum.select(
        "bin",
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        F.expr(
            "cast(tp * 1000000 div "
            "(case when _tpos >= 1 then _tpos else 1 end) as long)"
        ).alias("tpr_ppm"),
        F.expr(
            "cast(fp * 1000000 div "
            "(case when _tneg >= 1 then _tneg else 1 end) as long)"
        ).alias("fpr_ppm"),
    )
