"""Mergeable sketches — the fixed-size-state summaries that replace
exact operators when 100 TB makes "shuffle every distinct value to
one place" the bottleneck:

- :func:`hll_sketch` — HyperLogLog registers for distinct counting
  (the scale path beside an exact ``count(DISTINCT ...)``). State is
  ``m = 2**p`` small integers per group, merge is element-wise MAX —
  so partial sketches combine map-side and across days/shards/
  clusters without ever re-touching raw data.
- :func:`cms_sketch` — count-min counters for frequency estimation
  (the scale path beside the exact ``heavy_hitters``). State is a
  ``depth × width`` counter grid, merge is element-wise SUM; lookups
  overestimate only (min over depth rows).
- :func:`hdr_quantiles` — HDR-histogram quantiles (the scale path
  beside the exact ``group_percentiles`` selection): power-of-two
  buckets subdivided by ``2**k`` keep relative error ≤ 2⁻ᵏ with a few
  hundred buckets per group; merge is per-bucket SUM.

Everything here is INTEGER-deterministic on purpose: the hash is the
repo's engine-portable 60-bit md5 prefix (operators/sampling.py
``sample_hash``), register/rank/bucket math is ``div``/``%``/
``length(bin(x))`` — all bit-exact in both Spark and DuckDB — so even
the approximate operators pass the exact value-hash oracle gate. The
approximation is in WHAT the state claims about the data, never in
whether two engines (or two cluster runs) agree on the state.

Estimation helpers (:func:`hll_estimate`, :func:`cms_estimate`) are
driver-side pure Python over the tiny sketch frames: the float
estimate never enters an oracle-checked output (CLAUDE.md float
discipline); tests gate accuracy against exact counts instead.

Reference anchor: libbeat's monitoring/metrics registries expose
uniques and percentiles over event streams (reference
libbeat/monitoring/*); the sketch constructions follow the public
papers (Flajolet et al. HLL 2007; Cormode–Muthukrishnan CM 2005;
HdrHistogram) — no reference code.

Scale shape (all three): one shuffle over the raw events keyed by
(group, register/col/bucket) with map-side partial aggregation — the
reduced state per group is O(m), O(d·w), O(levels·2ᵏ) regardless of
row count, so the reduce side never sees data-proportional state.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beats_spark.operators.sampling import sample_hash

_HASH_BITS = 60


def hll_register_rank(
    key_col: str, p: int = 8, seed: int = 0
) -> tuple[Column, Column]:
    """The HLL hashing rule — (register, rank) columns from a key —
    shared by batch :func:`hll_sketch` and the streaming twin
    (streaming.pipeline.stream_hll_sketch) so their register frames
    stay byte-identical: ``p`` low bits of the portable md5-60 hash
    index the register, the remaining ``60-p`` high bits yield the
    rank as ``(60-p)+1 - floor(log2(w))`` computed exactly via
    ``length(bin(w))`` — integer bit math, no float log. NULL keys
    hash to NULL register/rank (callers filter them out)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    nbits = _HASH_BITS - p
    h = sample_hash(F.col(key_col), seed)
    register = (h % m).cast("int")
    w = F.shiftright(h, p)  # == h div 2^p for the non-negative hash
    rank = (
        F.when(w == 0, F.lit(nbits + 1))
        .otherwise(F.lit(nbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return register, rank


def hll_sketch(
    df: DataFrame,
    key_col: str,
    by: list[str] | tuple[str, ...] = (),
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """HyperLogLog registers per group: (*by, register, max_rank).

    Hashing rule in :func:`hll_register_rank`. Only HIT registers
    appear (an absent register is rank 0); :func:`hll_estimate`
    fills the gap. Merging two sketches = groupBy MAX over the
    union — the property that makes this the 100 TB distinct
    counter.

    NULL keys are excluded (SQL ``count(DISTINCT ...)`` semantics).
    """
    register, rank = hll_register_rank(key_col, p, seed)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *[F.col(c) for c in by],
            register.alias("register"),
            rank.alias("_rank"),
        )
        .groupBy(*by, "register")
        .agg(F.max("_rank").alias("max_rank"))
    )


def hll_estimate(registers: dict[int, int], p: int = 8) -> float:
    """Standard HLL estimate from a {register: max_rank} dict (absent
    registers are rank 0) — driver-side, for tests and reporting.
    Applies the small-range linear-counting correction."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = m - len([r for r in registers.values() if r > 0])
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


def cms_cells(
    value_col: str, depth: int = 4, width: int = 1024, seed: int = 0
):
    """The count-min hashing rule: one value → ``depth`` (depth_idx,
    col_idx) structs, each row hashed with a distinct seed
    (``seed*depth + i``). Shared by batch :func:`cms_sketch` and the
    streaming twin (stream_cms_sketch) so finalized cell frames from
    either origin are identical and merge by per-cell SUM."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("depth_idx"),
                (sample_hash(F.col(value_col), seed * depth + i) % width)
                .cast("int")
                .alias("col_idx"),
            )
            for i in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str] | tuple[str, ...] = (),
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Count-min counter grid per group: (*by, depth_idx, col_idx, cnt).

    Each of the ``depth`` rows hashes the value with a distinct seed
    (``seed*depth + i``) and bumps one of ``width`` counters; a
    lookup takes the MIN over rows (:func:`cms_estimate`) and
    overestimates by at most ~2·N/width with probability 1-2⁻ᵈᵉᵖᵗʰ.
    Merge = per-cell SUM. The explode is ``depth`` small ints per
    row BEFORE the single (group, cell)-keyed shuffle — map-side
    combine reduces it to ≤ depth·width rows per group.

    NULL values are excluded (they are not a frequency class)."""
    cells = cms_cells(value_col, depth, width, seed)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*[F.col(c) for c in by], F.explode(cells).alias("_c"))
        .groupBy(*by, F.col("_c.depth_idx").alias("depth_idx"),
                 F.col("_c.col_idx").alias("col_idx"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cells: dict[tuple[int, int], int],
    value: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> int:
    """Point frequency estimate from a {(depth_idx, col_idx): cnt}
    dict — driver-side twin of the in-plan hashing (same md5-60
    material as ``sample_hash``), for tests and reporting."""
    import hashlib

    est = None
    for i in range(depth):
        material = f"s{seed * depth + i}|{value}".encode()
        h = int(hashlib.md5(material).hexdigest()[:15], 16)
        c = cells.get((i, h % width), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)


def hdr_quantiles(
    df: DataFrame,
    value_col: str,
    by: list[str] | tuple[str, ...] = (),
    qs: tuple[int, ...] = (50, 90, 99),
    k: int = 5,
) -> DataFrame:
    """HDR-histogram percentiles per group: (*by, q, bucket_lo)
    long-format, ``bucket_lo`` in the value's ×10⁶ integer domain.

    Values enter as ``floor(value·10⁶)`` int64 (the repo's e6 float
    discipline; non-finite → NULL → excluded, negatives excluded —
    HDR is a non-negative-magnitude histogram). Each value keeps its
    top ``k+1`` significant bits: ``shift = max(msb-1-k, 0)``,
    ``bucket_lo = (x div 2^shift) · 2^shift`` — so bucket width is
    ≤ 2⁻ᵏ of the value (k=5 → ≤ ~3.1% relative error), with ~2ᵏ
    buckets per power of two. ``msb`` is ``length(bin(x))`` — exact
    integer bit math, no float log; ``2^shift`` is a power of two and
    therefore exact in the double ``power`` before the cast.

    The reported percentile is the LOWER BOUND of the bucket holding
    the nearest-rank element (rank ``(n-1)·q div 100 + 1``, the
    group_percentiles convention), so ``bucket_lo ≤ exact percentile
    < bucket_lo·(1+2⁻ᵏ) + 2ᵏ``. Merge = per-bucket SUM of counts.

    Scale: ONE (group, bucket)-keyed shuffle with map-side combine;
    the rank selection runs over ≤ levels·2ᵏ buckets per group."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if not all(1 <= q <= 100 for q in qs):
        raise ValueError(f"qs must be integer percents in [1, 100]: {qs}")
    if not 0 <= k <= 16:
        raise ValueError(f"k must be in [0, 16], got {k}")
    v = F.col(value_col)
    finite = (
        ~F.isnan(v) & (v < F.lit(float("inf"))) & (v > F.lit(float("-inf")))
    )
    x = F.when(finite, F.floor(v * F.lit(1_000_000)).cast("long"))
    lo = F.expr(
        f"CASE WHEN _hdr_x = 0 THEN 0 ELSE "
        f"(_hdr_x div CAST(power(2, greatest(length(bin(_hdr_x)) - 1 - {k}, 0)) AS BIGINT)) "
        f"* CAST(power(2, greatest(length(bin(_hdr_x)) - 1 - {k}, 0)) AS BIGINT) END"
    )
    hist = (
        df.withColumn("_hdr_x", x)
        .filter(F.col("_hdr_x").isNotNull() & (F.col("_hdr_x") >= 0))
        .select(*[F.col(c) for c in by], lo.alias("bucket_lo"))
        .groupBy(*by, "bucket_lo")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    wspec = Window.partitionBy(*[F.col(c) for c in by]).orderBy("bucket_lo")
    ranked = hist.select(
        *[F.col(c) for c in by],
        F.col("bucket_lo"),
        F.sum("_cnt").over(
            wspec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.sum("_cnt").over(
            wspec.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("_cum_prev"),
        F.sum("_cnt").over(
            wspec.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    picks = [
        F.max(
            F.when(
                (F.coalesce(F.col("_cum_prev"), F.lit(0))
                 < F.expr(f"(_n - 1) * {int(q)} div 100 + 1"))
                & (F.expr(f"(_n - 1) * {int(q)} div 100 + 1")
                   <= F.col("_cum")),
                F.struct(F.lit(int(q)).alias("q"),
                         F.col("bucket_lo").alias("bucket_lo")),
            )
        ).alias(f"_q{q}")
        for q in qs
    ]
    wide = ranked.groupBy(*by).agg(*picks)
    stacked = wide.select(
        *[F.col(c) for c in by],
        F.explode(F.array(*[F.col(f"_q{q}") for q in qs])).alias("_p"),
    )
    return stacked.select(
        *[F.col(c) for c in by],
        F.col("_p.q").alias("q"),
        F.col("_p.bucket_lo").alias("bucket_lo"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: bounded-size set membership (the crawl seen-set)
# ---------------------------------------------------------------------------


def bloom_positions(
    key: Column, n_bits: int, k: int, seed: int = 0
) -> Column:
    """``array<long>`` of the ``k`` Bloom bit positions for ``key`` —
    each an independent md5-60 hash (distinct seed material per hash
    index) reduced mod ``n_bits``. Engine-portable: DuckDB replays
    ``('0x' || substr(md5('s<seed*1000+i>|' || key), 1, 15))::BIGINT
    % n_bits`` exactly (the hash is non-negative, so ``%`` and pmod
    agree)."""
    return F.array(
        *[
            F.pmod(sample_hash(key, seed=seed * 1000 + i), F.lit(n_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as its POSITION-SET form:
    one ``(bit)`` row per set bit — semantically the classic bit
    array, represented relationally so it stays mergeable (union +
    distinct merges filters built on different days/shards/clusters)
    and joinable (membership probes are hash joins, not per-row
    array scans).

    Why this exists: the exact seen-set behind a crawl frontier or an
    incremental-ingest dedup index costs ≥ 16 B per key — 16 TB of
    state at 10¹² URLs. A Bloom filter at ~10 bits/key answers "have
    I seen this key?" with NO false negatives and a tunable
    false-positive rate (~(fill)^k; 10 bits/key, k=3 → ~1-2%), so the
    exact index only has to serve the tiny maybe-seen fraction — the
    standard two-tier membership architecture. False positives DROP
    work (a never-seen URL mistaken as seen is skipped); recall of
    the filter is exact, which is the safe direction for dedup and
    the wrong one for billing — callers that cannot tolerate FP skips
    chase the maybe-seen set through the exact index.

    Scale shape: one explode (×k) then a distinct whose map-side
    combine caps every task's output at ``n_bits`` rows — the reduced
    frame is ≤ ``n_bits`` rows TOTAL regardless of corpus size.
    Integer-deterministic throughout (module hash discipline), so the
    filter a 1000-executor cluster builds is row-identical to the
    local one and to the DuckDB oracle's."""
    if n_bits <= 0:
        raise ValueError(f"n_bits must be positive, got {n_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    pos = bloom_positions(F.col(key_col).cast("string"), n_bits, k, seed)
    return df.select(F.explode(pos).alias("bit")).distinct()


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int,
    k: int = 3,
    seed: int = 0,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Probe every row of ``df`` against a ``bloom_build`` filter:
    adds boolean ``flag_col`` — true iff ALL ``k`` bit positions of
    the row's key are set (membership is a pure function of the key,
    so rows sharing a key correctly share a verdict — unlike
    decision-joins keyed on a non-unique id, which OR unrelated
    outcomes together).

    Plan: distinct keys → explode to ``k`` position rows → ONE join
    against the position set (≤ ``n_bits`` rows, so AQE broadcasts it
    at any realistic sizing) → per-key all-``k`` AND → flag joined
    back to ``df`` on the key. Two key-shuffles worst case; the
    position-set side never scales with the corpus. The caller owns
    persistence of ``bloom`` when probing it more than once
    (streaming-safe: no operator-internal persist)."""
    if n_bits <= 0:
        raise ValueError(f"n_bits must be positive, got {n_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    pos = bloom_positions(F.col(key_col).cast("string"), n_bits, k, seed)
    hits = (
        df.select(key_col)
        .distinct()
        .select(F.col(key_col), F.explode(pos).alias("_bbit"))
        .join(
            bloom.select(
                F.col("bit").alias("_bbit"), F.lit(1).alias("_bhit")
            ),
            "_bbit",
            "left",
        )
        .groupBy(key_col)
        .agg(
            (F.sum(F.coalesce(F.col("_bhit"), F.lit(0))) == F.lit(k)).alias(
                flag_col
            )
        )
    )
    return df.join(hits, key_col, "left")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) sketch: distinct counts AND set
# overlap — the capability HLL lacks
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    by: list[str] | tuple[str, ...] = (),
    k: int = 64,
    salts: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Bottom-k sketch per group: the ``k`` smallest DISTINCT md5-60
    hash values of ``key_col`` — ``(*by, rank, h)`` rows.

    Why beside :func:`hll_sketch`: HLL registers answer "how many
    distinct" but cannot intersect — corpus-overlap questions ("how
    much of the crawl is already in last month's corpus", "what
    fraction of benchmark X leaked into source Y") need a sketch
    whose states COMBINE under both union and intersection. Bottom-k
    does both (Beyer et al. 2007, "On Synopses for Distinct-Value
    Estimation"): merge = min-k of the union of states (proven equal
    to the sketch of the union — every one of the true k smallest is
    in its own side's bottom-k), distinct estimate = (k-1)·2⁶⁰/h_k,
    and |A∩B|/|A∪B| ≈ the fraction of the merged bottom-k present in
    both sides. The STATE is exact integers (module discipline) — the
    oracle checks it hash-for-hash; only driver-side ESTIMATES are
    float (never oracle-checked; accuracy is pytest-gated vs exact).

    Plan — the salted two-phase min-k: hashes dedup per
    ``(group, salt)`` with ``salt = pmod(h, salts)`` (same h → same
    salt, so the dedup is globally correct), a per-(group, salt)
    window keeps each bucket's local bottom-k in parallel — a HOT
    GROUP spreads over ``salts`` reducers instead of serializing on
    one — then the final per-group window ranks ≤ salts·k survivors.
    Both shuffles carry (group, salt, h) triples, never corpus rows.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if salts <= 0:
        raise ValueError(f"salts must be positive, got {salts}")
    h = sample_hash(F.col(key_col).cast("string"), seed)
    gcols = [F.col(c) for c in by]
    staged = (
        df.select(*gcols, h.alias("h"))
        .withColumn("_salt", F.pmod(F.col("h"), F.lit(salts)))
        .distinct()
    )
    w1 = Window.partitionBy(*by, "_salt").orderBy("h")
    local = (
        staged.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*by).orderBy("h")
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*by, "rank", "h")
    )


def kmv_merge(states, by: list[str] | tuple[str, ...] = (), k: int = 64):
    """Merge bottom-k states (frames of ``(*by, rank, h)``): distinct
    union → re-rank → bottom-k. Equal to the sketch built over the
    unioned raw data (pytest-pinned)."""
    from functools import reduce

    u = reduce(
        lambda a, b: a.unionByName(b),
        [s.select(*by, "h") for s in states],
    ).distinct()
    w = Window.partitionBy(*by).orderBy("h")
    return (
        u.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*by, "rank", "h")
    )


def kmv_estimate(hs: list[int], k: int) -> float:
    """Driver-side distinct-count estimate from one group's bottom-k
    hash list: (k-1)·2⁶⁰/h_k when the sketch is full, else the exact
    count (fewer than k distinct values = the state IS the set)."""
    hs = sorted(hs)
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) * float(1 << _HASH_BITS) / float(hs[k - 1])


def kmv_jaccard(a: list[int], b: list[int], k: int) -> float:
    """Driver-side Jaccard estimate of two bottom-k states: the
    fraction of the MERGED bottom-k present in both sides."""
    sa, sb = set(a), set(b)
    merged = sorted(sa | sb)[:k]
    if not merged:
        return 0.0
    both = sum(1 for h in merged if h in sa and h in sb)
    return both / len(merged)


def kmv_overlap_matrix(
    states: DataFrame,
    by: str = "source",
    k: int = 64,
) -> DataFrame:
    """Pairwise overlap statistics for every pair of groups, computed
    ONLY from their bottom-k states — the whole point of KMV: the
    corpus-overlap matrix (which sources duplicate each other, how
    much of a benchmark bled into each crawl slice) without ever
    joining raw corpora. Emits per ``(src_a, src_b)`` with
    ``src_a < src_b``: ``k_used`` (size of the merged bottom-k) and
    ``n_both`` (how many of those hashes appear in BOTH sides) — the
    exact-integer sufficient statistic of the Jaccard estimate
    ``n_both / k_used`` (Beyer et al. 2007; the float division stays
    driver-side per the oracle float discipline).

    Scale shape: the input is sketch states — ≤ k rows per group
    regardless of corpus size — so the all-pairs expansion is
    (groups² · k) SKETCH rows, never data; every join is an equi-join
    on the group key and the final two aggregations reduce map-side.
    At 10⁴ groups × k=64 that is ~6.4 GB of expansion worst case —
    shard the pair grid if groups grow past that, the states never
    change."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    s = states.select(F.col(by).alias("_src"), "h")
    srcs = s.select("_src").distinct()
    pairs = (
        srcs.select(F.col("_src").alias("src_a"))
        .join(
            srcs.select(F.col("_src").alias("src_b")),
            F.col("src_a") < F.col("src_b"),
        )
    )
    left = pairs.join(
        s.withColumnRenamed("_src", "src_a"), "src_a"
    ).select(
        "src_a", "src_b", "h",
        F.lit(True).alias("_ia"), F.lit(False).alias("_ib"),
    )
    right = pairs.join(
        s.withColumnRenamed("_src", "src_b"), "src_b"
    ).select(
        "src_a", "src_b", "h",
        F.lit(False).alias("_ia"), F.lit(True).alias("_ib"),
    )
    g = (
        left.unionByName(right)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("_ia").alias("_ia"), F.max("_ib").alias("_ib"))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    return (
        g.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_used"),
            F.sum(
                F.when(F.col("_ia") & F.col("_ib"), 1).otherwise(0)
            ).cast("long").alias("n_both"),
        )
    )
