"""Deterministic corpus sampling / splitting / stratified quotas.

Training-data pipelines sample, mix and split corpora constantly; at
100 TB the only acceptable mechanisms are DETERMINISTIC (re-runs and
resumed runs must pick identical rows — `F.rand` is out) and
DRIVER-LIGHT (no global sorts, no collects). Everything here keys on a
hash of a stable id:

- ``hash_sample``: Bernoulli-style keep iff hash(key) < fraction —
  one narrow filter, exact in expectation, reproducible, and
  composable (a sample of a sample nests by hashing with different
  seeds).
- ``split_train_eval``: disjoint train/eval assignment from one hash —
  the same row lands on the same side on every run and every cluster
  size; eval contamination is structurally impossible.
- ``stratified_quota``: at most n rows per stratum, chosen in hash
  order (a deterministic "random" order) — per-stratum shuffle only,
  quota applied by row_number inside the stratum window. The standard
  data-mixing primitive: cap each source/language at its budget.

Hash choice: the 60-bit integer prefix of md5(key) — md5 is
engine-portable, so every operator here has an exact DuckDB oracle
(the same rows, not just the same counts). xxhash64 would be ~2×
faster but non-portable; sampling is never the bottleneck next to the
parse/dedup stages, portability of the GATE wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1 << 60


def sample_hash(key: Column, seed: int = 0) -> Column:
    """Uniform-ish 60-bit integer from md5(seed || key) — deterministic,
    engine-portable (DuckDB: ('0x' || substr(md5(...), 1, 15))::BIGINT)."""
    material = F.concat(F.lit(f"s{seed}|"), key.cast("string"))
    return F.conv(F.substring(F.md5(material), 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep rows whose hash falls below ``fraction`` of the hash space.
    Exact-in-expectation Bernoulli sampling, reproducible at any
    parallelism; a narrow filter (pushdown-friendly, no shuffle)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _SCALE)
    return df.filter(sample_hash(F.col(key_col), seed) < F.lit(threshold))


def split_train_eval(
    df: DataFrame,
    key_col: str,
    eval_fraction: float = 0.01,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Stamp each row 'train' or 'eval' from one hash — disjoint by
    construction, stable across runs/cluster sizes. Filter on the
    column (or write partitioned by it) downstream."""
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError(f"eval_fraction must be in [0, 1], got {eval_fraction}")
    threshold = int(eval_fraction * _SCALE)
    h = sample_hash(F.col(key_col), seed)
    return df.withColumn(
        split_col, F.when(h < F.lit(threshold), F.lit("eval")).otherwise(F.lit("train"))
    )


def cluster_safe_split(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    eval_fraction: float = 0.01,
    seed: int = 0,
    split_col: str = "split",
    component_col: str = "component",
) -> DataFrame:
    """Leakage-safe train/eval split: hash the duplicate-CLUSTER id,
    not the document id, so every member of a near-dup cluster lands
    on the same side of the split.

    ``split_train_eval`` is blind to near-duplicates: a doc and its
    near-copy flip independent coins, and with any realistic dup rate
    some pairs straddle the split — the eval set then scores memorized
    training text (the contamination ``fuzzy_decontaminate`` has to
    repair after the fact). Splitting by the connected-component label
    of the duplicate graph (RefinedWeb/Dolma practice) prevents the
    straddle by construction: members share a label, the label takes
    one coin flip, and the flip is the same deterministic md5 gate as
    ``split_train_eval`` (engine-portable, any parallelism).

    ``components`` is the ``(node, component)`` frame from
    ``dedup.connected_components`` over any of the pair generators.
    Documents absent from the graph (singletons — in practice almost
    the whole corpus) fall back to their own id, i.e. exactly the
    plain hash split.

    Scale shape: the components frame is 8-16 B per DUPLICATE-graph
    node (not per corpus row); the single join is id-keyed and AQE
    broadcasts the label side whenever the dup graph is small relative
    to the corpus. The split column itself is a narrow projection — no
    second shuffle.
    """
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError(f"eval_fraction must be in [0, 1], got {eval_fraction}")
    threshold = int(eval_fraction * _SCALE)
    comp = components.select(
        F.col("node").alias(id_col), F.col("component").alias("_cs_comp")
    )
    group = F.coalesce(F.col("_cs_comp"), F.col(id_col))
    h = sample_hash(group.cast("string"), seed)
    return (
        docs.join(comp, id_col, "left")
        .withColumn(component_col, group)
        .withColumn(
            split_col,
            F.when(h < F.lit(threshold), F.lit("eval")).otherwise(F.lit("train")),
        )
        .drop("_cs_comp")
    )


def stratified_quota(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int | dict[str, int],
    key_col: str,
    seed: int = 0,
    audit: bool = False,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, selected in hash
    order (deterministic pseudo-random, id-tie-broken). One shuffle
    keyed on the stratum; skewed strata are bounded by the quota
    itself — the window only has to RANK, never materialize, beyond
    n rows per partition after the limit pushdown.

    ``n_per_stratum`` may be a per-stratum dict (missing strata get
    quota 0 — explicit allowlist semantics, the mixture_epochs
    convention); the exact-count contract is min(quota, stratum
    size). With ``audit=True`` every input row is kept and stamped
    (``stratum_col``, ``key_col``, ``rank``, ``kept``) — the
    url_filter audit convention for review-batch / eval-set
    construction; the default remains the filtered subset with the
    original columns. Membership is NOT insertion-stable: adding
    rows can displace boundary ranks — exact counts and stable
    membership are mutually exclusive; hash_sample is the
    stable-membership tier.
    """
    if isinstance(n_per_stratum, dict):
        for v in n_per_stratum.values():
            if v < 0:
                raise ValueError(f"negative quota in {n_per_stratum!r}")
        if n_per_stratum:
            pairs = ", ".join(
                f"'{k}', {int(v)}" for k, v in sorted(n_per_stratum.items())
            )
            qcol = F.expr(
                f"coalesce(element_at(map({pairs}), {stratum_col}), 0)"
            )
        else:
            qcol = F.lit(0)
    else:
        if n_per_stratum <= 0:
            raise ValueError("n_per_stratum must be positive")
        qcol = F.lit(int(n_per_stratum))
    h = sample_hash(F.col(key_col), seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    ranked = df.withColumn("_rank", F.row_number().over(w))
    if audit:
        return ranked.select(
            stratum_col,
            key_col,
            F.col("_rank").cast("long").alias("rank"),
            (F.col("_rank") <= qcol).alias("kept"),
        )
    return ranked.filter(F.col("_rank") <= qcol).drop("_rank")


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_buckets: int = 64,
    sep_tokens: int = 1,
    seed: int = 0,
    token_counter: str = "whitespace",
) -> DataFrame:
    """GPT-style sequence packing: concatenate-then-chunk a corpus into
    fixed ``budget``-token context windows, distributed.

    The classic pretraining layout streams documents back to back (one
    separator token between docs) and slices the stream into windows;
    a doc may straddle a window boundary. Done naively that stream is a
    global total order — a single reducer. Here the corpus is split
    into ``n_buckets`` independent streams by the portable md5 hash of
    the id, and each stream is packed separately: one shuffle keyed on
    (bucket), parallelism = n_buckets, identical output at any cluster
    size. At 100 TB set n_buckets ≈ a few × cores so each stream's
    running sum is a short per-partition scan; skew is structurally
    impossible (hash-uniform buckets, window work is O(rows)).

    Returns one row per doc: ``bucket``, ``tok_count``, ``start_off``
    (token offset of the doc in its stream), ``pack_first``/
    ``pack_last`` (window indexes the doc lands in). With the default
    ``token_counter="whitespace"`` every column is an integer
    expression, so the DuckDB oracle reproduces the exact assignment
    (contract query ``pack_sequences``). ``token_counter="bpe"``
    prices the budget in REAL subword tokens (deterministic byte-level
    BPE, functions/bpe.py — whitespace counts misprice CJK and code by
    an order of magnitude); the Arrow pandas UDF count is not
    SQL-expressible, so that mode's contract query
    (``pack_sequences_bpe``) is rows-only, gated by the in-suite exact
    twin against the pure-Python encoder (tests/test_bpe.py).
    """
    if budget <= 0 or n_buckets <= 0:
        raise ValueError("budget and n_buckets must be positive")
    if token_counter == "whitespace":
        from beats_spark.operators.textstats import token_count_whitespace

        toks = token_count_whitespace(F.col(text_col))
    elif token_counter == "bpe":
        from beats_spark.functions.bpe import bpe_token_count

        toks = bpe_token_count(F.col(text_col))
    else:
        raise ValueError(f"unknown token_counter {token_counter!r}")
    bucket = sample_hash(F.col(id_col), seed=seed) % n_buckets
    base = df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        toks.cast("long").alias("tok_count"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.col("tok_count") + sep_tokens).over(w), F.lit(0)
    )
    out = base.withColumn("start_off", start)
    end_tok = F.col("start_off") + F.greatest(F.col("tok_count"), F.lit(1))
    return out.withColumns(
        {
            "pack_first": F.floor(F.col("start_off") / budget).cast("long"),
            "pack_last": F.floor((end_tok - 1) / budget).cast("long"),
        }
    )


def pack_manifest(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_buckets: int = 64,
    sep_tokens: int = 1,
    seed: int = 0,
    token_counter: str = "whitespace",
) -> DataFrame:
    """The trainer-facing view of :func:`pack_sequences`: one row per
    (document × context window it intersects) — the read plan a data
    loader executes to assemble window ``pack_idx`` of stream
    ``bucket``.

    Columns: ``bucket``, ``pack_idx``, ``id_col``, ``doc_from_tok``
    (offset INSIDE the doc where this window's slice starts),
    ``win_from_tok`` (offset inside the window where the slice lands),
    ``n_toks`` (slice length). Every value is an integer derived from
    the same layout pack_sequences emits, so the manifest is
    reproducible at any parallelism and the DuckDB oracle replays it
    exactly (contract query ``pack_manifest``). Invariant (tested):
    per (bucket, pack_idx), sum(n_toks) + separators == budget for
    every full window.

    Plan: pack_sequences' single window shuffle, then a narrow
    explode over ``sequence(pack_first, pack_last)`` — a doc adds one
    manifest row per window it touches, so output size is
    O(docs + total_tokens/budget), never quadratic.
    """
    layout = pack_sequences(
        df,
        text_col=text_col,
        id_col=id_col,
        budget=budget,
        n_buckets=n_buckets,
        sep_tokens=sep_tokens,
        seed=seed,
        token_counter=token_counter,
    )
    w = F.col("pack_idx")
    start, toks = F.col("start_off"), F.greatest(F.col("tok_count"), F.lit(1))
    seg_start = F.greatest(start, w * budget)
    seg_end = F.least(start + toks, (w + 1) * budget)
    return (
        layout.select(
            "bucket",
            F.col(id_col),
            "start_off",
            "tok_count",
            F.explode(F.sequence("pack_first", "pack_last")).alias("pack_idx"),
        )
        .select(
            "bucket",
            w.cast("long").alias("pack_idx"),
            F.col(id_col),
            (seg_start - start).cast("long").alias("doc_from_tok"),
            (seg_start - w * budget).cast("long").alias("win_from_tok"),
            (seg_end - seg_start).cast("long").alias("n_toks"),
        )
    )


def _unigram_bigram_grams(
    frame: DataFrame, text_col: str, keep_cols: list[str]
) -> DataFrame:
    """(keep_cols..., _g): normalized unigrams + bigrams WITH
    multiplicity, empties dropped — the DSIR featurizer, shared by the
    importance-weighting and divergence ops. Narrow explode."""
    from beats_spark.operators.dedup import tokens

    toks = tokens(F.col(text_col))
    cnt = F.size(toks)
    bi_idx = F.sequence(F.lit(0), F.greatest(cnt - 2, F.lit(0)))
    bigrams = F.transform(
        bi_idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2))
    )
    cols = [F.col(c) for c in keep_cols] + [
        F.explode(F.concat(toks, bigrams)).alias("_g")
    ]
    return frame.select(*cols).where(F.col("_g") != "")


def domain_divergence(
    df: DataFrame,
    stratum_col: str,
    text_col: str = "text",
    *,
    n_buckets: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Per-stratum distribution-drift report: KL(stratum ‖ corpus) over
    the hashed unigram+bigram bucket models, in integer floor-log2
    bits — which sources/languages/domains diverge most from the
    corpus mixture. The standard corpus-observability sweep a training
    pipeline runs per ingest batch (is the new crawl slice
    distributionally novel, or more of the same?).

    Per stratum s with bucket counts c_s[b] (total T_s) against the
    global counts c[b] (total T), with add-one/add-B smoothing:

        kl_mbits(s) = Σ_b c_s[b]·[L(1+c_s[b]) − L(T_s+B)
                                − L(1+c[b])  + L(T+B)]

    where L(n) is log2 in integer MILLIBITS: 1000·fl2(n) plus a
    linearly-interpolated fractional part ((n − 2^fl2)·1000 div 2^fl2)
    — max error 0.086 bits per term vs the full bit of error bare
    floor-log2 carries, which was enough to scramble the stratum
    ordering. Every step is integer (2^fl2 via pow(2, f) is an exact
    double for f < 52, cast back) → engine-portable, the
    unigram_surprisal discipline at 1000× resolution.
    ``kl_mean_mbits`` = kl_mbits div T_s (mean millibits per gram).

    Reading the estimator: log2 is concave, so the chord-interpolated
    L sits at-or-below the true log2 on every term — the four biases
    partially cancel but net slightly NEGATIVE, so values read as
    "KL minus a small per-gram bias" (≤ 86 mbits worst case) and a
    near-corpus stratum lands near zero rather than exactly at it.
    Rank strata by |kl_mean_mbits| (or against the majority stratum's
    baseline); on the sf0.01 test corpus the majority language sits
    ~20× closer to zero than any minority language — at smaller
    sub-corpus sizes sampling noise dominates the ranking, as it
    would for any divergence estimator.

    Scale shape: ONE corpus pass — explode → groupBy(stratum, bucket)
    with map-side partial aggregation onto ≤ strata×n_buckets keys;
    everything after operates on that tiny frame (global counts =
    re-aggregate of it; the join keys are (bucket) over ≤ n_buckets
    rows). No collect, no skew.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    from beats_spark.operators.scale import spread

    from pyspark import StorageLevel

    grams = _unigram_bigram_grams(spread(df), text_col, [stratum_col])
    # ≤ strata×n_buckets rows, consumed by FOUR subtrees (global
    # counts, stratum totals, grand total, the join) — persist or each
    # consumer recomputes the corpus explode (the dsir_weights lesson).
    sb = (
        grams.groupBy(
            F.col(stratum_col).alias("_s"),
            (sample_hash(F.col("_g"), seed) % n_buckets).alias("_b"),
        ).agg(F.count(F.lit(1)).alias("_c"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    glob = sb.groupBy("_b").agg(F.sum("_c").alias("_cg"))
    totals_s = sb.groupBy("_s").agg(F.sum("_c").alias("_ts"))
    total = glob.agg(F.sum("_cg").alias("_t"))
    def L(x: str) -> str:
        f = f"(length(bin({x})) - 1)"
        p = f"cast(pow(2.0, {f}) as bigint)"
        return f"(1000 * {f} + (1000 * (({x}) - {p})) div {p})"

    term = F.expr(
        f"_c * ({L('_c + 1')} - {L(f'_ts + {n_buckets}')} "
        f"- {L('_cg + 1')} + {L(f'_t + {n_buckets}')})"
    )
    joined = (
        sb.join(glob, "_b")
        .join(totals_s, "_s")
        .crossJoin(total)
        .select("_s", "_ts", term.alias("_term"))
    )
    return (
        joined.groupBy("_s", "_ts")
        .agg(F.sum("_term").alias("kl_mbits"))
        .select(
            F.col("_s").alias(stratum_col),
            F.col("_ts").cast("long").alias("n_grams"),
            F.col("kl_mbits").cast("long").alias("kl_mbits"),
            F.expr("kl_mbits div greatest(_ts, 1)")
            .cast("long")
            .alias("kl_mean_mbits"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much it resembles a TARGET domain corpus, using
    hashed-n-gram bag-of-words likelihood ratios.

    Published method: featurize docs as counts over ``n_buckets``
    hashed unigram+bigram buckets, fit two smoothed unigram models
    p (target) and q (raw), weight each doc by
    ``log w = Σ_grams [log p(bucket) − log q(bucket)]``, then resample
    proportionally. Two deliberate deviations keep the signal
    engine-portable and deterministic (the repo's oracle discipline):

    - logs are the INTEGER ``floor(log2(n)) = length(bin(n)) − 1``
      (the unigram_surprisal trick), with add-one smoothing on bucket
      counts and add-``n_buckets`` on totals, so every engine agrees
      bit-for-bit;
    - the final Gumbel-noise resampling step is replaced by
      deterministic selection on the weight (callers rank by
      ``dsir_milli`` or threshold it; ``hash_sample`` composes for the
      stochastic flavor).

    Per doc: ``log2 w ≈ Σ_grams [fl2(1+cnt_t(b)) − fl2(1+cnt_r(b))]
    + n_grams·[fl2(T_r+B) − fl2(T_t+B)]`` — the corpus-constant term
    rides at doc level so totals never join the big explode.

    Returns (id, n_grams, dsir_bits, dsir_milli = bits×1000 div
    n_grams).

    Scale shape (the 100 TB story): gram explode is narrow; BOTH
    model fits are groupBy(bucket) with map-side partial aggregation
    onto at most ``n_buckets`` keys (tiny, uniform) and collect only
    ``n_buckets`` integers to the driver (bounded by construction —
    the kmeans-partials precedent); the bucket→weight table compiles
    into the scoring projection as a literal map, so the only
    full-corpus shuffles are the (id, bucket) aggregation (persisted,
    computed once) and the final groupBy(id) over it. No skew (md5
    buckets are uniform).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    from beats_spark.operators.scale import spread

    # tokenize+hash is the heavy per-doc work — never on a single-file
    # scan's one partition (CLAUDE.md invariant)
    df = spread(df)
    target = spread(target)

    def grams_of(frame: DataFrame, keep_id: bool) -> DataFrame:
        g = _unigram_bigram_grams(
            frame, text_col, [id_col] if keep_id else []
        )
        return g.withColumnRenamed(id_col, "_id") if keep_id else g

    def bucket_of(g: Column) -> Column:
        return sample_hash(g, seed) % n_buckets

    # FIT phase — like the published method, the two bucket models are
    # materialized first: each is ≤ n_buckets integers, a bounded
    # driver collect (the kmeans-partials precedent). Keeping them
    # lazy instead costs a full-outer join, two totals aggregations
    # and a crossJoin — ~6 extra stages whose flat per-shuffle
    # scheduling overhead dwarfs the arithmetic (measured 16.7 s → 6 s
    # at sf0.1 on local[32]).
    from pyspark import StorageLevel

    t_rows = dict(
        grams_of(target, keep_id=False)
        .groupBy(bucket_of(F.col("_g")).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_ct"))
        .collect()
    )
    # ONE pass over the raw corpus: aggregate straight to (id, bucket,
    # count) and persist THAT — the q-model fit and the per-doc score
    # both consume it, and it is ≤ n_buckets rows per doc, orders of
    # magnitude smaller than the gram occurrences (the minhash
    # band-index persist rule).
    raw_ib = (
        grams_of(df, keep_id=True)
        .groupBy("_id", bucket_of(F.col("_g")).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    r_rows = dict(
        raw_ib.groupBy("_b").agg(F.sum("_n").alias("_cr")).collect()
    )

    def fl2_i(n: int) -> int:
        return n.bit_length() - 1

    const = fl2_i(sum(r_rows.values()) + n_buckets) - fl2_i(
        sum(t_rows.values()) + n_buckets
    )
    # SCORE phase — per-gram weight is a 512-entry literal-map lookup
    # compiled into codegen (one F.expr string, not 1000 py4j calls);
    # the only remaining shuffle is the doc-keyed aggregation.
    entries = ", ".join(
        f"{b}, {fl2_i(t_rows.get(b, 0) + 1) - fl2_i(cr + 1)}"
        for b, cr in sorted(r_rows.items())
    )
    w = F.expr(f"element_at(map({entries}), cast(_b as int))") if entries else F.lit(0)
    return (
        raw_ib.groupBy("_id")
        .agg(
            F.sum("_n").alias("n_grams"),
            F.sum(w * F.col("_n")).alias("_wsum"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            (F.col("_wsum") + F.col("n_grams") * const)
            .cast("long")
            .alias("dsir_bits"),
        )
        .withColumn(
            "dsir_milli",
            F.expr("dsir_bits * 1000 div greatest(n_grams, 1)"),
        )
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_weight: float = 1.0,
    copy_col: str = "mix_copy",
) -> DataFrame:
    """Domain mixing for training-corpus construction: resample each
    stratum (source, language, domain bucket) to a target weight.

    ``weight < 1``  — Bernoulli subsample (hash threshold, exact in
    expectation); ``weight > 1`` — upsample: ``floor(w)`` exact copies
    plus one fractional top-up copy decided by the same hash. Every
    surviving row carries ``copy_col`` (0-based copy index) so
    downstream dedup/packing can tell replicas apart. ``weight == 0``
    drops the stratum.

    Deterministic and cluster-size-independent: the per-row decision is
    a pure function of ``(seed, key)`` via the portable md5 hash
    (sample_hash), so the same corpus yields the same mixture on 1 or
    1000 executors — and a DuckDB oracle replays it exactly.

    Scale shape: a narrow projection + explode(array_repeat) — NO
    shuffle. Upsampling multiplies rows inside each input partition;
    at extreme weights follow with ``spread()`` (operators/scale.py)
    before a heavy downstream stage. Strata not listed in ``weights``
    get ``default_weight`` (1.0 = pass through unchanged).
    """
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for stratum {name!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight: {default_weight}")

    h = sample_hash(F.col(key_col), seed)

    def copies_for(w: float):
        full = int(w)
        frac_threshold = int((w - full) * _SCALE)
        n = F.lit(full) + F.when(h < F.lit(frac_threshold), 1).otherwise(0)
        return n

    expr = None
    for name, w in weights.items():
        cond = F.col(stratum_col) == name
        n = copies_for(w)
        expr = F.when(cond, n) if expr is None else expr.when(cond, n)
    n_copies = (
        copies_for(default_weight)
        if expr is None
        else expr.otherwise(copies_for(default_weight))
    )
    out = df.select(
        "*",
        F.posexplode(F.array_repeat(F.lit(1), n_copies)).alias(copy_col, "_mix_one"),
    ).drop("_mix_one")
    return out.withColumn(copy_col, F.col(copy_col).cast("long"))


def _isqrt(x: Column) -> Column:
    """Exact integer square root floor(sqrt(x)) for non-negative
    BIGINT x. The double sqrt gives a candidate within ±1; two integer
    corrections make the result exact regardless of the engine's
    float rounding — so a DuckDB oracle replaying the same three
    steps agrees bit-for-bit. Domain: x <= ~9.2e18 (int64); the
    (c+1)^2 probe stays in range for any such x except the top
    ~6e9-wide sliver below int64 max — i.e. safe for
    temperature_weights up to ~9.2e12 docs per stratum (9x the
    10^12-turn design target)."""
    c = F.floor(F.sqrt(x.cast("double"))).cast("long")
    c = F.when((c + 1) * (c + 1) <= x, c + 1).otherwise(c)
    return F.when(c * c > x, c - 1).otherwise(c)


def temperature_weights(
    df: DataFrame,
    stratum_col: str,
) -> DataFrame:
    """mT5-style temperature sampling weights (Xue et al. 2021 §3.1)
    at T=2 (alpha = 1/2): per stratum (language, source, domain),
    the raw share p_l = n_l/N, the temperature-flattened target share
    q_l proportional to sqrt(n_l), and the resulting per-stratum boost
    q_l/p_l — the weights dict a curator feeds ``mixture_sample`` to
    up-sample tail languages without letting the head dominate.

    Integer-exact and oracle-portable: shares are milli integers
    (x1000, floor division); sqrt(n_l) is computed as the EXACT
    integer sqrt of n_l * 10^6 (double sqrt candidate + two integer
    corrections — engine float rounding cannot leak into the result),
    and ``boost_milli`` is derived from the milli-rounded shares by
    the same integer formula on both engines. alpha other than 1/2
    needs float powers and is deliberately not offered here.

    Scale shape: one groupBy(stratum) with map-side combine (the only
    corpus-sized work), then one window pass over the stratum frame —
    bounded by the number of strata (languages/sources), tiny by
    construction. Returns (stratum, n_docs, p_milli, q_milli,
    boost_milli).
    """
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    s = _isqrt(F.col("n_docs") * F.lit(1000000))
    w = Window.orderBy("stratum").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = (
        counts.withColumn("_s", s)
        .withColumn("_n_tot", F.sum("n_docs").over(w))
        .withColumn("_s_tot", F.sum("_s").over(w))
        .withColumn("p_milli", F.expr("n_docs * 1000 div _n_tot"))
        .withColumn("q_milli", F.expr("_s * 1000 div _s_tot"))
        # boost from MICRO-precision shares, not the reported milli
        # ones: at milli precision a stratum with share < 1e-3 of the
        # sqrt mass quantizes to q_milli = 0 and its boost collapses
        # to 0 (deleting the tail the flattening exists to protect).
        # Micro shares stay int64-safe (_s <= ~3e9 so _s * 1e6 fits;
        # n * 1e6 fits for corpora to ~9e12 docs) and push that cliff
        # to shares < 1e-12 — an effectively empty stratum.
        .withColumn(
            "boost_milli",
            F.expr(
                "(_s * 1000000 div _s_tot) * 1000"
                " div greatest(n_docs * 1000000 div _n_tot, 1)"
            ),
        )
    )
    return out.select(
        "stratum", "n_docs", "p_milli", "q_milli", "boost_milli"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Sliding-window document chunking — the retrieval/eval-prep
    sibling of pack_sequences: each document becomes overlapping
    ``chunk_tokens``-token windows stepping by ``chunk_tokens −
    overlap_tokens``, so every token is covered and adjacent chunks
    share ``overlap_tokens`` of context (the standard RAG/eval
    chunking rule). Start offsets are 0, step, 2·step, … up to the
    last offset that contributes at least one NEW token beyond the
    overlap; the final chunk may be shorter. Blank/NULL documents
    emit no chunks.

    Returns one row per chunk: id, ``chunk_idx``, ``chunk_start``
    (token offset), ``chunk_len`` (tokens in this chunk), and
    ``chunk_text`` (tokens re-joined with single spaces — whitespace
    runs normalize, same convention as token_count_whitespace).

    Scale shape: split + transform(sequence) + one narrow explode —
    ZERO shuffles; a document's chunks materialize in its own task.
    Downstream consumers (embedding, dedup) pay the first shuffle.
    """
    if chunk_tokens <= 0 or overlap_tokens < 0 or overlap_tokens >= chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    # regexp strip, NOT F.trim: trim removes only ASCII spaces, so a
    # trailing newline/tab would leave a phantom empty token
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")

    def _chunks_of(toks):
        n = F.size(toks)
        starts = F.sequence(
            F.lit(0),
            F.greatest(n - overlap_tokens - 1, F.lit(0)),
            F.lit(step),
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_idx"),
                s.alias("chunk_start"),
                (F.least(s + chunk_tokens, n) - s).alias("chunk_len"),
                F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias(
                    "chunk_text"
                ),
            ),
        )

    # let-binding idiom (CLAUDE.md): bind the token array ONCE per row;
    # referencing the split expr directly inside the lambda would
    # re-tokenize the full text per chunk (O(chunks × text))
    chunks = F.element_at(
        F.transform(F.array(F.split(stripped, r"\s+")), _chunks_of), 1
    )
    base = df.where(F.col(text_col).isNotNull() & (stripped != ""))
    ex = base.select(F.col(id_col), F.explode(chunks).alias("_c"))
    return ex.select(
        id_col,
        F.col("_c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_c.chunk_start").cast("long").alias("chunk_start"),
        F.col("_c.chunk_len").cast("long").alias("chunk_len"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-order shuffle + shard assignment: the
    step between a curated corpus and the files a data loader reads.
    Every row gets ``shard = hash % n_shards`` and ``pos`` = its
    0-based position within the shard in hash order — a reproducible
    global permutation addressable as (shard, pos), independent of
    input partitioning or cluster size. Writing partitioned by
    ``shard`` with ``sortWithinPartitions(pos)`` then yields the
    standard pre-shuffled training shards.

    Deliberately NOT a global orderBy: a total order is a range
    shuffle whose skew is the sort key's, and no loader needs it —
    per-shard order plus a shard-level read schedule is the same
    permutation. One hash shuffle on the shard key, per-shard local
    sort; ties (hash collisions) break on ``key_col`` so the
    permutation is total. At 10^10 docs and 4096 shards each shard
    sorts ~2.4M (hash, key) pairs — kilobytes per row never move,
    only the projection being written.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = sample_hash(F.col(key_col), seed)
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_h", h)
        .withColumn(shard_col, F.pmod(F.col("_h"), F.lit(n_shards)))
        .withColumn(pos_col, F.row_number().over(w) - F.lit(1))
        .drop("_h")
    )


def mixture_epochs(
    df: DataFrame,
    source_col: str,
    token_col: Column,
    budget_tokens: int,
    weights_milli: dict[str, int] | None = None,
    max_epochs_milli: int = 4000,
) -> DataFrame:
    """Repeat-factor planner for a token-budgeted training mixture.

    Given per-document token counts and a total training budget,
    compute — per source — how many epochs (in milli-epochs, so 1500
    = "see this source 1.5 times") the trainer should take to hit the
    mixture weights without exceeding the data-repetition cap
    (Muennighoff et al. 2023 show returns diminish past ~4 epochs,
    hence the default cap of 4000 milli).

    ``weights_milli`` maps source → desired share in milli (parts per
    1000); sources absent from the map get weight 0. ``None`` means
    uniform: each source gets floor(1000 / n_sources) — computed from
    the aggregated frame itself, so the plan stays one shuffle.

    Outputs per source: ``n_docs``, ``tokens`` (available),
    ``weight_milli``, ``target_tokens`` = floor(budget·w/1000),
    ``epochs_milli`` = min(cap, floor(target·1000/tokens)) and
    ``planned_tokens`` = floor(tokens·epochs_milli/1000). Pure 64-bit
    integer arithmetic (budget ≤ ~9·10¹⁵ before the ·1000 step can
    overflow — far above any real token budget), DuckDB-exact.

    Scale: one groupBy on source (map-side combine; sources number in
    the dozens), then scalar math on a tiny frame. The weights map is
    compiled into the plan as a literal CASE — no join.
    """
    per_source = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(token_col, F.lit(0))).cast("long").alias("tokens"),
    )
    if weights_milli is None:
        # persist: per_source feeds both the n_sources agg and the
        # crossJoin — without it the corpus groupBy runs twice
        # (ReuseExchange doesn't fire under joins; CLAUDE.md). The
        # frame is one row per source, so the cache is trivial.
        per_source = per_source.persist()
        totals = per_source.agg(F.count(F.lit(1)).alias("n_sources"))
        per_source = per_source.crossJoin(F.broadcast(totals))
        weight = F.expr("1000 div n_sources")
    else:
        weight = F.lit(0)
        for src, w in sorted(weights_milli.items()):
            weight = F.when(F.col(source_col) == src, F.lit(int(w))).otherwise(
                weight
            )
    stage = per_source.select(
        F.col(source_col),
        "n_docs",
        "tokens",
        weight.cast("long").alias("weight_milli"),
    )
    target = F.expr(f"{int(budget_tokens)} * weight_milli div 1000")
    stage = stage.withColumn("target_tokens", target)
    epochs = F.when(F.col("tokens") <= 0, F.lit(0)).otherwise(
        F.when(
            F.expr("target_tokens * 1000 div tokens") > max_epochs_milli,
            F.lit(int(max_epochs_milli)),
        ).otherwise(F.expr("target_tokens * 1000 div tokens"))
    )
    stage = stage.withColumn("epochs_milli", epochs.cast("long"))
    return stage.withColumn(
        "planned_tokens", F.expr("tokens * epochs_milli div 1000")
    )


def padding_stats(
    df: DataFrame, token_col: Column, bucket: int = 128
) -> DataFrame:
    """Length-bucket padding audit: what a fixed-length batcher wastes.

    Sequences are binned by their padded length (``cap`` = token count
    rounded UP to the next multiple of ``bucket``; empty docs land in
    the first bucket). Per bucket: sequence count, real tokens, padding
    tokens a naive pad-to-cap batcher would burn, and the packing
    efficiency in ppm. The corpus-level roll-up of ``padding`` is the
    business case for pack_sequences — this operator produces the
    number.

    Integer-exact (DuckDB-oracle-safe), one shuffle on a small integer
    key with map-side combine; output is ≤ max_len/bucket rows.
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be positive, got {bucket}")
    toks = F.coalesce(token_col, F.lit(0)).cast("long")
    cap = F.expr(
        f"((greatest(_toks, 1) + {int(bucket)} - 1) div {int(bucket)})"
        f" * {int(bucket)}"
    )
    binned = df.select(toks.alias("_toks")).select(
        "_toks", cap.alias("cap")
    )
    agg = binned.groupBy("cap").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("_toks").cast("long").alias("token_sum"),
    )
    # eff_ppm widens through decimal(38,0): a single bucket of a
    # 100 TB corpus can hold > 9.2e12 tokens, where the bare int64
    # ·10⁶ multiply would ANSI-overflow (DuckDB promotes to HUGEINT
    # silently, so only Spark would crash — widen to match).
    return agg.select(
        "cap",
        "n_seqs",
        "token_sum",
        F.expr("n_seqs * cap - token_sum").alias("padding"),
        F.expr(
            "cast(cast(token_sum as decimal(38,0)) * 1000000"
            " div (n_seqs * cap) as bigint)"
        ).alias("eff_ppm"),
    )


def cluster_balance(
    df: DataFrame,
    centroids: list[list[int]],
    cap_per_cluster: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Cluster-balanced downsampling over embedding cells: assign each
    vector to its nearest centroid, then thin every over-represented
    cluster down to ~``cap_per_cluster`` members with a deterministic
    hash gate — the topic-balancing pass that keeps one boilerplate-
    heavy cluster (license pages, SEO spam) from dominating a
    pretraining mixture (cluster-based curation à la DataComp, Gadre
    et al. 2023 §4.2; SemDeDup's cluster-prune stage, Abbas et al.
    2023).

    Emits (id, cell, n_cluster, kept): clusters at/below the cap keep
    everything; above it each member survives with probability
    cap/n_cluster via the portable 60-bit md5 hash — expected
    survivors ≈ cap, deterministic for a fixed corpus and seed, and
    reproducible at any parallelism (no rank window, no global sort).

    Integer discipline: the gate compares the hash's top 40 bits
    against floor(2^40·cap / n_cluster) — all int64-exact, DuckDB-
    replayable (`cap_per_cluster` ≤ 2^22 so the numerator cannot
    overflow; a trainer cap is thousands, not millions).

    100 TB plan: cell assignment is a zero-shuffle codegen projection
    (:func:`~beats_spark.operators.similarity.assign_cells_quantized`);
    cluster counts are one map-side-combined groupBy on a ≤n_cells
    key; the counts frame (n_cells rows) broadcast-joins back, so the
    corpus itself never shuffles. An exact-quota variant would need a
    per-cluster rank window — a straggler on exactly the mega-clusters
    this op exists to thin — so the hash gate is the scale design,
    not a shortcut.
    """
    if not 0 < cap_per_cluster <= (1 << 22):
        raise ValueError(
            f"cap_per_cluster must be in (0, 2^22], got {cap_per_cluster}"
        )
    from beats_spark.operators.scale import spread
    from beats_spark.operators.similarity import assign_cells_quantized

    # spread: a single-file embeddings scan is one input partition;
    # persist: the assignment frame feeds BOTH the counts aggregate and
    # the join back, and the n_cells×dim dot-product tree re-inlines
    # per consumer otherwise (the CLAUDE.md invariant — this operator
    # measured 7.5 s → 1.1 s at sf0.1 with spread+persist plus the
    # let-bound single-expr assignment)
    cells = assign_cells_quantized(
        spread(df), centroids, vec_col, id_col
    ).persist()
    counts = cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_cluster")
    )
    joined = cells.join(counts, "cell")
    h40 = F.shiftright(sample_hash(F.col(id_col), seed), 20)
    numer = (1 << 40) * cap_per_cluster
    kept = (F.col("n_cluster") <= cap_per_cluster) | (
        h40 < F.expr(f"{numer} div n_cluster")
    )
    return joined.select(
        F.col(id_col), "cell", "n_cluster", kept.alias("kept")
    )


def budget_select(
    df: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "q_milli",
    tokens_col: str = "n_toks",
    budget_tokens: int = 100_000,
    n_buckets: int = 256,
) -> DataFrame:
    """Greedy quality-per-token corpus selection under a global token
    budget — the classic density-ordered knapsack relaxation every
    "best N-billion-token subset" curation pass runs: rank documents
    by value density (quality per token, exact integer micro scale),
    keep the maximal density-ordered prefix whose cumulative token
    count fits the budget. Tokens are non-negative, so the running
    sum is monotone and the kept set is EXACTLY a prefix — no holes,
    no re-scan, deterministic.

    Emits one AUDIT row per doc (the url_filter convention):
    ``id_col``, ``tokens_col``, ``density_micro`` (quality·1000 div
    max(tokens,1) — CASE-guarded, not greatest), ``rank`` (1-based
    density order, id tie-break), ``cum_tokens`` (inclusive running
    sum in that order), ``kept`` (cum_tokens ≤ budget).

    100 TB shape: the naive plan — SUM() OVER (ORDER BY density) — is
    a single-partition global sort of the corpus; this reuses
    layout.running_prefix (range-bucket → per-bucket parallel window
    → n_buckets-row offset broadcast), so the only bounded-by-one-
    partition step is the n_buckets-row bucket-total prefix. The
    density order key is (-density, id): ints stay far inside the
    negatable range (no int64.min sentinel wrap, CLAUDE.md).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    base = df.select(
        F.col(id_col),
        toks.alias(tokens_col),
        F.col(quality_col).cast("long").alias("_q"),
    ).withColumn(
        "density_micro",
        F.expr(
            f"cast((_q * 1000) div "
            f"(case when {tokens_col} >= 1 then {tokens_col} else 1 end) "
            "as long)"
        ),
    )
    from beats_spark.operators.layout import running_prefix

    ranked = running_prefix(
        base.withColumn("_neg_d", -F.col("density_micro")),
        order_cols=["_neg_d", id_col],
        size_col=tokens_col,
        n_buckets=n_buckets,
    )
    return ranked.select(
        F.col(id_col),
        F.col(tokens_col),
        "density_micro",
        F.col("rank").cast("long").alias("rank"),
        (F.col("prefix_sum") + F.col(tokens_col))
        .cast("long")
        .alias("cum_tokens"),
        (
            (F.col("prefix_sum") + F.col(tokens_col)) <= F.lit(budget_tokens)
        ).alias("kept"),
    )


def filter_cascade(
    df: DataFrame,
    filters: dict[str, tuple], 
) -> DataFrame:
    """Quality-gate cascade planner — the pipeline-economics question
    every multi-filter curation stack should answer before burning
    compute: in what ORDER do the gates run, and what does a document
    cost on average once the cheap gates reject early? ``filters``
    maps name → (pass_condition Column, cost_micro per evaluated
    doc). NULL conditions fail closed (tag-and-exclude: an
    unevaluable doc must not skip a gate).

    Plan = gates sorted by measured rejection-per-cost (reject_ppm ·
    10⁶ div cost_micro, name tie-break — the classic
    cheapest-reject-first heuristic), with the expected evaluation
    cost of each position under the independence approximation:
    contribution_i = cost_i · Π_{j<i} pass_ppm_j (exact integer fold,
    rescaled div 10⁶ per step — engine-replayable, unlike a float
    exp-sum-log). Real pass rates are correlated (see signal_mi —
    high-MI gate pairs make independence optimistic); the docstring
    contract is a PLAN and its cost model, not a measured rerun.

    Emits one row per gate: ``position``, ``gate``, ``cost_micro``,
    ``reject_ppm``, ``exp_cost_micro`` (this gate's expected
    contribution), ``survivors_ppm`` (after it). Scale shape: ONE
    corpus-scale aggregate measures every gate's pass count
    simultaneously (the flags ride one projection); ordering and the
    cost fold run on a single collected-to-one-row array of
    |filters| structs — never the corpus.
    """
    if not filters:
        raise ValueError("filters must be non-empty")
    names = sorted(filters)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for name in names:
        cond, cost = filters[name]
        if int(cost) <= 0:
            raise ValueError(f"cost for {name!r} must be > 0")
        aggs.append(
            F.sum(F.coalesce(cond, F.lit(False)).cast("long"))
            .cast("long")
            .alias(f"_p_{name}")
        )
    rates = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.expr(
                    f"cast((_n - _p_{name}) * 1000000 div "
                    f"(case when _n >= 1 then _n else 1 end) as long)"
                ).alias("reject_ppm"),
                F.lit(int(filters[name][1])).cast("long").alias("cost_micro"),
                F.lit(name).alias("gate"),
            )
            for name in names
        ]
    )
    # order key: rejection-per-cost DESC, then gate name — encoded as
    # a sortable struct whose first member is the NEGATED key (well
    # inside the negatable range: ppm ratios, never int64.min —
    # CLAUDE.md sentinel note)
    ordered = rates.withColumn("_s", structs).select(
        F.expr(
            "array_sort(transform(_s, x -> struct("
            "-(x.reject_ppm * 1000000 div x.cost_micro) as negkey,"
            " x.gate as gate, x.reject_ppm as reject_ppm,"
            " x.cost_micro as cost_micro)))"
        ).alias("_o")
    )
    rows = ordered.select(
        F.explode(
            F.expr(
                """transform(sequence(1, size(_o)), i -> struct(
  cast(i as long) as position,
  element_at(_o, i).gate as gate,
  element_at(_o, i).cost_micro as cost_micro,
  element_at(_o, i).reject_ppm as reject_ppm,
  cast(element_at(_o, i).cost_micro * aggregate(slice(_o, 1, i - 1),
       1000000L, (acc, x) -> acc * (1000000 - x.reject_ppm)
                 div 1000000) div 1000000 as long) as exp_cost_micro,
  cast(aggregate(slice(_o, 1, i), 1000000L,
       (acc, x) -> acc * (1000000 - x.reject_ppm) div 1000000)
       as long) as survivors_ppm))"""
            )
        ).alias("_r")
    ).select("_r.*")
    return rows
