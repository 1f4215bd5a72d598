"""Large-scale deduplication operators.

The reference has no dedup (a log shipper dedups at the sink via
``@metadata._id``; libbeat/beat/events/util.go:27-44 and the add_id
processor are the closest analogues) — these operators exist because a
100 TB training-data pipeline needs them as first-class citizens.

Design rules (scale-first):

- **Everything hot is a JVM column expression.** Shingling, hashing,
  MinHash, SimHash and Jaccard are built from ``split`` / ``transform``
  / ``aggregate`` / ``xxhash64`` / ``array_min`` — zero Python in the
  data path, whole-stage-codegen friendly.
- **Exact dedup is one partial-aggregated groupBy** (map-side combine
  does most of the work before the shuffle); representatives are chosen
  by ``min(id)`` so the result is deterministic at any parallelism.
- **Near-dup goes candidate-generation → exact-verify.** MinHash-LSH
  banding turns the O(n²) pair space into per-bucket joins; the verify
  stage recomputes exact Jaccard so false positives never escape. At
  100 TB only the per-band groupBy shuffles, keyed on (band, signature)
  — uniform by construction because signatures are hashes.
- Hot buckets (a shingle set shared by millions of docs) are capped with
  ``max_bucket`` to bound the quadratic blow-up inside a single bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: classic universal-hash modulus. Coefficients
# are capped at 31 bits and the base hash at 32 bits so a*x+b <
# 2^31 * 2^32 = 2^63 — exact in a Spark LongType, no overflow.
_MERSENNE61 = (1 << 61) - 1
_MAX32 = (1 << 32) - 1
_MAX31 = (1 << 31) - 1


def normalize_text(col: Column) -> Column:
    """Canonical text for dedup: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def shingles(col: Column, n: int = 5) -> Column:
    """Word n-gram shingles as array<string> (distinct, order-free).

    Built JVM-side: ``transform(sequence(0, len-n), i -> concat_ws)``.
    Documents shorter than ``n`` tokens yield one shingle = whole text.
    """
    toks = tokens(col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.slice(toks, i + 1, F.least(F.lit(n), cnt))
        ),
    )
    return F.array_distinct(gram)


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family,
    derived from the seed by splitmix-style mixing (pure Python at plan
    build — never per row)."""
    params = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(num_hashes):
        out = []
        for _ in range(2):
            state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            out.append((z ^ (z >> 31)) & _MAX31)
        a = out[0] | 1  # a must be odd/nonzero
        params.append((a, out[1]))
    return params


def minhash_signature(
    shingle_col: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes``.

    Base hash per shingle is ``pmod(xxhash64(s), 2^32)`` (JVM), lifted
    through ``num_hashes`` universal hashes ``(a*x + b) mod (2^61-1)``;
    the min over shingles is taken with ``array_min`` — one pass per
    hash function over an already-materialized base-hash array, fully
    inside codegen.
    """
    base = F.transform(
        shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MAX32 + 1))
    )

    def _minhash(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(
                base, lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(_MERSENNE61))
            )
        )

    return F.array(*[_minhash(a, b) for a, b in _hash_params(num_hashes, seed)])


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact content dedup: one row per distinct (normalized) text, the
    keeper being the minimum id — deterministic at any parallelism.

    Plan shape: hash the text to a 128-bit group key (two independent
    xxhash64 values — 16 bytes shuffled, not multi-KB text bodies),
    ``groupBy`` with map-side partial aggregation, keep ``min(id)``.
    One shuffle, no window sort. 128 bits because at the multi-billion-
    doc design scale a single 64-bit key has non-negligible birthday
    collisions (~50% at ~5B distinct texts), which would silently drop
    distinct documents; at 128 bits the risk is ~1e-20.
    """
    norm = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    keyed = df.withColumn("_ck", F.xxhash64(norm)).withColumn(
        "_ck2", F.xxhash64(norm, F.lit(1))
    )
    keepers = keyed.groupBy("_ck", "_ck2").agg(F.min(id_col).alias(id_col)).drop(
        "_ck", "_ck2"
    )
    # semi join back to recover full rows; broadcast-eligible when the
    # keeper set is small, AQE decides otherwise.
    return df.join(keepers, id_col, "semi")


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-group summary: (group_key, n_dups, keeper_id) for
    groups with >1 member. Grouped on a 128-bit key (see exact_dedup);
    ``group_key`` exposes the first 64 bits for display/joining."""
    norm = normalize_text(F.col(text_col))
    return (
        df.select(
            F.xxhash64(norm).alias("group_key"),
            F.xxhash64(norm, F.lit(1)).alias("_gk2"),
            F.col(id_col),
        )
        .groupBy("group_key", "_gk2")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
        .drop("_gk2")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string-array columns (as double)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    method: str = "inverted",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    ``method="inverted"`` (default) — inverted-index shape (the
    exact-jaccard analogue of a posting-list join): explode to
    (gram, doc), self-join on the gram, count shared grams per pair,
    then ``J = inter / (|A| + |B| - inter)``. A pair only ever
    materializes if the docs share at least one gram — docs with
    J = 0 (the overwhelming majority) never meet. Measured ~9× the
    blocked array-intersect form at sf0.1; the only shuffle is keyed
    on grams (hash-uniform text; boilerplate grams are the skew risk —
    AQE skew-join splits them, ``block_col`` additionally scopes the
    join). Exact: grams join as full strings, no hashing.

    ``method="block"`` — array-vs-array intersect inside block_col
    groups (cross join when blockless). One row per candidate PAIR
    instead of one per (pair × shared gram), which wins on
    DUPLICATE-HEAVY corpora: k exact copies of a doc cost the
    inverted index k²·|grams| join rows but the block join only k².
    The standard pipeline order avoids the issue entirely — run
    exact_dedup FIRST, near-dup the unique survivors (docs/SCALE.md).

    ``max_doc_freq`` (inverted mode only): drop grams present in more
    than that many docs from the index — the Σ c_g² candidate blowup
    of boilerplate grams (measured: a heavy-hitter phrase pool turned
    50k docs into a 333 s query) is bounded at cap²·n_heavy. APPROXIMATE
    and one-sided: the reported jaccard becomes a LOWER bound (shared
    heavy grams are uncounted, set sizes stay full), so the threshold
    filter can only lose borderline pairs, never fabricate one. Leave
    None for exact results (every oracle-checked query does).

    ``method="prefix"`` — prefix-filtered exact join (PPJoin family,
    see ``_jaccard_pairs_prefix``): indexes only each doc's rarest
    ``|g| − ⌈t·|g|⌉ + 1`` grams, so the candidate blowup runs over the
    rare-gram tail instead of every boilerplate phrase. Exact, no
    ``max_doc_freq`` needed; the scale default for corpora with heavy
    shared boilerplate.

    All methods return identical results when ``max_doc_freq`` is
    None (tests assert it).
    """
    from pyspark import StorageLevel

    from beats_spark.operators.scale import spread

    if method == "block":
        return _jaccard_pairs_block(df, text_col, id_col, n, threshold, block_col)
    if method == "prefix":
        return _jaccard_pairs_prefix(df, text_col, id_col, n, threshold, block_col)
    if method != "inverted":
        raise ValueError(f"unknown jaccard method {method!r}")

    blk = [F.col(block_col).alias("_blk")] if block_col else []
    shingled = spread(df).select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n).alias("_sh"),
        *blk,
    )
    grams = shingled.select(
        "_id",
        F.size("_sh").alias("_n"),
        F.explode("_sh").alias("_g"),
        *([F.col("_blk")] if block_col else []),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    join_keys = ["_g"] + (["_blk"] if block_col else [])
    if max_doc_freq is not None:
        heavy = (
            grams.groupBy(*join_keys)
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select(*join_keys)
        )
        grams = grams.join(heavy, join_keys, "left_anti")
    a = grams.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), *join_keys
    )
    b = grams.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), *join_keys
    )
    inter = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    j = F.col("_inter").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _jaccard_pairs_block(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    block_col: str | None,
) -> DataFrame:
    """Array-intersect variant (see ngram_jaccard_pairs method="block"):
    shingle once + persist, self-join per block (cross join blockless),
    size-ratio prune (J ≤ min/max of set sizes), exact intersect."""
    from pyspark import StorageLevel

    from beats_spark.operators.scale import spread

    shingled = spread(df).select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n).alias("_sh"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    left = shingled.select(
        F.col("_id").alias("id_a"),
        F.col("_sh").alias("sh_a"),
        F.size("_sh").alias("_na"),
        *([F.col("_blk")] if block_col else []),
    )
    right = shingled.select(
        F.col("_id").alias("id_b"),
        F.col("_sh").alias("sh_b"),
        F.size("_sh").alias("_nb"),
        *([F.col("_blk")] if block_col else []),
    )
    joined = (
        left.join(right, on="_blk") if block_col else left.crossJoin(right)
    ).filter(F.col("id_a") < F.col("id_b"))
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    joined = joined.filter(
        F.least(na, nb) >= F.lit(float(threshold)) * F.greatest(na, nb)
    )
    out = joined.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def _jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    block_col: str | None,
) -> DataFrame:
    """Prefix-filtered EXACT Jaccard join (the PPJoin family: Chaudhuri
    et al. ICDE'06 prefix filter; Xiao et al. WWW'08).

    The inverted-index method indexes EVERY gram, so candidate volume is
    Σ_g c_g² over all grams — boilerplate grams dominate. Prefix
    filtering keeps the result exact while indexing only each doc's
    first ``p = |g| − ⌈t·|g|⌉ + 1`` grams under a global order (document
    frequency ascending, gram ascending): J(r,s) ≥ t forces an overlap
    ≥ ⌈t·max(|r|,|s|)⌉, and two sets whose prefixes are disjoint cannot
    reach that overlap. Rare grams fill the prefixes, so the Σ c_g²
    blowup runs over the rare tail only — at 100 TB this is the
    difference between a bounded candidate set and a quadratic one on
    every boilerplate phrase, with no ``max_doc_freq`` approximation.

    Cost shape: one groupBy for document frequency (keyed on gram), one
    window for per-doc prefix selection (keyed on id), the prefix
    self-join (keyed on gram, tiny sides), then an exact array-intersect
    verify of the surviving candidate pairs against the persisted
    shingle table. More shuffles than the inverted index, but each one
    moves a small fraction of the data; candidates — not grams — are
    the scarce resource at scale.
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from beats_spark.operators.scale import spread

    blk = [F.col(block_col).alias("_blk")] if block_col else []
    blkc = [F.col("_blk")] if block_col else []
    gkeys = ["_g"] + (["_blk"] if block_col else [])

    shingled = spread(df).select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n).alias("_sh"),
        *blk,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    grams = shingled.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g"), *blkc
    )
    dfreq = grams.groupBy(*gkeys).agg(F.count(F.lit(1)).alias("_df"))
    # prefix length p = n − ⌈t·n⌉ + 1; the epsilon keeps float rounding
    # on the longer (safe) side so a borderline pair is never dropped.
    p = (
        F.col("_n")
        - F.ceil(F.lit(float(threshold)) * F.col("_n") - F.lit(1e-9)).cast("int")
        + 1
    )
    order = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_g").asc())
    pref = (
        grams.join(dfreq, gkeys)
        .withColumn("_rn", F.row_number().over(order))
        .filter(F.col("_rn") <= F.greatest(p, F.lit(1)))
        .select("_id", "_n", *gkeys)
    )

    a = pref.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"), *gkeys)
    b = pref.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), *gkeys)
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    cand = (
        a.join(b, gkeys)
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: J ≥ t ⟹ t·max(|a|,|b|) ≤ min(|a|,|b|)
        .filter(F.least(na, nb) >= F.lit(float(threshold)) * F.greatest(na, nb) - 1e-9)
        .select("id_a", "id_b")
        .distinct()
    )
    va = shingled.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    vb = shingled.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("jaccard", jaccard(F.col("_sha"), F.col("_shb")))
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def _band_signature_sql(
    shingle_col: str, num_hashes: int, bands: int, seed: int
) -> str:
    """One SQL expression: shingle array → base hashes → ``num_hashes``
    minhashes → ``bands`` band signatures, as array<struct<band,sig>>.

    The base-hash array is LET-BOUND with the single-element-array
    idiom (``transform(array(base), xs -> ...)``) so the 64 minhash
    terms reference a computed variable instead of re-inlining the
    shingle lineage — Catalyst's CollapseProject otherwise duplicates
    the whole tree per consumer and the generated code falls out of
    JIT'd codegen (measured 7 s vs 0.2 s for identical rows on the
    sf0.1 corpus). Emitted as ONE parsed string: plan build is a
    single expression, not hundreds of py4j Column calls.
    """
    rows_per_band = num_hashes // bands
    params = _hash_params(num_hashes, seed)
    sig = [
        f"array_min(transform(xs, x -> pmod(x * {a}L + {b}L, {_MERSENNE61}L)))"
        for a, b in params
    ]
    structs = ", ".join(
        "named_struct('band', {b}, 'sig', xxhash64({parts}))".format(
            b=b,
            parts=", ".join(
                sig[b * rows_per_band + r] for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    base = f"transform({shingle_col}, s -> pmod(xxhash64(s), {_MAX32 + 1}L))"
    return f"element_at(transform(array({base}), xs -> array({structs})), 1)"


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash-LSH candidate pairs, exact-Jaccard verified.

    1. signature+banding: ONE narrow projection per doc
       (:func:`_band_signature_sql`) — shingles, 64 minhashes and 16
       band signatures computed where the text already sits, zero
       shuffle, nothing persisted;
    2. bucket grouping: ``groupBy(band, sig) → collect_list(id)`` —
       THE shuffle, carrying only (band, sig, id) rows with uniform
       hash keys; hot buckets (a boilerplate shingle set shared by
       millions of docs) are dropped whole at ``max_bucket``, exactly
       the previous anti-join semantics without its extra aggregate +
       broadcast + self-join round-trips;
    3. candidate pairs explode INSIDE each bucket (narrow — bounded by
       max_bucket² per bucket), deduped across bands with one
       shuffle;
    4. verify candidates with exact shingle Jaccard ≥ ``threshold`` —
       LSH false positives cannot escape, output is a subset of the
       true pair set with recall set by (bands, rows-per-band).

    Shuffle count: 2 (+ the AQE-planned verify joins), down from the
    round-2 plan's 4 and two persisted intermediates — on the bench
    host each tiny shuffle costs ~1 s flat in task scheduling, and at
    cluster scale fewer barriers means fewer stragglers to wait on.
    """
    from beats_spark.operators.scale import spread

    assert num_hashes % bands == 0, "num_hashes must divide into bands"
    sh_df = spread(df).select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), shingle_n).alias("_sh")
    )
    band_entries = sh_df.select(
        "_id",
        F.explode(
            F.expr(_band_signature_sql("_sh", num_hashes, bands, seed))
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))

    buckets = (
        band_entries.groupBy("band", "sig")
        .agg(F.collect_list("_id").alias("_ids"))
        .filter((F.size("_ids") > 1) & (F.size("_ids") <= max_bucket))
    )
    # all i<j pairs inside a bucket, canonically oriented; flatten of
    # per-element slices keeps everything in one generator expression
    pair_sql = (
        "flatten(transform(_ids, (a, i) -> "
        "transform(slice(_ids, i + 2, size(_ids)), b -> "
        "named_struct('id_a', least(a, b), 'id_b', greatest(a, b)))))"
    )
    cand = (
        buckets.select(F.explode(F.expr(pair_sql)).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact-Jaccard verify: join the candidate set back to the raw
    # texts so shingles are recomputed ONLY for candidate rows — the
    # full-corpus shingle arrays are never materialized twice. AQE
    # picks broadcast when the candidate side is small and falls back
    # to a shuffle join when a pathological corpus makes it large
    # (forcing broadcast here OOMs on near-dup-heavy data).
    # False positives cannot escape the exact check.
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_ttext"))
    half = texts.join(cand, texts["_tid"] == cand["id_a"]).select(
        "id_a", "id_b", F.col("_ttext").alias("_text_a")
    )
    verified = (
        texts.join(half, F.col("_tid") == half["id_b"])
        .select("id_a", "id_b", "_text_a", F.col("_ttext").alias("_text_b"))
        .withColumn(
            "jaccard",
            jaccard(
                shingles(F.col("_text_a"), shingle_n),
                shingles(F.col("_text_b"), shingle_n),
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash of whitespace tokens as a signed 64-bit LongType.

    Per token h = xxhash64(token); each bit contributes ±1 to its
    position; the sign of the per-position sum sets the output bit.
    Implemented as one ``aggregate`` over the token array with an
    array<int> accumulator — JVM-side, no Python, no shuffle.
    """
    toks = tokens(col)
    zero = F.array(*[F.lit(0) for _ in range(bits)])

    def _bit_contribs(t: Column) -> Column:
        # ±1 per bit position of xxhash64(token); shift amounts are
        # plan-time Python ints (shiftright requires a literal count)
        return F.array(
            *[
                (
                    F.shiftrightunsigned(F.xxhash64(t), j)
                    .bitwiseAND(F.lit(1))
                    .cast("int")
                    * 2
                    - 1
                )
                for j in range(bits)
            ]
        )

    counts = F.aggregate(
        toks, zero, lambda acc, t: F.zip_with(acc, _bit_contribs(t), lambda a, d: a + d)
    )
    out = F.lit(0).cast("long")
    for j in range(bits):
        # bit 63 is the sign bit of a signed long: use the two's
        # complement literal; XOR accumulation never overflows
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        out = out.bitwiseXOR(
            F.when(F.element_at(counts, j + 1) > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def token_hash(col: Column, hash_fn: str = "xxhash64") -> Column:
    """Per-token hash for SimHash. ``xxhash64`` (default, fastest) or
    ``md5_60`` — 60-bit integer from the md5 hex prefix, chosen because
    md5 is engine-portable so external SQL oracles can recompute the
    identical signature (verified bit-equal vs DuckDB)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown token hash {hash_fn!r}")


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, _sig) SimHash signatures in explode→groupBy form: one row
    per (doc, token), per-bit ±1 contributions as codegen arithmetic,
    ``bits`` SUM aggregates with map-side combine (shuffle = bits
    ints/doc). Bit-identical to the ``simhash`` Column expression."""
    from beats_spark.operators.scale import spread

    toks = spread(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    ).withColumn("_h", token_hash(F.col("_t"), hash_fn))
    sums = toks.groupBy("_id").agg(
        *[
            F.sum(
                F.shiftrightunsigned(F.col("_h"), j).bitwiseAND(F.lit(1)).cast("int") * 2
                - 1
            ).alias(f"_b{j}")
            for j in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(bits):
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        sig = sig.bitwiseXOR(
            F.when(F.col(f"_b{j}") > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select("_id", sig.alias("_sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
    n_tables: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs with banded blocking.

    Pigeonhole: two signatures within ``max_hamming`` bits share at
    least one of ``max_hamming+1`` disjoint bit-bands exactly — so
    candidates = per-band equality joins (``n_tables`` must be ≥
    max_hamming+1 for full recall), verified by exact Hamming distance.
    """
    n_tables = max(n_tables, max_hamming + 1)
    band_bits = bits // n_tables
    base = simhash_signatures(df, text_col, id_col, bits, hash_fn)
    entries = base.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("band"),
                        F.shiftrightunsigned(F.col("_sig"), t * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.key")

    # Bucket-grouping candidate generation (same shape as minhash_lsh_
    # pairs): ONE groupBy on the band key collects (id, sig) members,
    # pairs explode inside the bucket, a second shuffle dedups across
    # bands. Replaces the round-2 persist + self-join + dropDuplicates
    # chain — two shuffles total, nothing cached, same pair set.
    buckets = (
        entries.groupBy("band", "key")
        .agg(F.collect_list(F.struct("_id", "_sig")).alias("_m"))
        .filter(F.size("_m") > 1)
    )
    pair_sql = (
        "flatten(transform(_m, (a, i) -> "
        "transform(slice(_m, i + 2, size(_m)), b -> named_struct("
        "'id_a', least(a._id, b._id), 'id_b', greatest(a._id, b._id), "
        "'sig_a', a._sig, 'sig_b', b._sig))))"
    )
    cand = (
        buckets.select(F.explode(F.expr(pair_sql)).alias("p"))
        .select("p.id_a", "p.id_b", "p.sig_a", "p.sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 0,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ threshold).

    ``n_planes`` = 0 → exact all-pairs (verification scale only).
    ``n_planes`` > 0 → random-hyperplane LSH blocking first (see
    similarity.hyperplane_bucket), then exact cosine verify within
    buckets — the 100 TB path.
    """
    from beats_spark.operators.similarity import bucketize, score_pairs_cosine
    from beats_spark.operators.scale import spread

    if n_planes:
        # scale path: bucket-blocked candidates, exact rerank. The
        # bucketized frame feeds BOTH self-join sides — persist it so
        # the scan + numpy bucketize pass runs once, not twice (same
        # rule as the minhash band index).
        from pyspark import StorageLevel

        bkts = bucketize(df, id_col, vec_col, n_planes, seed).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        a = bkts.select("bkt", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = bkts.select("bkt", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        cand = a.join(b, "bkt").drop("bkt").filter(F.col("id_a") < F.col("id_b"))
        scored = score_pairs_cosine(cand, "va", "vb")
        return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")

    # exact mode (verification scale): the full normalized corpus rides
    # in the task closure; each Arrow batch GEMMs against it and emits
    # only pairs above threshold — no pair frame is ever materialized.
    # Guarded: this branch collect()s the corpus to the driver, so it
    # refuses anything beyond ground-truth scale instead of OOMing a
    # production run — the n_planes>0 LSH branch above is the path
    # that survives 100 TB.
    import numpy as np

    n_rows = df.count()
    max_exact = 200_000
    if n_rows > max_exact:
        raise ValueError(
            f"embedding_neardup_pairs exact mode (n_planes=0) collects the "
            f"corpus to the driver and is capped at {max_exact} rows "
            f"(got {n_rows}); pass n_planes>0 for the bucketed scale path"
        )
    rows = df.select(id_col, vec_col).collect()
    all_ids = np.array([r[0] for r in rows], dtype=np.int64)
    all_mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    all_mat /= np.linalg.norm(all_mat, axis=1, keepdims=True)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ all_mat.T
            mask = (sims >= threshold) & (ids[:, None] < all_ids[None, :])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": ids[ii], "id_b": all_ids[jj], "cosine": sims[ii, jj]}
            )

    return spread(df.select(id_col, vec_col)).mapInPandas(
        fn, "id_a long, id_b long, cosine double"
    )


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
) -> DataFrame:
    """Exact substring-duplication removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    the ExactSubstr method): every token ``n``-gram that occurs more
    than once ANYWHERE in the corpus (across documents or within one)
    is removed from every occurrence except the first, where "first"
    is the minimum (doc_id, position). Operates on normalized
    whitespace tokens (the paper operates on BPE tokens; same
    machinery, different tokenizer), so the returned ``text`` is in
    normalized token space.

    The paper builds a corpus-wide suffix array — inherently
    sequential. The distributed equivalent: fingerprint every n-gram
    position, find fingerprints with count ≥ 2, mark every non-first
    occurrence's token span, and rebuild documents from unmarked
    tokens. Overlapping duplicated spans union naturally (a token is
    removed iff ANY marked span covers it); runs ≥ n tokens are fully
    removed, runs < n survive — the paper's documented edge behavior.

    Returns one row per input doc: id, ``n_tokens``, ``n_kept``,
    ``n_removed``, ``text`` (cleaned; '' when everything was
    duplicate).

    Scale plan: (1) narrow n-gram fingerprint explode — the shuffle
    key is md5 (16 B), never the gram text, and "first occurrence" is
    an integer min over doc_id·2³² + pos, so the groupBy(gram) is a
    plain partially-aggregated min/count; (2) join positions back on
    the fingerprint (uniform keys — duplicated-gram rows are the rare
    side, AQE broadcasts when small); (3) span explode is bounded by
    n × marked positions (duplicates only, not the corpus); (4)
    reassembly groupBy(id) moves text bytes once, keyed by the doc's
    own id — the line_level_dedup shape. md5 collisions delete ~2⁻¹²⁸
    of legit text; acceptable (the paper's own hashing has the same
    property).

    Id-space bound: the keeper order is min(doc_id·2³² + pos) — a
    plain int64 min, engine-portable. It requires doc_id < 2³¹; a
    wider id space overflows, which Spark 4 ANSI turns into a LOUD
    error (never a silently wrong keeper) — re-key docs or widen the
    encoding to decimal if you hit it.
    """
    from beats_spark.operators.scale import spread

    if n < 2:
        raise ValueError("n must be ≥ 2")
    base = spread(df).select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    cnt = F.size(F.col("_toks"))
    gram_keys = F.transform(
        F.sequence(F.lit(0), cnt - n),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n))),
    )
    grams = (
        base.where(cnt >= n)
        .select("_id", F.posexplode(gram_keys).alias("_pos", "_gk"))
    )
    enc = F.col("_id") * F.lit(1 << 32) + F.col("_pos")
    dup = (
        grams.groupBy("_gk")
        .agg(F.count(F.lit(1)).alias("_c"), F.min(enc).alias("_keeper"))
        .where(F.col("_c") >= 2)
        .select("_gk", "_keeper")
    )
    marked = grams.join(dup, "_gk").where(enc != F.col("_keeper"))
    removed = (
        marked.select(
            "_id", F.explode(F.sequence(F.col("_pos"), F.col("_pos") + n - 1)).alias("_tidx")
        )
        .dropDuplicates(["_id", "_tidx"])
    )
    toks_e = base.select(
        "_id", F.posexplode(F.col("_toks")).alias("_tidx", "_tok")
    )
    kept = toks_e.join(removed, ["_id", "_tidx"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_tidx", "_tok"))),
                lambda x: x["_tok"],
            ),
            " ",
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = base.select("_id", cnt.cast("long").alias("n_tokens"))
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("_n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("_clean"), F.lit("")).alias("text"),
        )
    )


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_cells: int = 8,
    threshold: tuple[int, int] = (19, 20),
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster embeddings into cells, then prune
    near-identical pairs WITHIN each cell only — the published recipe
    for making embedding dedup tractable at web scale (pairwise work is
    bounded per cell; cross-cell near-dups are accepted recall loss).

    Published method uses trained k-means cells + float cosine. This
    implementation makes both stages integer-exact so the outcome is
    engine-portable (the repo's oracle discipline):

    - cells come from ``similarity.fixed_centroids`` (deterministic
      equal-norm ±1 centroids) with vectors quantized ``floor(x·1e6)``
      and argmax over exact int64 dot products — the same arithmetic
      the oracle-checked ``ivf_assign`` stage proves; swap in
      ``kmeans_fit`` centroids for the trained-float production flavor
      (then the decision is float, like ``knn_ivf``).
    - the cosine test ``cos(a,b) ≥ p/q`` is decided on quantized
      vectors as ``q²·dot² ≥ p²·|a|²·|b|² AND dot > 0`` in decimal/
      int128 arithmetic — no sqrt, no float compare. With |x|≤1,
      dim≤64: dot ≤ 6.4e13, dot² ≤ 4.1e27, q²-scaled ≲ 1e31 — inside
      decimal(38,0) (Spark) and HUGEINT (DuckDB) exactly.

    Returns (id_a, id_b, cell, dot_q); feed ``connected_components``
    for keeper selection.

    Scale shape: one narrow projection computes (cell, |v|², qv) in a
    single codegen pass (no shuffle); the only shuffle is the
    cell-keyed self-join. Cell population is bounded by construction
    (n_cells scales with corpus size); AQE splits residual skew. The
    projected frame feeds both join sides — persisted once, the
    minhash band-index rule.
    """
    from pyspark import StorageLevel

    from beats_spark.operators.scale import spread
    from beats_spark.operators.similarity import _dim_of, fixed_centroids

    p, q = threshold
    if not (0 < p <= q):
        raise ValueError(f"threshold must be a fraction in (0,1], got {p}/{q}")
    if dim is None:
        dim = _dim_of(df, vec_col)
    centroids = fixed_centroids(n_cells, dim, seed)

    # The cell/norm expressions reference ~n_cells×dim quantized terms;
    # built as Column arithmetic that is hundreds of py4j round-trips
    # (~5 s of plan build, the CLAUDE.md gotcha) — emit ONE SQL string
    # per expression instead. Flat per-dim terms tolerate the textual
    # duplication; codegen folds them.
    def term(d: int) -> str:
        return f"floor(cast({vec_col}[{d}] as double) * 1000000)"

    dots = []
    for j, cent in enumerate(centroids):
        s = " + ".join(
            (term(d) if c > 0 else f"(-{term(d)})") for d, c in enumerate(cent)
        )
        dots.append(f"named_struct('s', {s}, 'nj', {-j})")
    cell = F.expr(
        f"cast(-(array_max(array({', '.join(dots)})).nj) as int)"
    )
    normsq = F.expr(
        " + ".join(f"{term(d)} * {term(d)}" for d in range(dim))
    )
    qv = F.expr(
        f"transform({vec_col}, x -> floor(cast(x as double) * 1000000))"
    )

    base = spread(
        df.select(
            F.col(id_col).alias("_sid"),
            cell.alias("cell"),
            normsq.alias("_nsq"),
            qv.alias("_qv"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = base.select(
        "cell",
        F.col("_sid").alias("id_a"),
        F.col("_nsq").alias("_na"),
        F.col("_qv").alias("_qa"),
    )
    b = base.select(
        "cell",
        F.col("_sid").alias("id_b"),
        F.col("_nsq").alias("_nb"),
        F.col("_qv").alias("_qb"),
    )
    cand = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(F.col("_qa"), F.col("_qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = cand.withColumn("dot_q", dot)
    d38 = F.col("dot_q").cast("decimal(38,0)")
    lhs = d38 * d38 * F.lit(q * q)
    rhs = (
        F.col("_na").cast("decimal(38,0)")
        * F.col("_nb").cast("decimal(38,0)")
        * F.lit(p * p)
    )
    return (
        scored.filter((F.col("dot_q") > 0) & (lhs >= rhs))
        .select("id_a", "id_b", "cell", "dot_q")
    )


# ---------------------------------------------------------------------------
# Connected components: pairs → clusters → canonical keepers
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components of the duplicate-pair graph:
    ``(node, component)`` where component = min node id reachable.

    This is the step that turns any of this module's pair generators
    (exact groups, n-gram Jaccard, MinHash-LSH, SimHash, embedding
    near-dup) into the thing a training pipeline actually consumes: a
    cluster id per document, so one canonical copy survives and the
    rest drop. A pair list alone under-deletes — near-duplicate
    relations chain (A~B, B~C but not A~C directly), and only the
    transitive closure dedups the whole cluster.

    Algorithm: iterative min-label propagation over the symmetrized
    edge list — each round every node takes the minimum label among
    itself and its neighbors; fixpoint = components. Converges in
    O(graph diameter) rounds, and near-dup graphs are dense, shallow
    clusters (diameter a small constant), so 2-4 rounds in practice;
    ``max_iter`` bounds adversarial chains. Each round is one join +
    one groupBy (2 shuffles) on the LABEL frame (8-16 bytes/node),
    never the corpus. Lineage is truncated with a localCheckpoint
    every ``checkpoint_every`` rounds so long runs don't accrete a
    mile-deep plan (the classic iterative-Spark failure mode).

    The reference has no equivalent operator (its dedup surface stops
    at fingerprinting); the design is the standard MapReduce-CC
    min-label iteration (Kiveris et al., "Connected Components in
    MapReduce and Beyond" — the simple variant, chosen because dedup
    clusters make the large-star/small-star optimization moot).
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        "u is not null and v is not null and u != v"
    )
    # Symmetrize and add a self-loop per node: min over in-neighbors
    # of the self-looped graph IS least(own label, neighbor labels),
    # which folds the keep-own-label back-join out of the loop — each
    # round is exactly one join + one groupBy. Pre-partitioning the
    # (bigger) edge side on the join key means only the label frame
    # reshuffles per round.
    loops = (
        e.select("u")
        .union(e.select(F.col("v")))
        .distinct()
        .select(F.col("u"), F.col("u").alias("v"))
    )
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .union(loops)
        .distinct()
        .repartition("v")
        .persist()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    # Convergence by the monotone label-sum: labels only ever
    # decrease, so an unchanged sum means fixpoint — detected on the
    # same per-round action, no extra old-vs-new join. The sum runs
    # in decimal(38,0): ANSI long-sum overflows on hash-derived
    # 64-bit ids (the ids other operators in this repo emit), killing
    # the job mid-iteration. Non-numeric (string) ids can't sum at
    # all, so they checksum via sum(xxhash64(label)) — not strictly
    # monotone, but a changed label multiset leaving the 128-bit-wide
    # decimal sum unchanged needs a 2^-64-scale collision, and
    # max_iter backstops the loop either way.
    numeric_label = dict(labels.dtypes)["label"] in (
        "tinyint", "smallint", "int", "bigint", "decimal(38,0)"
    )
    if numeric_label:
        checksum = F.sum(F.col("label").cast("decimal(38,0)"))
    else:
        checksum = F.sum(F.xxhash64(F.col("label")).cast("decimal(38,0)"))
    prev_sum = None
    try:
        for i in range(max_iter):
            new_labels = (
                edges.join(labels, edges.v == labels.node)
                .groupBy("u")
                .agg(F.min("label").alias("label"))
                .withColumnRenamed("u", "node")
            )
            if (i + 1) % checkpoint_every == 0:
                new_labels = new_labels.localCheckpoint(eager=False)
            new_labels = new_labels.persist()
            cur_sum = new_labels.agg(checksum).first()[0]
            if hasattr(labels, "unpersist") and i > 0:
                labels.unpersist()
            labels = new_labels
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        return labels.withColumnRenamed("label", "component")
    finally:
        edges.unpersist()


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Drop every document that is a non-canonical member of a
    duplicate cluster; the keeper is the minimum id (deterministic at
    any parallelism). Documents in no pair pass through untouched.

    Plan shape: the loser set (cluster members minus keepers) is
    proportional to the duplicate count, not the corpus — the final
    left_anti join lets AQE broadcast it when small.
    """
    comp = (
        components
        if components is not None
        else connected_components(pairs, src, dst)
    )
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def line_level_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    unit: str = "line",
) -> DataFrame:
    """Cross-corpus line-level dedup (the CCNet/RefinedWeb boilerplate
    pass): remove every line that appears, trimmed-identical, in at
    least ``min_docs`` DISTINCT documents — headers, footers, cookie
    banners, nav menus — and reassemble each document from its
    surviving lines in original order.

    Returns one row per input document: ``id_col``, ``text`` (cleaned;
    '' when every line was boilerplate), ``n_lines`` (before),
    ``n_kept``, ``n_removed``. Blank/whitespace-only lines are
    structure, not content: never counted toward frequency and never
    removed.

    Scale plan (the classic three-shuffle global pass):
      1. explode to (id, pos, line) — narrow, no shuffle; the line key
         is ``md5(trim(line))`` so the shuffle carries a 16-byte key,
         never the line text (and the oracle can replay it).
      2. line-frequency: distinct (key, id) then groupBy(key) — the
         count-distinct pair of shuffles, both partially aggregated
         map-side; uniform keys (hashes) so no salting needed.
      3. anti-join lines against the boilerplate keys — the
         boilerplate set is tiny relative to the corpus (it IS the
         repeated content), so AQE broadcasts it; left as AQE's call
         because a pathological corpus can make it huge (CLAUDE.md:
         forced broadcast of candidate sets OOMs).
      4. reassemble: groupBy(id), sort_array over (pos, line) structs,
         array_join — one shuffle keyed by doc id.
    At 100 TB the dominant cost is step 2's shuffle of one (16 B, id)
    pair per non-blank line; text bytes only move in step 4, keyed by
    the document's own id (no skew beyond document size itself).
    """
    if unit not in ("line", "paragraph"):
        raise ValueError(f"unit must be line|paragraph, got {unit!r}")
    # paragraph mode: blank-line-separated blocks are the unit (the
    # RefinedWeb/CCNet pass runs at BOTH granularities — repeated
    # paragraphs like license blocks and nav sections are invisible to
    # the line pass when their internal lines vary by one char).
    sep = "\n" if unit == "line" else "\n{2,}"
    joiner = "\n" if unit == "line" else "\n\n"
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    key = F.md5(F.trim(F.col("line")))
    boiler = (
        lines.where(F.trim(F.col("line")) != "")
        .select(key.alias("lk"), id_col)
        .dropDuplicates(["lk", id_col])
        .groupBy("lk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("lk")
    )
    kept = lines.join(
        boiler, on=[key == boiler["lk"]], how="left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            joiner,
        ).alias("_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep)).cast("long").alias("n_lines"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_clean"), F.lit("")).alias("text"),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (
                F.col("n_lines")
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def content_index(
    df: DataFrame, text_col: str = "text", normalize: bool = True
) -> DataFrame:
    """Persistent corpus content index: the distinct 128-bit content
    keys (``_ck``, ``_ck2`` — same keying as exact_dedup) of a corpus.
    Write it once per ingest wave; it is what continuous ingestion
    dedups NEW batches against without rescanning old text. 16 bytes
    per distinct document — a 10¹⁰-doc corpus indexes in ~160 GB,
    a partitioned parquet dimension."""
    norm = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.select(
            F.xxhash64(norm).alias("_ck"),
            F.xxhash64(norm, F.lit(1)).alias("_ck2"),
        )
        .groupBy("_ck", "_ck2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Continuous-ingestion dedup: exact-dedup the NEW batch within
    itself (min-id keeper, exact_dedup semantics), then drop every
    document whose content key already exists in the persistent
    ``index`` (content_index output). Returns the surviving new rows;
    the caller appends ``content_index(survivors)`` to the index for
    the next wave.

    Scale shape: one 16-byte-key shuffle for the within-batch group,
    one key-hashed anti-join against the index (both sides partition
    on the same key; the BATCH side is usually the small one — at
    steady state the index is the corpus and the batch is a day's
    crawl), and the exact_dedup semi join back. Old corpus TEXT is
    never read — only its key index."""
    deduped = exact_dedup(new_docs, text_col, id_col, normalize=normalize)
    norm = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    keyed = deduped.withColumn("_ck", F.xxhash64(norm)).withColumn(
        "_ck2", F.xxhash64(norm, F.lit(1))
    )
    fresh = keyed.join(index, ["_ck", "_ck2"], "left_anti")
    return fresh.drop("_ck", "_ck2")


def _shingleable(df: DataFrame, text_col: str) -> DataFrame:
    """Exclude NULL/whitespace-only texts from fuzzy matching — the
    emptiness test mirrors the shingle normalization (lower + \\s+
    collapse + trim), never bare F.trim (CLAUDE.md: shingles(NULL)
    degenerates to [''] in Spark while DuckDB oracles produce [], so
    blank docs would otherwise "match" each other at jaccard 1.0 in
    Spark only)."""
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    return df.filter(norm != "")


def neardup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Persistent FUZZY content index — the MinHash-band extension of
    :func:`content_index` (reference anchor: the dedup-at-sink
    ``@metadata._id`` convention, libbeat/beat/events/util.go:27-44,
    generalized from exact keys to near-dup signatures). One row per
    (document, band): (``id_col``, ``band``, ``sig``) — ~``bands``×24
    bytes per document, a flat appendable parquet dimension. Write
    once per ingest wave (``neardup_index(survivors)`` appended); a
    new batch then near-dups against the whole corpus history without
    ever re-reading old text (:func:`incremental_neardup`).

    Blank/NULL texts are excluded (see :func:`_shingleable`); the
    banding parameters must match at query time — they are part of
    the index's identity, so persist them alongside (a manifest row
    or directory naming)."""
    from beats_spark.operators.scale import spread

    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    sh_df = spread(_shingleable(df, text_col)).select(
        F.col(id_col),
        shingles(F.col(text_col), shingle_n).alias("_sh"),
    )
    return sh_df.select(
        id_col,
        F.explode(
            F.expr(_band_signature_sql("_sh", num_hashes, bands, seed))
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))


def shingle_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """The verify-side companion of :func:`neardup_index`: per
    document, the sorted distinct xxhash64-hashed shingle set
    (``id_col``, ``sh`` array<bigint>). Jaccard over these hashed
    sets equals exact shingle Jaccard (64-bit collisions aside), so
    the incremental verify stage never re-reads or re-tokenizes old
    corpus text — it ships dedup key material, not payload (the
    ``@metadata._id`` discipline again). ~8 bytes per distinct
    shingle; blank/NULL texts excluded like the band index."""
    return _shingleable(df, text_col).select(
        F.col(id_col),
        F.array_sort(
            F.transform(
                shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)
            )
        ).alias("sh"),
    )


def incremental_neardup(
    new_docs: DataFrame,
    band_index: DataFrame,
    sh_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Continuous-ingestion NEAR-dedup: drop every new document whose
    exact shingle Jaccard with ANY historically indexed document is
    ≥ ``threshold`` — the fuzzy twin of :func:`incremental_dedup`,
    and the op a real ingest pipeline runs daily (yesterday's corpus
    is indexed; today's crawl dedups against it without a corpus
    rescan).

    Stages:

    1. band the NEW batch (one narrow projection — same
       ``_band_signature_sql`` as the index build; parameters must
       match the index's);
    2. candidate join on (band, sig) against ``band_index`` — both
       sides hash-partition on the same key; at steady state the
       batch side is tiny vs the corpus index, so AQE broadcast-joins
       it. Hot buckets (boilerplate shingle sets shared by >
       ``max_bucket`` docs) are excluded via one aggregate over the
       24-byte-row index — in production that count table is
       maintained incrementally with the index, not recomputed;
    3. exact verify: hashed-shingle Jaccard between the new doc
       (computed from its text) and the historical doc (fetched from
       ``sh_index`` for CANDIDATES ONLY — a semi-join point lookup,
       never a corpus text read);
    4. survivors = new rows with no verified match, returned
       unchanged. Append ``neardup_index(survivors)`` /
       ``shingle_index(survivors)`` for the next wave.

    Composition order for a full ingest tick: exact within-batch
    (:func:`exact_dedup`) → within-batch near-dup
    (:func:`minhash_lsh_pairs` + keeper) → :func:`incremental_dedup`
    (exact vs history) → this (fuzzy vs history). Assumes new ids are
    disjoint from indexed ids (an ingest invariant). Precision is
    exact (verify stage); recall is the LSH band curve — on a fixed
    corpus every hash is deterministic, so the contract-query output
    is stable (q_dedup_minhash_lsh's determinism argument).

    100 TB: no corpus-scale text read anywhere; the only index-scale
    work is the (band, sig) hash join and the hot-bucket aggregate,
    both over 24-byte rows."""
    from beats_spark.operators.scale import spread

    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    new_entries = neardup_index(
        new_docs, text_col, id_col, shingle_n, num_hashes, bands, seed
    ).withColumnRenamed(id_col, "_new_id")

    hot = (
        band_index.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select("band", "sig")
    )
    old_entries = (
        band_index.withColumnRenamed(id_col, "_old_id")
        .join(hot, ["band", "sig"], "left_anti")
    )
    cand = (
        new_entries.join(old_entries, ["band", "sig"])
        .select("_new_id", "_old_id")
        .dropDuplicates(["_new_id", "_old_id"])
    )

    new_sh = shingle_index(new_docs, text_col, id_col, shingle_n).select(
        F.col(id_col).alias("_new_id"), F.col("sh").alias("_sh_new")
    )
    old_sh = sh_index.select(
        F.col(id_col).alias("_old_id"), F.col("sh").alias("_sh_old")
    )
    verified = (
        cand.join(new_sh, "_new_id")
        .join(old_sh, "_old_id")
        .withColumn("jaccard", jaccard(F.col("_sh_new"), F.col("_sh_old")))
        .filter(F.col("jaccard") >= threshold)
    )
    # no .distinct() on matched: left_anti is existence-based, and the
    # distinct would be one more full exchange+aggregate stage (this
    # host prices every shuffle ~0.7-1 s flat; a doc matching k
    # historical near-dups ships k 8-byte ids instead — cheaper than
    # the stage at any k the max_bucket cap permits)
    matched = verified.select(F.col("_new_id").alias(id_col))
    return spread(new_docs).join(matched, id_col, "left_anti")


def strip_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "line",
) -> DataFrame:
    """WITHIN-document repetition removal (the Gopher/RefinedWeb
    intra-doc cleanup that precedes the cross-corpus line pass):
    drop every repeat of a line already seen earlier in the SAME
    document, keeping the first occurrence. Catches scraped pages
    that duplicate their nav/footer blocks inline, chat logs that
    re-echo the same status line, and template expansions — none of
    which the cross-doc frequency pass (line_level_dedup) can touch
    without also deleting the first, legitimate occurrence.

    Matching is trimmed-identity (same rule as line_level_dedup);
    blank/whitespace-only lines are document structure and always
    kept. Returns ``id_col``, ``text`` (cleaned), ``n_lines``,
    ``n_kept``, ``n_removed`` — the same shape as line_level_dedup so
    the two passes compose.

    Scale: ZERO shuffles — the whole operator is one higher-order
    filter per row (whole-stage codegen), so it rides the scan and
    composes with any downstream shuffle for free. keep-first is
    array_position == own index, O(lines²) per document worst-case:
    right for web/transcript docs (≤ thousands of lines); a
    pathological million-line document should go through the
    explode+window form instead (same semantics, one shuffle keyed
    by the doc's own id).
    """
    if unit not in ("line", "paragraph"):
        raise ValueError(f"unit must be line|paragraph, got {unit!r}")
    sep = "\n" if unit == "line" else "\n{2,}"
    joiner = "\n" if unit == "line" else "\n\n"
    lines = F.split(F.col(text_col), sep)
    # One SQL string: the lambda references the split array and its
    # trimmed twin; emitting via F.expr keeps plan-build O(1) py4j
    # calls (CLAUDE.md: hundreds of Column calls cost real seconds).
    kept = F.expr(
        f"filter(split({text_col}, '{sep}'), (x, i) -> "
        f"trim(x) = '' OR "
        f"array_position(transform(split({text_col}, '{sep}'), y -> trim(y)),"
        f" trim(x)) = i + 1)"
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, joiner).alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"),
    )


def dedup_keep_best(
    docs: DataFrame,
    components: DataFrame,
    score_col,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware cluster keeper: within every duplicate cluster
    keep the HIGHEST-scoring member (ties broken on min id), not the
    minimum id. ``dedup_keep_canonical``'s min-id keeper is the right
    default for exact duplicates (all copies identical — any keeper
    works, cheapest rule wins); for NEAR duplicates the members
    differ, and production pipelines keep the best copy — longest,
    highest quality-classifier score, newest snapshot (the
    keep-best-duplicate practice of the Dolma/RefinedWeb lineage).

    Emits an audit row per document: ``(id, component, keeper_id,
    kept)`` — documents outside the graph are their own keeper.
    Filter on ``kept`` (or anti-join the losers) downstream.

    Plan: the label frame joins the corpus id-keyed (AQE broadcasts
    it when the dup graph is sparse — the common case); the argmax
    runs as ONE max_by aggregate over (component, score, id) — 24
    B/doc shuffle with map-side combine, tie-break folded into the
    packed ordering key, never a corpus-wide window sort. The packed
    key is (score asc, id desc) lexicographic via struct comparison:
    ``max_by`` with a struct compares fields in order, so max score
    wins and WITHIN a score the larger struct field ``-id`` (i.e.
    smaller id) wins — deterministic at any parallelism.
    """
    comp = components.select(
        F.col("node").alias(id_col), F.col("component").alias("_kb_comp")
    )
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    labeled = (
        docs.join(comp, id_col, "left")
        .withColumn(
            "component", F.coalesce(F.col("_kb_comp"), F.col(id_col))
        )
        .drop("_kb_comp")
    )
    keepers = labeled.groupBy("component").agg(
        F.max_by(
            F.col(id_col),
            F.struct(
                score.cast("long").alias("s"),
                (-F.col(id_col)).alias("negid"),
            ),
        ).alias("keeper_id")
    )
    return labeled.join(keepers, "component").select(
        id_col,
        "component",
        "keeper_id",
        (F.col(id_col) == F.col("keeper_id")).alias("kept"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_ppm: int = 800_000,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric set CONTAINMENT pairs: ``C = |A∩B| / min(|A|,|B|)``
    over word n-gram shingles, in exact integer ppm — the
    doc-inside-doc signal Jaccard structurally misses (a 50-gram
    quote fully embedded in a 5000-gram page has J ≈ 0.01 but C = 1):
    Broder's containment measure beside resemblance, the standard
    detector for quote inclusion, boilerplate wrappers, and
    benchmark-passage embedding.

    Same inverted-index shape as ``ngram_jaccard_pairs`` (a pair only
    materializes on an actual shared gram; the one shuffle keys on
    grams; ``max_doc_freq`` bounds boilerplate blowup one-sidedly, as
    there), with the containment formula at the end — integer ppm
    (``inter·10⁶ div min(n_a, n_b)``) so the output is engine-exact,
    never an engine-ordered float. NULL/blank texts are excluded with
    the shingle-normalized emptiness test (CLAUDE.md: ``shingles``
    degenerates to [''] for them in Spark but [] in SQL oracles).

    Emits ``(id_a, id_b, inter, n_a, n_b, containment_ppm)`` with
    ``id_a < id_b`` — sizes kept so consumers can tell which side is
    the contained one.
    """
    from pyspark import StorageLevel

    from beats_spark.operators.scale import spread

    if not 0 <= threshold_ppm <= 1_000_000:
        raise ValueError(f"threshold_ppm out of range: {threshold_ppm}")
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    shingled = spread(df.filter(norm != "")).select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n).alias("_sh"),
    )
    grams = shingled.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if max_doc_freq is not None:
        heavy = (
            grams.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("_g")
        )
        grams = grams.join(heavy, "_g", "left_anti")
    a = grams.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("n_a"), "_g"
    )
    b = grams.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("n_b"), "_g"
    )
    inter = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # n_a/n_b are non-null by construction, so least() is safe here
    # (the NULL-skipping least gotcha needs nullable inputs)
    ppm = F.expr("inter * 1000000L div least(n_a, n_b)")
    return (
        inter.withColumn("containment_ppm", ppm.cast("long"))
        .filter(F.col("containment_ppm") >= threshold_ppm)
        .select(
            "id_a", "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "containment_ppm",
        )
    )


def cdc_chunk_sql(
    text_expr: str,
    gram: int = 16,
    mask_bits: int = 6,
    max_chars: int = 8000,
    dialect: str = "spark",
) -> str:
    """Content-defined chunking (LBFS, Muthitacharoen et al. SOSP'01;
    the gear-less core of FastCDC) as ONE generated SQL expression per
    dialect — array<struct(chunk_idx, start_pos, chunk_len,
    chunk_md5)>.

    A cut lands after position p+gram−1 wherever the 40-bit md5
    prefix of the gram at p is ≡ 0 mod 2^mask_bits — expected chunk
    length 2^mask_bits chars. Boundaries are purely content-LOCAL
    (deliberately no FastCDC min/max clamps: those make each cut
    depend on the previous one, serializing the scan AND breaking
    cut alignment between shifted copies), so a shared region yields
    IDENTICAL interior chunks at any byte offset — the dedup
    property. Raw text (no normalization — storage dedup is
    byte-level), capped at ``max_chars``; shorter-than-gram non-empty
    docs are one whole-text chunk; NULL/empty yield no chunks.

    Shared-battery discipline (winnow_fingerprint_sql precedent):
    both engines run SQL generated HERE. Everything is let-bound
    (tx → ends0 → ends) against the re-inlining trap.
    """
    if gram < 2 or mask_bits < 1 or mask_bits > 20:
        raise ValueError(f"bad cdc params gram={gram} mask_bits={mask_bits}")
    mod = 1 << mask_bits
    if dialect == "spark":
        start = "(case when i = 1 then 1 else element_at(ends, i - 1) + 1 end)"
        ln = f"(element_at(ends, i) - {start} + 1)"
        return f"""element_at(transform(array(substr({text_expr}, 1, {max_chars})), tx ->
  CASE WHEN length(tx) >= {gram} THEN
    element_at(transform(array(
        transform(
          filter(sequence(1, length(tx) - {gram} + 1),
            p -> cast(conv(substr(md5(substr(tx, p, {gram})), 1, 10),
                           16, 10) as bigint) % {mod} = 0),
          p -> p + {gram} - 1)
      ), ends0 ->
      element_at(transform(array(
          case when size(ends0) > 0
                    and element_at(ends0, -1) = length(tx)
               then ends0
               else concat(ends0, array(length(tx))) end
        ), ends ->
        transform(sequence(1, size(ends)), i -> named_struct(
          'chunk_idx', cast(i as long),
          'start_pos', cast({start} as long),
          'chunk_len', cast({ln} as long),
          'chunk_md5', md5(substr(tx, {start}, {ln}))))
      ), 1)
    ), 1)
  WHEN length(tx) > 0 THEN
    array(named_struct('chunk_idx', cast(1 as long),
                       'start_pos', cast(1 as long),
                       'chunk_len', cast(length(tx) as long),
                       'chunk_md5', md5(tx)))
  ELSE cast(array() as
    array<struct<chunk_idx:bigint,start_pos:bigint,
                 chunk_len:bigint,chunk_md5:string>>) END
), 1)"""
    if dialect == "duckdb":
        start = "(CASE WHEN i = 1 THEN 1 ELSE ends[i - 1] + 1 END)"
        ln = f"(ends[i] - {start} + 1)"
        return f"""(list_transform([substr({text_expr}, 1, {max_chars})], tx ->
  CASE WHEN length(tx) >= {gram} THEN
    (list_transform([
        list_transform(
          list_filter(range(1, length(tx) - {gram} + 2),
            p -> ('0x' || substr(md5(substr(tx, p, {gram})), 1, 10))::BIGINT
                 % {mod} = 0),
          p -> p + {gram} - 1)
      ], ends0 ->
      (list_transform([
          CASE WHEN len(ends0) > 0 AND ends0[-1] = length(tx)
               THEN ends0
               ELSE list_concat(ends0, [length(tx)]) END
        ], ends ->
        list_transform(range(1, len(ends) + 1), i -> {{
          'chunk_idx': i::BIGINT,
          'start_pos': {start}::BIGINT,
          'chunk_len': {ln}::BIGINT,
          'chunk_md5': md5(substr(tx, {start}, {ln}))}}))
      )[1])
    )[1]
  WHEN length(tx) > 0 THEN
    [{{'chunk_idx': 1::BIGINT, 'start_pos': 1::BIGINT,
       'chunk_len': length(tx)::BIGINT, 'chunk_md5': md5(tx)}}]
  ELSE []::STRUCT(chunk_idx BIGINT, start_pos BIGINT,
                  chunk_len BIGINT, chunk_md5 VARCHAR)[] END
))[1]"""
    raise ValueError(f"unknown dialect {dialect!r}")


def cdc_shared_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 16,
    mask_bits: int = 6,
    max_chars: int = 8000,
) -> DataFrame:
    """Cross-document chunk-sharing rollup over content-defined
    chunks: per doc, how many CDC chunks it holds and how many of
    them (count and chars) also appear in at least one OTHER doc —
    the storage-dedup / shared-boilerplate audit that byte-offset-
    sensitive fixed chunking (chunk_documents) cannot compute.

    100 TB shape: chunking is a scan-side projection (zero shuffle);
    the explode carries (id, md5, len) — ~48 B per expected
    2^mask_bits chars, never text. Sharing is one chunk-hash-keyed
    groupBy (map-side-combined distinct-doc partials) joined back on
    the same hash key, then one id-keyed rollup: shuffle bytes are
    chunk-index-scale on uniform md5 keys (no skew by construction),
    three exchanges total.
    """
    sql = cdc_chunk_sql(text_col, gram, mask_bits, max_chars, "spark")
    chunks = df.select(
        F.col(id_col), F.explode(F.expr(sql)).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_len").alias("_len"),
        F.col("_c.chunk_md5").alias("_h"),
    )
    docs_per = chunks.groupBy("_h").agg(
        F.countDistinct(id_col).alias("_ndocs")
    )
    joined = chunks.join(docs_per, "_h")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum((F.col("_ndocs") > 1).cast("long")).cast("long").alias(
            "n_shared_chunks"
        ),
        F.sum(
            F.when(F.col("_ndocs") > 1, F.col("_len")).otherwise(0)
        ).cast("long").alias("chars_shared"),
    )


def ngram_novelty(
    probes: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: what
    fraction of a probe doc's distinct word shingles never occur in
    the reference — the memorization/novelty profile (a probe set
    with low novelty against the training corpus is paraphrase or
    leakage; a synthetic-data batch with suspiciously HIGH novelty
    is off-distribution). Shares the shingles() normalization and
    the shingle-less-doc exclusion discipline with the whole dedup
    family (the NULL-shingle pitfall stays closed on both engines).

    Emits per probe doc: ``n_grams`` (distinct shingles),
    ``n_novel``, ``novelty_ppm`` (exact integer).

    100 TB shape: both sides explode to (shingle[, id]) and meet in
    ONE shingle-keyed left-anti join — the inverted-index shape the
    Jaccard family already uses (CLAUDE.md: beats array_intersect
    block joins ~9×); the reference side deduplicates to DISTINCT
    shingles first (map-side combine), so the join's build side is
    vocabulary-scale, not corpus-scale. No pairs, no quadratic path.
    """
    from pyspark.sql import functions as F  # noqa: F811 — local alias

    def _sh(df: DataFrame, with_id: bool):
        norm = normalize_text(F.col(text_col))
        base = df.where(norm != "").select(
            *( [F.col(id_col).alias("_id")] if with_id else [] ),
            F.explode(shingles(F.col(text_col), n)).alias("_g"),
        )
        return base

    ref = _sh(reference, with_id=False).distinct()
    pr = _sh(probes, with_id=True)
    novel = pr.join(ref, "_g", "left_anti").groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    totals = pr.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    return (
        totals.join(novel, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.expr(
                "cast(coalesce(n_novel, 0) * 1000000 div n_grams as long)"
            ).alias("novelty_ppm"),
        )
    )


def dedup_rate_curve(
    pairs: DataFrame,
    thresholds_ppm: tuple[int, ...] = (
        300_000, 400_000, 500_000, 600_000, 700_000, 800_000, 900_000,
    ),
    id_a: str = "id_a",
    id_b: str = "id_b",
    jaccard_col: str = "jaccard",
) -> DataFrame:
    """Dedup aggressiveness curve — the threshold-tuning report every
    near-dup deployment needs before picking τ: over a LOW-threshold
    exact-Jaccard pair frame (the ground-truth tier), how many pairs
    survive each candidate threshold, how many documents are touched,
    and how many the pairwise min-id keeper would drop. Pair-level
    accounting (no transitive closure per threshold — that is
    connected_components × |thresholds|; the curve is the scouting
    report, the chosen τ then gets the full clustering pass).

    Per threshold: ``threshold_ppm``, ``n_pairs``,
    ``n_docs_matched`` (distinct docs in any surviving pair),
    ``n_dropped_naive`` (distinct larger-ids — the pairwise keeper
    upper bound on survivors removed). Jaccard values classify via
    floor(j·10⁶) — the single IEEE division is bit-identical across
    engines, so the floor is too (CLAUDE.md float discipline).

    Scale shape: the input pair frame is already candidate-scale;
    the sweep explodes it |thresholds|× and runs two map-side-
    combined aggregates — never touches the corpus.
    """
    ts = sorted(set(int(t) for t in thresholds_ppm))
    if not ts or ts[0] < 0 or ts[-1] > 1_000_000:
        raise ValueError(f"bad thresholds: {thresholds_ppm!r}")
    base = pairs.select(
        F.col(id_a).alias("_a"),
        F.col(id_b).alias("_b"),
        F.floor(F.col(jaccard_col) * F.lit(1_000_000))
        .cast("long")
        .alias("_ppm"),
    )
    probes = base.select(
        "_a", "_b", "_ppm",
        F.explode(
            F.array(*[F.lit(t).cast("long") for t in ts])
        ).alias("threshold_ppm"),
    ).where(F.col("_ppm") >= F.col("threshold_ppm"))
    counts = probes.groupBy("threshold_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("_b").cast("long").alias("n_dropped_naive"),
    )
    touched = (
        probes.select(
            "threshold_ppm", F.explode(F.array("_a", "_b")).alias("_d")
        )
        .groupBy("threshold_ppm")
        .agg(F.countDistinct("_d").cast("long").alias("n_docs_matched"))
    )
    return counts.join(touched, "threshold_ppm").select(
        "threshold_ppm", "n_pairs", "n_docs_matched", "n_dropped_naive"
    )


def dup_rate_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    normalize: bool = True,
) -> DataFrame:
    """Exact-duplicate rate per source — the per-provider release
    metric (a feed whose dup rate jumps is re-crawling itself or
    replaying a bucket; the corpus_report twin scoped to exact
    content identity). Per group: ``n_docs``, ``n_distinct``
    (distinct normalized texts), ``dup_ppm`` (docs beyond the first
    copy of their text, ppm).

    Scale shape: same 128-bit two-hash key as exact_dedup (16 B per
    doc shuffled, never text; birthday-safe at multi-billion docs) —
    one (group, key) groupBy with map-side combine, then a ≤|groups|
    rollup.
    """
    norm = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    keyed = df.select(
        F.col(group_col).alias("_g"),
        F.xxhash64(norm).alias("_k1"),
        F.xxhash64(norm, F.lit(1)).alias("_k2"),
    )
    per_text = keyed.groupBy("_g", "_k1", "_k2").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    g = per_text.groupBy("_g").agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    return g.select(
        F.col("_g").alias(group_col),
        "n_docs",
        "n_distinct",
        F.expr(
            "cast((n_docs - n_distinct) * 1000000 div "
            "(case when n_docs >= 1 then n_docs else 1 end) as long)"
        ).alias("dup_ppm"),
    )
