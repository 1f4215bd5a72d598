"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, random-hyperplane
LSH bucketing as the scale path (an IVF-style coarse quantizer without
a training step — centroid assignment is replaced by deterministic
hyperplane signs, so the whole index is a column expression).

Scale notes:
- vector math runs as numpy over Arrow batches (``mapInPandas`` block
  GEMM) — measured ~10x the per-element JVM expression path, and the
  per-partition local-top-k keeps shuffle volume at k x n_partitions
  rows per query regardless of corpus size;
- brute force ships the (small) query matrix in the task closure; the
  corpus streams once; only candidate rows shuffle;
- LSH: hyperplane sign-bit buckets on both sides, equi-join on bucket
  (multiprobe = also probe the query's Hamming-1 buckets), exact
  rerank inside candidates. Recall is tunable with n_planes /
  multiprobe; precision is exact because of the rerank;
- the ``dot``/``l2_norm`` Column helpers remain for composition in
  pure-JVM plans (small dims / few rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two numeric array columns (double).

    With ``dim`` known at plan time the sum unrolls into plain
    arithmetic that whole-stage codegen compiles (~10× the interpreted
    higher-order-function path — HOFs evaluate per element outside
    codegen). The left-to-right add order matches a sequential fold, so
    results are bit-stable at any parallelism."""
    if dim:
        out = a[0].cast("double") * b[0].cast("double")
        for i in range(1, dim):
            out = out + a[i].cast("double") * b[i].cast("double")
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def l2_normalize(a: Column, dim: int | None = None) -> Column:
    n = l2_norm(a, dim)
    if dim:
        return F.array(*[a[i].cast("double") / n for i in range(dim)])
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine(a: Column, b: Column, normalized: bool = False, dim: int | None = None) -> Column:
    if normalized:
        return dot(a, b, dim)
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def _dim_of(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    exclude_same: str | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, neighbor_id,
    cosine).

    Block-matrix design: the (small) query matrix rides in the task
    closure; each corpus Arrow batch scores against it with one numpy
    GEMM inside ``mapInPandas`` and emits only its LOCAL top-k per
    query, so the shuffle carries k x n_partitions candidates per query
    — never the full score matrix. The final exact top-k is a Window
    over that small candidate set. Scales linearly in corpus size with
    zero growth in shuffle volume.

    ``exclude_same`` names a column present on BOTH frames: candidates
    sharing the query's value are masked out in the same GEMM pass —
    the hard-negative-mining switch (top-k most similar items of a
    DIFFERENT class), at zero extra data movement.
    """
    import numpy as np

    from beats_spark.operators.scale import spread

    q_cols = [query_id, vec_col] + ([exclude_same] if exclude_same else [])
    q_rows = queries.select(*q_cols).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_lab = (
        np.array([r[2] for r in q_rows]) if exclude_same else None
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[corpus_id].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ q_mat.T  # (batch, n_queries)
            if exclude_self:
                sims[c_ids[:, None] == q_ids[None, :]] = -np.inf
            if q_lab is not None:
                c_lab = pdf[exclude_same].to_numpy()
                sims[c_lab[:, None] == q_lab[None, :]] = -np.inf
            kk = min(k, sims.shape[0])
            # local top-k per query (argpartition: O(n) per column)
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                rows = idx[:, j]
                out_q.extend([q_ids[j]] * len(rows))
                out_n.extend(c_ids[rows])
                out_s.extend(sims[rows, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    c_cols = [corpus_id, vec_col] + ([exclude_same] if exclude_same else [])
    cand = spread(corpus.select(*c_cols)).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    cand = cand.filter(F.col("cosine") > float("-inf"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _plane_coef(plane: int, dim_idx: int, seed: int) -> int:
    """Deterministic Rademacher(+-1) hyperplane coefficient — a pure
    function of (plane, dim, seed) so every executor rebuilds identical
    planes with no broadcast of randomness."""
    z = (plane * 0x9E3779B97F4A7C15 + dim_idx * 0xBF58476D1CE4E5B9 + seed) & (
        (1 << 64) - 1
    )
    z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return 1 if (z >> 63) else -1


def _planes(dim: int, n_planes: int, seed: int):
    import numpy as np

    return np.array(
        [[_plane_coef(p, d, seed) for d in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


def hyperplane_bucket(vec: Column, dim: int, n_planes: int, seed: int = 7) -> Column:
    """LSH bucket id as a Column expression (sign bits of deterministic
    Rademacher hyperplanes packed into a long). Kept for composition in
    pure-JVM plans; the numpy ``bucketize`` below is the fast path and
    produces identical buckets."""
    bits = []
    for p in range(n_planes):
        proj = None
        for d in range(dim):
            term = F.element_at(vec, d + 1).cast("double") * F.lit(
                float(_plane_coef(p, d, seed))
            )
            proj = term if proj is None else proj + term
        bits.append(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseXOR(b)
    return out


def bucketize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    seed: int = 7,
    multiprobe: int = 0,
) -> DataFrame:
    """(id, vec, bkt) rows via one numpy pass: bucket = packed sign
    bits of vec @ planes.T. ``multiprobe`` > 0 additionally emits the
    n_planes buckets at Hamming distance 1 (query-side recall boost).
    Identical bucket values to ``hyperplane_bucket`` — signs of the
    same exact +-1 sums (integer-valued dot products, no float
    ambiguity)."""
    import numpy as np

    from beats_spark.operators.scale import spread

    def fn(batches):
        import pandas as pd

        planes = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if planes is None:
                planes = _planes(mat.shape[1], n_planes, seed)
            proj = mat @ planes.T  # (n, n_planes)
            bits = (proj >= 0).astype(np.int64)
            bkt = np.zeros(len(mat), dtype=np.int64)
            for p in range(n_planes):
                bkt |= bits[:, p] << p
            ids = pdf[id_col].to_numpy()
            vecs = list(pdf[vec_col])
            out_i, out_v, out_b = list(ids), list(vecs), list(bkt)
            for p in range(n_planes if multiprobe else 0):
                out_i.extend(ids)
                out_v.extend(vecs)
                out_b.extend(bkt ^ (1 << p))
            yield pd.DataFrame({id_col: out_i, vec_col: out_v, "bkt": out_b})

    vec_type = dict(df.dtypes)[vec_col]
    return spread(df.select(id_col, vec_col)).mapInPandas(
        fn, f"{id_col} long, {vec_col} {vec_type}, bkt long"
    )


def score_pairs_cosine(df: DataFrame, va: str, vb: str, out: str = "cosine") -> DataFrame:
    """Row-wise cosine of two vector columns via one vectorized numpy
    pass (einsum over the Arrow batch) — for candidate pairs after a
    bucket join, where GEMM does not apply."""
    import numpy as np

    other = [c for c in df.columns if c not in (va, vb)]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(list(pdf[va]), dtype=np.float64)
            b = np.array(list(pdf[vb]), dtype=np.float64)
            dots = np.einsum("ij,ij->i", a, b)
            na = np.linalg.norm(a, axis=1)
            nb = np.linalg.norm(b, axis=1)
            res = pdf[other].copy()
            res[out] = dots / (na * nb)
            yield res

    schema = ", ".join(
        [f"{c} {t}" for c, t in df.dtypes if c in other] + [f"{out} double"]
    )
    return df.mapInPandas(fn, schema)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
    multiprobe: int = 1,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-bucket both sides (numpy
    pass), equi-join on bucket, exact rerank of candidates (row-wise
    einsum). The join shuffles (id, vec, bkt) — linear in data, keyed
    on uniform hash-like buckets, no skew. ``multiprobe`` also probes
    the query's Hamming-1 buckets for recall."""
    c = bucketize(corpus, corpus_id, vec_col, n_planes, seed).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "bkt"
    )
    q = bucketize(queries, query_id, vec_col, n_planes, seed, multiprobe).select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"), "bkt"
    )
    pairs = q.join(c, "bkt").drop("bkt")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.dropDuplicates(["query_id", "neighbor_id"])
    scored = score_pairs_cosine(pairs, "_qv", "_cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 5,
):
    """Lloyd's k-means over normalized vectors — the IVF coarse
    quantizer's training step, as distributed partial sums.

    Init is deterministic: the k lowest-id vectors. Each iteration is
    one mapInPandas pass emitting per-partition (centroid, sum, count)
    partials (tiny: k x dim doubles per partition) combined on the
    driver — the classic tree-aggregation shape; the corpus itself
    never shuffles. Returns a numpy (k, dim) centroid matrix.
    """
    import numpy as np

    from beats_spark.operators.scale import spread

    seed_rows = corpus.orderBy(id_col).limit(k).collect()
    cents = np.array([list(r[vec_col]) for r in seed_rows], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    data = spread(corpus.select(vec_col))

    for _ in range(iterations):
        c = cents  # capture current centroids in the task closure

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                assign = np.argmax(mat @ c.T, axis=1)
                out_c, out_s, out_n = [], [], []
                for j in np.unique(assign):
                    sel = mat[assign == j]
                    out_c.append(int(j))
                    out_s.append(sel.sum(axis=0).tolist())
                    out_n.append(len(sel))
                yield pd.DataFrame({"c": out_c, "s": out_s, "n": out_n})

        rows = data.mapInPandas(partials, "c int, s array<double>, n long").collect()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for r in rows:
            sums[r["c"]] += np.array(r["s"])
            counts[r["c"]] += r["n"]
        nonzero = counts > 0
        cents[nonzero] = sums[nonzero] / counts[nonzero, None]
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 3,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 3,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → corpus
    assigned to nearest cell → each query probes its ``nprobe``
    nearest cells → exact rerank of candidates.

    vs the hyperplane LSH: cells adapt to the data distribution
    (trained), so recall at equal candidate counts is higher on
    clustered corpora; cost is the training passes. Candidate volume ≈
    corpus x nprobe / n_cells.
    """
    import numpy as np

    from pyspark.sql import Window

    from beats_spark.operators.scale import spread

    cents = kmeans_fit(corpus, n_cells, vec_col, corpus_id, iterations)

    def assign_corpus(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            cell = np.argmax(mat @ cents.T, axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[corpus_id].to_numpy(),
                    "_cv": list(pdf[vec_col]),
                    "cell": cell.astype("int32"),
                }
            )

    vec_type = dict(corpus.dtypes)[vec_col]
    c = spread(corpus.select(corpus_id, vec_col)).mapInPandas(
        assign_corpus, f"neighbor_id long, _cv {vec_type}, cell int"
    )

    def probe_queries(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ cents.T
            order = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = pdf[query_id].to_numpy()
            vecs = list(pdf[vec_col])
            out_i, out_v, out_c = [], [], []
            for row in range(len(ids)):
                for cell in order[row]:
                    out_i.append(ids[row])
                    out_v.append(vecs[row])
                    out_c.append(int(cell))
            yield pd.DataFrame({query_id: out_i, vec_col: out_v, "cell": out_c})

    q = queries.select(query_id, vec_col).mapInPandas(
        probe_queries, f"{query_id} long, {vec_col} {vec_type}, cell int"
    ).select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"), "cell")

    pairs = q.join(c, "cell").drop("cell")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.dropDuplicates(["query_id", "neighbor_id"])
    scored = score_pairs_cosine(pairs, "_qv", "_cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def fixed_centroids(n_cells: int, dim: int, seed: int = 11) -> list[list[int]]:
    """Deterministic equal-norm (Rademacher ±1) centroids.

    Every centroid has norm sqrt(dim), so argmax of the raw dot product
    IS argmax of cosine — no normalization, no floats. Used by the
    integer-decidable assignment stage below; pure function of
    (cell, dim, seed) like the LSH planes, so the oracle can rebuild
    identical centroids."""
    return [[_plane_coef(j, d, seed) for d in range(dim)] for j in range(n_cells)]


def assign_cells_quantized(
    corpus: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell): nearest-centroid assignment in PURE int64 codegen.

    The IVF coarse-assignment step (ivf_topk's assign_corpus) is float
    argmax inside numpy; correct, but not cross-engine decidable. This
    twin quantizes each vector to floor(x*1e6) (one FP multiply on the
    stored double — identical IEEE result in any engine) and takes
    argmax_j dot(qv, c_j) over equal-norm INTEGER centroids: every
    partial sum is exact int64, ties break to the lowest cell. Narrow
    plan, zero shuffles, whole-stage codegen — the 100 TB shape for a
    bulk assignment pass. tests/test_dedup_similarity.py pins that the
    production float kernel agrees with this on the test corpora.

    Emitted as ONE let-bound F.expr string (the CLAUDE.md idiom): the
    quantized vector binds to a lambda var so the n_cells×dim terms
    read it instead of re-inlining floor(x·1e6) per term, and plan
    build is a single parse instead of ~n_cells×dim py4j Column calls
    (which alone cost seconds per query at 8×64).
    """
    structs = ", ".join(
        "named_struct('s', "
        + " + ".join(
            ("" if c > 0 else "-") + f"qv[{d}]" for d, c in enumerate(cent)
        )
        + f", 'nj', {-j}L)"
        for j, cent in enumerate(centroids)
    )
    cell = F.expr(
        f"element_at(transform(array(transform(`{vec_col}`, "
        "x -> cast(floor(cast(x as double) * 1000000) as bigint))), "
        f"qv -> cast(-array_max(array({structs})).nj as int)), 1)"
    )
    return corpus.select(F.col(id_col), cell.alias("cell"))


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 4,
):
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector space is
    split into ``m`` subspaces and each gets its own ``ksub``-centroid
    Lloyd's quantizer — at 100 TB this is THE memory lever for vector
    search (64-dim float32 → m bytes per vector, 32× smaller, so the
    scan stage reads codes, not vectors).

    All ``m`` subquantizers train in the SAME partial-sums pass per
    iteration (one job per iteration, corpus never shuffles — the
    kmeans_fit shape generalized): each partition emits (sub, centroid,
    sum, count) partials, the driver combines. Init is deterministic
    (the ksub lowest-id vectors' subvectors). Returns numpy
    (m, ksub, dim//m).
    """
    import numpy as np

    from beats_spark.operators.scale import spread

    seed_rows = corpus.orderBy(id_col).limit(ksub).collect()
    seed = np.array([list(r[vec_col]) for r in seed_rows], dtype=np.float64)
    seed /= np.linalg.norm(seed, axis=1, keepdims=True)
    dim = seed.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack([seed[:, s * dsub : (s + 1) * dsub] for s in range(m)])

    data = spread(corpus.select(vec_col))
    for _ in range(iterations):
        b = books

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                out_s, out_c, out_sum, out_n = [], [], [], []
                for s in range(m):
                    sub = mat[:, s * dsub : (s + 1) * dsub]
                    d2 = (
                        (sub * sub).sum(1)[:, None]
                        - 2 * sub @ b[s].T
                        + (b[s] * b[s]).sum(1)[None, :]
                    )
                    assign = np.argmin(d2, axis=1)
                    for j in np.unique(assign):
                        sel = sub[assign == j]
                        out_s.append(s)
                        out_c.append(int(j))
                        out_sum.append(sel.sum(axis=0).tolist())
                        out_n.append(len(sel))
                yield pd.DataFrame(
                    {"sub": out_s, "c": out_c, "s": out_sum, "n": out_n}
                )

        rows = data.mapInPandas(
            partials, "sub int, c int, s array<double>, n long"
        ).collect()
        sums = np.zeros_like(books)
        counts = np.zeros((m, ksub))
        for r in rows:
            sums[r["sub"], r["c"]] += np.array(r["s"])
            counts[r["sub"], r["c"]] += r["n"]
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 50,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """PQ/ADC approximate top-k with exact rerank: train codebooks,
    encode the corpus to m-byte codes, score every (query, code) via
    asymmetric distance computation — per query a tiny (m × ksub)
    dot-product lookup table, so the scan is LUT sums over codes, no
    vector arithmetic — keep a per-query ``shortlist``, exact-rerank
    it with true cosine, return top-k.

    Scale shape: queries collect to the driver (bounded query set, the
    cosine_topk precedent) as LUTs in the task closure; the corpus
    pass is one mapInPandas over (id, code, vec) emitting only each
    partition's local shortlist per query (shuffle = shortlist ×
    partitions × queries rows); exact rerank touches shortlist rows
    only. At real scale the codes table is 32× smaller than the
    vectors — the encode pass is where the memory win lands.
    """
    import numpy as np

    from pyspark.sql import Window

    from beats_spark.operators.scale import spread

    books = pq_train(corpus, m, ksub, vec_col, corpus_id, iterations)
    dsub = books.shape[2]

    q_rows = queries.select(query_id, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    # LUT[qi, s, c] = dot(q_sub, centroid) → ADC score = Σ_s LUT[qi, s, code_s]
    lut = np.stack(
        [q_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m)],
        axis=1,
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            ids = pdf[corpus_id].to_numpy(dtype=np.int64)
            # encode this partition's rows...
            codes = np.empty((len(mat), m), dtype=np.int64)
            for s in range(m):
                sub = mat[:, s * dsub : (s + 1) * dsub]
                d2 = (
                    (sub * sub).sum(1)[:, None]
                    - 2 * sub @ books[s].T
                    + (books[s] * books[s]).sum(1)[None, :]
                )
                codes[:, s] = np.argmin(d2, axis=1)
            # ...then ADC-score all queries against the codes
            approx = np.zeros((len(q_ids), len(mat)))
            for s in range(m):
                approx += lut[:, s, :][:, codes[:, s]]
            out_q, out_n, out_a, out_v = [], [], [], []
            for qi in range(len(q_ids)):
                row = approx[qi]
                if exclude_self:
                    row = np.where(ids == q_ids[qi], -np.inf, row)
                top = np.argsort(-row)[:shortlist]
                for t in top:
                    if row[t] == -np.inf:
                        continue
                    out_q.append(q_ids[qi])
                    out_n.append(ids[t])
                    out_a.append(float(row[t]))
                    out_v.append(list(pdf[vec_col].iloc[t]))
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "neighbor_id": out_n,
                    "approx": out_a,
                    "_cv": out_v,
                }
            )

    vec_type = dict(corpus.dtypes)[vec_col]
    cand = spread(corpus.select(corpus_id, vec_col)).mapInPandas(
        scan, f"query_id long, neighbor_id long, approx double, _cv {vec_type}"
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    kept = (
        cand.withColumn("_r", F.row_number().over(w_short))
        .filter(F.col("_r") <= shortlist)
        .drop("_r")
    )
    q_df = queries.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, q_mat)],
        f"query_id long, _qv array<double>",
    )
    scored = score_pairs_cosine(kept.join(q_df, "query_id"), "_qv", "_cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization (max-abs scaling) — the
    storage/transfer path for an embedding corpus: 4x smaller than
    float32 before ANN ever runs, the standard scalar-quantization
    step public vector stores apply (Lucene/FAISS SQ8 family).

    Everything is integer and cross-engine decidable, the
    assign_cells_quantized discipline: elements quantize to
    floor(x·1e6) int64 micro-units (one FP multiply on the stored
    float, identical IEEE result in any engine); ``scale_micro`` is
    the max-abs micro-unit; codes are ``(v·127) div scale`` —
    Spark ``div`` and DuckDB ``//`` both truncate toward zero on
    integers (CLAUDE.md, verified on negative dividends), so negative
    components are exact too. Alongside the codes the pass emits the
    audit stats a corpus job wants in the same projection:
    ``code_l1`` (Σ|code|), ``code_checksum`` (Σ code_i·i, 1-based —
    pins every code positionally for the oracle), and reconstruction
    error in micro-units (``max_err_micro``/``sum_err_micro``, vs the
    dequantized ``(code·scale) div 127``).

    All-zero vectors: scale_micro 0, codes all 0, zero error (the
    divisions guard with greatest(scale, 1)). NULL vectors are
    dropped (no geometry to quantize).

    Scale shape: ONE narrow projection riding the corpus scan — zero
    shuffles, zero Python, whole-stage codegen; emitted as a single
    let-bound F.expr (qv and scale bind once each) so the ~6·dim
    terms re-read variables instead of re-inlining the quantization
    (the CLAUDE.md re-inlining/JIT pitfall), and plan build is one
    parse instead of thousands of py4j calls.
    """
    inner = (
        "named_struct("
        "'scale_micro', am, "
        "'codes', transform(qv, v -> cast((v * 127) div greatest(am, 1L) as int)), "
        "'code_l1', aggregate(qv, 0L, (acc, v) -> acc + abs((v * 127) div greatest(am, 1L))), "
        "'code_checksum', aggregate(transform(qv, (v, i) -> ((v * 127) div greatest(am, 1L)) * (cast(i as bigint) + 1L)), 0L, (acc, x) -> acc + x), "
        "'max_err_micro', array_max(transform(qv, v -> abs(v - (((v * 127) div greatest(am, 1L)) * am) div 127))), "
        "'sum_err_micro', aggregate(transform(qv, v -> abs(v - (((v * 127) div greatest(am, 1L)) * am) div 127)), 0L, (acc, x) -> acc + x))"
    )
    q = F.expr(
        "element_at(transform(array(transform(`" + vec_col + "`, "
        "x -> cast(floor(cast(x as double) * 1000000) as bigint))), "
        "qv -> element_at(transform(array(array_max(transform(qv, v -> abs(v)))), "
        f"am -> {inner}), 1)), 1)"
    )
    return (
        df.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col), q.alias("_q"))
        .select(
            id_col,
            F.col("_q.scale_micro").alias("scale_micro"),
            F.col("_q.codes").alias("codes"),
            F.col("_q.code_l1").alias("code_l1"),
            F.col("_q.code_checksum").alias("code_checksum"),
            F.col("_q.max_err_micro").alias("max_err_micro"),
            F.col("_q.sum_err_micro").alias("sum_err_micro"),
        )
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Brute-force top-k over SQ8 codes — the search half of
    ``quantize_embeddings``: both sides quantize to int8 codes and
    score by INTEGER arithmetic — ``dot(codes_q, codes_c) ·
    scale_micro_c``. The per-corpus-vector scale factor undoes the
    max-abs normalization (codes_c ≈ x_c·127·10⁶/scale_c), so the
    score is ∝ the true inner product up to a constant per-query
    factor — ranking by MIPS, which equals cosine ranking on
    L2-normalized corpora (measured recall@5 0.65 → 0.99 on the test
    embeddings when the scale factor went in). Max |score| =
    dim·127²·10⁶ ≈ 10¹² — exact in int64 and therefore exact
    cross-engine, unlike float cosine. This is the memory-bound
    regime's plan: the corpus streams as codes (4x less I/O), the
    scoring GEMM is int64, and precision loss is the quantization's,
    not the arithmetic's.

    Same block-matrix shape as cosine_topk (query code matrix in the
    task closure, local top-k per Arrow batch, global Window top-k) —
    with one extra obligation float kNN dodges: integer scores TIE
    routinely, so the LOCAL top-k must already apply the global
    (score desc, id asc) order (lexsort, not bare argpartition) or
    the result would depend on partitioning.

    Returns (query_id, rank, neighbor_id, score).
    """
    import numpy as np

    from beats_spark.operators.scale import spread

    q_rows = (
        quantize_embeddings(queries.select(query_id, vec_col), vec_col, query_id)
        .select(query_id, "codes")
        .collect()
    )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.int64)
    # exclude-self sentinel: far below any real score (|score| <= ~10¹²)
    # but NOT int64.min — the lexsort below negates scores, and
    # -int64.min silently wraps back to int64.min in numpy, which would
    # sort the self row FIRST and evict a real local candidate
    sentinel = -(2**62)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[corpus_id].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["codes"]), dtype=np.int64)
            c_scale = pdf["scale_micro"].to_numpy(dtype=np.int64)
            # exact int64: |dot| <= dim·127², × scale_micro <= ~10¹²
            scores = (c_mat @ q_mat.T) * c_scale[:, None]
            if exclude_self:
                scores[c_ids[:, None] == q_ids[None, :]] = sentinel
            kk = min(k, scores.shape[0])
            out_q, out_n, out_s = [], [], []
            for j in range(scores.shape[1]):
                # deterministic local top-k: (-score, id) lexsort so tied
                # scores keep the globally-winning (lowest-id) rows
                order = np.lexsort((c_ids, -scores[:, j]))[:kk]
                out_q.extend([q_ids[j]] * len(order))
                out_n.extend(c_ids[order])
                out_s.extend(scores[order, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    codes = quantize_embeddings(
        corpus.select(corpus_id, vec_col), vec_col, corpus_id
    ).select(corpus_id, "codes", "scale_micro")
    cand = spread(codes).mapInPandas(
        score, "query_id long, neighbor_id long, score long"
    )
    cand = cand.filter(F.col("score") > sentinel)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def kmeans_refine_quantized(
    corpus: DataFrame,
    centroids_q: list[list[int]],
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Distributed Lloyd refinement of an IVF coarse quantizer in
    EXACT int64 — the trainable twin of :func:`assign_cells_quantized`
    (which is fixed-±1): general integer centroids, nearest by true
    squared distance, centroid update = truncating integer mean.
    Returns ``(assignments, centroids)`` — the assignment frame
    evaluated against the FINAL centroids plus the refined centroid
    table itself (list of k dim-length int lists).

    Determinism contract (what makes a clustering oracle-checkable at
    all): vectors enter as floor(x·10⁶) int64 (one IEEE multiply),
    distances are exact integer sums (|q|≤~10⁷ → diff²·dim ≪ 2⁶³),
    argmin ties break to the lowest cell, and the update is
    ``sum div count`` — truncation toward zero, which Spark ``div``
    and DuckDB ``//`` agree on even for negative sums (CLAUDE.md:
    verified, floats are what differ). Empty cells keep their previous
    centroid. Identical input ⇒ bit-identical centroids on any
    engine, any cluster size, any iteration count.

    Scale shape per iteration: ONE corpus pass — the assignment is a
    let-bound codegen expression with literal centroids (zero
    shuffle), the update is a posexplode to (cell, dim, q) whose
    groupBy reduces map-side to ≤ k·dim rows per task; the k·dim
    partial-sum frame collects to the driver and recompiles into the
    next iteration's literals (the dsir_weights bounded-model idiom —
    k·dim ints, never data). Callers iterating many rounds should
    persist the corpus projection upstream.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    k = len(centroids_q)
    if k == 0:
        raise ValueError("need at least one centroid")
    dim = len(centroids_q[0])
    if any(len(c) != dim for c in centroids_q):
        raise ValueError("ragged centroid table")

    def _assign(cents: list[list[int]]):
        arrs = ", ".join(
            "named_struct('d', aggregate(zip_with(qv, array("
            + ", ".join(f"{int(v)}L" for v in cent)
            + "), (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x), "
            f"'j', {j})"
            for j, cent in enumerate(cents)
        )
        return F.expr(
            f"element_at(transform(array(transform(`{vec_col}`, "
            "x -> cast(floor(cast(x as double) * 1000000) as bigint))), "
            f"qv -> array_min(array({arrs})).j), 1)"
        )

    cents = [list(map(int, c)) for c in centroids_q]
    qv = F.expr(
        f"transform(`{vec_col}`, "
        "x -> cast(floor(cast(x as double) * 1000000) as bigint))"
    )
    for _ in range(iterations):
        staged = corpus.select(
            _assign(cents).alias("cell"), qv.alias("_qv")
        )
        parts = (
            staged.select("cell", F.posexplode("_qv").alias("dim", "q"))
            .groupBy("cell", "dim")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in parts:
            new[r["cell"]][r["dim"]] = _trunc_div(int(r["s"]), int(r["n"]))
        cents = new
    assign = corpus.select(
        F.col(id_col), _assign(cents).cast("int").alias("cell")
    )
    return assign, cents


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark div / DuckDB //
    semantics) — Python's // floors, which differs on negatives."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
