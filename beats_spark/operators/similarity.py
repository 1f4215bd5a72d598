"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, random-hyperplane
LSH bucketing as the scale path (an IVF-style coarse quantizer without
a training step — centroid assignment is replaced by deterministic
hyperplane signs, so the whole index is a column expression).

Scale notes:
- dot products / norms are JVM ``zip_with`` + ``aggregate`` folds in
  double precision — no Python, no Arrow transfer;
- brute force broadcasts the QUERY side (assumed small) against the
  corpus: one narrow stage, no shuffle except the final top-k groupBy;
- top-k avoids a full Window sort: ``groupBy(query).agg(min_by`` style
  via sorting a collected small array per query key (k ≪ corpus);
- LSH: bucket both sides on hyperplane sign bits, join on bucket
  (multiprobe = also emit buckets at Hamming distance 1 from the query
  side), exact-rerank inside buckets. Recall is tunable with
  n_planes / multiprobe; precision is exact because of the rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns, double, JVM fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine(a: Column, b: Column, normalized: bool = False) -> Column:
    if normalized:
        return dot(a, b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, neighbor_id,
    cosine). Queries are broadcast; the corpus streams through one
    narrow stage; only the per-query top-k aggregation shuffles (keyed
    on query_id — as many keys as queries, no skew).
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), l2_normalize(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), l2_normalize(F.col(vec_col)).alias("_cv")
    )
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("cosine", dot(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _plane_coef(plane: int, dim_idx: int, seed: int) -> int:
    """Deterministic Rademacher(±1) hyperplane coefficient — a pure
    function of (plane, dim, seed) so executors rebuild identical
    planes with no broadcast of randomness."""
    z = (plane * 0x9E3779B97F4A7C15 + dim_idx * 0xBF58476D1CE4E5B9 + seed) & (
        (1 << 64) - 1
    )
    z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return 1 if (z >> 63) else -1


def hyperplane_bucket(vec: Column, dim: int, n_planes: int, seed: int = 7) -> Column:
    """LSH bucket id: sign bits of ``n_planes`` deterministic
    Rademacher hyperplanes packed into a long. Pure JVM expressions —
    the "index" ships inside the plan."""
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
    """Approximate cosine top-k: hyperplane-bucket both sides, join on
    bucket, exact rerank within candidates.

    ``multiprobe`` ≥ 1 also probes buckets at Hamming distance 1 from
    each query bucket (flips one sign bit), trading compute for recall
    — the standard answer to "my neighbor fell on the other side of a
    plane". Returned ranks are exact over the candidate set.
    """
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), l2_normalize(F.col(vec_col)).alias("_cv")
    ).withColumn("_bkt", hyperplane_bucket(F.col("_cv"), dim, n_planes, seed))

    q = queries.select(
        F.col(query_id).alias("query_id"), l2_normalize(F.col(vec_col)).alias("_qv")
    ).withColumn("_qbkt", hyperplane_bucket(F.col("_qv"), dim, n_planes, seed))
    if multiprobe:
        probes = F.array(
            F.col("_qbkt"),
            *[
                F.col("_qbkt").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), p))
                for p in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("_qbkt"))
    q = q.select("query_id", "_qv", F.explode(probes).alias("_bkt"))

    pairs = q.join(c, "_bkt")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "cosine", dot(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
