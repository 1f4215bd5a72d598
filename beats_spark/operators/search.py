"""Full-text relevance search over the corpus — BM25 on an inverted
index, the classic analytics-engine operator (find the transcripts /
documents most relevant to a term query), built entirely from
relational ops with INTEGER-deterministic scoring so the DuckDB
oracle replays every score bit-for-bit.

Scoring is a deterministic BM25 variant (Robertson & Spärck Jones
probabilistic relevance; parameter shape follows Lucene's
BM25Similarity, k1=1.2, b=0.75, non-negative idf) with two
engine-portability substitutions, both in the spirit of the repo's
float discipline (CLAUDE.md):

- idf uses floor-log2 bits instead of ``ln``:
  ``idf_bits = max(1, fl2(2N - 2df + 1) - fl2(2df + 1))`` with
  ``fl2(n) = length(bin(n)) - 1`` — the ±0.5 smoothing of the
  Robertson idf absorbed by the ×2, and every engine agrees on
  binary-string length. The floor is 1 (not Lucene's 0): a PRESENT
  query term always contributes at least its tf-normalized weight,
  so narrow-vocabulary corpora (where every term is near-ubiquitous
  and a 0-floor would zero every score) still rank by tf saturation
  while rare terms keep their multi-bit amplification.
- the tf normalization is evaluated in milli-integers:
  ``r_milli  = dl·10⁶ div avgdl_milli`` (document length ratio),
  ``tf_milli = 22·10⁶·tf div (10⁴·tf + 3·10³ + 9·r_milli)``
  — exactly ``1000·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
  with k1=12/10, b=3/4 cleared to integers, truncation defined by
  integer division (identical in Spark ``div`` and DuckDB ``//``
  for the non-negative operands here).

A hit's score is ``Σ_terms idf_bits · tf_milli`` (bit-milli units):
order-independent integer sums, no engine-ordered float addition.

Overflow bounds (ANSI-safe by construction): the largest
intermediate is ``22·10⁶ · tf`` — safe for any document under
~4·10¹¹ occurrences of one term; ``dl·10⁶`` is safe for documents
under ~9·10¹² tokens; the idf inputs are linear in corpus doc count
(safe to ~4.6·10¹⁸ docs). The corpus token total is summed but
never multiplied — the avgdl division is split quotient/remainder
so ``sum·1000`` never materializes.

Scale shape (the part that matters at 10¹² turns):

1. the exploded token stream joins the BROADCAST query vocabulary
   BEFORE any shuffle — postings materialize only for query terms,
   so the inverted-index groupBy shuffles |query-vocab postings|,
   not the corpus;
2. document length needs no shuffle at all — docs arrive one row
   each, so ``dl = size(tokens)`` is a projection;
3. corpus totals (N, avgdl) are one column-pruned aggregate pass;
4. df / idf / per-query rollups operate on the pruned postings
   (≤ |query terms| × |matching docs| rows) — tiny frames, tiny
   shuffles, and the final top-k window partitions by query_id.

Two passes over the corpus total (the totals scan and the postings
scan); both are narrow scans with map-side reduction.

Reference anchor: the reference pipeline ships transcript events to
Elasticsearch for exactly this query shape (libbeat/outputs/
elasticsearch); this operator is the in-engine equivalent of that
search path, scoring with the same family Elasticsearch/Lucene use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import re as _re

from beats_spark.functions.intmath import fl2 as _fl2

# Java \s — the exact class Spark's regexp_replace(r"\s+") uses in
# the corpus tokenizer. Python's str.split() would ALSO split on
# U+00A0 and other Unicode spaces, silently fracturing a phrase the
# engine tokenizes as one token.
_JAVA_WS = _re.compile(r"[ \t\n\x0b\x0c\r]+")


def phrase_tokens(text: str | None) -> list[str]:
    """Driver-side twin of the corpus tokenizer (dedup.tokens):
    lowercase + split on the Java ``\\s`` class. Used for phrase
    parsing AND the oracle-SQL generator so neither can drift from
    the in-engine rule."""
    return [t for t in _JAVA_WS.split((text or "").lower()) if t]


def phrase_search(
    docs: DataFrame,
    phrases: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Exact ordered-phrase search via POSITIONAL postings — the
    inverted-index operator BM25's bag-of-words scoring can't
    express ("hash join" as adjacent words, not two terms). A
    document matches where tokens t₁..tₘ occupy consecutive
    positions; occurrences may overlap (Lucene sliding-position
    semantics: 'a a a' contains 'a a' twice).

    Construction: posexplode the normalized token stream →
    positional postings (doc, pos, tok), pruned by the BROADCAST
    phrase vocabulary before any shuffle (the bm25_search
    discipline); each phrase then chains m−1 equi-joins on
    (doc, pos + offset) over its own term postings — never a cross
    join, and every join key includes the document, so candidate
    pairs only materialize inside documents that contain ALL the
    phrase's terms. Per-phrase frames union (phrases are a bounded
    driver-side list, same contract as ``bm25_search`` queries).

    Returns ``(query_id, <id_col>, n_matches, rank)`` — rank by
    match count desc, doc id asc; only matching docs appear.

    Scale: positional postings exist only for phrase terms, so the
    shuffled volume is |phrase-term postings| (uniform hash keys,
    AQE-sized); single-term phrases reduce to a tf count with no
    join. The final top-k window partitions by query_id.
    """
    if not phrases:
        raise ValueError("phrase_search needs at least one phrase")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from beats_spark.operators.dedup import tokens as _toks

    spark = docs.sparkSession
    parsed: list[tuple[str, list[str]]] = []
    for qid, text in phrases:
        toks = phrase_tokens(text)
        if not toks:
            raise ValueError(f"phrase {qid!r} has no tokens")
        parsed.append((qid, toks))

    vocab = spark.createDataFrame(
        [(t,) for t in sorted({t for _, ts in parsed for t in ts})],
        "tok string",
    )
    postings = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.posexplode(
                F.filter(_toks(F.col(text_col)), lambda x: x != "")
            ).alias("_pos", "tok"),
        )
        .join(F.broadcast(vocab), "tok")
        .persist()  # every phrase term re-reads the pruned postings
    )

    per_phrase = []
    for qid, toks in parsed:
        cand = (
            postings.where(F.col("tok") == toks[0])
            .select(F.col("_doc"), F.col("_pos"))
        )
        for off, t in enumerate(toks[1:], start=1):
            nxt = postings.where(F.col("tok") == t).select(
                F.col("_doc").alias("_d2"),
                (F.col("_pos") - off).alias("_p2"),
            )
            cand = cand.join(
                nxt,
                (F.col("_doc") == F.col("_d2"))
                & (F.col("_pos") == F.col("_p2")),
            ).select("_doc", "_pos")
        per_phrase.append(
            cand.groupBy("_doc")
            .agg(F.count(F.lit(1)).alias("n_matches"))
            .select(
                F.lit(qid).alias("query_id"),
                "_doc",
                F.col("n_matches").cast("long").alias("n_matches"),
            )
        )
    hits = per_phrase[0]
    for f in per_phrase[1:]:
        hits = hits.unionByName(f)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_matches"), F.asc("_doc")
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("_doc").alias(id_col),
            "n_matches",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def keyword_extract(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by integer tf-idf
    — the corpus-curation companion to :func:`bm25_search` (topic
    tagging, cluster labeling, dedup-family diagnostics). Same idf
    rule as BM25 (floor-log2 bits with a presence floor of 1, module
    docstring), score ``tf · idf_bits``, ties broken by ascending
    token text so the extraction is deterministic at any parallelism.

    Returns ``(<id_col>, tok, tf, score, rank)``, rank 1-based per
    document. Documents with no tokens yield no rows.

    Scale shape: unlike search (which prunes to a query vocabulary),
    keyword extraction is a FULL-corpus doc-vector build — the
    irreducible cost is one partially-aggregated shuffle of the
    token stream keyed (doc, tok) for tf, plus a (tok)-keyed
    aggregate for df whose output is |vocab| rows (AQE chooses the
    join side to broadcast). The top-k window re-partitions the
    (doc, tok) frame by doc alone — token-level rows, never raw
    text. Corpus totals are one column-pruned pass (1 row).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from beats_spark.operators.dedup import tokens as _toks

    base = docs.select(
        F.col(id_col).alias("_doc"),
        F.filter(_toks(F.col(text_col)), lambda x: x != "").alias("_tk"),
    )
    n_docs = base.agg(F.count(F.lit(1)).alias("_n_docs"))
    toks = base.select("_doc", F.explode("_tk").alias("tok"))
    tf = (
        toks.groupBy("_doc", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()  # feeds df AND the scoring join (multi-consumer rule)
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))

    two_n = F.col("_n_docs") * 2
    two_df = F.col("_df") * 2
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_idf",
            F.greatest(
                F.lit(1).cast("long"),
                _fl2(two_n - two_df + 1) - _fl2(two_df + 1),
            ),
        )
        .withColumn("score", (F.col("tf") * F.col("_idf")).cast("long"))
    )
    w = Window.partitionBy("_doc").orderBy(
        F.desc("score"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_doc").alias(id_col),
            "tok",
            F.col("tf").cast("long").alias("tf"),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def bm25_search(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query under deterministic integer
    BM25 (module docstring has the exact formula and bounds).

    ``queries`` is a bounded driver-side list of ``(query_id,
    query_text)`` — the interactive-search contract (same bounded-
    queries stance as the ANN operators). Query text is normalized
    with the corpus tokenizer; duplicate terms within one query
    count once. Terms absent from the corpus contribute nothing
    (df=0 rows never materialize). Ties break on ascending doc id,
    so the ranking is deterministic at any parallelism.

    Returns ``(query_id, <id_col>, score_milli, rank)`` with rank
    1-based per query, score descending.
    """
    if not queries:
        raise ValueError("bm25_search needs at least one query")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from beats_spark.operators.dedup import tokens as _toks

    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        list(queries), "query_id string, _q string"
    )
    qterms = (
        qdf.select("query_id", F.explode(_toks(F.col("_q"))).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    vocab = qterms.select("tok").distinct()

    base = docs.select(
        F.col(id_col).alias("_doc"),
        F.filter(_toks(F.col(text_col)), lambda x: x != "").alias("_tk"),
    )
    # corpus stats: one aggregate pass, one row out
    totals = base.select(F.size("_tk").cast("long").alias("_dl")).agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
    ).select(
        "_n_docs",
        # (sum*1000) div n, split so the corpus token total is never
        # multiplied (sum*1000 would overflow int64 past ~9.2e15
        # tokens): quotient*1000 + remainder*1000 div n — identical
        # value, remainder < n keeps every product small
        F.expr(
            "(_sum_dl div greatest(_n_docs, 1)) * 1000"
            " + ((_sum_dl % greatest(_n_docs, 1)) * 1000"
            "    div greatest(_n_docs, 1))"
        ).alias("_avgdl_milli"),
    )

    # postings pruned to the query vocabulary BEFORE the tf shuffle;
    # dl rides along (functionally dependent on _doc)
    matched = (
        base.select(
            "_doc",
            F.size("_tk").cast("long").alias("_dl"),
            F.explode("_tk").alias("tok"),
        )
        .join(F.broadcast(vocab), "tok")
        .groupBy("tok", "_doc", "_dl")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .persist()  # feeds df AND the scoring join (multi-consumer rule)
    )
    dfreq = matched.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))

    two_n = F.col("_n_docs") * 2
    two_df = F.col("_df") * 2
    scored = (
        matched.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_idf",
            F.greatest(
                F.lit(1).cast("long"),
                _fl2(two_n - two_df + 1) - _fl2(two_df + 1),
            ),
        )
        .withColumn(
            "_r_milli",
            F.expr("_dl * 1000000 div greatest(_avgdl_milli, 1)"),
        )
        .withColumn(
            "_tf_milli",
            F.expr("22000000 * _tf div (10000 * _tf + 3000 + 9 * _r_milli)"),
        )
        .withColumn("_partial", F.col("_idf") * F.col("_tf_milli"))
    )
    hits = (
        scored.join(F.broadcast(qterms), "tok")
        .groupBy("query_id", "_doc")
        .agg(F.sum("_partial").cast("long").alias("score_milli"))
        # degenerate documents (length ≫ 2400× avgdl) can tf-zero a
        # match; ranks stay meaningful by dropping zero-score hits
        .where(F.col("score_milli") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("_doc")
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("_doc").alias(id_col),
            "score_milli",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def rrf_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    probes: dict[str, int],
    k: int = 5,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    emb_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval second stage — reciprocal-rank fusion
    (Cormack et al., SIGIR 2009) of a lexical candidate ranking with
    a dense cosine re-rank: final score = Σᵢ 10⁶ div (rrf_k + rankᵢ)
    over the two rankings, exact integers once the ranks are fixed.
    ``candidates`` is a bm25_search-shaped frame (query, id, rank);
    ``probes`` maps each query id to the vec id whose embedding
    stands in as the query vector (the interactive-search contract:
    bounded driver-side queries, same stance as the ANN operators).

    Cosine VALUES are floats but only their per-query ORDER is used
    (ids-only float-order-stable discipline, knn_bruteforce
    precedent); ties and near-ties break on ascending doc id.

    100 TB shape: stage 1 (bm25_search) already reduced the corpus
    to ≤ |queries|·k₁ candidate rows, so this stage's only
    corpus-scale touch is ONE broadcast-candidates hash join against
    the embeddings table to fetch candidate vectors — the corpus
    embedding matrix never shuffles, no GEMM, no index. Probe
    vectors are a bounded driver collect. Every window here runs on
    the candidate frame.
    """
    if not probes:
        raise ValueError("probes must be non-empty")
    from pyspark.sql import Window

    pv_rows = {
        r[0]: list(r[1])
        for r in emb.where(
            F.col(emb_id).isin(*set(probes.values()))
        ).select(emb_id, vec_col).collect()
    }
    missing = [q for q, v in probes.items() if v not in pv_rows]
    if missing:
        raise ValueError(f"probe vectors not found for {missing}")
    probe_vec = None
    for q, vid in sorted(probes.items()):
        arr = F.array(*[F.lit(float(x)) for x in pv_rows[vid]])
        probe_vec = (
            F.when(F.col(query_col) == q, arr)
            if probe_vec is None
            else probe_vec.when(F.col(query_col) == q, arr)
        )
    cand = candidates.select(
        F.col(query_col),
        F.col(id_col),
        F.col(rank_col).cast("long").alias("_r1"),
    )
    withvec = (
        F.broadcast(cand)
        .join(
            emb.select(F.col(emb_id).alias(id_col), F.col(vec_col)),
            id_col,
        )
        .withColumn("_pv", probe_vec)
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("_pv"),
            F.col(vec_col),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731 — tiny local combinator
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / (norm(F.col("_pv")) * norm(F.col(vec_col)))
    w_cos = Window.partitionBy(query_col).orderBy(
        F.col("_cos").desc(), F.col(id_col).asc()
    )
    w_fin = Window.partitionBy(query_col).orderBy(
        F.col("rrf_micro").desc(), F.col(id_col).asc()
    )
    return (
        withvec.withColumn("_cos", cos)
        .withColumn("_r2", F.row_number().over(w_cos).cast("long"))
        .withColumn(
            "rrf_micro",
            F.expr(
                f"cast(1000000 div ({rrf_k} + _r1) "
                f"+ 1000000 div ({rrf_k} + _r2) as long)"
            ),
        )
        .withColumn("rank", F.row_number().over(w_fin).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_col, id_col, "rrf_micro", "rank")
    )
