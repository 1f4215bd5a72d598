"""URL canonicalization and URL-level dedup for web-scale corpora.

Web-crawl training pipelines dedup documents by canonical URL before
any content-based pass: the same page is fetched under scheme/host
case variants, default ports, tracker-laden query strings, shuffled
parameter order, and fragments. Canonicalizing first removes the
bulk of crawl duplicates for the cost of a projection — no shuffle,
no text comparison (the content-based passes in
beats_spark/operators/dedup.py handle the rest).

This is a training-data op beyond the reference surface; libbeat's
nearest relatives are the `urldecode` processor
(beats_spark/operators/parse.py:492, reference
libbeat/processors/urldecode/urldecode.go) and the `registered_domain`
processor (beats_spark/operators/enrich.py:175) — both transform URL
fields but neither canonicalizes. The rules below are the common
subset of public crawl canonicalizers (lowercase scheme+host, strip
default port, collapse duplicate slashes, strip trailing slash,
drop fragment, drop tracking params, sort the rest).

Everything is flat `pyspark.sql.functions` expressions — one
whole-stage-codegen span, replayable in ANSI SQL for the DuckDB
oracle. Regexes are in the Java ∩ RE2 subset; parameter sort is
binary/ASCII (both engines' default for ASCII strings, the only
content the fixtures emit — noted for non-ASCII query strings,
where Java UTF-16 vs UTF-8 byte order can differ on astral planes).

At 100 TB this op is scan-dominated: canonicalization itself is
codegen; the dedup group-by shuffles one short string + one long
per row, with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import Processor, Updates, add_flag, register

# Query parameters that never identify content: analytics trackers.
# Matched against the lowercased `key=` prefix of each parameter.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|yclid|igshid|mc_cid|mc_eid)="
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored scan to the first '?' OR '#', whichever comes first: an
# unanchored \? would happily match a '?' INSIDE the fragment
# ('http://h/p#?a=b' must canonicalize to 'http://h/p', not resurrect
# 'a=b' as a query on a URL that never existed)
_QUERY_RE = r"^[^#?]*\?([^#]*)"

# scheme -> default port suffix stripped from the authority
DEFAULT_PORTS = {"http": ":80", "https": ":443", "ftp": ":21", "ws": ":80", "wss": ":443"}


def url_scheme(col: Column) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(col, _SCHEME_RE, 1))


def canonical_query(col: Column) -> Column:
    """Sorted, tracker-free query string ('' when nothing survives).

    Split on '&', drop empty segments and tracking parameters, sort
    binary-ascending, rejoin. Parameter VALUES are preserved byte-for-
    byte — only order and trackers are normalized.
    """
    q = F.regexp_extract(col, _QUERY_RE, 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(col: Column) -> Column:
    """Canonical form of an absolute URL; NULL for non-URL values.

    Rules (each a pure codegen expression over the input string):
      scheme    lowercased
      host      authority lowercased; the scheme's default port
                stripped (http:80, https:443, ftp:21, ws/wss)
      path      duplicate slashes collapsed, trailing slash stripped,
                '' -> '/'
      query     trackers dropped, params sorted (canonical_query)
      fragment  dropped
    """
    scheme = url_scheme(col)
    auth = F.lower(F.regexp_extract(col, _AUTHORITY_RE, 1))
    # one flat CASE, not a nested when-chain: nesting would re-inline
    # the authority extract 2^N times (CLAUDE.md: deep nested exprs
    # blow the JIT threshold); a WHEN-branch chain references it N+1×.
    stripped = None
    for sch, port in DEFAULT_PORTS.items():
        cond = scheme == sch
        repl = F.regexp_replace(auth, port + "$", "")
        stripped = F.when(cond, repl) if stripped is None else stripped.when(cond, repl)
    auth = stripped.otherwise(auth)
    path = F.regexp_extract(col, _PATH_RE, 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    path = F.when(path == "", "/").otherwise(path)
    q = canonical_query(col)
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q == "", "").otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def add_url_canonical(
    df: DataFrame, url_col: str = "url", target: str = "canonical_url"
) -> DataFrame:
    """Attach the canonical URL column (NULL where not an absolute URL)."""
    return df.withColumn(target, canonicalize_url(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup: per input row, the canonical URL, how many
    rows share it, and whether this row is the canonical keeper
    (lowest id). Rows whose value is not an absolute URL keep
    `canonical_url` NULL and are never deduped against each other.

    Plan: projection + one hash shuffle on the canonical string
    (window over canonical_url). Partial aggregation does not apply
    to windows, but the shuffled payload is (canonical_url, id) —
    bytes-per-row bounded by the URL, never the document text. For
    keeper-only output, filter `is_keeper` afterwards; Catalyst
    pushes nothing through the window, so apply upstream filters
    before calling.

    NULL canonicals are SALTED out of the hot partition (ADVICE r3):
    on a crawl a large non-URL fraction would otherwise all hash to
    the single NULL window key and funnel into one task — a
    straggler/OOM hazard at 100 TB even though their computed values
    are discarded. The window partitions on
    ``coalesce(canonical_url, '\\0null' || hash(id) % 64)`` so NULL
    rows spread over 64 synthetic keys, and their outputs are
    overridden to the constants (n_dupes=1, is_keeper=true). Still
    ONE pass and ONE shuffle — a filter-split + union would execute
    the upstream canonicalization battery twice (no ReuseExchange for
    shared subtrees, CLAUDE.md).
    """
    from pyspark.sql.window import Window

    out = add_url_canonical(df, url_col)
    is_null = F.col("canonical_url").isNull()
    salt_key = F.coalesce(
        F.col("canonical_url"),
        F.concat(
            F.lit("\x00null"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(64)).cast("string"),
        ),
    )
    w = Window.partitionBy(salt_key)
    return out.withColumns(
        {
            "n_dupes": F.when(is_null, F.lit(1).cast("long")).otherwise(
                F.count(F.lit(1)).over(w)
            ),
            "is_keeper": F.when(is_null, F.lit(True)).otherwise(
                F.col(id_col) == F.min(id_col).over(w)
            ),
        }
    )


@register
class CanonicalizeURL(Processor):
    """Beats-style config-chain form of URL canonicalization.

    Config: ``field`` (URL column, default "url"), optional
    ``target`` (default overwrites in place). Non-URL values write
    NULL and tag ``url_canonical_error`` in `flags` — tag-and-
    continue like every parse-family processor.
    """

    name = "canonicalize_url"

    def updates(self, df: DataFrame) -> Updates:
        field = self.cfg.get("field", "url")
        target = self.cfg.get("target") or field
        col = F.col(field)
        canon = canonicalize_url(col)
        out: dict[str, Column] = {target: canon}
        if self.cfg.get("tag_on_failure", True):
            out["flags"] = add_flag(
                df, "url_canonical_error", col.isNotNull() & canon.isNull()
            )
        return Updates(set=out)


def url_host(col: Column) -> Column:
    """Lowercased host of an absolute URL: authority minus userinfo
    and port. '' when the value is not an absolute URL (including
    NULL input). Normalizes the two RFC-legal one-character evasions
    a blocklist gate must not fall for: an empty port ('host:') and a
    trailing-dot FQDN ('host.' is the same DNS name as 'host')."""
    auth = F.lower(F.regexp_extract(col, _AUTHORITY_RE, 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    auth = F.regexp_replace(auth, r":[0-9]*$", "")
    return F.coalesce(F.regexp_replace(auth, r"\.$", ""), F.lit(""))


def domain_suffixes(host: Column) -> Column:
    """Every dot-suffix of a hostname, most-specific first:
    a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com]. Pure codegen (split + transform + slice); the array length
    is the label count, bounded by the hostname itself."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def url_filter(
    df: DataFrame,
    blocklist_df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    patterns: list[str] | None = None,
    blocklist_col: str = "domain",
    persist: bool = True,
) -> DataFrame:
    """URL/domain blocklist filter — the curation gate web-crawl
    training pipelines (RefinedWeb §3.1, UT1-style lists) run before
    any content pass: a document is rejected when its host or ANY
    parent domain appears in the blocklist, or when the lowercased URL
    matches a path/keyword pattern.

    Returns the input plus ``host``, ``blocked_domain``,
    ``blocked_pattern``, and ``keep`` (= neither blocked; non-URL rows
    have host '' and are never blocked here — content passes own
    them). ``id_col`` keys the blocked-set join-back: rows SHARING an
    id receive the OR of their block decisions, so on a multi-URL
    frame (e.g. an extract_links frontier, many links per doc_id)
    pass a row-unique id or the URL column itself — never the doc id.

    Scale shape: the blocklist is a DIMENSION table (UT1 is ~4.6M
    domains, ~100 MB) — broadcast it; the corpus never shuffles for
    it. Suffix matching explodes each host into its ≤label-count
    dot-suffixes (narrow), left-semi broadcast-joins the blocklist,
    and the surviving (rare) blocked id set joins back on the id —
    AQE broadcasts that side when it is small, which on a healthy
    crawl it is. The pattern battery is a single codegen rlike — no
    join at all.
    """
    host = url_host(F.col(url_col))
    # persisted: with_host feeds both the exploded-suffix candidate
    # frame and the join-back — without the cache the upstream df and
    # the url_host regex battery execute on both sides of the
    # self-join (ReuseExchange doesn't fire for shared subtrees).
    # ``persist=False`` is for long-running per-batch callers
    # (streaming foreachBatch): an internal persist has no unpersist
    # hook and would pin one cached frame per micro-batch forever —
    # such callers cache their own upstream and eat the (cheap)
    # host-regex recompute on the second consumer.
    with_host = df.withColumn("host", host)
    if persist:
        with_host = with_host.persist()
    cand = with_host.select(
        F.col(id_col), F.explode(domain_suffixes(F.col("host"))).alias("_sfx")
    ).where(F.col("_sfx") != "")
    bl = blocklist_df.select(F.lower(F.col(blocklist_col)).alias("_sfx"))
    blocked = (
        cand.join(F.broadcast(bl), "_sfx", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_bd", F.lit(True))
    )
    out = with_host.join(blocked, id_col, "left").withColumn(
        "blocked_domain", F.coalesce(F.col("_bd"), F.lit(False))
    ).drop("_bd")
    if patterns:
        pat = "|".join(f"(?:{p})" for p in patterns)
        blocked_pat = F.coalesce(
            F.lower(F.col(url_col)).rlike(pat), F.lit(False)
        )
    else:
        blocked_pat = F.lit(False)
    return out.withColumn("blocked_pattern", blocked_pat).withColumn(
        "keep", ~F.col("blocked_domain") & ~F.col("blocked_pattern")
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 48,
) -> DataFrame:
    """Redirect / rel=canonical chain resolution: every source URL
    resolves to its TERMINAL target (the page that actually serves
    content) or is flagged as part of a redirect loop — the crawl
    hygiene pass that keeps a frontier from re-fetching 301 chains
    and prevents loop traps from eating budget.

    Multiple outgoing edges per source (conflicting canonical hints)
    collapse to the lexicographically smallest target first —
    deterministic on any engine/parallelism. Emits one row per
    distinct source: ``src_col``, ``terminal`` (NULL when looped),
    ``hops`` (chain length; NULL when looped), ``looped``.

    Spark-first shape — POINTER JUMPING (the linearize_threads
    doubling without path strings): state (origin, cur, hops) jumps
    through the current frame each round, so a length-L chain
    resolves in ceil(log2 L) self-joins; convergence (zero jumps) is
    read off the same action that materializes the round's persist.
    A chain that is still jumping after the doubling horizon has, by
    pigeonhole, entered a cycle — those origins flag ``looped`` via
    one final semi-join against the source set (no cycle-finding
    pass, no path storage). Each round shuffles 24 B/url state rows.
    """
    e = (
        edges.select(
            F.col(src_col).alias("_o"), F.col(dst_col).alias("_d")
        )
        .where("_o is not null and _d is not null and _o != _d")
        .groupBy("_o")
        .agg(F.min("_d").alias("_d"))
    )
    state = e.select(
        F.col("_o"),
        F.col("_d").alias("_cur"),
        F.lit(1).cast("long").alias("_hops"),
    ).persist()
    n_total = state.count()
    # ceil(log2(n)) + 1 doubling rounds resolve every acyclic chain
    # (length <= n); anything still jumping after that is cyclic
    horizon = max(1, (max(n_total, 2) - 1).bit_length() + 1)
    if horizon > max_rounds:
        raise ValueError(
            f"resolve_redirects: {n_total} edges need {horizon} doubling "
            f"rounds > max_rounds={max_rounds}"
        )
    for rounds in range(horizon):
        a, b = state.alias("a"), state.alias("b")
        nxt = a.join(
            b, F.col("a._cur") == F.col("b._o"), "left"
        ).select(
            F.col("a._o").alias("_o"),
            F.coalesce(F.col("b._cur"), F.col("a._cur")).alias("_cur"),
            (
                F.col("a._hops") + F.coalesce(F.col("b._hops"), F.lit(0))
            ).alias("_hops"),
        )
        if (rounds + 1) % 5 == 0:
            nxt = nxt.localCheckpoint(eager=False)
        nxt = nxt.persist()
        nxt.count()  # materialize the round; horizon bounds the loop
        state.unpersist()
        state = nxt
    srcs = e.select(F.col("_o").alias("_cand"))
    out = state.join(
        srcs, state._cur == srcs._cand, "left"
    ).select(
        F.col("_o").alias(src_col),
        F.when(F.col("_cand").isNull(), F.col("_cur")).alias("terminal"),
        F.when(F.col("_cand").isNull(), F.col("_hops")).alias("hops"),
        F.col("_cand").isNotNull().alias("looped"),
    )
    return out
