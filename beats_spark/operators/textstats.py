"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure JVM column expressions (regexp counts, md5, array folds) —
these run inside the same whole-stage-codegen span as the rest of the
processor chain, cost ~one pass over the text bytes, and need no
shuffle at any scale.

Every function here is deliberately SQL-replicable (the heuristics use
only lower/regexp/length/md5 primitives that exist in ANSI-ish SQL
engines) so correctness oracles can recompute them independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.functions.intmath import fl2
from pyspark.sql.window import Window

# Language ID v2 (round 5 — widened from the original 5-language
# battery): two stages, both pure regexp counts so the DuckDB oracle
# is GENERATED from these very tables (lang_id_sql_parts below) and
# cannot drift from the Spark expression.
#
# Stage 1 — script routing: languages with a (near-)unique script are
# identified by codepoint-range counts, far more robust than stopwords
# (zh/ja/ko/ru/uk/ar/he/hi/th/el, plus vi via its precomposed Latin
# extensions). \x{...} ranges parse identically in Java regex (Spark)
# and RE2 (DuckDB); \uXXXX would not.
LANG_SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("kana", r"[\x{3040}-\x{30ff}]"),      # hiragana + katakana → ja
    ("hangul", r"[\x{ac00}-\x{d7af}]"),    # → ko
    ("han", r"[\x{4e00}-\x{9fff}]"),       # → zh (ja if kana present)
    ("cyr", r"[\x{0400}-\x{04ff}]"),       # → ru / uk
    # Ukrainian-specific Cyrillic letters (Єє Іі Її Ґґ): the ru/uk split
    ("ukr", r"[\x{0404}\x{0406}\x{0407}\x{0454}\x{0456}\x{0457}\x{0490}\x{0491}]"),
    ("arab", r"[\x{0600}-\x{06ff}]"),      # → ar
    ("hebr", r"[\x{0590}-\x{05ff}]"),      # → he
    ("deva", r"[\x{0900}-\x{097f}]"),      # → hi
    ("thai", r"[\x{0e00}-\x{0e7f}]"),      # → th
    ("grek", r"[\x{0370}-\x{03ff}]"),      # → el
    # Vietnamese precomposed vowels/đ (Latin Ext-A/B + Ext Additional)
    ("viet", r"[\x{0102}\x{0103}\x{0110}\x{0111}\x{01a0}\x{01a1}\x{01af}\x{01b0}\x{1ea0}-\x{1ef9}]"),
    ("lat", r"[A-Za-z\x{00c0}-\x{024f}]"),
)

# Stage 2 — stopword-marker batteries for Latin-script languages.
# ASCII-only ON PURPOSE: \b is ASCII-word-based in BOTH Java regex
# (default flags) and RE2, so a marker with a diacritic would anchor
# on the accented letter as a boundary; restricting the battery to
# ASCII markers keeps both engines trivially identical. Score =
# marker hits over lowercased text; argmax wins, ties broken by
# language code order; all-zero → 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "cs": ["je", "se", "na", "ale", "jako", "pro", "byl", "tak"],
    "da": ["og", "det", "til", "er", "ikke", "med", "for", "af"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "es": ["el", "los", "las", "que", "por", "una", "como", "pero"],
    "fi": ["ja", "on", "ei", "oli", "mutta", "joka", "kun", "niin"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "qui"],
    "hu": ["az", "nem", "hogy", "is", "egy", "meg", "van", "mint"],
    "id": ["yang", "dan", "di", "untuk", "dengan", "tidak", "ini", "itu"],
    "it": ["il", "che", "di", "non", "per", "sono", "con", "della"],
    "nl": ["het", "een", "van", "niet", "dat", "voor", "met", "op"],
    "pl": ["nie", "jest", "sie", "na", "jak", "ale", "czy", "tak"],
    "pt": ["para", "uma", "com", "mas", "mais", "como", "dos", "mesmo"],
    "ro": ["este", "care", "pentru", "mai", "din", "sunt", "dar", "acest"],
    "sv": ["och", "att", "det", "som", "inte", "med", "av", "en"],
    "tr": ["bir", "ve", "bu", "gibi", "daha", "ama", "olarak", "sonra"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "in", "it", "on", "as", "at", "be", "by"]


def _word_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def count_matches(col: Column, pattern: str) -> Column:
    """Number of regex matches in a string column (JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def token_count_whitespace(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank).

    Convention caveat (mirrored exactly by every DuckDB oracle, so it
    is load-bearing — change both sides or neither): F.trim strips
    only ASCII spaces, so edge whitespace like a trailing newline
    contributes one empty token ('a\\n' counts 2). Fine for the
    relative-size signals this feeds (quality, packing budgets — the
    precise path is BPE anyway); chunk_documents uses a regex strip
    where token identity matters."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# BPE-ish pre-tokenizer: word pieces, numbers, and single non-space
# punctuation — the GPT-2 pre-tokenizer's shape without the lookbehind
# (kept simple so SQL oracles can reproduce it byte-for-byte).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe_ish(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def lang_id(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID over ~27 languages. Two deterministic
    stages (tables above; the DuckDB oracle is generated from the
    same tables by :func:`lang_id_sql_parts`):

    1. Script routing — if a non-Latin script outweighs the Latin
       letter count, the script decides: kana→ja (han+kana vs latin),
       hangul→ko, han→zh, cyrillic→ru (uk when Ukrainian-specific
       letters appear), arabic→ar, hebrew→he, devanagari→hi, thai→th,
       greek→el; ≥3 Vietnamese precomposed letters → vi.
    2. Stopword-marker argmax over 16 Latin-script languages; ties
       break to the alphabetically first code; all-zero scores (and
       NULL/empty text) → 'und'.

    Returns the ISO-639-1 code string (or 'und')."""
    markers = markers or LANG_MARKERS
    sc = {
        n: F.coalesce(F.regexp_count(col, F.lit(p)), F.lit(0))
        for n, p in LANG_SCRIPT_RANGES
    }
    scored = [
        F.struct(
            count_matches(F.lower(col), _word_pattern(words)).alias("score"),
            # invert code ordering inside the struct comparison so that
            # array_max's lexicographic (score, rank) max = highest
            # score, FIRST code on ties
            F.lit(-i).alias("rank"),
            F.lit(code).alias("code"),
        )
        for i, (code, words) in enumerate(sorted(markers.items()))
    ]
    best = F.array_max(F.array(*scored))
    latin_pred = F.when(best.getField("score") <= 0, F.lit("und")).otherwise(
        best.getField("code")
    )
    return (
        F.when(col.isNull() | (F.length(col) == 0), F.lit("und"))
        .when((sc["kana"] >= 1) & (sc["kana"] + sc["han"] > sc["lat"]), F.lit("ja"))
        .when(sc["hangul"] > sc["lat"], F.lit("ko"))
        .when(sc["han"] > sc["lat"], F.lit("zh"))
        .when((sc["cyr"] > sc["lat"]) & (sc["ukr"] >= 1), F.lit("uk"))
        .when(sc["cyr"] > sc["lat"], F.lit("ru"))
        .when(sc["arab"] > sc["lat"], F.lit("ar"))
        .when(sc["hebr"] > sc["lat"], F.lit("he"))
        .when(sc["deva"] > sc["lat"], F.lit("hi"))
        .when(sc["thai"] > sc["lat"], F.lit("th"))
        .when(sc["grek"] > sc["lat"], F.lit("el"))
        .when(sc["viet"] >= 3, F.lit("vi"))
        .otherwise(latin_pred)
    )


def lang_id_sql_parts(text_expr: str = "text") -> tuple[str, str]:
    """The DuckDB twin of :func:`lang_id`, GENERATED from the same
    LANG_SCRIPT_RANGES / LANG_MARKERS tables so the two engines cannot
    drift (the quality_model discipline). Returns (select_list,
    pred_expr): put the select_list in a CTE computing each count once
    (aliases ``c_<script>`` / ``m_<code>``), then select ``pred_expr``
    over it."""
    cols = [
        f"len(regexp_extract_all({text_expr}, '{p}')) AS c_{n}"
        for n, p in LANG_SCRIPT_RANGES
    ]
    codes = sorted(LANG_MARKERS)
    cols += [
        "len(regexp_extract_all(lower(" + text_expr + "), "
        f"'{_word_pattern(LANG_MARKERS[c])}')) AS m_{c}"
        for c in codes
    ]
    branches = []
    for i, c in enumerate(codes):
        rest = ", ".join(f"m_{x}" for x in codes[i + 1:])
        cond = f"m_{c} >= greatest({rest})" if rest else "TRUE"
        branches.append(f"WHEN {cond} THEN '{c}'")
    all_m = ", ".join(f"m_{c}" for c in codes)
    latin_case = (
        f"CASE WHEN greatest({all_m}) <= 0 THEN 'und' "
        + " ".join(branches)
        + " END"
    )
    pred = (
        "CASE "
        f"WHEN {text_expr} IS NULL OR length({text_expr}) = 0 THEN 'und' "
        "WHEN c_kana >= 1 AND c_kana + c_han > c_lat THEN 'ja' "
        "WHEN c_hangul > c_lat THEN 'ko' "
        "WHEN c_han > c_lat THEN 'zh' "
        "WHEN c_cyr > c_lat AND c_ukr >= 1 THEN 'uk' "
        "WHEN c_cyr > c_lat THEN 'ru' "
        "WHEN c_arab > c_lat THEN 'ar' "
        "WHEN c_hebr > c_lat THEN 'he' "
        "WHEN c_deva > c_lat THEN 'hi' "
        "WHEN c_thai > c_lat THEN 'th' "
        "WHEN c_grek > c_lat THEN 'el' "
        "WHEN c_viet >= 3 THEN 'vi' "
        f"ELSE {latin_case} END"
    )
    return ",\n         ".join(cols), pred


def quality_metrics(col: Column) -> dict[str, Column]:
    """Quality heuristics over a text column; all deterministic and
    cheap: char length, word count, mean word length, punctuation
    ratio, uppercase ratio, stopword ratio, digit ratio."""
    n_chars = F.length(col)
    words = token_count_whitespace(col)
    n_punct = count_matches(col, r"[^\w\s]")
    n_upper = count_matches(col, r"[A-Z]")
    n_digit = count_matches(col, r"[0-9]")
    n_stop = count_matches(F.lower(col), _word_pattern(STOPWORDS_EN))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_words = F.greatest(words, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_words": words,
        "mean_word_len": n_chars.cast("double") / safe_words,
        "punct_ratio": n_punct.cast("double") / safe_chars,
        "upper_ratio": n_upper.cast("double") / safe_chars,
        "digit_ratio": n_digit.cast("double") / safe_chars,
        "stopword_ratio": n_stop.cast("double") / safe_words,
    }


def quality_score(col: Column) -> Column:
    """Composite quality score in [0, 100]: rewards mid-length docs
    with stopword structure; penalizes punctuation/digit soup. A
    linear, fully-SQL-expressible rubric (Gopher-rules flavored)."""
    m = quality_metrics(col)
    length_ok = F.when((m["n_words"] >= 10) & (m["n_words"] <= 10000), 30.0).otherwise(
        0.0
    )
    word_len_ok = F.when(
        (m["mean_word_len"] >= 2.0) & (m["mean_word_len"] <= 12.0), 20.0
    ).otherwise(0.0)
    stop_component = F.least(m["stopword_ratio"] * 100.0, F.lit(30.0))
    punct_penalty = F.least(m["punct_ratio"] * 100.0, F.lit(10.0))
    digit_penalty = F.least(m["digit_ratio"] * 100.0, F.lit(10.0))
    base = length_ok + word_len_ok + stop_component + F.lit(20.0)
    return F.greatest(
        F.least(base - punct_penalty - digit_penalty, F.lit(100.0)), F.lit(0.0)
    )


def md5_fingerprint(col: Column, normalize: bool = True) -> Column:
    """Content fingerprint: md5 hex of (optionally normalized) text.
    md5 is engine-portable, so oracles reproduce it exactly."""
    from beats_spark.operators.dedup import normalize_text

    target = normalize_text(col) if normalize else col
    return F.md5(target)


def rolling_fingerprints(col: Column, window: int = 32, stride: int = 16) -> Column:
    """Rolling window fingerprints: md5 of each ``window``-char slice
    every ``stride`` chars — array<string>. The building block for
    chunk-level contamination / overlap detection: match ANY rolling
    fingerprint ⇒ shared span. Pure JVM (sequence + transform +
    substring)."""
    n = F.length(col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - window + 1, F.lit(1)),
        F.lit(stride),
    )
    return F.transform(starts, lambda s: F.md5(F.substring(col, s, window)))


def line_repetition_metrics(col: Column, line_sep: str = "\n") -> dict[str, Column]:
    """Gopher-style line-repetition signals (Rae et al. 2021 §A1.1),
    expression-only (no shuffle): fraction of duplicate lines and the
    fraction of characters sitting in duplicated lines.

    Lines are the RAW text split on ``line_sep`` (normalization would
    collapse the separators), trimmed, empties dropped. Per-doc cost is
    O(lines²) inside one codegen span — lines-per-doc is bounded in
    practice; the n-gram family below handles unbounded repetition.
    """
    lines = F.filter(
        F.transform(F.split(col, F.lit(line_sep)), F.trim),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    total_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    dup_chars = F.aggregate(
        F.filter(
            lines,
            lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1,
        ),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    safe_n = F.greatest(n_lines, F.lit(1)).cast("double")
    safe_c = F.greatest(total_chars, F.lit(1)).cast("double")
    return {
        "dup_line_frac": (n_lines - n_distinct).cast("double") / safe_n,
        "dup_line_char_frac": dup_chars.cast("double") / safe_c,
    }


def _word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of normalized text WITH multiplicity (the dedup
    module's shingles() minus the distinct — repetition needs counts).
    Docs shorter than n tokens yield one gram = the whole text."""
    from beats_spark.operators.dedup import tokens

    toks = tokens(col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.least(F.lit(n), cnt))),
    )


def add_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3),
    dup_n: int = 5,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher-style repetition battery (Rae et al. 2021, Table A1):

    - ``dup_line_frac`` / ``dup_line_char_frac`` — expression-only,
      see ``line_repetition_metrics``.
    - ``top{n}gram_cover_frac`` for n in ``top_ns`` — characters
      covered by the single heaviest word n-gram (count × gram chars)
      over normalized text chars, capped at 1.0 (overlapping
      occurrences double-count). "Heaviest" = max of count×chars,
      which is tie-free-deterministic on any engine (no argmax).
    - ``dup{n}gram_char_frac`` for ``dup_n`` — characters in n-grams
      occurring more than once, capped at 1.0 (overlapping occurrences
      double-count, the standard approximation).

    Scale shape: ONE explode over all requested n values →
    partial-aggregated groupBy (id, n, gram) → groupBy (id) with
    conditional aggregates → join back on id. Both shuffles are keyed
    on uniform hashes (ids / grams); no per-row Python, no skew —
    repetitive docs produce FEWER distinct grams, not hotter keys.
    """
    from beats_spark.operators.scale import spread

    # Heavy per-doc expressions (O(lines²) repetition metrics, n-gram
    # explode) must not run on a single-file scan's one partition —
    # spread to cluster parallelism first (CLAUDE.md invariant).
    df = spread(df)
    all_ns = sorted(set(top_ns) | {dup_n})
    c = F.col(text_col)
    norm_chars = F.length(
        F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    )

    def _tag(n: int):
        # closure, not a default arg: PySpark counts lambda default
        # args as lambda parameters (CLAUDE.md gotcha)
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    gram_structs = F.concat(
        *[F.transform(_word_ngrams(c, n), _tag(n)) for n in all_ns]
    )
    exploded = df.select(
        F.col(id_col).alias("_rid"), F.explode(gram_structs).alias("_gs")
    ).select("_rid", F.col("_gs.n").alias("_n"), F.col("_gs.g").alias("_g"))
    counted = exploded.groupBy("_rid", "_n", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    cover = F.col("_c") * F.length("_g")
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("_n") == n, cover)).alias(f"_top{n}")
        )
    aggs.append(
        F.sum(
            F.when((F.col("_n") == dup_n) & (F.col("_c") > 1), cover).otherwise(
                F.lit(0)
            )
        ).alias("_dup")
    )
    per_id = counted.groupBy("_rid").agg(*aggs)

    out = df.join(per_id, df[id_col] == per_id["_rid"], "left").drop("_rid")
    safe = F.greatest(norm_chars, F.lit(1)).cast("double")
    cols = dict(line_repetition_metrics(c, line_sep))
    for n in top_ns:
        cols[f"top{n}gram_cover_frac"] = F.least(
            F.coalesce(F.col(f"_top{n}"), F.lit(0)).cast("double") / safe,
            F.lit(1.0),
        )
    cols[f"dup{dup_n}gram_char_frac"] = F.least(
        F.coalesce(F.col("_dup"), F.lit(0)).cast("double") / safe, F.lit(1.0)
    )
    return out.withColumns(cols).drop(
        *[f"_top{n}" for n in top_ns], "_dup"
    )


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stamp the full stats battery as columns (one codegen pass)."""
    c = F.col(text_col)
    m = quality_metrics(c)
    return df.withColumns(
        {
            "tokens_ws": token_count_whitespace(c),
            "tokens_bpe": token_count_bpe_ish(c),
            "lang_pred": lang_id(c),
            "quality": quality_score(c),
            "fingerprint": md5_fingerprint(c),
            "stopword_ratio": m["stopword_ratio"],
            "punct_ratio": m["punct_ratio"],
        }
    )


def contamination_pairs(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Train/eval contamination detection: (train_id, eval_id,
    shared_windows) for every pair sharing ≥1 rolling-window
    fingerprint — the canonical "did my benchmark leak into the
    training set" sweep.

    Plan: explode each side to (id, fp), equi-join on fp (uniform
    md5 keys, no skew), count per pair. Shuffle carries 16-B
    fingerprints, never text; at 10^10 train docs this is the same
    shape as the MinHash band join."""
    def fps(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(rolling_fingerprints(F.col(text_col), window, stride)).alias("fp"),
        ).dropDuplicates([out_id, "fp"])

    t = fps(train_df, "train_id")
    e = fps(eval_df, "eval_id")
    return (
        t.join(e, "fp")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 20,
    max_words: int = 10000,
    min_mean_word_len: float = 2.5,
    max_mean_word_len: float = 10.0,
    max_digit_ratio: float = 0.2,
    min_stopword_ratio: float = 0.03,
    max_dup_line_frac: float = 0.3,
    max_top2gram_cover: float = 0.2,
    max_dup5gram_char_frac: float = 0.2,
    min_quality: float = 40.0,
) -> DataFrame:
    """The composed Gopher-style corpus filter chain (Rae et al. 2021
    §A1): every document is scored against the full rule battery —
    length, word shape, digit soup, stopword structure, line and
    n-gram repetition, composite quality — and annotated with
    ``reasons`` (comma-joined, sorted rule tags; '' = clean) and
    ``keep``. Keeping the reject REASONS first-class is the point:
    production corpus builds audit per-rule reject rates before
    filtering, so this returns every row annotated rather than
    pre-filtered (``.where("keep")`` is the caller's one-liner).

    Plan shape: the repetition battery's two keyed aggregations +
    join-back (see add_repetition_stats) are the only shuffles; every
    rule predicate and the composite score ride the same codegen
    projection. All ratios are IEEE-exact int/int divisions, so the
    rule outcomes are engine-portable and oracle-checkable.
    """
    rep = add_repetition_stats(df, text_col, id_col)
    c = F.col(text_col)
    m = quality_metrics(c)
    score = quality_score(c)
    checks: list[tuple[str, Column]] = [
        ("too_short", m["n_words"] < min_words),
        ("too_long", m["n_words"] > max_words),
        (
            "word_len",
            (m["mean_word_len"] < min_mean_word_len)
            | (m["mean_word_len"] > max_mean_word_len),
        ),
        ("digit_soup", m["digit_ratio"] > max_digit_ratio),
        ("low_stopword", m["stopword_ratio"] < min_stopword_ratio),
        ("dup_lines", F.col("dup_line_frac") > max_dup_line_frac),
        ("top2gram", F.col("top2gram_cover_frac") > max_top2gram_cover),
        ("dup5gram", F.col("dup5gram_char_frac") > max_dup5gram_char_frac),
        ("low_quality", score < min_quality),
    ]
    reasons = F.array_sort(
        F.filter(
            F.array(*[F.when(cond, F.lit(tag)) for tag, cond in checks]),
            lambda x: x.isNotNull(),
        )
    )
    return (
        rep.withColumn("n_words", m["n_words"].cast("long"))
        .withColumn("reasons", F.array_join(reasons, ","))
        .withColumn("keep", F.col("reasons") == "")
    )


def _corpus_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) rows: normalized whitespace tokens, empties dropped.
    Narrow explode — no shuffle; shared by the corpus-level ops below."""
    from beats_spark.operators.dedup import tokens as _toks

    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(_toks(F.col(text_col))).alias("tok"),
        )
        .where(F.col("tok") != "")
    )


def vocab_top_k(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary build: the ``k`` most frequent normalized
    tokens with occurrence count, document frequency, and a dense
    1-based rank (ties broken by token text, so the result is
    deterministic on any engine and any parallelism).

    Scale shape: explode (narrow) → groupBy(token) with map-side
    partial aggregation (the distinct-doc count shuffles (token, id)
    pairs once) → distributed top-k via orderBy().limit(k), which
    Spark executes as TakeOrderedAndProject — each partition keeps
    only its local k, never a global sort — then a row_number window
    over the surviving k rows (single tiny partition by construction).
    """
    toks = _corpus_tokens(df, text_col, id_col)
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("_id").alias("n_docs"),
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("tok")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("tok"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "tok", "n_occurrences", "n_docs"
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-exact unigram LM surprisal per document — the
    CCNet-style "perplexity bucket" quality signal without the
    engine-portability trap of floating-point ``log``.

    Per token occurrence, surprisal ≈ log2(T) - log2(count(tok))
    (T = corpus token total), computed with the INTEGER
    ``floor(log2(n)) = length(bin(n)) - 1`` so every engine agrees
    bit-for-bit. Returns per doc: ``n_tokens``, ``surprisal_sum`` (in
    floor-log2 bits), and ``surprisal_milli`` (mean × 1000, integer
    division — exact). High mean = rare-token soup (gibberish, OCR
    noise); low mean = boilerplate of corpus-common tokens.

    Scale shape: explode → groupBy(token) count (one partially-
    aggregated shuffle) → token-keyed equi-join back (uniform hash
    keys; AQE may broadcast the count table when the vocabulary is
    small) → groupBy(doc) (one shuffle keyed by id) → cross join with
    the 1-row total (broadcast nested loop, free). The doc-level sum
    uses n_tokens × floor_log2(T) − Σ floor_log2(count), so T never
    rides the big join.
    """
    toks = _corpus_tokens(df, text_col, id_col)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))

    per_doc = (
        toks.join(counts, "tok")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(fl2(F.col("cnt"))).alias("_sum_fl2"),
        )
    )
    totals = counts.agg(F.sum("cnt").alias("_t"))
    return (
        per_doc.crossJoin(totals)
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") * fl2(F.col("_t")) - F.col("_sum_fl2"))
            .cast("long")
            .alias("surprisal_sum"),
        )
        .withColumn(
            "surprisal_milli",
            F.expr("surprisal_sum * 1000 div greatest(n_tokens, 1)"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-exact CONDITIONAL bigram-LM surprisal per document —
    the next step up from ``unigram_surprisal``: per bigram (w1, w2),
    surprisal ≈ −log2 P(w2 | w1) = log2 cnt(w1·) − log2 cnt(w1 w2),
    where cnt(w1·) is how often w1 opens a bigram. Uses the same
    floor-log2 integer arithmetic (``fl2(n) = length(bin(n)) − 1``) so
    every engine agrees bit-for-bit; the per-bigram ±1-bit floor error
    averages out over a document. High mean = improbable token
    TRANSITIONS (shuffled text, boilerplate splices) that unigram
    statistics cannot see; low mean = formulaic continuation.

    Returns per doc (docs with < 2 tokens report 0 bigrams):
    ``n_bigrams``, ``surprisal_sum`` (bits), ``surprisal_milli``
    (mean × 1000, exact integer division).

    Scale shape: bigram explode (narrow) → groupBy(bigram) count —
    the one corpus-sized shuffle, map-side partial-aggregated onto
    hash-uniform keys; the LEFT-word totals derive from that (small)
    count table itself via substring_index, never a second corpus
    pass; count lookups join back on the same uniform keys (AQE
    broadcasts natural-language count tables); one groupBy(id)
    finishes. The doc frame left-joins back so short docs survive
    with zeros.
    """
    from beats_spark.operators.dedup import tokens
    from beats_spark.operators.scale import spread

    base = spread(df).select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    cnt = F.size(F.col("_toks"))
    bigrams = F.transform(
        F.sequence(F.lit(0), cnt - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, 2)),
    )
    bg = base.where(cnt >= 2).select(
        "_id", F.explode(bigrams).alias("_bg")
    )
    bg_counts = bg.groupBy("_bg").agg(F.count(F.lit(1)).alias("_cbg"))
    left_counts = bg_counts.groupBy(
        F.substring_index(F.col("_bg"), " ", 1).alias("_w1")
    ).agg(F.sum("_cbg").alias("_cl"))

    per_doc = (
        bg.join(bg_counts, "_bg")
        .join(
            left_counts,
            F.substring_index(F.col("_bg"), " ", 1) == F.col("_w1"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum(fl2(F.col("_cl")) - fl2(F.col("_cbg"))).alias("_ssum"),
        )
    )
    ids = df.select(F.col(id_col).alias("_id"))
    return (
        ids.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_nb"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("_ssum"), F.lit(0))
            .cast("long")
            .alias("surprisal_sum"),
        )
        .withColumn(
            "surprisal_milli",
            F.expr("surprisal_sum * 1000 div greatest(n_bigrams, 1)"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, §4.3):
    rank every document by its LM surprisal and split the corpus into
    ``n_buckets`` equal-count tiers — CCNet keeps "head" (most fluent
    vs the LM), samples "middle", and drops "tail". The LM here is the
    integer-exact ``unigram_surprisal`` signal, so the whole bucketing
    replays bit-for-bit on any engine.

    Tie + exactness rule (engine-portable): buckets are VALUE-based,
    never row-ntile — the b-th cutoff is the smallest surprisal_milli
    value v whose cumulative doc count satisfies
    ``cdf(v) * n_buckets >= total * b`` (pure integer comparison, no
    division), and every doc with the same value lands in the same
    bucket. Returns (id, surprisal_milli, bucket) with bucket labels
    head/middle/tail for n_buckets=3, else ``b1..bN``. Documents with
    no tokens (empty/whitespace-only text) have no surprisal and are
    NOT returned — route those through quality_filter's ``too_short``
    rule; this op ranks only scoreable docs.

    Scale shape: the ranking never sorts the corpus. surprisal_milli
    is a bounded integer (mean floor-log2 bits × 1000 ≤ 64000), so the
    CDF is a groupBy on ≤64k distinct values → one unpartitioned
    window over that BOUNDED histogram (not the corpus) → a 1-row
    cutoff aggregate broadcast back over the docs. The per-doc frame
    is persisted because both the histogram and the final labeling
    consume it (recomputing unigram_surprisal would re-shuffle the
    corpus twice).
    """
    from pyspark import StorageLevel

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    s = unigram_surprisal(df, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hist = s.groupBy("surprisal_milli").agg(F.count(F.lit(1)).alias("_n"))
    # running CDF and grand total in ONE window pass over the bounded
    # histogram (same ordering spec, two frames) — no separate agg of
    # hist, no crossJoin, no second tiny shuffle
    w = Window.orderBy("surprisal_milli")
    cdf = hist.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_total",
        F.sum("_n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    cuts = cdf.agg(
        *[
            F.min(
                F.when(
                    F.col("_cum") * n_buckets >= F.col("_total") * b,
                    F.col("surprisal_milli"),
                )
            ).alias(f"_c{b}")
            for b in range(1, n_buckets)
        ]
    )
    bucket_idx = sum(
        (F.col("surprisal_milli") > F.col(f"_c{b}")).cast("int")
        for b in range(1, n_buckets)
    )
    if n_buckets == 3:
        label = (
            F.when(bucket_idx == 0, F.lit("head"))
            .when(bucket_idx == 1, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        label = F.concat(F.lit("b"), (bucket_idx + 1).cast("string"))
    return s.crossJoin(cuts).select(
        id_col, "surprisal_milli", label.alias("bucket")
    )


def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str | None = None,
) -> DataFrame:
    """Per-slice corpus curation rollup — the report a crawl curator
    reads before deciding which sources to keep, re-weight, or drop:
    per ``group_col`` the document count, exact-duplicate rate
    (distinct normalized-md5 fingerprints vs rows, the same key
    ``exact_dedup`` collapses on), size stats, and optionally the
    language spread.

    Integer-exact outputs only: ``dup_rate_milli`` = duplicated-row
    fraction × 1000 (integer division), ``mean_chars_milli`` = mean
    text length × 1000 — both engine-portable, no float aggregation.

    Scale shape: one groupBy(group) with map-side partial aggregation;
    the only wide value is the 32-hex fingerprint for the distinct
    count (texts themselves never shuffle). Distinct-count skew on a
    hot source is AQE's problem, and the key cardinality (sources) is
    tiny by construction.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(md5_fingerprint(F.col(text_col))).alias("n_unique"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("total_chars"),
    ]
    if lang_col is not None:
        aggs.append(F.countDistinct(F.col(lang_col)).alias("n_langs"))
    out = df.groupBy(group_col).agg(*aggs)
    return out.select(
        "*",
        F.expr("(n_docs - n_unique) * 1000 div n_docs").alias(
            "dup_rate_milli"
        ),
        F.expr("total_chars * 1000 div n_docs").alias("mean_chars_milli"),
    )


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 0,
) -> DataFrame:
    """Model-based quality scoring — the fastText-style linear
    classifier gate the CCNet / GPT-3 / FineWeb pipelines run after
    the heuristic battery (quality_filter): a logistic regression over
    md5-hashed bag-of-words buckets, MEAN-pooled so length cancels.
    The weights are FROZEN integers trained offline by the
    deterministic scripts/train_quality.py (synthetic prose-vs-junk
    corpus — repetition, stuffing, shouting, symbol soup, nav
    boilerplate; 99.5% held-out after quantization) and checked in as
    functions/quality_model.py, the bpe_merges precedent: model = data.

    Score (integer milli, engine-exact): ``bias + (Σ_tokens
    weight[sample_hash(tok, seed) % 256]) div n_tokens`` over
    normalize_text whitespace tokens; ``keep_quality = score ≥
    threshold``. Both engines replay the identical arithmetic — the
    DuckDB oracle indexes the same literal table.

    Scale: ZERO shuffles and zero fit phase — the whole score is one
    ``aggregate()`` higher-order expression over the token array with
    the 256-weight table compiled in as an array literal (one F.expr
    string: the dsir literal-map lesson, no thousand py4j calls), so
    it rides the scan inside whole-stage codegen. Per-doc cost is one
    md5 per token; there is nothing to broadcast, skew, or collect.
    """
    from beats_spark.functions.quality_model import (
        QUALITY_BIAS_MILLI,
        QUALITY_BUCKETS,
        QUALITY_SEED,
        QUALITY_WEIGHTS_MILLI,
    )

    table = ", ".join(str(v) for v in QUALITY_WEIGHTS_MILLI)
    # let-binding idiom (CLAUDE.md): bind the token array once so the
    # three consumers (n, sum, score) don't re-inline the normalize+
    # split tree per reference.
    score = F.expr(
        f"""
        element_at(transform(array(
          filter(split(trim(regexp_replace(lower({text_col}),
                                           '\\\\s+', ' ')), ' '),
                 t -> t <> '')
        ), toks ->
          CASE WHEN size(toks) = 0 THEN CAST(NULL AS BIGINT)
               ELSE {QUALITY_BIAS_MILLI}L + aggregate(toks,
                 CAST(0 AS BIGINT),
                 (acc, t) -> acc + element_at(array({table}),
                   cast(cast(conv(substring(md5(concat(
                     's{QUALITY_SEED}|', t)), 1, 15), 16, 10)
                     AS BIGINT) % {QUALITY_BUCKETS} AS INT) + 1))
                 div size(toks)
          END), 1)
        """
    )
    toks_n = F.size(
        F.filter(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
                " ",
            ),
            lambda t: t != "",
        )
    )
    scored = df.select(
        F.col(id_col),
        toks_n.cast("long").alias("n_tokens"),
        score.cast("long").alias("quality_milli"),
    )
    # Separate projection so the md5 aggregate evaluates ONCE — the
    # keep flag reads the materialized column, and NULL (null/empty
    # text: unscorable) propagates into a NULL flag.
    return scored.withColumn(
        "keep_quality", F.col("quality_milli") >= F.lit(threshold_milli)
    )


# (class, regex char-class) — \x{...} ranges parse identically in Java
# regex (Spark) and RE2 (DuckDB), unlike \uXXXX which RE2 rejects.
# CJK bundles Han + kana + Hangul (the routing signal is "CJK-script
# doc", not per-language — lang_id owns finer splits).
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", r"[A-Za-z\x{00c0}-\x{024f}]"),
    ("cjk", r"[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]"),
    ("cyrillic", r"[\x{0400}-\x{04ff}]"),
    ("arabic", r"[\x{0600}-\x{06ff}]"),
    ("digit", r"[0-9]"),
)


def _script_exprs(col: Column) -> tuple[dict[str, Column], Column]:
    """(per-class count exprs, dominant-script expr) for one text
    column — shared by :func:`script_composition` and
    :func:`tokenizer_fertility` so both price scripts identically."""
    counts = {
        name: F.regexp_count(col, F.lit(pat)) for name, pat in SCRIPT_CLASSES
    }
    lat, cjk = counts["latin"], counts["cjk"]
    cyr, ara = counts["cyrillic"], counts["arabic"]
    dominant = (
        F.when((lat >= cjk) & (lat >= cyr) & (lat >= ara) & (lat > 0), "latin")
        .when((cjk >= cyr) & (cjk >= ara) & (cjk > 0), "cjk")
        .when((cyr >= ara) & (cyr > 0), "cyrillic")
        .when(ara > 0, "arabic")
        .otherwise("none")
    )
    return counts, dominant


def script_composition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document writing-script composition — the router signal a
    multilingual curation pipeline needs before any per-language
    stage (tokenizer choice, mT5 temperature strata, CJK-aware
    pricing): counts of Latin / CJK / Cyrillic / Arabic letters and
    ASCII digits, total chars, and the dominant script with a fixed
    precedence tie-break (latin > cjk > cyrillic > arabic; all-zero
    or NULL text → 'none'). Complements lang_id (which assumes
    Latin-alphabet n-grams) rather than replacing it.

    Scale: zero shuffles — five regexp_count projections in one
    codegen stage riding the scan. The char-class table is shared
    verbatim with the DuckDB oracle (same \\x{{...}} ranges parse in
    Java regex and RE2), so both engines count identically.
    """
    counts, dominant = _script_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.coalesce(F.length(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_chars"),
        *[
            F.coalesce(counts[n], F.lit(0)).cast("long").alias(n)
            for n, _ in SCRIPT_CLASSES
        ],
        dominant.alias("dominant_script"),
    )


# Code-corpus quality battery (StarCoder/BigCode-style preprocessing,
# Li et al. 2023 §3.1; The Stack v2, Lozhkov et al. 2024): source-code
# files fail on signals prose filters never see — one minified
# 100k-char line, auto-generated headers, embedded hex/base64 blobs.
_AUTOGEN_PATTERN = (
    r"(?i)auto-?generated|do not edit|generated by|@generated"
)
_HEX_BLOB_PATTERN = r"[0-9a-fA-F]{32,}"


def code_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_line: int = 1000,
    max_avg_line_milli: int = 100_000,
    min_alnum_milli: int = 250,
) -> DataFrame:
    """Per-document code-quality signals and the composed keep flag.

    Emitted per document (all integers, DuckDB-exact):

    - ``n_lines``            newline-split line count
    - ``max_line_len``       longest line (minified/generated files)
    - ``avg_line_milli``     floor(sum(line lens)·1000 / n_lines)
    - ``alnum_milli``        alphanumeric chars per 1000 chars
    - ``n_hex_blobs``        runs of ≥32 hex chars (digests, blobs)
    - ``is_autogen``         auto-generated marker present
    - ``keep_code``          max_line ≤ cap ∧ avg ≤ cap ∧ alnum ≥
      floor ∧ no autogen marker — the StarCoder-shaped gate

    Pure JVM projection (split + transform + regexp counts): zero
    Exchange, rides the scan, scale-bounded by bytes read. Empty/NULL
    text degrades to one empty line (n_lines 1, everything else 0).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n", -1)
    lens = F.transform(lines, lambda x: F.length(x).cast("long"))
    n_lines = F.size(lines).cast("long")
    sum_lens = F.aggregate(
        lens, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    max_len = F.coalesce(F.array_max(lens), F.lit(0).cast("long"))
    n_chars = F.length(txt).cast("long")
    alnum = F.size(
        F.regexp_extract_all(txt, F.lit("[A-Za-z0-9]"), F.lit(0))
    ).cast("long")
    avg_milli = F.expr(
        f"sum_lens * 1000 div greatest(n_lines, 1)"
    )
    alnum_milli = F.expr("alnum_n * 1000 div greatest(n_chars, 1)")
    n_hex = F.size(
        F.regexp_extract_all(txt, F.lit(_HEX_BLOB_PATTERN), F.lit(0))
    ).cast("long")
    is_autogen = txt.rlike(_AUTOGEN_PATTERN)
    staged = df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        max_len.alias("max_line_len"),
        sum_lens.alias("sum_lens"),
        n_chars.alias("n_chars"),
        alnum.alias("alnum_n"),
        n_hex.alias("n_hex_blobs"),
        is_autogen.alias("is_autogen"),
    )
    staged = staged.withColumn("avg_line_milli", avg_milli).withColumn(
        "alnum_milli", alnum_milli
    )
    keep = (
        (F.col("max_line_len") <= max_line)
        & (F.col("avg_line_milli") <= max_avg_line_milli)
        & (F.col("alnum_milli") >= min_alnum_milli)
        & ~F.col("is_autogen")
    )
    return staged.select(
        id_col,
        "n_lines",
        "max_line_len",
        "avg_line_milli",
        "alnum_milli",
        "n_hex_blobs",
        "is_autogen",
        keep.alias("keep_code"),
    )


def fuzzy_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 64,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Fuzzy train/eval contamination sweep: (train_id, eval_id,
    jaccard) for every train document whose word-shingle Jaccard with
    an eval/benchmark document is ≥ ``threshold``.

    Default banding is rows=1 (bands == num_hashes): a train doc is a
    candidate if ANY single minhash agrees with an eval doc's.
    Decontamination is recall-first — a missed contamination silently
    poisons an eval number, while a false candidate only costs one
    exact-verify row against a tiny eval set. rows=1 also hedges a
    measured estimator bias: the affine ``(a·x+b) mod (2^61-1)``
    family over 32-bit base hashes wraps at most 4 times, so it is
    piecewise-monotone rather than a random permutation, and observed
    per-hash agreement runs well BELOW true Jaccard (a fixture pair
    at J=0.65 agreed on only 16/64 minhashes — the idealized band
    curve would call that a 1-in-10^8 event). Band-curve recall math
    does not apply to this family; rows=1 keeps recall robust anyway
    (any one of 64 agreements suffices).

    Complements :func:`contamination_pairs` (exact rolling-window
    fingerprints — catches verbatim inclusions only): a benchmark
    item that was lightly paraphrased, truncated, or re-wrapped
    shares no exact 32-token window but keeps high shingle overlap,
    which is what this operator measures — the fuzzy decontamination
    pass from Gopher (Rae et al. 2021 §A.2, 13-gram Jaccard) / GPT-3
    (Brown et al. 2020 §C).

    Plan (the cross-frame variant of ``minhash_lsh_pairs``):

    1. band signatures on BOTH frames with the shared let-bound
       single-expression SQL (zero shuffle, rides each scan);
    2. eval side collapses to one row per (band, sig) bucket holding
       its eval-id list — the eval frame is a benchmark (thousands of
       rows), so this aggregate is tiny; buckets larger than
       ``max_bucket`` (degenerate boilerplate signatures) are dropped
       whole, mirroring the dedup discipline;
    3. train bands equi-join the bucket frame on (band, sig) — AQE
       broadcasts the eval side at any realistic benchmark size, so
       the 100 TB train scan never shuffles; candidates dedup on
       (train_id, eval_id);
    4. exact shingle-Jaccard verify on the candidate pairs only —
       false positives cannot escape; every hash is deterministic, so
       on a fixed corpus the output is fixed.

    100 TB: the only full-corpus shuffle is the candidate dedup,
    keyed on (train_id, eval_id) — bounded by matches, not corpus
    size. Texts are re-read for candidates only.
    """
    from beats_spark.operators.dedup import (
        _band_signature_sql,
        jaccard,
        shingles,
    )
    from beats_spark.operators.scale import spread

    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )

    # NULL/whitespace-only texts are excluded from matching entirely:
    # shingles() degenerates to [''] for them in Spark (the NULL slice
    # is swallowed by concat_ws) while DuckDB oracles produce [] — and
    # semantically a blank train doc is not "contaminated" by a blank
    # eval doc. The emptiness test mirrors the shingle normalization
    # (lower + \s+ collapse + trim), NOT bare F.trim, which strips
    # only ASCII spaces (CLAUDE.md gotcha).
    def _has_text(df: DataFrame) -> DataFrame:
        norm = F.trim(
            F.regexp_replace(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
            )
        )
        return df.filter(norm != "")

    def _bands(df: DataFrame, idc: str, out: str, do_spread: bool) -> DataFrame:
        base = spread(_has_text(df)) if do_spread else _has_text(df)
        sh = base.select(
            F.col(idc).alias(out),
            shingles(F.col(text_col), shingle_n).alias("_sh"),
        )
        return sh.select(
            out,
            F.explode(
                F.expr(_band_signature_sql("_sh", num_hashes, bands, seed))
            ).alias("bb"),
        ).select(out, F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))

    eval_buckets = (
        _bands(eval_df, eval_id_col, "eval_id", do_spread=False)
        .groupBy("band", "sig")
        .agg(F.collect_list("eval_id").alias("_eids"))
        .filter(F.size("_eids") <= max_bucket)
    )
    cand = (
        _bands(train_df, id_col, "train_id", do_spread=True)
        .join(eval_buckets, ["band", "sig"])
        .select("train_id", F.explode("_eids").alias("eval_id"))
        .dropDuplicates(["train_id", "eval_id"])
    )
    t_texts = train_df.select(
        F.col(id_col).alias("_tid"), F.col(text_col).alias("_ttext")
    )
    e_texts = eval_df.select(
        F.col(eval_id_col).alias("_eid"), F.col(text_col).alias("_etext")
    )
    verified = (
        cand.join(t_texts, cand["train_id"] == t_texts["_tid"])
        .join(e_texts, cand["eval_id"] == e_texts["_eid"])
        .withColumn(
            "jaccard",
            jaccard(
                shingles(F.col("_ttext"), shingle_n),
                shingles(F.col("_etext"), shingle_n),
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "train_id", "eval_id", "jaccard"
    )


def tokenizer_fertility(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level tokenizer fertility per dominant writing script:
    how many characters one token buys, for the whitespace tokenizer
    and the BPE-ish regex tokenizer, stratified by script class.

    This is the pricing table a multilingual budget needs: a token
    budget priced on whitespace tokens undercounts CJK by ~10× (no
    spaces ⇒ one "token" per run), while the BPE-ish regex prices
    each CJK codepoint as its own token — the per-script
    chars-per-token ratio is exactly the correction factor between
    the two regimes (mT5, Xue et al. 2021 §3.1 measure the same
    statistic for SentencePiece).

    Emitted per ``dominant_script`` stratum (all BIGINT, engine-
    portable):

    - ``n_docs``, ``sum_chars``, ``sum_tokens_ws``, ``sum_tokens_bpe``
    - ``chars_per_ws_token_milli``  = floor(sum_chars·1000 / tokens)
    - ``chars_per_bpe_token_milli`` (same, BPE-ish tokens)

    Plan: the script counts and both token counts are one zero-
    Exchange projection riding the scan (regexp_count batteries);
    the stratified rollup is one groupBy on a ≤5-value key with full
    map-side partial aggregation — at 100 TB the shuffle carries a
    handful of rows per task.
    """
    col = F.col(text_col)
    _, dominant = _script_exprs(col)
    per_doc = df.select(
        dominant.alias("dominant_script"),
        F.coalesce(F.length(col), F.lit(0)).cast("long").alias("n_chars"),
        token_count_whitespace(col).alias("_tws"),
        token_count_bpe_ish(col).alias("_tbpe"),
    )
    agg = per_doc.groupBy("dominant_script").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("_tws").cast("long").alias("sum_tokens_ws"),
        F.sum("_tbpe").cast("long").alias("sum_tokens_bpe"),
    )
    return agg.select(
        "dominant_script",
        "n_docs",
        "sum_chars",
        "sum_tokens_ws",
        "sum_tokens_bpe",
        # coalesce before greatest: an all-NULL-text stratum sums to
        # NULL, and greatest() SKIPS NULLs in Spark but not DuckDB —
        # the exact landmine CLAUDE.md documents for least/greatest
        F.expr(
            "sum_chars * 1000 div greatest(coalesce(sum_tokens_ws, 0), 1)"
        ).alias("chars_per_ws_token_milli"),
        F.expr(
            "sum_chars * 1000 div greatest(coalesce(sum_tokens_bpe, 0), 1)"
        ).alias("chars_per_bpe_token_milli"),
    ).orderBy("dominant_script")


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Distinct-n corpus diversity (the distinct-1/2/3-gram ratios of
    Li et al. 2016, the standard post-dedup mode-collapse audit): per
    ``group_col`` and n-gram order, total gram occurrences, distinct
    grams, and the integer-ppm distinct ratio — a slice whose
    distinct-2 ppm collapses is template spam that per-document dedup
    missed (near-identical boilerplate across MANY documents keeps
    per-doc stats healthy while corpus diversity craters).

    Tokenization is the dedup module's normalization (lower, collapse
    whitespace, trim); grams keep multiplicity (repetition is the
    signal). Documents empty AFTER normalization are excluded on both
    engines — the shingles(NULL) Spark/DuckDB divergence documented in
    CLAUDE.md. Ratio is exact integer ``distinct*1e6 div total``.

    Scale shape: one narrow explode (each doc fans out to
    sum(len-n+1) gram rows) + ONE groupBy — Spark plans the distinct
    aggregate as the two-phase partial-dedup-then-merge expansion, so
    the shuffle carries (group, n, gram) once per distinct gram per
    map partition, not per occurrence. At 100 TB the exact distinct
    count is the honest-but-heavy path; ``sketches.hll_sketch`` is the
    mergeable approximate twin when ppm precision isn't needed."""
    from beats_spark.operators.dedup import normalize_text
    from beats_spark.operators.scale import spread

    def tag(n: int):
        def inner(g: Column) -> Column:
            return F.struct(
                F.lit(n).cast("int").alias("n"), g.alias("gram")
            )

        return inner

    base = spread(df.where(normalize_text(F.col(text_col)) != ""))
    grams = F.explode(
        F.flatten(
            F.array(*[F.transform(_word_ngrams(F.col(text_col), n), tag(n)) for n in ns])
        )
    ).alias("g")
    return (
        base.select(F.col(group_col).alias("source"), grams)
        .select("source", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.countDistinct("gram").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n",
            "n_grams",
            "n_distinct",
            F.expr("CAST(n_distinct * 1000000 DIV n_grams AS BIGINT)").alias(
                "distinct_ppm"
            ),
        )
    )


def contamination_matrix(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_group: str = "source",
    eval_group: str = "split",
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Corpus-level contamination rollup — the release-report twin of
    :func:`contamination_pairs`: instead of per-document pairs, one
    row per (training source × benchmark split) with contaminated-doc
    and shared-window totals. This is the table a data card publishes
    ("source X leaks into benchmark Y") and the gate a mixture build
    checks before weighting a source up.

    The group labels ride the fingerprint explode, so the rollup adds
    NO corpus-scale join over :func:`contamination_pairs` — the fp
    equi-join shuffle grows by one small string per row and the two
    aggregations after it run on match rows only (empty when the
    corpus is clean).

    Output: ``train_group``/``eval_group``, distinct contaminated
    train/eval docs, pair count, summed shared windows."""
    def fps(df: DataFrame, out_id: str, grp: str, out_grp: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(grp).alias(out_grp),
            F.explode(
                rolling_fingerprints(F.col(text_col), window, stride)
            ).alias("fp"),
        ).dropDuplicates([out_id, "fp"])

    t = fps(train_df, "train_id", train_group, "train_group")
    e = fps(eval_df, "eval_id", eval_group, "eval_group")
    pairs = (
        t.join(e, "fp")
        .groupBy("train_group", "eval_group", "train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )
    return pairs.groupBy("train_group", "eval_group").agg(
        F.countDistinct("train_id").cast("long").alias("n_train_docs"),
        F.countDistinct("eval_id").cast("long").alias("n_eval_docs"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("shared_windows").cast("long").alias("shared_windows"),
    )


def adaptive_length_filter(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-language length-outlier trim: keep a document iff its
    whitespace token count lies inside the [lo_pct, hi_pct] exact
    nearest-rank percentile band OF ITS OWN GROUP.

    Fixed length thresholds are wrong multilingually — a 40-token
    Chinese document and a 40-token German document are different
    beasts, and one global cutoff either starves compact-script
    languages or keeps boilerplate in verbose ones. The adaptive form
    learns each group's own distribution and trims both tails
    (truncated fragments below, concatenation/boilerplate blobs
    above) — the per-language threshold practice of the multilingual
    curation literature (CCNet's per-language perplexity buckets are
    the same move on a different signal).

    Emits every row (audit-friendly: thresholds + verdict, filter on
    ``kept`` downstream): ``(id, group, n_toks, lo_toks, hi_toks,
    kept)``. Exactness contract: the thresholds are SELECTED elements
    (group_percentiles discipline — never interpolated floats), ties
    broken on ``id_col``, so the verdict is deterministic at any
    parallelism and engine-portable.

    Plan: one group-keyed window sort for the ranks (the
    group_percentiles pass), then the ≤|groups|-row threshold frame
    broadcast-joins back onto the token-count projection — the
    second corpus pass re-derives n_toks in codegen rather than
    shuffling the corpus a second time (narrow projection beats a
    corpus-wide exchange). Exact percentiles cost a per-group sort;
    at extreme per-group cardinality feed the hdr_quantiles sketch
    into the same band-join shape instead.
    """
    if not (0 <= lo_pct <= hi_pct <= 100):
        raise ValueError(f"bad percentile band: [{lo_pct}, {hi_pct}]")
    from beats_spark.operators.analytics import group_percentiles

    toks = token_count_whitespace(F.col(text_col)).cast("long")
    base = df.select(
        F.col(id_col), F.col(group_col), toks.alias("n_toks")
    )
    pct = group_percentiles(
        base, group_col, "n_toks", id_col, (lo_pct, hi_pct)
    ).select(
        F.col(group_col),
        F.col(f"p{lo_pct}").cast("long").alias("lo_toks"),
        F.col(f"p{hi_pct}").cast("long").alias("hi_toks"),
    )
    return base.join(F.broadcast(pct), group_col).select(
        id_col,
        group_col,
        "n_toks",
        "lo_toks",
        "hi_toks",
        (
            (F.col("n_toks") >= F.col("lo_toks"))
            & (F.col("n_toks") <= F.col("hi_toks"))
        ).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Robust winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
# MOSS fingerprinter). Complements rolling_fingerprints: the stride
# sampler above gives FIXED positions (two copies of a span only match
# if their strides align), winnowing selects the minimum hash in every
# sliding window, so any shared substring of length >= k + w - 1
# GUARANTEES at least one shared fingerprint (density ~ 2/(w+1)).
# ---------------------------------------------------------------------------

# selected fingerprints are encoded (hash40 << 20) | position so the
# in-window argmin breaks hash ties on the LEFTMOST position with one
# integer compare; 40 + 20 = 60 bits keeps the whole code in a BIGINT
# on both engines. The 2^20 position space is why max_chars caps at
# 1M; the default is far below.
_WINNOW_POS_MOD = 1 << 20


def winnow_fingerprint_sql(
    text_expr: str,
    k: int = 24,
    w: int = 8,
    max_chars: int = 4000,
    dialect: str = "spark",
    hashes_only: bool = False,
) -> str:
    """One SQL expression — Spark or DuckDB dialect — computing the
    winnowed fingerprint set of ``text_expr`` as array<bigint>.

    Shared-battery discipline (see html_steps_sql): BOTH engines run
    SQL generated here from the same template, so the oracle proves
    the selection math, not a lookalike. Normalization is the dedup
    module's (lower + \\s+ collapse + trim) capped at ``max_chars``;
    docs whose normalized text is shorter than ``k`` yield an EMPTY
    set (never a degenerate shared gram — the shingles-NULL pitfall in
    CLAUDE.md). Each position p carries the 40-bit prefix of
    md5(k-gram at p) encoded as hash*2^20 + (p-1); each window of w
    positions selects its minimum code (min hash, leftmost on ties);
    the distinct selected codes are the fingerprints. With
    ``hashes_only`` the positions are stripped (code div 2^20) for
    cross-document matching — two copies of a span at different
    offsets share hashes, not codes.

    Cost: O(len) md5 calls + O(len * w) integer compares per doc,
    entirely inside one codegen projection — zero shuffle at any
    scale. All arrays are let-bound (element_at(transform(array(..
    idiom) so no subtree re-inlines per consumer.
    """
    if max_chars >= _WINNOW_POS_MOD:
        raise ValueError(f"max_chars must stay below 2^20, got {max_chars}")
    if k < 2 or w < 1:
        raise ValueError(f"bad winnow params k={k} w={w}")
    if dialect == "spark":
        norm = (
            f"substr(trim(regexp_replace(lower({text_expr}), '\\\\s+', ' ')),"
            f" 1, {max_chars})"
        )
        body = f"""element_at(transform(array({norm}), nt ->
  CASE WHEN length(nt) >= {k} THEN
    element_at(transform(array(
        transform(sequence(1, length(nt) - {k} + 1),
          p -> cast(conv(substr(md5(substr(nt, p, {k})), 1, 10), 16, 10)
                    as bigint) * {_WINNOW_POS_MOD}L + cast(p - 1 as bigint))
      ), enc ->
        array_distinct(transform(
          sequence(1, greatest(size(enc) - {w} + 1, 1)),
          i -> array_min(slice(enc, i, least({w}, size(enc))))))
    ), 1)
  ELSE cast(array() as array<bigint>) END
), 1)"""
        if hashes_only:
            body = (
                f"array_distinct(transform({body},"
                f" e -> e div {_WINNOW_POS_MOD}))"
            )
        return body
    if dialect == "duckdb":
        norm = (
            f"substr(trim(regexp_replace(lower({text_expr}), '\\s+', ' ',"
            f" 'g')), 1, {max_chars})"
        )
        body = f"""(list_transform([{norm}], nt ->
  CASE WHEN length(nt) >= {k} THEN
    (list_transform([
        list_transform(range(1, length(nt) - {k} + 2),
          p -> ('0x' || substr(md5(substr(nt, p, {k})), 1, 10))::BIGINT
               * {_WINNOW_POS_MOD} + (p - 1))
      ], enc ->
        list_distinct(list_transform(
          range(1, greatest(len(enc) - {w} + 1, 1) + 1),
          i -> list_min(list_slice(enc, i, i + least({w}, len(enc)) - 1))))
    ))[1]
  ELSE []::BIGINT[] END
))[1]"""
        if hashes_only:
            body = (
                f"list_distinct(list_transform({body},"
                f" e -> e // {_WINNOW_POS_MOD}))"
            )
        return body
    raise ValueError(f"unknown dialect {dialect!r}")


def add_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 24,
    w: int = 8,
    max_chars: int = 4000,
    out_col: str = "winnow_fps",
    hashes_only: bool = False,
) -> DataFrame:
    """Attach the winnowed fingerprint set (array<bigint>) per doc —
    a pure projection; see winnow_fingerprint_sql for the math."""
    return df.withColumn(
        out_col,
        F.expr(
            winnow_fingerprint_sql(
                text_col, k, w, max_chars, "spark", hashes_only
            )
        ),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
    w: int = 8,
    max_chars: int = 4000,
    min_shared: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Shared-span candidate pairs via winnowed fingerprints: docs
    sharing >= ``min_shared`` selected hashes, with the per-hash
    posting capped at ``max_bucket`` docs (boilerplate hashes are
    dropped WHOLE, the minhash_lsh_pairs discipline — deterministic,
    never sampled). Output: ``doc_a`` < ``doc_b``, ``n_shared``.

    100 TB shape: the winnow selection is a scan-side projection
    (zero shuffle); the only corpus-scale exchange is the
    explode → groupBy(hash) collect_set, whose payload is ~2/(w+1)
    fingerprints per normalized char — 8 B codes, never text. Pair
    generation happens JVM-side inside each <= max_bucket posting
    (sorted-array double transform — the measured 3.5x win over the
    self-join chain, see tool_pairs), so pair rows are bounded by
    max_bucket * sum(bucket), and the final (a, b) groupBy carries
    only candidate ids. Guarantee inherited from winnowing: any
    shared normalized substring of length >= k + w - 1 yields at
    least one shared hash, so true span copies cannot be missed —
    the recall-side story the stride sampler cannot tell.
    """
    hsql = winnow_fingerprint_sql(
        text_col, k, w, max_chars, "spark", hashes_only=True
    )
    fps = df.select(
        F.col(id_col).alias("_id"), F.explode(F.expr(hsql)).alias("_fp")
    )
    posting = (
        fps.groupBy("_fp")
        .agg(F.collect_set("_id").alias("_ids"))
        .where((F.size("_ids") > 1) & (F.size("_ids") <= max_bucket))
        .select(F.array_sort("_ids").alias("_ids"))
    )
    pairs = posting.select(
        F.explode(
            F.expr(
                "flatten(transform(_ids, (a, i) ->"
                " transform(slice(_ids, i + 2, size(_ids)),"
                " b -> struct(a, b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def readability_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic readability battery per document — Flesch Reading Ease
    and Flesch-Kincaid grade (Kincaid et al. 1975), the curation
    signal quality pipelines use to bound audience difficulty (both
    tails are suspect in web text: a too-low grade is boilerplate /
    spam, a too-high one is OCR debris and token soup).

    Heuristics, chosen for exact SQL replicability (every term is a
    regexp count — the lang_id discipline):

    - words = whitespace tokens (token_count_whitespace convention);
    - sentences = runs of ``[.!?]`` floored at 1 (a headline is one
      sentence, not zero);
    - syllables = vowel-group runs ``[aeiouy]+`` of the lowercased
      text — the standard cheap estimator (miscounts silent-e words,
      but deterministically and identically on both engines).

    Scores are exact integer-milli arithmetic (CLAUDE.md float
    discipline), divisions guarded by the floor-1 denominators:
    ``flesch_milli`` = 206835 − (1015·w) div s − (84600·syl) div
    max(w,1); ``fk_grade_milli`` = (390·w) div s + (11800·syl) div
    max(w,1) − 15590. Zero shuffle — one codegen projection over the
    scan; the two-step select exists because integer ``div`` is an
    F.expr on named columns (PySpark Column has no floordiv).
    """
    text = F.col(text_col)
    sent_runs = F.size(
        F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))
    ).cast("long")
    base = df.select(
        F.col(id_col),
        token_count_whitespace(text).cast("long").alias("n_words"),
        # CASE, not greatest: Spark greatest SKIPS NULLs while DuckDB
        # propagates them (CLAUDE.md) — the when-form gives both
        # engines 1 for a NULL text identically
        F.when(sent_runs >= 1, sent_runs)
        .otherwise(F.lit(1).cast("long"))
        .alias("n_sentences"),
        F.size(
            F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), F.lit(0))
        ).cast("long").alias("n_syllables"),
    )
    w1 = "(case when n_words >= 1 then n_words else 1 end)"
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "cast(206835 - (1015 * n_words) div n_sentences "
            f"- (84600 * n_syllables) div {w1} as long)"
        ).alias("flesch_milli"),
        F.expr(
            "cast((390 * n_words) div n_sentences "
            f"+ (11800 * n_syllables) div {w1} "
            "- 15590 as long)"
        ).alias("fk_grade_milli"),
    )


def winnow_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    k: int = 24,
    w: int = 8,
    max_chars: int = 4000,
    min_shared: int = 2,
) -> DataFrame:
    """Eval-set decontamination on winnowed fingerprints: flag every
    corpus document sharing ≥ ``min_shared`` distinct selected hashes
    with the benchmark set. The winnowing guarantee makes this the
    recall-first tier — ANY shared normalized span of length ≥
    k + w − 1 chars yields a shared hash, so a benchmark passage
    pasted into a training doc cannot be missed (the same
    recall-over-precision stance as fuzzy_decontaminate's rows=1
    banding, with a density-2/(w+1) fingerprint set instead of full
    shingle inventories).

    Output per FLAGGED corpus doc: ``id_col``, ``n_eval_partners``
    (distinct benchmark docs hit), ``n_shared_fps`` (distinct shared
    hashes — the evidence count a reviewer triages by).

    100 TB shape: benchmark suites are 10⁴–10⁶ docs — their
    fingerprint set fits comfortably in a broadcast, so the corpus
    side stays a scan-side projection + explode and the flag join is
    a BroadcastHashJoin: ZERO corpus-scale shuffle. The only exchange
    is the groupBy over MATCHED rows (contamination-sized, not
    corpus-sized). Empty/short texts fingerprint to [] on both
    engines and can never match (the shingles-NULL pitfall stays
    closed).
    """
    hsql = winnow_fingerprint_sql(
        text_col, k, w, max_chars, "spark", hashes_only=True
    )
    cfps = corpus.select(
        F.col(id_col), F.explode(F.expr(hsql)).alias("_fp")
    )
    efps = eval_df.select(
        F.col(eval_id_col), F.explode(F.expr(hsql)).alias("_fp")
    )
    hits = cfps.join(F.broadcast(efps), "_fp")
    return (
        hits.groupBy(id_col)
        .agg(
            F.countDistinct(eval_id_col).cast("long").alias("n_eval_partners"),
            F.countDistinct("_fp").cast("long").alias("n_shared_fps"),
        )
        .where(F.col("n_shared_fps") >= min_shared)
    )


def doc_structure_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Markdown/document-structure profile — the instruction-data
    curation signal the flat-prose battery misses: how much of a doc
    is headings, lists, fenced code, tables, quotes, links. Heavily
    structured docs route to different cleaning (keep the fences,
    don't sentence-split tables) and different mixtures (markdown-
    rich sources over-sample for instruction tuning).

    All counts are single regexp passes with the (?m) flag — Java
    regex and RE2 share the grammar (html_steps_sql discipline):

    - ``n_headings``    (?m)^#{1,6} lines
    - ``n_fences``      ``` runs div 2 (fence PAIRS; an unclosed
      trailing fence truncates down — tag-free tolerance)
    - ``n_list_items``  (?m)^[ \\t]*[-*+][ ] lines
    - ``n_links``       inline [text](url) occurrences
    - ``n_table_rows``  (?m)^\\|.*\\|$ lines
    - ``n_quotes``      (?m)^> lines
    - ``structured_milli`` structured lines per 1000 newline-split
      lines (headings + list items + table rows + quotes)

    Zero shuffle — one codegen projection; NULL text yields NULL
    counts (tag-and-exclude downstream).
    """
    t = F.col(text_col)

    def cnt(pat: str) -> Column:
        return F.size(
            F.regexp_extract_all(t, F.lit(pat), F.lit(0))
        ).cast("long")

    base = df.select(
        F.col(id_col),
        cnt(r"(?m)^#{1,6} ").alias("n_headings"),
        cnt("```").alias("_ticks"),
        cnt(r"(?m)^[ \t]*[-*+] ").alias("n_list_items"),
        cnt(r"\[[^\]]*\]\([^)]*\)").alias("n_links"),
        cnt(r"(?m)^\|.*\|$").alias("n_table_rows"),
        cnt(r"(?m)^> ").alias("n_quotes"),
        F.size(F.split(t, "\n", -1)).cast("long").alias("_n_lines"),
    )
    return base.select(
        id_col,
        "n_headings",
        F.expr("_ticks div 2").cast("long").alias("n_fences"),
        "n_list_items",
        "n_links",
        "n_table_rows",
        "n_quotes",
        F.expr(
            "cast((n_headings + n_list_items + n_table_rows + n_quotes) "
            "* 1000 div (case when _n_lines >= 1 then _n_lines else 1 end)"
            " as long)"
        ).alias("structured_milli"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cutoffs: tuple[int, ...] = (100, 1000, 10000),
    n_buckets: int = 64,
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design question
    vocab_top_k's flat list doesn't answer: what fraction of all
    corpus token OCCURRENCES is covered by the top-k token types, at
    each probe cutoff k (Zipf economics: where the coverage curve
    flattens is where growing the vocab stops paying).

    Per cutoff: ``k``, ``eff_k`` (= min(k, distinct types)),
    ``covered`` (occurrences of the eff_k most frequent types, ties
    broken by token text), ``total`` occurrences, ``coverage_ppm``
    (exact integer). One corpus-scale explode→groupBy(token) with
    map-side combine reduces to the type frame; the cumulative count
    over (freq desc, tok) order runs on layout.running_prefix — at
    web scale the TYPE frame is still hundreds of millions of rows,
    and the naive SUM() OVER (ORDER BY freq DESC) is a one-partition
    sort of it. Cutoff rows are picked by an ``eff_k`` equi-join
    against a broadcast ≤|cutoffs|-row frame.
    """
    ks = sorted(set(int(k) for k in cutoffs))
    if not ks or ks[0] < 1:
        raise ValueError(f"bad cutoffs: {cutoffs!r}")
    from beats_spark.operators.layout import running_prefix

    toks = _corpus_tokens(df, text_col, id_col)
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    ranked = running_prefix(
        counts.withColumn("_negn", -F.col("_n")),
        order_cols=["_negn", "tok"],
        size_col="_n",
        n_buckets=n_buckets,
    ).select(
        "tok",
        "_n",
        F.col("rank").cast("long").alias("_rank"),
        (F.col("prefix_sum") + F.col("_n")).cast("long").alias("_cum"),
    ).persist()
    tot = ranked.agg(
        F.sum("_n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("_n_types"),
    )
    probes = tot.select(
        "total",
        "_n_types",
        F.explode(
            F.array(*[F.lit(k).cast("long") for k in ks])
        ).alias("k"),
    ).withColumn("eff_k", F.least(F.col("k"), F.col("_n_types")))
    out = F.broadcast(probes).join(
        ranked, probes.eff_k == ranked._rank
    )
    return out.select(
        "k",
        "eff_k",
        F.col("_cum").alias("covered"),
        "total",
        F.expr("cast(_cum * 1000000 div total as long)").alias(
            "coverage_ppm"
        ),
    )


def signal_mi(
    df: DataFrame,
    cols: tuple[str, ...] | list[str],
) -> DataFrame:
    """Pairwise mutual information between curation signals, in
    floor-log2 millibits — the filter-redundancy audit: two signals
    with high MI gate the same documents, and the weaker one is
    wasted compute in the cascade (DataComp-style ablation question,
    answered from counts instead of reruns).

    Statistic (deterministic, engine-exact by construction):
    mi_milli = Σ_ij n_ij · (fl2(N) + fl2(n_ij) − fl2(n_i) − fl2(n_j))
    · 1000 div N — the plug-in MI with every log2 floored
    independently (fl2 = length(bin(n))−1, the surprisal-family
    rule). Floors compound, so cells can contribute negatively and
    the estimate is a millibit-resolution BAND around true MI, not a
    float approximation — same stance as unigram_surprisal. Signals
    may be any groupable type but must be NON-NULL: cube() encodes
    rolled-up positions as NULL, so a data NULL would vanish from
    the marginal equi-joins — pre-bucket NULLs to a sentinel (the
    caller owns this; the contract query derives all-non-null
    buckets).

    Scale shape: ONE pass — ``cube()`` over the signal columns
    compiles to a single Catalyst Expand + one keyed aggregate
    (every marginal, pair, and the grand total in the same shuffle,
    the domain_cube move); |cols| corpus-scale groupBys would cost
    |cols|·(|cols|−1)/2 + |cols| shuffles instead. Everything after
    the aggregate runs on bucket-cardinality frames.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("signal_mi needs at least two signal columns")
    gid = F.grouping_id(*[F.col(c) for c in cols])
    agg = (
        df.cube(*cols)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"), gid.alias("_g"))
        .persist()
    )
    k = len(cols)
    full_mask = (1 << k) - 1
    total_row = agg.where(F.col("_g") == full_mask).select(
        F.col("_n").alias("_N")
    )
    out = None
    for i in range(k):
        for j in range(i + 1, k):
            # grouping_id bit = 1 when the column is AGGREGATED AWAY;
            # leftmost cube column is the most significant bit
            gi = full_mask ^ (1 << (k - 1 - i))
            gj = full_mask ^ (1 << (k - 1 - j))
            gij = full_mask ^ (1 << (k - 1 - i)) ^ (1 << (k - 1 - j))
            a, b = cols[i], cols[j]
            joints = agg.where(F.col("_g") == gij).select(
                F.col(a).alias("_a"), F.col(b).alias("_b"),
                F.col("_n").alias("_nij"),
            )
            ma = agg.where(F.col("_g") == gi).select(
                F.col(a).alias("_a"), F.col("_n").alias("_ni")
            )
            mb = agg.where(F.col("_g") == gj).select(
                F.col(b).alias("_b"), F.col("_n").alias("_nj")
            )
            cell = (
                joints.join(ma, "_a")
                .join(mb, "_b")
                .crossJoin(F.broadcast(total_row))
                .select(
                    F.expr(
                        "_nij * ((length(bin(_N)) - 1) + (length(bin(_nij)) - 1)"
                        " - (length(bin(_ni)) - 1) - (length(bin(_nj)) - 1))"
                    ).alias("_term"),
                    F.col("_N"),
                )
            )
            pair = cell.agg(
                F.expr("cast(sum(_term) * 1000 div max(_N) as long)").alias(
                    "mi_milli"
                )
            ).select(
                F.lit(a).alias("sig_a"), F.lit(b).alias("sig_b"), "mi_milli"
            )
            out = pair if out is None else out.unionByName(pair)
    return out


def collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 30,
    min_count: int = 5,
) -> DataFrame:
    """Top-k PMI collocations — corpus-level phrase mining (Church &
    Hanks 1990): bigrams whose words co-occur far above chance, the
    candidates a tokenizer-vocab or phrase-index build promotes to
    units. PMI in whole floor-log2 bits (the surprisal-family rule,
    ±2-bit floor band): pmi_fl2 = fl2(n_ab) + fl2(N) − fl2(n_a) −
    fl2(n_b), with n_a = w1's count as a bigram LEFT and n_b = w2's
    as a bigram RIGHT — both derived from the bigram count table
    itself (the bigram_surprisal convention; no second corpus pass).
    ``min_count`` floors away the hapax noise PMI is notorious for.

    Scale shape: ONE corpus-scale bigram explode → groupBy (map-side
    combined, hash-uniform keys); marginals and N reduce from that
    count table; ranking is orderBy().limit(k) —
    TakeOrderedAndProject, each partition keeps k rows, never a
    global sort. Ties break (n_ab desc, bigram asc): deterministic.
    """
    if k < 1 or min_count < 1:
        raise ValueError(f"bad collocation params k={k} min_count={min_count}")
    from beats_spark.operators.dedup import tokens
    from beats_spark.operators.scale import spread

    base = spread(df).select(tokens(F.col(text_col)).alias("_toks"))
    cnt = F.size(F.col("_toks"))
    bigrams = F.transform(
        F.sequence(F.lit(0), cnt - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, 2)),
    )
    bg = base.where(cnt >= 2).select(F.explode(bigrams).alias("_bg"))
    counts = bg.groupBy("_bg").agg(
        F.count(F.lit(1)).cast("long").alias("_nab")
    ).persist()
    lefts = counts.groupBy(
        F.substring_index(F.col("_bg"), " ", 1).alias("_w1")
    ).agg(F.sum("_nab").cast("long").alias("_na"))
    rights = counts.groupBy(
        F.substring_index(F.col("_bg"), " ", -1).alias("_w2")
    ).agg(F.sum("_nab").cast("long").alias("_nb"))
    total = counts.agg(F.sum("_nab").cast("long").alias("_N"))
    scored = (
        counts.where(F.col("_nab") >= min_count)
        .join(lefts, F.substring_index(F.col("_bg"), " ", 1) == F.col("_w1"))
        .join(rights, F.substring_index(F.col("_bg"), " ", -1) == F.col("_w2"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("_bg").alias("bigram"),
            F.col("_nab").alias("n_ab"),
            (
                fl2(F.col("_nab")) + fl2(F.col("_N"))
                - fl2(F.col("_na")) - fl2(F.col("_nb"))
            ).cast("long").alias("pmi_fl2"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi_fl2"), F.desc("n_ab"), F.asc("bigram")
    ).limit(k)
    w = Window.orderBy(F.desc("pmi_fl2"), F.desc("n_ab"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "bigram", "n_ab", "pmi_fl2"
    )


def source_concentration(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """Corpus concentration audit — how dominated the corpus is by
    its biggest providers: exact integer Gini over per-group totals
    (pairwise |xᵢ−xⱼ| formulation — the group frame is tiny, so the
    quadratic form is free and exactly engine-replayable where the
    sorted-rank form would need a floats-free rederivation), plus
    the top-group share. A release whose Gini drifts up is quietly
    becoming one provider's corpus.

    Emits one row: ``n_groups``, ``total``, ``gini_micro``
    (Σᵢⱼ|xᵢ−xⱼ| · 10⁶ div (2·n·Σx)), ``top_share_ppm``. One
    corpus-scale map-side-combined groupBy; the pairwise sum runs on
    the ≤|groups|² cross of the reduced frame (broadcast both sides).
    """
    w = (
        F.count(F.lit(1)).cast("long")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).cast("long")
    )
    g = df.groupBy(group_col).agg(w.alias("_x")).persist()
    a = g.select(F.col("_x").alias("_xa"))
    b = g.select(F.col("_x").alias("_xb"))
    pair = F.broadcast(a).crossJoin(F.broadcast(b)).agg(
        F.sum(F.abs(F.col("_xa") - F.col("_xb"))).cast("long").alias("_d")
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("_x").cast("long").alias("total"),
        F.max("_x").cast("long").alias("_mx"),
    )
    return F.broadcast(tot).crossJoin(pair).select(
        "n_groups",
        "total",
        F.expr(
            "cast(_d * 1000000 div (case when n_groups * total >= 1 "
            "then 2 * n_groups * total else 1 end) as long)"
        ).alias("gini_micro"),
        F.expr(
            "cast(_mx * 1000000 div "
            "(case when total >= 1 then total else 1 end) as long)"
        ).alias("top_share_ppm"),
    )
