"""Encoding repair for crawl/transcript text — the mojibake pass.

Web corpora and exported chat logs routinely contain UTF-8 bytes that
were decoded once as cp1252/Latin-1 and re-encoded ("mojibake":
``donâ€™t``, ``caffÃ©``, ``costsÂ 100``). The reference pipeline
ships text through opaquely (libbeat never transcodes message bytes);
a training pipeline must repair it or every affected token is
out-of-vocabulary. This is the deterministic single-level subset of
the public ftfy heuristic: a FROZEN table of the printable UTF-8→
cp1252 round-trip sequences for the characters that dominate real
corpora (curly quotes, dashes, ellipsis, NBSP, the Latin-1 letter
block). Single pass, fixed order, longest sequence first — doubly-
encoded text repairs one level per application, matching ftfy's
``fix_encoding`` one-step contract.

Why a frozen literal table and not a decoder: the repair then stays a
chain of literal ``replace`` calls — pure JVM whole-stage codegen,
zero shuffles, zero Python — and any SQL engine can replay it
byte-for-byte (the DuckDB oracle does), which a chardet-style
heuristic cannot promise.

Reference behavior: none (libbeat forwards bytes verbatim —
libbeat/beat/event.go); this operator exists for the corpus-curation
layer, cited to the public ftfy/NFC practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (mojibake sequence, repaired character). Order matters: the
# three-byte punctuation family starts with 'â' and must run before
# any future two-byte 'Ã'-family entry could be added that overlaps;
# within the table, longest-first. Frozen — tests pin the length and
# a round-trip property (each left side IS the right side's UTF-8
# bytes read as cp1252).
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = (
    ("â€¦", "…"),  # â€¦ -> …
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("Ã ", "à"),  # Ã  -> à
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã¢", "â"),  # Ã¢ -> â
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã©", "é"),  # Ã© -> é
    ("Ãª", "ê"),  # Ãª -> ê
    ("Ã­", "í"),  # Ã­ -> í
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("ÃŸ", "ß"),  # ÃŸ -> ß
    ("Â ", " "),  # Â +nbsp -> nbsp
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
)


def _verify_table() -> None:
    """Every left side must be exactly the right side's UTF-8 bytes
    decoded as cp1252 — the defining mojibake property."""
    for moji, fixed in MOJIBAKE_TABLE:
        expect = fixed.encode("utf-8").decode("cp1252")
        if moji != expect:
            raise AssertionError(
                f"MOJIBAKE_TABLE broken: {moji!r} != cp1252({fixed!r} utf8)"
                f" = {expect!r}"
            )


_verify_table()


def fix_mojibake_col(col: Column) -> Column:
    """The repair as a single Column expression: a chain of literal
    replaces in frozen table order. Pure codegen; NULL flows through."""
    out = col
    for moji, fixed in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(moji), F.lit(fixed))
    return out


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    flag_col: str = "had_mojibake",
) -> DataFrame:
    """Repair single-level UTF-8/cp1252 mojibake in ``text_col``
    (in place unless ``out_col`` names a new column) and flag rows
    that changed. Each repair shortens the string (3→1 or 2→1 chars),
    so ``flag_col`` is a pure length comparison — no second scan.

    Scale: zero shuffles, zero Python; 25 literal replaces inside one
    whole-stage-codegen projection riding the parquet scan. At 100 TB
    this is bandwidth-bound on the scan it shares with whatever runs
    next.
    """
    target = out_col or text_col
    src = F.col(text_col)
    fixed = fix_mojibake_col(src)
    # Flag FIRST (reads the pre-repair column), then overwrite — the
    # in-place mode would otherwise compare the fixed text to itself.
    return df.withColumn(
        flag_col,
        F.when(src.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.length(src) > F.length(fixed)
        ),
    ).withColumn(target, fixed)


def mojibake_oracle_expr(col_sql: str) -> str:
    """The SAME repair as a DuckDB SQL expression (nested literal
    replace calls in table order) — used by the contract oracle so
    both engines share one frozen table."""
    expr = col_sql
    for moji, fixed in MOJIBAKE_TABLE:
        m = moji.replace("'", "''")
        x = fixed.replace("'", "''")
        expr = f"replace({expr}, '{m}', '{x}')"
    return expr
