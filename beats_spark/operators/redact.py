"""PII redaction for training-data pipelines: mask emails, IP
addresses, SSN-like ids, phone numbers, and card numbers in text
columns before the corpus leaves the pipeline.

This is a training-data op beyond the reference surface (libbeat's
closest relative is the `script` processor users abuse for ad-hoc
scrubbing — beats_spark/operators/compat.py:198); here it is a
first-class battery: chained `regexp_replace` expressions that run
inside the same whole-stage-codegen span as the rest of the processor
chain. One pass over the text bytes, no shuffle, no Python — at
100 TB this costs what the scan costs.

Pattern discipline: every regex is written in the common subset of
Java regex (Spark) and RE2 (DuckDB, Go) — no lookbehind, no
backreferences, ASCII classes only — so correctness oracles can
replay the exact same battery and compare redacted text
byte-for-byte. Counting is done on the ORIGINAL text (a mask token
inserted by an earlier category must not change a later category's
count), and replacement order is fixed by `PII_CATEGORIES`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import Processor, Updates, register

# (name, pattern, mask) in application order. Order matters only for
# overlapping matches (email bodies contain dots; card numbers are
# digit runs); the order below redacts the most-specific shapes first.
PII_CATEGORIES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "card",
        r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
        "<CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def redact_pii(col: Column) -> Column:
    """Text with every PII category masked, in `PII_CATEGORIES` order."""
    out = col
    for _name, pattern, mask in PII_CATEGORIES:
        out = F.regexp_replace(out, pattern, mask)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL (pre-mask) text."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))
        for name, pattern, _mask in PII_CATEGORIES
    }


def add_pii_redaction(
    df: DataFrame,
    text_col: str = "text",
    target: str | None = None,
    prefix: str = "pii_",
) -> DataFrame:
    """Attach per-category counts, a total, and the redacted text.

    `target=None` overwrites the text column in place (the common
    pipeline shape: scrub before write); passing a name keeps the
    original alongside, e.g. for an audit sink.
    """
    col = F.col(text_col)
    out = df.withColumns(_count_columns(col, prefix))
    return out.withColumn(target or text_col, redact_pii(col))


def _count_columns(col: Column, prefix: str) -> dict[str, Column]:
    """Per-category count columns + the running total — the ONE place
    that accumulation lives, shared by the function form and the
    RedactPII processor so their pii_total can never drift."""
    out: dict[str, Column] = {}
    total = None
    for k, v in pii_counts(col).items():
        out[prefix + k] = v
        total = v if total is None else total + v
    out[prefix + "total"] = total
    return out


@register
class RedactPII(Processor):
    """Beats-style config-chain form of the redaction battery.

    Config: ``field`` (text column, default "message"), optional
    ``target`` (write redacted text elsewhere, default in-place),
    ``counts`` (bool, attach per-category pii_* count columns,
    default false). Composes with ``when:`` like every processor.
    """

    name = "redact_pii"

    def updates(self, df: DataFrame) -> Updates:
        field = self.cfg.get("field", "message")
        target = self.cfg.get("target") or field
        col = F.col(field)
        out: dict[str, Column] = {}
        if self.cfg.get("counts", False):
            out.update(_count_columns(col, self.cfg.get("prefix", "pii_")))
        out[target] = redact_pii(col)
        return Updates(set=out)
