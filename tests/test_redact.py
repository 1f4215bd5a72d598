"""PII redaction battery (operators/redact.py)."""

from pyspark.sql import functions as F

from beats_spark.operators.redact import (
    PII_CATEGORIES,
    add_pii_redaction,
    pii_counts,
    redact_pii,
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = add_pii_redaction(df, "text").collect()[0]
    return row


def test_masks_every_category(spark):
    row = _one(
        spark,
        "mail a@b.co ip 10.0.0.1 ssn 123-45-6789 "
        "tel 555-867-5309 card 4111-1111-1111-1111",
    )
    assert row["text"] == "mail <EMAIL> ip <IP> ssn <SSN> tel <PHONE> card <CARD>"
    assert (row["pii_email"], row["pii_ipv4"], row["pii_ssn"],
            row["pii_phone"], row["pii_card"]) == (1, 1, 1, 1, 1)
    assert row["pii_total"] == 5


def test_counts_are_on_original_text(spark):
    # An email whose domain would look IP-ish once redacted must not
    # change the ipv4 count: counts come from the pre-mask text.
    row = _one(spark, "x 1.2.3.4 and bob@mail.example.com")
    assert row["pii_ipv4"] == 1 and row["pii_email"] == 1
    assert row["text"] == "x <IP> and <EMAIL>"


def test_ssn_not_double_counted_as_phone(spark):
    # 3-2-4 (SSN) and 3-3-4 (phone) shapes are disjoint.
    row = _one(spark, "123-45-6789 vs 123-456-7890")
    assert row["pii_ssn"] == 1 and row["pii_phone"] == 1
    assert row["text"] == "<SSN> vs <PHONE>"


def test_clean_and_empty_text(spark):
    row = _one(spark, "")
    assert row["pii_total"] == 0 and row["text"] == ""
    row = _one(spark, "no pii here, just words")
    assert row["pii_total"] == 0
    assert row["text"] == "no pii here, just words"


def test_multiple_occurrences_counted(spark):
    row = _one(spark, "a@b.co c@d.org and again a@b.co")
    assert row["pii_email"] == 3
    assert row["text"] == "<EMAIL> <EMAIL> and again <EMAIL>"


def test_target_column_keeps_original(spark):
    df = spark.createDataFrame([("hit a@b.co",)], "text string")
    row = add_pii_redaction(df, "text", target="clean").collect()[0]
    assert row["text"] == "hit a@b.co"
    assert row["clean"] == "hit <EMAIL>"


def test_battery_is_pure_codegen(spark):
    # No Python UDFs, no shuffle: a redaction over a projection must
    # stay a single whole-stage-codegen scan.
    df = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.io")).alias("text")
    )
    plan = add_pii_redaction(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_category_table_shape():
    assert [c[0] for c in PII_CATEGORIES] == [
        "email", "card", "ssn", "phone", "ipv4"
    ]
    # masks are distinct and every pattern compiles under Python's re
    # (a proxy for the Java∩RE2 subset discipline: no lookbehind used)
    import re

    for _name, pattern, mask in PII_CATEGORIES:
        re.compile(pattern)
        assert "(?<" not in pattern and r"\1" not in pattern


def test_config_chain_processor(spark):
    # Beats-style config form: composes with when: like any processor.
    from beats_spark.operators.base import build_chain

    df = spark.createDataFrame(
        [("a@b.co here", "scrub"), ("c@d.org kept", "keep")],
        "message string, mode string",
    )
    chain = build_chain(
        [{"redact_pii": {"counts": True,
                         "when": {"equals": {"mode": "scrub"}}}}]
    )
    rows = {r["mode"]: r for r in chain(df).collect()}
    assert rows["scrub"]["message"] == "<EMAIL> here"
    assert rows["scrub"]["pii_email"] == 1
    assert rows["keep"]["message"] == "c@d.org kept"
    assert rows["keep"]["pii_email"] is None
