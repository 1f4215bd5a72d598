"""Parity against the reference's golden dissect corpus.

The corpus (libbeat/processors/dissect/testdata/dissect_tests.json,
27 records of {name, tok, msg, expected/fail}) is the reference's own
oracle for its tokenizer; we load it IN PLACE from /root/reference as
test data and require our compiler to reproduce EVERY case (27/27) —
in both execution modes. Indirect `&` / pointer `*` fields produce
row-dependent key names, which surface in the `_map` overflow column;
for comparison the map is merged into the captured dict, matching the
reference's flat event-map output.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from beats_spark.functions.dissect import DissectPattern, UnsupportedModifier

CORPUS = "/root/reference/libbeat/processors/dissect/testdata/dissect_tests.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not available"
)


def _cases():
    with open(CORPUS) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "case", _cases(), ids=[c["name"][:60].replace(" ", "_") for c in _cases()]
)
def test_reference_corpus_case(case):
    tok, msg = case["tok"], case["msg"]
    pattern = DissectPattern(tok)

    res = pattern.extract_pandas(pd.Series([msg])).iloc[0].to_dict()
    matched = res.pop("_match")
    dyn = res.pop("_map", None)
    if dyn:
        res.update(dyn)
    if case.get("fail"):
        assert not matched, f"expected failure, got {res}"
        return
    assert matched, f"expected match for {case['name']!r}"
    expected = case["expected"]
    assert res == expected, f"{case['name']}: {res} != {expected}"


def test_corpus_fully_supported():
    """Every corpus tokenizer compiles — 27/27, zero rejections (the
    4 indirect/pointer cases compile to the map overflow column)."""
    for c in _cases():
        DissectPattern(c["tok"])  # must not raise


def test_append_indirect_still_rejected():
    with pytest.raises(UnsupportedModifier):
        DissectPattern("%{&+key} %{rest}")


def test_corpus_native_mode_agrees_with_pandas(spark):
    """Both execution modes produce identical captures on every
    supported corpus case."""
    from pyspark.sql import functions as F

    for c in _cases():
        pattern = DissectPattern(c["tok"])
        df = spark.createDataFrame([(c["msg"],)], "text string")
        native = pattern.native_columns(F.col("text"))
        native_row = df.select(
            *[v.alias(k.replace(".", "_")) for k, v in native.items()]
        ).first()
        pandas_row = pattern.extract_pandas(pd.Series([c["msg"]])).iloc[0].to_dict()
        got_native = {
            k: native_row[k.replace(".", "_")] for k in pandas_row if k != "_match"
        }
        got_pandas = {k: v for k, v in pandas_row.items() if k != "_match"}
        assert bool(native_row["_match"]) == bool(pandas_row["_match"]), c["name"]
        if pandas_row["_match"]:
            assert got_native == got_pandas, c["name"]
