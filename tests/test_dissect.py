"""Dissect compiler tests.

The cases transliterate the *behaviors* covered by the reference's
corpus (libbeat/processors/dissect/testdata/dissect_tests.json and
dissect_test.go): delimiters, greedy padding, append/ordinal, skip,
fixed-length, types, multiline, failure modes. Written fresh for this
engine — same semantics, our own cases.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.functions.dissect import (
    DissectError,
    DissectPattern,
    UnsupportedModifier,
)

CASES = [
    # name, tokenizer, message, expected (None => must fail to parse)
    ("two keys", "%{a} %{b}", "hello world", {"a": "hello", "b": "world"}),
    ("rest of string", "%{a} %{b}", "x y z tail", {"a": "x", "b": "y z tail"}),
    ("first delim anchored", "=%{a}", "x=y", None),
    ("leading delim", "log: %{a}", "log: msg", {"a": "msg"}),
    ("wrong delim", "%{a},%{b}", "one two", None),
    ("trailing literal closes", "[%{ts}] %{msg}!", "[t0] boom! extra", {"ts": "t0", "msg": "boom"}),
    ("greedy padding", "%{a->} %{b}", "x        y", {"a": "x", "b": "y"}),
    ("greedy tabs", "%{a->}\t%{b}", "x\t\t\ty", {"a": "x", "b": "y"}),
    ("non greedy keeps pad", "%{a} %{b}", "x   y", {"a": "x", "b": "  y"}),
    ("append default join", "%{+n} %{+n} %{rest}", "a b c", {"n": "a b", "rest": "c"}),
    ("append ordinal", "%{+n/2} %{+n/1}", "beta alpha", {"n": "alpha beta"}),
    ("named skip", "%{?junk} %{keep}", "x y", {"keep": "y"}),
    ("empty skip", "%{} %{keep}", "x y", {"keep": "y"}),
    ("fixed length", "%{a#4}%{b}", "abcdrest", {"a": "abcd", "b": "rest"}),
    ("kv line", 'level=%{lvl} msg="%{m}"', 'level=warn msg="disk low"', {"lvl": "warn", "m": "disk low"}),
    ("multiline value", "%{a}|%{b}", "line1\nline2|end", {"a": "line1\nline2", "b": "end"}),
    ("empty last value", "%{a} %{b}", "x ", {"a": "x", "b": ""}),
    ("empty middle value", "%{a}--%{b}--%{c}", "x----y", {"a": "x", "b": "", "c": "y"}),
    ("no delim in msg", "%{a} %{b}", "nospace", None),
]


@pytest.mark.parametrize("name,tok,msg,expected", CASES, ids=[c[0] for c in CASES])
def test_corpus_pandas(name, tok, msg, expected):
    p = DissectPattern(tok)
    res = p.extract_pandas(pd.Series([msg])).iloc[0].to_dict()
    matched = res.pop("_match")
    if expected is None:
        assert not matched
    else:
        assert matched, p.regex
        assert res == expected


def test_typed_captures(spark):
    df = spark.createDataFrame([("a=42 b=2.5 c=true",)], "text string")
    p = DissectPattern("a=%{a|long} b=%{b|double} c=%{c|boolean}")
    struct = p.pandas_udf()(F.col("text"))
    out = df.select(
        p.cast("a", struct.getField("a")).alias("a"),
        p.cast("b", struct.getField("b")).alias("b"),
        p.cast("c", struct.getField("c")).alias("c"),
    ).first()
    assert out["a"] == 42 and abs(out["b"] - 2.5) < 1e-9 and out["c"] is True
    assert dict(df.select(struct.getField("a")).dtypes)  # schema resolvable


def test_native_matches_pandas(spark):
    msgs = [
        "level=info caller=a.go:1 took 5ms",
        "level=warn caller=b.go:22 took 130ms",
        "garbage line",
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "text string")
    p = DissectPattern("level=%{level} caller=%{caller} took %{dur}")
    nat = p.native_columns(F.col("text"))
    native_rows = df.select(
        *[nat[k].alias(k) for k in p.keys()], nat["_match"].alias("_match")
    ).collect()
    struct = p.pandas_udf()(F.col("text"))
    pandas_rows = df.select(
        *[struct.getField(k).alias(k) for k in p.keys()],
        struct.getField("_match").alias("_match"),
    ).collect()
    for a, b in zip(native_rows, pandas_rows):
        assert a.asDict() == b.asDict()


def test_unsupported_and_invalid():
    # pointer/indirect compile (map overflow column); the mixed
    # prefixes are rejected as REFERENCE PARITY — libbeat's own
    # tokenizer parse returns errMixedPrefix{IndirectAppend,
    # AppendIndirect} for them (dissect/field.go:258-263), so a
    # tokenizer the reference accepts never hits this path
    with pytest.raises(UnsupportedModifier, match="reference rejects"):
        DissectPattern("%{&+k} %{rest}")
    with pytest.raises(UnsupportedModifier, match="reference rejects"):
        DissectPattern("%{+&k} %{rest}")
    with pytest.raises(DissectError):
        DissectPattern("no keys here")
    with pytest.raises(DissectError):
        DissectPattern("%{?only} %{?skips}")
    # dangling pointer / indirect without its twin is a config error
    with pytest.raises(DissectError):
        DissectPattern("%{*k} %{v}")
    with pytest.raises(DissectError):
        DissectPattern("%{&k} %{v}")


def test_pointer_indirect_map():
    pat = DissectPattern("%{*k1}=%{&k1} %{*k2}=%{&k2}")
    assert pat.keys() == []
    assert pat.has_map
    res = pat.extract_pandas(pd.Series(["a=1 b=2", "nope"])).to_dict("records")
    assert res[0]["_map"] == {"a": "1", "b": "2"} and res[0]["_match"]
    assert res[1]["_map"] is None and not res[1]["_match"]


def test_trim_values(spark):
    """trim_values left/right/all with trim_chars (reference trim.go)."""
    from beats_spark.operators.base import build_chain

    df = spark.createDataFrame([("k=  v  ;",)], "text string")
    for mode, expected in [("left", "v  "), ("right", "  v"), ("all", "v"), ("none", "  v  ")]:
        chain = build_chain(
            [
                {
                    "dissect": {
                        "tokenizer": "k=%{val};",
                        "field": "text",
                        "target_prefix": "",
                        "trim_values": mode,
                        "overwrite_keys": True,
                    }
                }
            ]
        )
        got = chain(df).first()["val"]
        assert got == expected, (mode, got)
