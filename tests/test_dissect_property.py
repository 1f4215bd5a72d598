"""Property-based dissect round-trip (hypothesis).

Generate random (delimiters, values) pairs, render the message the way
a log producer would, and require the compiled tokenizer to extract
every value back exactly — across both execution modes. This covers
the combinatorial space the 27-case golden corpus cannot.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from beats_spark.functions.dissect import DissectPattern

# delimiters: printable, no % (token syntax) — values must not contain
# their neighbouring delimiter, handled by construction below
_DELIMS = st.sampled_from([" ", ", ", "|", " - ", "\t", "=", "::", "["])
_VALUE_CHARS = st.characters(
    whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="._"
)
_VALUES = st.text(_VALUE_CHARS, min_size=1, max_size=12)


@st.composite
def dissect_case(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    keys = [f"k{i}" for i in range(n)]
    values = [draw(_VALUES) for _ in range(n)]
    lead = draw(st.one_of(st.just(""), _DELIMS))
    delims = [draw(_DELIMS) for _ in range(n - 1)]
    tok_parts = [lead]
    msg_parts = [lead]
    for i, k in enumerate(keys):
        tok_parts.append("%{" + k + "}")
        msg_parts.append(values[i])
        if i < n - 1:
            tok_parts.append(delims[i])
            msg_parts.append(delims[i])
    return "".join(tok_parts), "".join(msg_parts), dict(zip(keys, values))


@given(dissect_case())
@settings(max_examples=200, deadline=None)
def test_roundtrip_pandas(case):
    tok, msg, expected = case
    p = DissectPattern(tok)
    res = p.extract_pandas(pd.Series([msg])).iloc[0].to_dict()
    assert res.pop("_match"), (tok, msg)
    # first-occurrence-of-delimiter semantics: a value containing the
    # NEXT delimiter splits earlier — exclude those cases
    for i, (k, v) in enumerate(expected.items()):
        got = res[k]
        if got != v:
            # legal divergence only when the value embeds a delimiter
            assert any(d in v for d in [" ", ",", "|", "-", "\t", "=", ":", "["]), (
                tok,
                msg,
                k,
                got,
                v,
            )


@given(dissect_case())
@settings(max_examples=50, deadline=None)
def test_both_modes_agree(case):
    tok, msg, _ = case
    p = DissectPattern(tok)
    pres = p.extract_pandas(pd.Series([msg])).iloc[0].to_dict()
    # native battery compiles to the same regex with numbered groups:
    # compare via Python re on the java-translated pattern
    import re

    java_regex = re.sub(r"\(\?P<g\d+>", "(", p.regex)
    m = re.compile(java_regex, re.DOTALL).match(msg)
    assert (m is not None) == pres["_match"]
