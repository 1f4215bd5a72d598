"""Pins for the frozen fastText-style quality classifier
(functions/quality_model.py) and its operator
(textstats.quality_classifier)."""

import hashlib
import re

from beats_spark.functions.quality_model import (
    QUALITY_BIAS_MILLI,
    QUALITY_BUCKETS,
    QUALITY_SEED,
    QUALITY_WEIGHTS_MILLI,
)
from beats_spark.operators.textstats import quality_classifier


def _py_score(text):
    """Pure-Python replay of the engine arithmetic (div truncates
    toward zero, like Spark's `div` and DuckDB's `//`)."""
    toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
    if not toks:
        return None
    s = sum(
        QUALITY_WEIGHTS_MILLI[
            int(
                hashlib.md5(f"s{QUALITY_SEED}|{t}".encode()).hexdigest()[:15],
                16,
            )
            % QUALITY_BUCKETS
        ]
        for t in toks
    )
    q = abs(s) // len(toks)
    return QUALITY_BIAS_MILLI + (q if s >= 0 else -q)


def test_model_table_is_frozen():
    # Retraining via scripts/train_quality.py must consciously update
    # these pins (the bpe_merges discipline).
    assert QUALITY_BUCKETS == 256
    assert len(QUALITY_WEIGHTS_MILLI) == 256
    assert QUALITY_SEED == 11
    assert QUALITY_BIAS_MILLI == 1876
    assert all(isinstance(w, int) for w in QUALITY_WEIGHTS_MILLI)
    # the model is non-trivial: weights spread across both signs
    assert sum(1 for w in QUALITY_WEIGHTS_MILLI if w > 0) > 50
    assert sum(1 for w in QUALITY_WEIGHTS_MILLI if w < 0) > 50


def test_classifier_separates_prose_from_junk(spark):
    rows = [
        (1, "The government of the country was in the morning a question"
            " of history and the market."),
        (2, "cheap buy now click here free offer deal sale discount"
            " casino winner prize"),
        (3, "home | about | contact | login | privacy | terms"),
        (4, "The research project on energy and water development was"
            " a service to the community."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    assert out[1]["keep_quality"] is True
    assert out[2]["keep_quality"] is False
    assert out[3]["keep_quality"] is False
    assert out[4]["keep_quality"] is True
    # engine arithmetic == pure-Python replay, bit for bit
    for i, t in rows:
        assert out[i]["quality_milli"] == _py_score(t), i


def test_classifier_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["quality_milli"] is None
        assert out[i]["keep_quality"] is None
    assert out[2]["n_tokens"] == 0


def test_classifier_threshold(spark):
    df = spark.createDataFrame([(1, "the market")], "doc_id long, text string")
    base = quality_classifier(df).collect()[0]
    strict = quality_classifier(
        df, threshold_milli=base["quality_milli"] + 1
    ).collect()[0]
    assert base["keep_quality"] is True
    assert strict["keep_quality"] is False
