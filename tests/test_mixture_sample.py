"""Domain-mixture resampling semantics (operators/sampling.py)."""

from __future__ import annotations

import pytest

from beats_spark.operators.sampling import mixture_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_integer_weights_exact(corpus):
    out = mixture_sample(corpus, "lang", {"en": 3.0, "de": 0.0}, "doc_id")
    rows = out.collect()
    assert all(r.lang == "en" for r in rows)
    assert len(rows) == 200 * 3
    # copy indices 0..2 present for every doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.mix_copy)
    assert all(v == {0, 1, 2} for v in by_doc.values())


def test_fractional_weight_in_expectation(corpus):
    out = mixture_sample(corpus, "lang", {"en": 0.5, "de": 1.0}, "doc_id", seed=3)
    n_en = out.where("lang = 'en'").count()
    assert 60 <= n_en <= 140  # 200 * 0.5 ± generous noise
    assert out.where("lang = 'de'").count() == 200


def test_deterministic_across_parallelism(corpus):
    a = sorted(
        (r.doc_id, r.mix_copy)
        for r in mixture_sample(
            corpus.repartition(1), "lang", {"en": 1.5, "de": 0.25}, "doc_id"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.mix_copy)
        for r in mixture_sample(
            corpus.repartition(13), "lang", {"en": 1.5, "de": 0.25}, "doc_id"
        ).collect()
    )
    assert a == b


def test_default_weight_passthrough(corpus):
    out = mixture_sample(corpus, "lang", {"en": 0.0}, "doc_id")
    assert out.count() == 200  # de untouched by default_weight=1.0


def test_negative_weight_rejected(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "lang", {"en": -1.0}, "doc_id")


def test_temperature_weights_flattens_the_head(spark):
    from beats_spark.operators.sampling import temperature_weights

    rows = [(i, "en" if i < 900 else "is") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.stratum: r for r in temperature_weights(df, "lang").collect()}
    en, is_ = out["en"], out["is"]
    # shares: p = 900/100 milli; sqrt: isqrt(900e6)=30000, isqrt(100e6)=10000
    assert (en.p_milli, is_.p_milli) == (900, 100)
    assert (en.q_milli, is_.q_milli) == (750, 250)
    # tail boosted 2.5x, head dampened to 0.833x
    assert is_.boost_milli == 250 * 1000 // 100 == 2500
    assert en.boost_milli == 750 * 1000 // 900 == 833


def test_isqrt_exact_at_square_boundaries(spark):
    from pyspark.sql import functions as F

    from beats_spark.operators.sampling import _isqrt

    # perfect squares and their neighbors, incl. values where the
    # double sqrt candidate could round either way
    vals = []
    for base in [0, 1, 2, 3, 10, 999, 10**6, 3 * 10**9, (2**26 + 1)]:
        sq = base * base
        vals.extend([sq, sq + 1, max(sq - 1, 0)])
    import math

    df = spark.createDataFrame([(v,) for v in set(vals)], "x long")
    got = df.select("x", _isqrt(F.col("x")).alias("s")).collect()
    for r in got:
        assert r.s == math.isqrt(r.x), (r.x, r.s)
