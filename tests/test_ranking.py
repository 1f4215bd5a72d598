"""Bradley-Terry MM ranking vs an independent pure-Python twin, plus
the structural guarantees (tie/self/NULL drops, dominance ordering,
clamp floor)."""

from __future__ import annotations

import pytest

from beats_spark.operators.ranking import bradley_terry

SCALE = 1_000_000
S2 = SCALE * SCALE


def _python_bt(duel_rows: list[tuple[str, str]], iterations: int = 3) -> dict[str, int]:
    """Independent fixed-point MM twin (dict arithmetic, no Spark)."""
    from collections import Counter

    c = [(w, l) for w, l in duel_rows if w is not None and l is not None and w != l]
    duels = Counter((min(w, l), max(w, l)) for w, l in c)
    wins = Counter(w for w, _ in c)
    models = {m for pair in duels for m in pair}
    p = {m: SCALE for m in models}
    for _ in range(iterations):
        d = {m: 0 for m in models}
        for (a, b), n in duels.items():
            t = n * S2 // (p[a] + p[b])
            d[a] += t
            d[b] += t
        p = {m: max(wins.get(m, 0) * S2 // max(d[m], 1), 1) for m in models}
    return p


@pytest.fixture(scope="module")
def arena(spark):
    # 4 models, deterministic skill gradient with upsets + noise rows
    rows = []
    for i in range(400):
        a, b = i % 4, (i % 4 + 1 + i % 3) % 4
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        w, l = (hi, lo) if i % 5 == 0 else (lo, hi)
        rows.append((f"m{w}", f"m{l}"))
    rows += [("m0", "m0"), (None, "m1"), ("m2", None)]  # dropped
    return rows


def test_matches_pure_python_twin(spark, arena):
    df = spark.createDataFrame(arena, "winner string, loser string")
    got = {r["model"]: r["strength"] for r in bradley_terry(df, iterations=3).collect()}
    assert got == _python_bt(arena, iterations=3)


def test_dominant_model_ranks_first(spark, arena):
    df = spark.createDataFrame(arena, "winner string, loser string")
    out = {r["model"]: r for r in bradley_terry(df).collect()}
    # m0 wins most of its duels under the gradient: strictly strongest
    strengths = sorted(out.values(), key=lambda r: -r["strength"])
    assert strengths[0]["model"] == "m0"
    assert out["m0"]["strength"] > out["m3"]["strength"]


def test_all_loss_model_clamps_to_floor(spark):
    df = spark.createDataFrame(
        [("a", "z")] * 10, "winner string, loser string"
    )
    out = {r["model"]: r for r in bradley_terry(df, iterations=2).collect()}
    assert out["z"]["strength"] == 1  # zero wins → clamp floor, never 0/NULL
    assert out["z"]["wins"] == 0 and out["z"]["n_duels"] == 10
    assert out["a"]["wins"] == 10


def test_duel_counts_are_symmetric(spark, arena):
    df = spark.createDataFrame(arena, "winner string, loser string")
    out = bradley_terry(df).collect()
    clean = [(w, l) for w, l in arena if w is not None and l is not None and w != l]
    assert sum(r["n_duels"] for r in out) == 2 * len(clean)
    assert sum(r["wins"] for r in out) == len(clean)


def test_iterations_validated(spark):
    df = spark.createDataFrame([("a", "b")], "winner string, loser string")
    with pytest.raises(ValueError):
        bradley_terry(df, iterations=0)


def test_lazy_join_path_matches_driver_path(spark, arena):
    """Forcing max_driver_pairs=0 exercises the all-lazy join strategy;
    both physical paths must produce identical integers."""
    from beats_spark.operators.ranking import bradley_terry_from_counts, duel_counts

    df = spark.createDataFrame(arena, "winner string, loser string")
    counts = duel_counts(df)
    fast = bradley_terry_from_counts(counts, iterations=3).collect()
    lazy = bradley_terry_from_counts(counts, iterations=3, max_driver_pairs=0).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, lazy))


def test_integer_entity_ids_both_paths(spark):
    """Integer-keyed comparisons (players, model ids) must work in the
    driver path (schema derived from input, not hardcoded string) and
    match the lazy path."""
    from beats_spark.operators.ranking import bradley_terry_from_counts, duel_counts

    df = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3), (1, 3), (3, 2)], "winner long, loser long"
    )
    counts = duel_counts(df)
    fast = bradley_terry_from_counts(counts, iterations=2).collect()
    lazy = bradley_terry_from_counts(counts, iterations=2, max_driver_pairs=0).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, lazy))
    assert {r["model"] for r in fast} == {1, 2, 3}
