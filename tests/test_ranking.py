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


def test_model_auc_known_values(spark):
    from beats_spark.operators.ranking import model_auc

    # perfect separation
    rows = [(i, i * 10, i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, label boolean")
    r = model_auc(df, n_buckets=3).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_ppm) == (5, 5, 1_000_000)
    # perfectly wrong
    rows = [(i, -i * 10, i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, label boolean")
    assert model_auc(df, n_buckets=3).collect()[0].auc_ppm == 0
    # random-ish hand case: scores 1..4, labels alternate -> AUC 1/2
    rows = [(1, 10, True), (2, 20, False), (3, 30, True), (4, 40, False)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, label boolean")
    # ranks: 1T 2F 3T 4F -> rpos = 4, U = 4 - 3 = 1, auc = 1/4
    assert model_auc(df, n_buckets=2).collect()[0].auc_ppm == 250_000
    # degenerate single-class input -> NULL
    rows = [(1, 10, True), (2, 20, True)]
    df = spark.createDataFrame(rows, "doc_id long, score_milli long, label boolean")
    assert model_auc(df).collect()[0].auc_ppm is None


def test_model_calibration_bins_and_clamp(spark):
    import pytest

    from beats_spark.operators.ranking import model_calibration

    rows = [(50, True), (50, False), (999, True), (1000, True), (-5, False)]
    df = spark.createDataFrame(rows, "p_milli long, label boolean")
    got = {r.bin: r for r in model_calibration(df).collect()}
    assert got[0].n == 3 and got[0].frac_pos_milli == 333
    # 999 and the clamped 1000 edge share the top bin
    assert got[9].n == 2 and got[9].frac_pos_milli == 1000
    assert got[9].mean_pred_milli == (999 + 1000) // 2
    # -5 clamps to bin 0 (already counted above: 50, 50, -5)
    assert got[0].mean_pred_milli == (50 + 50 - 5) // 3
    with pytest.raises(ValueError):
        model_calibration(df, n_bins=7)


def test_roc_points_curve(spark):
    from beats_spark.operators.ranking import roc_points

    # scores spanning bins; positives concentrated high
    rows = [(30_000, True), (30_000, True), (20_000, True),
            (10_000, False), (0, False), (-20_000, False)]
    df = spark.createDataFrame(rows, "score_milli long, label boolean")
    got = {r.bin: r for r in roc_points(df).collect()}
    bins = sorted(got)
    # lowest occupied threshold classifies everything positive
    lo = got[bins[0]]
    assert lo.tpr_ppm == 1_000_000 and lo.fpr_ppm == 1_000_000
    # top bin (clamped 30k scores -> bin 15): only true positives
    top = got[15]
    assert top.tp == 2 and top.fp == 0
    assert top.tpr_ppm == 2 * 1_000_000 // 3 and top.fpr_ppm == 0
    # monotone: moving the threshold down never lowers tp/fp
    tps = [got[b].tp for b in sorted(got, reverse=True)]
    assert tps == sorted(tps)
