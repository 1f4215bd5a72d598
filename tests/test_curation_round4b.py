"""Unit tests for the late-round-4 curation additions: preference
pairs (DPO construction), intra-document repetition stripping,
mojibake repair, and the deterministic training-order shuffle."""

from pyspark.sql import functions as F

from beats_spark.operators.chat import preference_pairs
from beats_spark.operators.dedup import strip_repeated_lines
from beats_spark.operators.encoding import (
    MOJIBAKE_TABLE,
    fix_mojibake,
    mojibake_oracle_expr,
)
from beats_spark.operators.sampling import shuffle_shards


# ---------------------------------------------------------------- DPO pairs


def _turns(spark):
    return spark.createDataFrame(
        [
            # conv 1: three scored candidates -> best vs worst
            (1, 1, "user", "q1", None),
            (1, 2, "assistant", "a-good", 5.0),
            (1, 3, "assistant", "a-bad", 1.5),
            (1, 4, "assistant", "a-mid", 3.0),
            # conv 2: one candidate -> no pair
            (2, 1, "user", "q2", None),
            (2, 2, "assistant", "only", 4.0),
            # conv 3: all-tied scores -> no preference signal, no pair
            (3, 1, "assistant", "t1", 2.0),
            (3, 2, "assistant", "t2", 2.0),
            # conv 4: no user turn -> prompt falls back to ''
            (4, 1, "assistant", "x1", 9.0),
            (4, 2, "assistant", "x2", 1.0),
            # conv 5: NULL-scored candidate excluded from ranking
            (5, 1, "user", "q5", None),
            (5, 2, "assistant", "n1", None),
            (5, 3, "assistant", "n2", 7.0),
            (5, 4, "assistant", "n3", 2.0),
        ],
        "conv_id long, turn_idx int, role string, text string, score double",
    )


def test_preference_pairs_basic(spark):
    rows = {
        r["conv_id"]: r
        for r in preference_pairs(_turns(spark)).collect()
    }
    assert set(rows) == {1, 4, 5}
    r1 = rows[1]
    assert (r1["prompt"], r1["chosen"], r1["rejected"]) == (
        "q1", "a-good", "a-bad")
    assert r1["margin_micro"] == 3_500_000
    assert r1["n_candidates"] == 3
    assert rows[4]["prompt"] == ""  # no user turn
    r5 = rows[5]
    assert (r5["chosen"], r5["rejected"]) == ("n2", "n3")
    assert r5["n_candidates"] == 2  # NULL-scored turn never counted


def test_preference_pairs_tie_break(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "user", "q", None),
            (1, 2, "assistant", "first-best", 5.0),
            (1, 3, "assistant", "second-best", 5.0),
            (1, 4, "assistant", "first-worst", 1.0),
            (1, 5, "assistant", "last-worst", 1.0),
        ],
        "conv_id long, turn_idx int, role string, text string, score double",
    )
    [r] = preference_pairs(df, order_cols=("turn_idx",)).collect()
    assert r["chosen"] == "first-best"
    assert r["rejected"] == "last-worst"
    assert r["margin_micro"] == 4_000_000


def test_preference_pairs_min_candidates_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        preference_pairs(_turns(spark), min_candidates=1)


# ------------------------------------------------------- intra-doc repeats


def test_strip_repeated_lines_keep_first_trimmed(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na \n\nc\nb"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in strip_repeated_lines(df).collect()}
    # 'a ' is a trimmed-dup of 'a'; blank line survives; second b drops
    assert rows[1]["text"] == "a\nb\n\nc"
    assert (rows[1]["n_lines"], rows[1]["n_kept"], rows[1]["n_removed"]) == (
        6, 4, 2)
    assert rows[2]["text"] == "x"
    assert rows[3]["text"] == ""
    assert rows[3]["n_removed"] == 0


def test_strip_repeated_lines_paragraph_unit(spark):
    df = spark.createDataFrame(
        [(1, "lic a\nlic b\n\nbody\n\nlic a\nlic b\n\nbody2")],
        "doc_id long, text string",
    )
    [r] = strip_repeated_lines(df, unit="paragraph").collect()
    assert r["text"] == "lic a\nlic b\n\nbody\n\nbody2"
    assert (r["n_lines"], r["n_kept"], r["n_removed"]) == (4, 3, 1)


def test_strip_repeated_lines_bad_unit(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        strip_repeated_lines(df, unit="sentence")


# ------------------------------------------------------------- mojibake


def test_mojibake_table_is_frozen_and_consistent():
    # Pin the table: every left side is the right side's UTF-8 bytes
    # read back as cp1252 (the defining property), and the size is
    # fixed so silent edits fail loudly.
    assert len(MOJIBAKE_TABLE) == 25
    for moji, fixed in MOJIBAKE_TABLE:
        assert moji == fixed.encode("utf-8").decode("cp1252")


def test_fix_mojibake_repairs_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "donâ€™t caffÃ© â€” okÂ«xÂ»"),
            (2, "plain ascii"),
            (3, None),
            (4, "costsÂ\xa0100Â°"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    assert rows[1]["text"] == "don’t caffé — ok«x»"
    assert rows[1]["had_mojibake"] is True
    assert rows[2]["text"] == "plain ascii"
    assert rows[2]["had_mojibake"] is False
    assert rows[3]["text"] is None and rows[3]["had_mojibake"] is None
    assert rows[4]["text"] == "costs 100°"


def test_fix_mojibake_idempotent_on_clean_output(spark):
    dirty = "donâ€™t â€¦ caffÃ© Â«okÂ» â€” Ã¼ber"
    df = spark.createDataFrame([(1, dirty)], "doc_id long, text string")
    once = fix_mojibake(df, "text")
    twice = fix_mojibake(once.select("doc_id", "text"), "text")
    a = once.collect()[0]
    b = twice.collect()[0]
    assert a["text"] == b["text"]
    assert b["had_mojibake"] is False


def test_fix_mojibake_out_col_preserves_source(spark):
    df = spark.createDataFrame([(1, "Ã©")], "doc_id long, text string")
    [r] = fix_mojibake(df, "text", out_col="fixed").collect()
    assert r["text"] == "Ã©" and r["fixed"] == "é"


def test_mojibake_oracle_expr_matches_spark(spark):
    import duckdb

    samples = ["donâ€™t Ã¼ Â«xÂ» â€” Â°", "clean", "Ã©Ã©Ã©"]
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    got = {
        r["i"]: r["text"]
        for r in fix_mojibake(sdf, "text").collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        [(want,)] = con.execute(
            f"SELECT {mojibake_oracle_expr('?')}", [s]
        ).fetchall()
        assert got[i] == want


# ------------------------------------------------------------- shard shuffle


def test_shuffle_shards_dense_and_deterministic(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, "doc_id", n_shards=8, seed=1)
    rows = out.collect()
    assert len(rows) == 200
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are a dense 0..k-1 run inside every shard
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # independent of input partitioning
    again = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in shuffle_shards(
            df.repartition(13), "doc_id", n_shards=8, seed=1
        ).collect()
    }
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in rows} == again


def test_shuffle_shards_seed_changes_permutation(spark):
    df = spark.range(64).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(df, "doc_id", 4, seed=0).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(df, "doc_id", 4, seed=9).collect()}
    assert a != b


def test_shuffle_shards_validation(spark):
    import pytest

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        shuffle_shards(df, "doc_id", 0)


# ------------------------------------------------------------ script stats


def test_script_composition_branches(spark):
    from beats_spark.operators.textstats import script_composition

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "你好世界 こんにちは"),
            (3, "привет мир"),
            (4, "مرحبا بالعالم"),
            (5, "12345 +-*/"),
            (6, ""),
            (7, None),
            (8, "abc 你好"),  # tie-break: latin wins ties by precedence
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in script_composition(df).collect()}
    assert rows[1]["dominant_script"] == "latin"
    assert rows[2]["dominant_script"] == "cjk"
    assert rows[2]["cjk"] == 9
    assert rows[3]["dominant_script"] == "cyrillic"
    assert rows[4]["dominant_script"] == "arabic"
    assert rows[5]["dominant_script"] == "none"
    assert rows[5]["digit"] == 5
    assert rows[6]["dominant_script"] == "none" and rows[6]["n_chars"] == 0
    assert rows[7]["dominant_script"] == "none" and rows[7]["latin"] == 0
    assert rows[8]["latin"] == 3 and rows[8]["cjk"] == 2
    # latin==3 > cjk==2, so latin; shrink latin to force the tie path
    [tie] = script_composition(
        spark.createDataFrame([(9, "ab 你好")], "doc_id long, text string")
    ).collect()
    assert tie["latin"] == 2 and tie["cjk"] == 2
    assert tie["dominant_script"] == "latin"  # precedence on exact tie
