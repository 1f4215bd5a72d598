"""Streaming continuous-ingestion dedup tick (stream_ingest_dedup):
per-micro-batch exact + fuzzy dedup against persistent indexes that
evolve batch-over-batch, with restart resume."""

from __future__ import annotations

import glob
import os
import shutil


def _plant_wave(spark, src_dir, rows, mtime):
    """Write one wave as a single parquet file with a pinned mtime so
    the file stream (which orders candidates by modification time)
    processes waves deterministically."""
    tmp = str(src_dir) + f".tmp{mtime}"
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src_dir, exist_ok=True)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dest = f"{src_dir}/wave{mtime}.parquet"
    shutil.copyfile(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(tmp)


_BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_OTHER = "completely different second document about engines and streams ok"


def test_stream_ingest_dedup_evolves_and_resumes(spark, tmp_path):
    from beats_spark.streaming.pipeline import stream_ingest_dedup

    src = tmp_path / "src"
    # wave 1: two originals
    _plant_wave(spark, src, [(1, _BASE), (2, _OTHER)], 1_000)
    # wave 2: exact replay of 1 (drop), near-dup of 1 (drop via the
    # band index), one fresh (keep → its index entries must append)
    _plant_wave(
        spark,
        src,
        [
            (10, _BASE),
            (11, _BASE + " lambda"),
            (12, "fresh wave two doc with genuinely new words inside it yes"),
        ],
        2_000,
    )
    # wave 3: near-dup of the WAVE-2 survivor (only dropped if the
    # index evolved), within-batch exact pair (one survives), fresh
    _plant_wave(
        spark,
        src,
        [
            (20, "fresh wave two doc with genuinely new words inside it ok"),
            (21, "wave three unique content nothing like the others"),
            (22, "wave three unique content nothing like the others"),
            (23, "and one more wholly distinct third wave document here"),
        ],
        3_000,
    )

    out, ck, idx = tmp_path / "out", tmp_path / "ck", tmp_path / "idx"
    q = stream_ingest_dedup(
        spark, str(src), str(idx), str(out), str(ck),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(900)  # generous: full-suite host contention

    got = spark.read.parquet(str(out))
    surv = {r.doc_id for r in got.select("doc_id").collect()}
    assert surv == {1, 2, 12, 21, 23}
    # one batch per wave, in mtime order
    assert got.select("batch_id").distinct().count() == 3
    by_batch = {
        r.batch_id: r.doc_id for r in got.select("batch_id", "doc_id").collect()
        if r.doc_id in (1, 12, 21)
    }
    assert sorted(by_batch) == [0, 1, 2]

    # all three indexes carry exactly the survivors
    bands = spark.read.parquet(str(idx / "bands"))
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == surv
    shingles = spark.read.parquet(str(idx / "shingles"))
    assert {r.doc_id for r in shingles.select("doc_id").collect()} == surv
    content = spark.read.parquet(str(idx / "content"))
    assert content.select("_ck", "_ck2").distinct().count() == 5

    # restart resume: a 4th wave against the SAME checkpoint must dedup
    # against everything indexed so far and extend the index
    _plant_wave(
        spark,
        src,
        [
            (30, _BASE + " mu"),  # near-dup of wave-1 #1 → drop
            (31, "wave three unique content nothing like the others"),  # exact of 21 → drop
            (32, "a final wave four document unlike any predecessor at all"),
        ],
        4_000,
    )
    q2 = stream_ingest_dedup(
        spark, str(src), str(idx), str(out), str(ck),
        max_files_per_trigger=1,
    )
    assert q2.awaitTermination(900)
    got2 = spark.read.parquet(str(out))
    assert {r.doc_id for r in got2.select("doc_id").collect()} == surv | {32}
    assert spark.read.parquet(str(idx / "shingles")).count() == 6


def test_stream_ingest_dedup_string_ids_cold_start(spark, tmp_path):
    """A string-keyed corpus must cold-start cleanly: the empty-index
    fallback frames carry the batch's id TYPE (not an assumed bigint),
    so the first batch's index joins typecheck."""
    import os

    from beats_spark.streaming.pipeline import stream_ingest_dedup

    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    df = spark.createDataFrame(
        [("d-1", _BASE), ("d-2", _BASE), ("d-3", _OTHER)],
        "doc_id string, text string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(src))
    q = stream_ingest_dedup(
        spark, str(src), str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    assert q.awaitTermination(900)
    got = spark.read.parquet(str(tmp_path / "out"))
    # within-batch exact collapse keeps the min id; d-3 is fresh
    assert {r.doc_id for r in got.collect()} == {"d-1", "d-3"}
    bands = spark.read.parquet(str(tmp_path / "idx" / "bands"))
    assert dict(bands.dtypes)["doc_id"] == "string"


def _plant_url_wave(spark, src_dir, rows, mtime):
    tmp = str(src_dir) + f".tmp{mtime}"
    df = spark.createDataFrame(rows, "url string")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src_dir, exist_ok=True)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dest = f"{src_dir}/wave{mtime}.parquet"
    shutil.copyfile(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(tmp)


def test_stream_bloom_seen_matches_sequential_batch(spark, tmp_path):
    """Per-wave verdicts equal a sequential batch replay of
    bloom_build/bloom_probe; the persistent index ends exactly equal
    to the filter built over all keys at once (bounded, distinct)."""
    from pyspark.sql import functions as F

    from beats_spark.operators.sketches import bloom_build, bloom_probe
    from beats_spark.streaming.pipeline import stream_bloom_seen

    NB, K, SEED = 512, 3, 4
    waves = [
        [(f"https://w1.example/{i}",) for i in range(30)],
        # wave 2: 10 repeats of wave 1 + 20 fresh
        [(f"https://w1.example/{i}",) for i in range(10)]
        + [(f"https://w2.example/{i}",) for i in range(20)],
        # wave 3: repeats from both + fresh, plus a within-wave dup
        [(f"https://w1.example/{5}",), (f"https://w2.example/{7}",),
         (f"https://w3.example/a",), (f"https://w3.example/a",),
         (f"https://w3.example/b",)],
    ]
    src = tmp_path / "src"
    for n, rows in enumerate(waves, 1):
        _plant_url_wave(spark, src, rows, 1000 * n)
    q = stream_bloom_seen(
        spark, str(src), str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), key_col="url", n_bits=NB, k=K, seed=SEED,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(900)
    out = spark.read.parquet(str(tmp_path / "out"))
    # batch replay: wave i probes the filter of waves < i
    prior = spark.createDataFrame([], "bit bigint")
    for bid, rows in enumerate(waves):
        df = spark.createDataFrame(rows, "url string")
        want = {
            (r.url, r.maybe_seen)
            for r in bloom_probe(df, prior, "url", NB, K, SEED).collect()
        }
        got_rows = out.where(F.col("batch_id") == bid).collect()
        got = {(r.url, r.maybe_seen) for r in got_rows}
        assert got == want, bid
        # and batch row multiplicity preserved (within-wave dup kept)
        assert len(got_rows) == len(rows), bid
        prior = prior.unionByName(
            bloom_build(df, "url", NB, K, SEED)
        ).distinct()
    # no false negatives across waves: every wave-2/3 repeat flagged
    w2 = {r.url: r.maybe_seen for r in out.where("batch_id = 1").collect()}
    assert all(w2[f"https://w1.example/{i}"] for i in range(10))
    w3 = {r.url: r.maybe_seen for r in out.where("batch_id = 2").collect()}
    assert w3["https://w1.example/5"] and w3["https://w2.example/7"]
    # final index == filter over all keys at once; distinct and bounded
    idx = spark.read.parquet(str(tmp_path / "idx") + "/bloom")
    all_urls = spark.createDataFrame(
        [r for w in waves for r in w], "url string"
    )
    want_bits = {r.bit for r in bloom_build(all_urls, "url", NB, K, SEED).collect()}
    got_bits = [r.bit for r in idx.select("bit").collect()]
    assert len(got_bits) == len(set(got_bits))  # batch deltas disjoint
    assert set(got_bits) == want_bits
    assert len(got_bits) <= NB


def test_stream_kmv_state_equals_union_sketch(spark, tmp_path):
    """After three waves the rolling bottom-k state equals the sketch
    built over all raw keys at once (the merge law, streamed)."""
    from pyspark.sql import functions as F

    from beats_spark.operators.sketches import kmv_sketch
    from beats_spark.streaming.pipeline import stream_kmv_state

    K = 16
    waves = [
        [(f"s{i % 3}", f"k-{i}") for i in range(60)],
        [(f"s{i % 3}", f"k-{i}") for i in range(30, 90)],   # overlap
        [(f"s{i % 3}", f"fresh-{i}") for i in range(20)],
    ]
    src = tmp_path / "src"
    for n, rows in enumerate(waves, 1):
        tmp = str(src) + f".tmp{n}"
        spark.createDataFrame(rows, "grp string, u string").coalesce(1)\
            .write.mode("overwrite").parquet(tmp)
        os.makedirs(src, exist_ok=True)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/wave{n}.parquet"
        shutil.copyfile(part, dest)
        os.utime(dest, (1000 * n, 1000 * n))
        shutil.rmtree(tmp)
    q = stream_kmv_state(
        spark, str(src), str(tmp_path / "idx"), str(tmp_path / "ckpt"),
        key_col="u", by=("grp",), k=K, salts=4,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(900)
    idx = spark.read.parquet(str(tmp_path / "idx") + "/kmv")
    last = idx.agg(F.max("batch_id")).first()[0]
    got = {(r.grp, r.rank, r.h)
           for r in idx.where(F.col("batch_id") == last).collect()}
    all_rows = [r for w in waves for r in w]
    direct = {(r.grp, r.rank, r.h) for r in kmv_sketch(
        spark.createDataFrame(all_rows, "grp string, u string"),
        "u", ["grp"], k=K, salts=4,
    ).collect()}
    assert got == direct
    # every wave left a superseded state partition
    assert idx.select("batch_id").distinct().count() == 3


def test_stream_bloom_seen_restart_resume(spark, tmp_path):
    """Two waves, stream stops (availableNow), a third wave arrives,
    the stream restarts on the SAME checkpoint: the resumed run must
    probe against the persisted bits (wave-1/2 repeats flagged) and
    the final index must equal the uninterrupted 3-wave filter —
    bounded, distinct, no double-processing of waves 1-2."""
    from pyspark.sql import functions as F

    from beats_spark.operators.sketches import bloom_build
    from beats_spark.streaming.pipeline import stream_bloom_seen

    NB, K, SEED = 256, 3, 9
    w1 = [(f"https://r.example/{i}",) for i in range(20)]
    w2 = [(f"https://r.example/{i}",) for i in range(10, 35)]
    w3 = [(f"https://r.example/{i}",) for i in range(5, 15)] + [
        ("https://r.example/new",)
    ]
    src = tmp_path / "src"
    _plant_url_wave(spark, src, w1, 1000)
    _plant_url_wave(spark, src, w2, 2000)
    args = (str(src), str(tmp_path / "idx"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"))
    q = stream_bloom_seen(spark, *args, key_col="url", n_bits=NB, k=K,
                          seed=SEED, max_files_per_trigger=1)
    assert q.awaitTermination(900)
    _plant_url_wave(spark, src, w3, 3000)
    q2 = stream_bloom_seen(spark, *args, key_col="url", n_bits=NB, k=K,
                           seed=SEED, max_files_per_trigger=1)
    assert q2.awaitTermination(900)
    out = spark.read.parquet(str(tmp_path / "out"))
    # exactly one verdict row per (wave, url): waves 1-2 not replayed
    assert out.count() == len(w1) + len(w2) + len(w3)
    w3rows = {r.url: r.maybe_seen for r in out.where("batch_id = 2").collect()}
    assert all(w3rows[u] for (u,) in w3[:-1])  # all repeats flagged
    # final index == uninterrupted filter over all three waves
    idx = spark.read.parquet(str(tmp_path / "idx") + "/bloom")
    bits = [r.bit for r in idx.select("bit").collect()]
    assert len(bits) == len(set(bits))
    all_urls = spark.createDataFrame(w1 + w2 + w3, "url string")
    want = {r.bit for r in bloom_build(all_urls, "url", NB, K, SEED).collect()}
    assert set(bits) == want


def test_stream_kmv_state_restart_resume(spark, tmp_path):
    """Rolling bottom-k across a restart: the resumed wave merges into
    the persisted state, ending equal to the all-at-once sketch."""
    from pyspark.sql import functions as F

    from beats_spark.operators.sketches import kmv_sketch
    from beats_spark.streaming.pipeline import stream_kmv_state

    K = 8
    w1 = [("g", f"k-{i}") for i in range(30)]
    w2 = [("g", f"k-{i}") for i in range(20, 50)]
    src = tmp_path / "src"

    def plant(rows, mtime):
        tmp = str(src) + f".tmp{mtime}"
        spark.createDataFrame(rows, "grp string, u string").coalesce(1)\
            .write.mode("overwrite").parquet(tmp)
        os.makedirs(src, exist_ok=True)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/wave{mtime}.parquet"
        shutil.copyfile(part, dest)
        os.utime(dest, (mtime, mtime))
        shutil.rmtree(tmp)

    plant(w1, 1000)
    args = (str(src), str(tmp_path / "idx"), str(tmp_path / "ckpt"))
    q = stream_kmv_state(spark, *args, key_col="u", by=("grp",), k=K,
                         salts=4, max_files_per_trigger=1)
    assert q.awaitTermination(900)
    plant(w2, 2000)
    q2 = stream_kmv_state(spark, *args, key_col="u", by=("grp",), k=K,
                          salts=4, max_files_per_trigger=1)
    assert q2.awaitTermination(900)
    idx = spark.read.parquet(str(tmp_path / "idx") + "/kmv")
    last = idx.agg(F.max("batch_id")).first()[0]
    got = {(r.grp, r.rank, r.h)
           for r in idx.where(F.col("batch_id") == last).collect()}
    direct = {(r.grp, r.rank, r.h) for r in kmv_sketch(
        spark.createDataFrame(w1 + w2, "grp string, u string"),
        "u", ["grp"], k=K, salts=4,
    ).collect()}
    assert got == direct
