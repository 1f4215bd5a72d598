"""scripts/corpus.py — the corpus-build CLI wiring (each stage's
semantics are oracle-proven elsewhere; this pins the composition,
flags, outputs, and the stats contract)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "corpus_cli", Path(__file__).resolve().parent.parent / "scripts" / "corpus.py"
)
corpus_cli = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(corpus_cli)


def test_corpus_cli_end_to_end(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    rc = corpus_cli.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--temperature",
            "--budget", "256",
            "--buckets", "8",
            "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 500
    assert 0 < stats["docs_kept"] <= stats["docs_in"]
    assert 0 < stats["docs_unique"] <= stats["docs_kept"]
    assert stats["rows_packed"] > 0 and stats["windows"] > 0
    # temperature boosts: head language dampened, tails boosted
    w = stats["mixture_weights"]
    assert w["en"] < 1.0 < min(v for k, v in w.items() if k != "en")
    manifest = spark.read.parquet(f"{out}/manifest")
    assert manifest.count() == stats["rows_packed"]
    assert {"bucket", "tok_count", "pack_first", "pack_last"} <= set(
        manifest.columns
    )
    report = spark.read.parquet(f"{out}/reject_report")
    assert report.count() > 0  # sf0.001 plants rejectable docs


def test_corpus_cli_minimal_flags(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus2")
    rc = corpus_cli.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--no-quality", "--dedup", "none",
            "--budget", "128", "--buckets", "4", "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 500 and stats["rows_packed"] == 500
    assert "docs_kept" not in stats and "docs_unique" not in stats


def test_corpus_cli_transcripts_mode(spark, transcripts, tmp_path, capsys):
    turns_path = str(tmp_path / "turns")
    transcripts.write.mode("overwrite").parquet(turns_path)
    out = str(tmp_path / "chat_corpus")
    rc = corpus_cli.main(
        [
            "--input", turns_path,
            "--out", out,
            "--transcripts",
            "--order-cols", "turn_idx",
            "--context-budget", "64",
            "--no-quality",
            "--budget", "128", "--buckets", "4", "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["turns_in"] == transcripts.count()
    assert stats["convs_in"] == 300
    assert 0 < stats["convs_valid"] < stats["convs_in"]  # gate really fires
    assert 0 < stats["turns_kept"] <= stats["turns_in"]
    assert stats["docs_in"] == stats["convs_valid"]
    assert 0 < stats["rows_packed"] <= stats["docs_in"]
    rendered = spark.read.parquet(f"{out}/rendered")
    assert {"rendered", "loss_spans", "n_turns", "n_loss_turns"} <= set(
        rendered.columns
    )
    assert rendered.count() == stats["convs_valid"]
    report = spark.read.parquet(f"{out}/conv_reject_report")
    reasons = {r.reason for r in report.collect()}
    assert reasons  # synth corpus trips at least one validity rule
    assert reasons <= {
        "empty_turn", "bad_role", "missing_required",
        "bad_opening", "dangling_turn",
    }


def test_corpus_cli_transcripts_flag_conflicts(tmp_path):
    import pytest

    for extra in (["--html"], ["--temperature"]):
        with pytest.raises(SystemExit):
            corpus_cli.main(
                ["--input", "x", "--out", str(tmp_path), "--transcripts"]
                + extra
            )


def test_corpus_cli_warc_input(spark, tmp_path, capsys):
    from tests.test_warc import _record

    d = tmp_path / "segments"
    d.mkdir()
    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><h1>Title</h1><p>a real paragraph of text here "
        b"that should survive the quality gate in spirit</p></body></html>"
    )
    blob = b"".join(
        _record(b"response", html.replace(b"Title", b"Title %d" % i),
                uri=b"http://e.com/%d" % i)
        for i in range(5)
    ) + _record(b"request", b"GET / HTTP/1.1\r\n\r\n", uri=b"http://e.com/0")
    (d / "seg-0.warc").write_bytes(blob)
    out = str(tmp_path / "warc_corpus")
    rc = corpus_cli.main(
        [
            "--input", str(d),
            "--input-format", "warc",
            "--out", out,
            "--no-quality", "--dedup", "none",
            "--budget", "64", "--buckets", "2", "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["warc_records"] == 6   # 5 responses + 1 request
    assert stats["docs_in"] == 5        # request filtered out
    assert stats["rows_packed"] == 5


def test_corpus_cli_plan_report(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus_plan")
    rc = corpus_cli.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--budget", "256",
            "--buckets", "8",
            "--plan-report",
            "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # naive pad-to-budget always costs at least as much as the real
    # token mass is short of full windows; both are positive here
    assert stats["tokens_real"] > 0
    assert stats["padding_tokens_naive"] > 0
    assert stats["skew_heavy_strata"] >= 0
    pad = spark.read.parquet(f"{out}/padding_report")
    assert {"cap", "n_seqs", "token_sum", "padding", "eff_ppm"} <= set(
        pad.columns
    )
    # padding report internally consistent with the stats line
    agg = pad.agg({"padding": "sum", "token_sum": "sum"}).collect()[0]
    assert agg["sum(padding)"] == stats["padding_tokens_naive"]
    assert agg["sum(token_sum)"] == stats["tokens_real"]
    skew = spark.read.parquet(f"{out}/skew_report")
    assert {"cnt", "share_ppm", "rec_salt", "avg_cnt"} <= set(skew.columns)


def test_corpus_cli_plan_report_transcripts_no_stratum(spark, transcripts, tmp_path, capsys):
    """Regression: --plan-report on --transcripts input (no lang
    column) must skip the skew leg, not crash after padding wrote."""
    turns_path = str(tmp_path / "turns2")
    transcripts.write.mode("overwrite").parquet(turns_path)
    out = str(tmp_path / "chat_plan")
    rc = corpus_cli.main(
        [
            "--input", turns_path,
            "--out", out,
            "--transcripts",
            "--no-quality",
            "--plan-report",
            "--budget", "128", "--buckets", "4", "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["skew_heavy_strata"] is None
    assert stats["tokens_real"] > 0
    assert spark.read.parquet(f"{out}/padding_report").count() > 0


def test_corpus_cli_release_split_and_shards(spark, tmp_path, capsys):
    """--split-eval-milli + --shard-bytes: split assignment written
    and disjoint, eval never packed, shard plan covers the train
    side; hash mode replays the deterministic coin."""
    import hashlib

    out = str(tmp_path / "rel")
    rc = corpus_cli.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--no-quality",
            "--split-eval-milli", "200",
            "--shard-bytes", "8192",
            "--budget", "256",
            "--buckets", "8",
            "--cores", "8",
            "--seed", "5",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_train"] + stats["docs_eval"] == stats["docs_unique"]
    assert 0 < stats["docs_eval"] < stats["docs_unique"]
    assign = {r.doc_id: r.split
              for r in spark.read.parquet(f"{out}/split_assignment").collect()}
    # the deterministic md5 coin, replayed
    thr = int(0.2 * (1 << 60))
    for did, sp in list(assign.items())[:50]:
        h = int(hashlib.md5(f"s5|{did}".encode()).hexdigest()[:15], 16)
        assert sp == ("eval" if h < thr else "train"), did
    plan = spark.read.parquet(f"{out}/shard_plan")
    assert plan.count() == stats["docs_train"]
    assert stats["shards"] == plan.agg({"shard": "max"}).collect()[0][0] + 1
    # packed manifest holds only train docs (pid = doc_id here)
    manifest = spark.read.parquet(f"{out}/manifest")
    packed_ids = {r["_pid"] for r in manifest.select("_pid").collect()}
    eval_ids = {d for d, s in assign.items() if s == "eval"}
    assert not packed_ids & eval_ids


def test_corpus_cli_cluster_split_mode(spark, tmp_path, capsys):
    """--split-mode cluster groups near-dup docs onto one side: the
    sf0.001 fixture's near-dup families must not straddle."""
    out = str(tmp_path / "rel2")
    rc = corpus_cli.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--no-quality",
            "--dedup", "none",
            "--split-eval-milli", "300",
            "--split-mode", "cluster",
            "--budget", "256",
            "--buckets", "8",
            "--cores", "8",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_train"] + stats["docs_eval"] == stats["docs_in"]
    # verify the grouping invariant directly: every minhash near-dup
    # pair of the input shares a split side
    from beats_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assign = spark.read.parquet(f"{out}/split_assignment")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id")
    a = assign.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "split", "split_a"
    )
    b = assign.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "split", "split_b"
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    straddle = joined.where("split_a != split_b").count()
    assert straddle == 0 and joined.count() > 0
