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
