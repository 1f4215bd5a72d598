"""Self-contained driver-contract gate: every ``queries()`` entry runs
at sf0.001 and, where an oracle exists, matches DuckDB on row count,
column names, and order-insensitive values — the same comparison the
external correctness gate applies at sf0.01 (scripts/parity.py is the
standalone form).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_contract(name, spark, duck):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) > 0, f"{name}: rows-only query returned nothing"
        return
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert _normalize(srows, sdf.columns) == _normalize(drows, dcols), name


# The four queries that plant duplicate fixtures from a limit() of the
# documents scan: parity must hold when the table is MANY parquet files
# in arbitrary row order, not just the single driver-written file
# (orderBy("doc_id") before limit() is what makes this deterministic).
_MULTIFILE_QUERIES = [
    "dedup_exact", "dedup_simhash", "rolling_fingerprint", "dedup_simhash_md5",
    # round-3 fixture-planting queries: plant by doc_id predicates
    # (order-independent by construction) — proven here, not assumed
    "substring_dedup", "media_neardup",
]


@pytest.fixture(scope="module")
def multifile_sf(spark, tmp_path_factory):
    import os

    root = tmp_path_factory.mktemp("sf_multifile")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # scramble row order across 5 files so nothing about scan order
    # resembles the original write order
    docs.repartition(5, "doc_id").write.parquet(str(root / "documents.parquet"))
    for t in entry_mod.TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", root / f"{t}.parquet")
    return str(root)


@pytest.mark.parametrize("name", _MULTIFILE_QUERIES)
def test_multifile_order_independence(name, spark, multifile_sf, duck_multifile):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, multifile_sf)
    srows = [tuple(r) for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) > 0
        return
    res = duck_multifile.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert _normalize(srows, sdf.columns) == _normalize(drows, dcols), name


@pytest.fixture(scope="module")
def duck_multifile(multifile_sf):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        path = f"{multifile_sf}/{t}.parquet"
        src = f"'{path}/*.parquet'" if t == "documents" else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.schema.simpleString() == "struct<sink:string,n:bigint,users:bigint>"


def test_contract_surface_invariants():
    """Bench queries must be real contract queries, and the rows-only
    set (no oracle) must stay exactly the two documented-by-design
    entries — any new query silently missing its oracle fails here."""
    import bench as bench_mod

    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert set(bench_mod.BENCH_QUERIES) <= qs
    assert set(bench_mod.EXT_QUERIES) <= qs
    assert not set(bench_mod.EXT_QUERIES) & set(bench_mod.BENCH_QUERIES)
    assert oracles <= qs
    # documented-by-design rows-only entries (COVERAGE.md): simhash's
    # 60-bit sampling (gated by its md5 bit-equal twin), the two
    # recall-gated ANN variants, and the two BPE-priced queries
    # (ranked greedy merges aren't ANSI-SQL; gated by the in-suite
    # pure-Python twin, tests/test_bpe.py)
    assert qs - oracles == {
        "dedup_simhash", "knn_ivf", "knn_pq",
        "pack_sequences_bpe", "transcript_corpus_bpe",
    }
