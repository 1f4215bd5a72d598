"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, compares row count, column
names, and order-insensitive values (columns sorted by name, rows
sorted), and prints one PASS/FAIL line per query.

Usage: python scripts/parity.py [sf_dir] [query ...] [--json=PATH]

``--json=PATH`` additionally writes a CORRECTNESS_r*-shaped JSON file
(per-query rows/schema/values match booleans) — the round's local
evidence artifact.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from beats_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--json=")]
    json_args = [a for a in sys.argv[1:] if a.startswith("--json=")]
    json_out = json_args[0].split("=", 1)[1] if json_args else None
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            results[name] = {"err": f"spark: {ex}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            results[name] = {"rows_only": True, "spark_rows": len(srows),
                             "err": None}
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
                results[name]["err"] = "zero rows"
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            results[name] = {"err": f"duckdb: {ex}"}
            failures += 1
            continue
        rec = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": False,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": None,
        }
        results[name] = rec
        if not rec["schema_match"]:
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            failures += 1
            continue
        if not rec["rows_match"]:
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            failures += 1
            continue
        a = normalize(srows, scols)
        b = normalize(drows, dcols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            failures += 1
            continue
        rec["hash_match"] = True
        print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(results, f, indent=2)
        print(f"wrote {json_out}")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
