"""Schema-contract audit operators (operators/contracts.py).

The contract query `schema_drift` (oracle-checked, in-suite parity)
exercises the macro behavior; these tests pin the micro-semantics the
fixture can't isolate — dominant-class tie-breaks, denominator
accounting, key-set algebra — and the plan shape (the only cross joins
are the documented bounded broadcast grids, never a CartesianProduct).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.contracts import (
    batch_payload_stats,
    json_schema_profile,
    schema_drift,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "batch long, props string")


def _report(spark, rows, base_batch=0):
    out = schema_drift(_frame(spark, rows), "props", "batch", base_batch)
    return {(r["batch"], r["key"]): r.asDict() for r in out.collect()}


def test_drift_flags_and_ppm_exact(spark):
    rows = [
        # baseline: a always (num), b always (str)
        (0, '{"a":1,"b":"x"}'),
        (0, '{"a":2,"b":"y"}'),
        # batch 1: a in 1 of 2 valid rows, b flips to num, c appears,
        # one malformed row and one NULL payload (neither in n_valid)
        (1, '{"a":3,"b":7,"c":true}'),
        (1, '{"b":8}'),
        (1, "{bad"),
        (1, None),
    ]
    rep = _report(spark, rows)
    a = rep[(1, "a")]
    assert a["present"] == 1 and a["rows"] == 4
    assert a["presence_ppm"] == 500_000  # denominator is the 2 VALID rows
    assert a["presence_delta_ppm"] == -500_000
    assert not a["new_key"] and not a["dropped_key"] and not a["type_changed"]
    b = rep[(1, "b")]
    assert b["type_changed"] and b["cls"] == "num" and b["base_cls"] == "str"
    c = rep[(1, "c")]
    assert c["new_key"] and c["cls"] == "bool" and c["base_cls"] == "absent"
    assert c["base_ppm"] == 0 and c["presence_delta_ppm"] == 500_000
    assert all(r["malformed"] == 1 for r in rep.values())


def test_dropped_key_row_is_synthesized_from_baseline(spark):
    rows = [(0, '{"a":1}'), (1, '{"z":"s"}')]
    rep = _report(spark, rows)
    a = rep[(1, "a")]
    assert a["dropped_key"] and a["cls"] == "absent" and a["present"] == 0
    assert a["presence_delta_ppm"] == -1_000_000
    assert not a["type_changed"]  # absent is not a type change
    assert rep[(1, "z")]["new_key"]


def test_dominant_class_tiebreak_is_rank_not_order(spark):
    # equal str/num counts for k: the tie must resolve to the HIGHER
    # CLASS_RANK ('str' = 3 > 'num' = 2) in every partitioning, never
    # to whichever aggregate bucket an engine happens to fold first
    rows = [
        (0, '{"k":1}'),
        (1, '{"k":1}'),
        (1, '{"k":"s"}'),
        (1, '{"k":2}'),
        (1, '{"k":"t"}'),
    ]
    rep = _report(spark, rows)
    assert rep[(1, "k")]["cls"] == "str"
    assert rep[(1, "k")]["type_changed"]


def test_json_null_and_nested_classes(spark):
    rows = [
        (0, '{"g":null,"d":[1],"o":{"e":1}}'),
        (1, '{"g":null,"d":[1],"o":{"e":1}}'),
    ]
    rep = _report(spark, rows)
    assert rep[(1, "g")]["cls"] == "null"
    assert rep[(1, "d")]["cls"] == "arr"
    assert rep[(1, "o")]["cls"] == "obj"
    assert not any(r["type_changed"] for r in rep.values())


def test_profile_and_stats_grains(spark):
    df = _frame(
        spark,
        [(0, '{"a":1}'), (0, "[1]"), (0, '"str"'), (0, "{bad"), (0, None)],
    )
    stats = {r["batch"]: r.asDict() for r in
             batch_payload_stats(df, "props", "batch").collect()}
    # non-object JSON ('[1]', '"str"') breaks the object contract just
    # like malformed text; NULL payloads are counted apart
    assert stats[0] == {
        "batch": 0, "rows": 5, "n_valid": 1, "malformed": 3, "n_null_props": 1
    }
    prof = json_schema_profile(df, "props", "batch").collect()
    assert [(r["batch"], r["key"], r["present"]) for r in prof] == [(0, "a", 1)]


def test_drift_plan_has_no_cartesian_product(spark, sf_dir_small=None):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["schema_drift"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the two dimension grids must ride broadcast, not shuffle
    assert plan.count("BroadcastNestedLoopJoin") <= 2
