"""Processor framework: registry, chain builder, Beats error semantics.

The reference runs events one at a time through a processor chain
(libbeat/publisher/processing/processors.go:130-155) with three rules
we preserve on the relational plan:

1. processors run in declared order;
2. a processor may DROP rows (drop_event) — short-circuit for that row;
3. a processor failure on a row must NOT kill the row — it is tagged
   (``flags`` array gets an error tag, details to ``error_message``)
   and keeps flowing (tag-and-continue, processors.go:140-148;
   FlagField convention libbeat/beat/event.go:38).

Every processor accepts a ``when:`` condition (conditionals.go:160-179):
when false the row passes through unchanged — compiled here as
``F.when(cond, new).otherwise(old)`` per affected column so the whole
chain stays one narrow Catalyst stage (no shuffles, fully fused by
whole-stage codegen).

The registry is keyed by the reference's config names so a pipeline
config reads like a Beats YAML ``processors:`` block::

    chain = build_chain([
        {"add_fields": {"target": "", "fields": {"env": "prod"}}},
        {"dissect": {"tokenizer": "...", "field": "text"}},
        {"drop_event": {"when": {"equals": {"level": "debug"}}}},
    ])
    df = chain(df)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.functions.conditions import compile_condition

FLAGS_COL = "flags"  # mirrors the reference's `log.flags` (event.go:38)
ERROR_COL = "error_message"  # mirrors `error.message` (event.go:303-316)


class ProcessorConfigError(ValueError):
    """Raised at plan-build time for configs the reference would reject."""


@dataclass
class Updates:
    """The column-level effect of one processor on a DataFrame.

    ``set``     — columns to set/add (order preserved, later wins).
    ``drop``    — columns to remove.
    ``renames`` — (src, dst) pairs: dst := src, src removed.
    ``keep``    — whitelist projection (include_fields); None = all.
    ``remove_rows`` — predicate of rows to drop (drop_event).
    """

    set: dict[str, Column] = dc_field(default_factory=dict)
    drop: list[str] = dc_field(default_factory=list)
    renames: list[tuple[str, str]] = dc_field(default_factory=list)
    keep: list[str] | None = None
    remove_rows: Column | None = None


def flags_base(df: DataFrame) -> Column:
    """The current flags column expression (NULL literal if absent)."""
    return (
        F.col(FLAGS_COL)
        if FLAGS_COL in df.columns
        else F.lit(None).cast("array<string>")
    )


def append_flag(existing: Column, tag: str, cond: Column) -> Column:
    """flags := flags + [tag] where cond, building on an arbitrary
    flags expression — chainable so one processor can tag several
    failure modes in a single column expression."""
    base = F.coalesce(existing, F.array().cast("array<string>"))
    return F.when(
        F.coalesce(cond, F.lit(False)), F.array_union(base, F.array(F.lit(tag)))
    ).otherwise(existing)


def add_flag(df: DataFrame, tag: str, cond: Column) -> Column:
    """flags := flags + [tag] where cond (append, reference appends to
    the `log.flags` array — dissect/processor.go:106-118)."""
    return append_flag(flags_base(df), tag, cond)


class Processor:
    """Base class. Subclasses set ``name`` and implement ``updates``
    (preferred — enables when-guard composition) or override ``apply``.
    """

    name: str = ""

    def __init__(self, cfg: dict[str, Any]):
        self.cfg = dict(cfg)
        self.when = self.cfg.pop("when", None)

    # -- contract --------------------------------------------------------
    def updates(self, df: DataFrame) -> Updates:  # pragma: no cover
        raise NotImplementedError

    def apply(self, df: DataFrame) -> DataFrame:
        cond = compile_condition(df, self.when) if self.when else None
        return apply_updates(df, self.updates(df), cond)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


def apply_updates(df: DataFrame, upd: Updates, cond: Column | None) -> DataFrame:
    """Apply an Updates block, guarded by an optional when-condition.

    Unconditional path uses plain withColumns/drop/select. Conditional
    schema changes (rename/drop under when) are expressed as row-level
    nulling since a relational schema cannot differ per row: the column
    exists for all rows, holds null where the change applied.
    """
    if upd.remove_rows is not None:
        pred = upd.remove_rows if cond is None else (cond & upd.remove_rows)
        df = df.filter(~F.coalesce(pred, F.lit(False)))

    if upd.set:
        if cond is None:
            df = df.withColumns(upd.set)
        else:
            guarded = {}
            for name, expr in upd.set.items():
                if name in df.columns:
                    guarded[name] = F.when(cond, expr).otherwise(F.col(name))
                else:
                    guarded[name] = F.when(cond, expr)
            df = df.withColumns(guarded)

    for src, dst in upd.renames:
        if cond is None:
            df = df.withColumn(dst, F.col(src)).drop(src)
        else:
            df = df.withColumn(dst, F.when(cond, F.col(src))).withColumn(
                src, F.when(~cond, F.col(src))
            )

    if upd.drop:
        if cond is None:
            df = df.drop(*upd.drop)
        else:
            df = df.withColumns(
                {c: F.when(~cond, F.col(c)) for c in upd.drop if c in df.columns}
            )

    if upd.keep is not None:
        if cond is not None:
            raise ProcessorConfigError("include_fields cannot be conditional")
        df = df.select(*[c for c in upd.keep if c in df.columns])

    return df


# -- registry -------------------------------------------------------------

REGISTRY: dict[str, type[Processor] | Callable[[dict], Processor]] = {}


def register(cls: type[Processor]) -> type[Processor]:
    REGISTRY[cls.name] = cls
    return cls


def make_processor(config_item: dict[str, Any]) -> Processor:
    """One config item = exactly one action key (+ optional ``if``),
    mirroring processors.New (libbeat/processors/processor.go:88-120)."""
    if "if" in config_item:
        from beats_spark.operators.conditionals import IfThenElse

        return IfThenElse(config_item)
    if len(config_item) != 1:
        raise ProcessorConfigError(
            f"each processor config needs exactly one action key, got {list(config_item)}"
        )
    name, cfg = next(iter(config_item.items()))
    if name not in REGISTRY:
        raise ProcessorConfigError(f"unknown processor {name!r}")
    return REGISTRY[name](cfg or {})


def build_chain(configs: list[dict[str, Any]]) -> Callable[[DataFrame], DataFrame]:
    """Compile a processors list once into a DataFrame→DataFrame function
    (the reference's construction-time chain build, registry.go:30-39)."""
    procs = [make_processor(c) for c in configs]

    def chain(df: DataFrame) -> DataFrame:
        for p in procs:
            df = p(df)
        return df

    chain.processors = procs  # type: ignore[attr-defined]
    return chain
