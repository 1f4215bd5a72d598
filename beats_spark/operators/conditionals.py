"""Conditional processors: drop_event and if/then/else.

Ref: libbeat/processors/actions/drop_event.go:30-46 (a drop_event
without ``when`` drops everything — "only useful under a condition"),
libbeat/processors/conditionals.go:181-268 (IfThenElseProcessor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.functions.conditions import compile_condition
from beats_spark.operators.base import Processor, Updates, register


@register
class DropEvent(Processor):
    """drop_event: removes rows matching ``when`` (all rows if absent).
    Compiles to ``df.filter(~cond)`` — Catalyst pushes it into the scan
    when the condition touches only source columns."""

    name = "drop_event"

    def updates(self, df: DataFrame) -> Updates:
        return Updates(remove_rows=F.lit(True))


@register
class IncludeMessage(Processor):
    """include_message: the reader-chain FilterParser as a processor —
    keep rows whose ``field`` (default ``message``) matches ANY of
    ``patterns`` (unanchored regex), drop the rest; NULL never matches.

    Ref: libbeat/reader/filter/filter.go:32-47 (matchAny over the
    configured match.Matcher list decides keep/drop), registered under
    the parser name of libbeat/reader/parser/parser.go:126-131. The
    rlike disjunction is a plain codegen filter, so Catalyst pushes it
    toward the scan."""

    name = "include_message"

    def updates(self, df: DataFrame) -> Updates:
        from beats_spark.functions.conditions import include_message_keep

        col = F.col(self.cfg.get("field", "message"))
        keep = include_message_keep(col, self.cfg.get("patterns"))
        return Updates(remove_rows=~keep)


class IfThenElse(Processor):
    """{"if": cond, "then": [...], "else": [...]}.

    Row-level branch on a shared schema: ``then`` effects apply where
    cond, ``else`` effects where ~cond — each branch chain is compiled
    with the branch predicate as its when-guard, so the whole construct
    stays one narrow stage."""

    name = "if"

    def __init__(self, cfg):
        self.cond_cfg = cfg["if"]
        self.then_cfgs = cfg.get("then", [])
        self.else_cfgs = cfg.get("else", [])

    def apply(self, df: DataFrame) -> DataFrame:
        from beats_spark.operators.base import make_processor

        cond = compile_condition(df, self.cond_cfg)
        # Branch rows can't see each other's mutations; stamp the branch
        # once so chained branch processors observe a stable predicate
        # even if they mutate columns the condition reads.
        marker = "_if_branch"
        df = df.withColumn(marker, F.coalesce(cond, F.lit(False)))
        for cfgs, positive in ((self.then_cfgs, True), (self.else_cfgs, False)):
            for c in cfgs:
                p = make_processor(c)
                branch = F.col(marker) if positive else ~F.col(marker)
                inner_when = p.when
                if inner_when is not None:
                    # combine with the processor's own when
                    from beats_spark.operators.base import apply_updates

                    guard = branch & compile_condition(df, inner_when)
                    df = apply_updates(df, p.updates(df), guard)
                else:
                    from beats_spark.operators.base import apply_updates

                    df = apply_updates(df, p.updates(df), branch)
        return df.drop(marker)
