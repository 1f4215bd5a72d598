"""Field-mutation processors (the Beats "actions" family).

Each class cites the reference implementation whose observable
behavior it reproduces; execution is columnar Spark expressions, fused
by whole-stage codegen — nothing here shuffles or leaves the JVM.

Nested targets: the reference writes dot-paths into a nested map; on
the relational schema a dot-path ``a.b`` flattens to column ``a_b``
(see SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.operators.base import (
    Processor,
    ProcessorConfigError,
    Updates,
    add_flag,
    register,
)


def _flat(path: str) -> str:
    return path.replace(".", "_").replace("@", "")


@register
class AddFields(Processor):
    """add_fields: DeepUpdate literal values under ``target`` (default
    ``fields``, "" = event root), overwrite=true.
    Ref: libbeat/processors/actions/addfields/add_fields.go:46-87."""

    name = "add_fields"

    def updates(self, df: DataFrame) -> Updates:
        target = self.cfg.get("target", "fields")
        fields: dict[str, Any] = self.cfg.get("fields", {})
        out: dict[str, Any] = {}

        def walk(prefix: str, obj: Any) -> None:
            if isinstance(obj, dict):
                for k, v in obj.items():
                    walk(f"{prefix}_{k}" if prefix else k, v)
            else:
                out[_flat(prefix)] = F.lit(obj)

        walk(_flat(target), fields)
        return Updates(set=out)


@register
class AddTags(Processor):
    """add_tags: append tags to an array field, deduplicated.
    Ref: libbeat/processors/actions/add_tags.go:77 (AddTagsWithKey)."""

    name = "add_tags"

    def updates(self, df: DataFrame) -> Updates:
        target = _flat(self.cfg.get("target", "tags"))
        tags = [F.lit(t) for t in self.cfg["tags"]]
        existing = (
            F.coalesce(F.col(target), F.array().cast("array<string>"))
            if target in df.columns
            else F.array().cast("array<string>")
        )
        return Updates(set={target: F.array_union(existing, F.array(*tags))})


@register
class AddLabels(Processor):
    """add_labels: flattened literal labels under ``labels``.
    Ref: libbeat/processors/actions/add_labels.go."""

    name = "add_labels"

    def updates(self, df: DataFrame) -> Updates:
        return AddFields({"target": "labels", "fields": self.cfg["labels"]}).updates(df)


@register
class Rename(Processor):
    """rename: list of {from,to}; the target must not already exist and
    the source must exist (unless ignore_missing).
    Ref: libbeat/processors/actions/rename.go:34-196.

    The reference validates per event at runtime; on a fixed schema we
    validate once at plan build — same rejection, earlier."""

    name = "rename"

    def updates(self, df: DataFrame) -> Updates:
        ignore_missing = self.cfg.get("ignore_missing", False)
        renames: list[tuple[str, str]] = []
        cols = set(df.columns)
        for spec in self.cfg["fields"]:
            src, dst = _flat(spec["from"]), _flat(spec["to"])
            if src not in cols:
                if ignore_missing:
                    continue
                raise ProcessorConfigError(f"rename: source column {src!r} missing")
            if dst in cols:
                raise ProcessorConfigError(f"rename: target column {dst!r} exists")
            cols.discard(src)
            cols.add(dst)
            renames.append((src, dst))
        return Updates(renames=renames)


@register
class CopyFields(Processor):
    """copy_fields: copy value from→to; no overwrite unless configured.
    Ref: libbeat/processors/actions/copy_fields.go:71."""

    name = "copy_fields"

    def updates(self, df: DataFrame) -> Updates:
        out = {}
        for spec in self.cfg["fields"]:
            src, dst = _flat(spec["from"]), _flat(spec["to"])
            if dst in df.columns and not self.cfg.get("overwrite", False):
                if self.cfg.get("fail_on_error", True):
                    raise ProcessorConfigError(f"copy_fields: target {dst!r} exists")
                continue
            out[dst] = F.col(src)
        return Updates(set=out)


@register
class MoveFields(Processor):
    """move_fields: re-parent listed keys under a prefix.
    Ref: libbeat/processors/move_fields/move_fields.go:52."""

    name = "move_fields"

    def updates(self, df: DataFrame) -> Updates:
        prefix = _flat(self.cfg.get("to", ""))
        fields = self.cfg.get("fields", [])
        renames = []
        for f_ in fields:
            src = _flat(f_)
            if src in df.columns:
                renames.append((src, f"{prefix}_{src}" if prefix else src))
        return Updates(renames=renames)


@register
class DropFields(Processor):
    """drop_fields: delete listed fields; error if missing unless
    ignore_missing. Ref: libbeat/processors/actions/drop_fields.go:99."""

    name = "drop_fields"

    # the timestamp cannot be deleted (event.go:64-70) and mandatory
    # exported fields are silently filtered from the drop list
    # (drop_fields.go:68-77); ts is this schema's @timestamp
    PROTECTED = ["ts"]

    def updates(self, df: DataFrame) -> Updates:
        drop = []
        for f_ in self.cfg["fields"]:
            c = _flat(f_)
            if c in self.PROTECTED:
                continue
            if c not in df.columns:
                if self.cfg.get("ignore_missing", False):
                    continue
                raise ProcessorConfigError(f"drop_fields: column {c!r} missing")
            drop.append(c)
        return Updates(drop=drop)


@register
class IncludeFields(Processor):
    """include_fields: whitelist projection; mandatory event columns
    (timestamp, routing/meta, flags) always survive, mirroring the
    reference keeping @timestamp/type/@metadata.
    Ref: libbeat/processors/actions/include_fields.go:70."""

    name = "include_fields"

    # _bucket/_ckpt_bucket are pipeline infrastructure: dropping them
    # mid-chain would desync the checkpointed writer's partitioning
    # from its chunk selection (plans/lineage.py)
    MANDATORY = [
        "ts", "_meta_sink", "flags", "error_message",
        "_bucket", "_ckpt_bucket",
    ]

    def updates(self, df: DataFrame) -> Updates:
        keep = [_flat(f_) for f_ in self.cfg["fields"]]
        for m in self.MANDATORY:
            if m in df.columns and m not in keep:
                keep.append(m)
        return Updates(keep=keep)


@register
class TruncateFields(Processor):
    """truncate_fields: cut to max_characters (codepoints) or
    max_bytes (UTF-8 octets — true byte slice, may split a multibyte
    rune exactly like the reference's truncateBytes), flag
    ``truncated``. Ref: libbeat/processors/actions/truncate_fields.go:84,
    semantics table truncate_fields_test.go:41-120."""

    name = "truncate_fields"

    def updates(self, df: DataFrame) -> Updates:
        chars = self.cfg.get("max_characters")
        nbytes = self.cfg.get("max_bytes")
        if not chars and not nbytes:
            raise ProcessorConfigError("truncate_fields needs max_characters/max_bytes")
        out = {}
        truncated_any = F.lit(False)
        for f_ in self.cfg["fields"]:
            c = _flat(f_)
            if c not in df.columns:
                continue
            if chars:
                over = F.length(F.col(c)) > int(chars)
                cut = F.substring(F.col(c), 1, int(chars))
            else:
                over = F.octet_length(F.col(c)) > int(nbytes)
                cut = F.substring(F.col(c).cast("binary"), 1, int(nbytes)).cast(
                    "string"
                )
            truncated_any = truncated_any | F.coalesce(over, F.lit(False))
            out[c] = F.when(F.coalesce(over, F.lit(False)), cut).otherwise(F.col(c))
        out["flags"] = add_flag(df, "truncated", truncated_any)
        return Updates(set=out)


@register
class Replace(Processor):
    """replace: regex replacement per field.
    Ref: libbeat/processors/actions/replace.go:84."""

    name = "replace"

    def updates(self, df: DataFrame) -> Updates:
        out = {}
        for spec in self.cfg["fields"]:
            c = _flat(spec["field"])
            if c not in df.columns and self.cfg.get("ignore_missing", False):
                continue
            out[c] = F.regexp_replace(F.col(c), spec["pattern"], spec["replacement"])
        return Updates(set=out)


class _AlterCase(Processor):
    """lowercase/uppercase: the reference alters field NAMES and, via
    ``values``, listed string values (actions/alterFieldProcessor.go:30-91).
    Name-casing is a plan-time rename here; ``values`` casing is a
    column expression."""

    _fn = staticmethod(F.lower)

    def updates(self, df: DataFrame) -> Updates:
        renames = []
        for f_ in self.cfg.get("fields", []):
            src = _flat(f_)
            dst = self._case(src)
            if src in df.columns and dst != src:
                renames.append((src, dst))
        out = {}
        for f_ in self.cfg.get("values", []):
            c = _flat(f_)
            if c in df.columns:
                out[c] = self._fn(F.col(c))
            elif not self.cfg.get("ignore_missing", False):
                raise ProcessorConfigError(f"{self.name}: column {c!r} missing")
        return Updates(set=out, renames=renames)

    def _case(self, s: str) -> str:
        return s.lower()


@register
class Lowercase(_AlterCase):
    name = "lowercase"
    _fn = staticmethod(F.lower)


@register
class Uppercase(_AlterCase):
    name = "uppercase"
    _fn = staticmethod(F.upper)

    def _case(self, s: str) -> str:
        return s.upper()


@register
class Append(Processor):
    """append: concatenate source-field values and literal values onto a
    target array; optional de-dup (allow_duplicate=false).
    Ref: libbeat/processors/actions/append.go:77."""

    name = "append"

    def updates(self, df: DataFrame) -> Updates:
        target = _flat(self.cfg["target_field"])
        parts = []
        if target in df.columns:
            base = F.col(target)
            base = F.when(base.isNotNull(), base).otherwise(F.array().cast("array<string>"))
            parts.append(base)
        for f_ in self.cfg.get("fields", []):
            c = _flat(f_)
            if c in df.columns:
                parts.append(F.array(F.col(c).cast("string")))
        values = [F.lit(str(v)) for v in self.cfg.get("values", [])]
        if values:
            parts.append(F.array(*values))
        if not parts:
            raise ProcessorConfigError("append: nothing to append")
        merged = parts[0]
        for p in parts[1:]:
            merged = F.concat(merged, p)
        if not self.cfg.get("allow_duplicate", True):
            merged = F.array_distinct(merged)
        return Updates(set={target: merged})


@register
class AddId(Processor):
    """add_id: random ES-style id. Non-deterministic by nature — excluded
    from equality-checked paths. Ref: libbeat/processors/add_id/add_id.go:64."""

    name = "add_id"

    def updates(self, df: DataFrame) -> Updates:
        target = _flat(self.cfg.get("target_field", "meta._id"))
        return Updates(set={target: F.expr("uuid()")})
