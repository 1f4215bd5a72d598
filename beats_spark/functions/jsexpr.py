"""Beats `script` processor: restricted-JavaScript → Catalyst transpiler.

The reference embeds a full JS engine and runs ``process(event)`` per
event (libbeat/processors/script/javascript/javascript.go:51; event
API Put/Get/Delete/Rename/Tag/Cancel/AppendTo in beatevent_v0.go).
Per-row interpretation is exactly what this engine refuses to do — so
instead the COMMON grammar those scripts actually use is parsed ONCE
at plan build and compiled to column expressions. The result executes
inside whole-stage codegen at full JVM speed; anything beyond the
subset is rejected at build time with a precise error (fail-fast, like
the reference's own compile-time script check), and the ``lang: sql``
surface remains for everything else.

Supported statements (inside ``function process(event) { ... }``)::

    event.Put("field", EXPR);
    event.Delete("field");              // top level only
    event.Rename("from", "to");        // top level only
    event.Tag("tagname");
    event.AppendTo("field", EXPR);
    event.Cancel();                     // drop the row
    var x = EXPR;                       // plan-time alias
    if (EXPR) { ... } [else { ... }]    // nestable
    return; / return event;             // no-ops

Expressions: string/number/bool/null literals, ``event.Get("f")``,
local vars, ``+ - * / %``, comparisons, ``&& || !``, ternary,
parentheses, ``String(x)``, ``parseInt/parseFloat``, ``Math.floor/
ceil/abs/round``, and string methods ``toLowerCase/toUpperCase/trim/
includes/startsWith/endsWith`` plus the ``length`` property.

JS semantics preserved where they matter: ``Get`` reads the CURRENT
event state (earlier Puts visible), ``+`` concatenates when either
side is a string, missing fields read as null, statements apply in
order, ``Cancel`` inside an ``if`` drops only matching rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JsSubsetError(ValueError):
    """The script uses JS outside the supported subset."""


# -- tokenizer --------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<comment>//[^\n]*|/\*.*?\*/)
      | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<number>\d+(?:\.\d+)?)
      | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
      | (?P<punct>===|!==|==|!=|<=|>=|&&|\|\||[-+*/%!<>=(){},.;?:])
    )""",
    re.VERBOSE | re.DOTALL,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise JsSubsetError(f"unrecognized JS at: {src[pos:pos + 30]!r}")
        pos = m.end()
        for kind in ("string", "number", "ident", "punct"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.encode().decode("unicode_escape")


# -- value wrapper (tracks stringishness for the `+` operator) --------------


@dataclass
class _Val:
    col: Column
    is_str: bool
    is_null: bool = False  # the `null` literal (for ==/!= null guards)


def _num(v: _Val) -> Column:
    """Numeric view of an operand for arithmetic / mixed comparisons.

    String-typed values are ``try_cast`` to double so malformed input
    yields NULL instead of an ANSI CAST_INVALID_INPUT job abort — the
    JS semantics are ``Number('abc') === NaN`` and NaN-poisoned
    arithmetic, which NULL models faithfully under tag-and-continue.
    """
    return v.col.try_cast("double") if v.is_str else v.col


# -- parser / compiler ------------------------------------------------------


class _Compiler:
    def __init__(self, df: DataFrame, toks: list[tuple[str, str]]):
        self.df = df
        self.toks = toks
        self.i = 0
        self.dtypes = dict(df.dtypes)
        self.env: dict[str, _Val] = {}  # pending Puts
        self.vars: dict[str, _Val] = {}  # var aliases
        self.drops: list[str] = []
        self.tags: list[tuple[str, Column | None]] = []
        self.cancel: Column | None = None

    # token helpers
    def _peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, value: str):
        kind, v = self._next()
        if v != value:
            raise JsSubsetError(f"expected {value!r}, got {v!r}")

    # event state
    def _cur(self, field: str) -> _Val:
        if field in self.env:
            return self.env[field]
        if field in self.df.columns:
            return _Val(F.col(field), self.dtypes.get(field) == "string")
        return _Val(F.lit(None), False)

    # ---- statements ----
    def run(self, cond: Column | None = None) -> None:
        while self._peek()[0] != "eof" and self._peek()[1] != "}":
            self.statement(cond)

    def statement(self, cond: Column | None) -> None:
        kind, v = self._peek()
        if v == ";":
            self._next()
            return
        if v == "return":
            self._next()
            if self._peek()[1] == "event":
                self._next()
            self._expect(";")
            return
        if v == "var" or v == "let" or v == "const":
            self._next()
            _, name = self._next()
            self._expect("=")
            self.vars[name] = self.expr()
            self._expect(";")
            return
        if v == "if":
            self._next()
            self._expect("(")
            test = self.expr().col
            self._expect(")")
            self._expect("{")
            sub = test if cond is None else (cond & test)
            self.run(sub)
            self._expect("}")
            if self._peek()[1] == "else":
                self._next()
                self._expect("{")
                neg = ~F.coalesce(test, F.lit(False))
                self.run(neg if cond is None else (cond & neg))
                self._expect("}")
            return
        if v == "event":
            self._next()
            self._expect(".")
            _, method = self._next()
            self._expect("(")
            self._event_stmt(method, cond)
            self._expect(")")
            self._expect(";")
            return
        raise JsSubsetError(f"unsupported statement at {v!r}")

    def _str_arg(self) -> str:
        kind, v = self._next()
        if kind != "string":
            raise JsSubsetError(f"expected string literal, got {v!r}")
        return _unquote(v)

    def _event_stmt(self, method: str, cond: Column | None) -> None:
        if method == "Put":
            field = self._str_arg()
            self._expect(",")
            val = self.expr()
            if cond is not None:
                prev = self._cur(field)
                val = _Val(
                    F.when(cond, val.col).otherwise(prev.col),
                    val.is_str or prev.is_str,
                )
            self.env[field] = val
        elif method == "Delete":
            field = self._str_arg()
            if cond is not None:
                self.env[field] = _Val(
                    F.when(~F.coalesce(cond, F.lit(False)), self._cur(field).col),
                    self._cur(field).is_str,
                )
            else:
                self.env.pop(field, None)
                if field in self.df.columns:
                    self.drops.append(field)
        elif method == "Rename":
            src = self._str_arg()
            self._expect(",")
            dst = self._str_arg()
            if cond is not None:
                raise JsSubsetError("conditional Rename is not representable")
            self.env[dst] = self._cur(src)
            self.env.pop(src, None)
            if src in self.df.columns:
                self.drops.append(src)
        elif method == "Tag":
            self.tags.append((self._str_arg(), cond))
        elif method == "AppendTo":
            field = self._str_arg()
            self._expect(",")
            val = self.expr()
            prev = self._cur(field).col
            appended = F.array_union(
                F.coalesce(prev.cast("array<string>"), F.array().cast("array<string>")),
                F.array(val.col.cast("string")),
            )
            out = appended if cond is None else F.when(cond, appended).otherwise(prev)
            self.env[field] = _Val(out, False)
        elif method == "Cancel":
            c = F.lit(True) if cond is None else cond
            self.cancel = c if self.cancel is None else (self.cancel | c)
        else:
            raise JsSubsetError(f"unsupported event.{method}()")

    # ---- expressions (precedence climbing) ----
    def expr(self) -> _Val:
        return self._ternary()

    def _ternary(self) -> _Val:
        c = self._or()
        if self._peek()[1] == "?":
            self._next()
            a = self._ternary()
            self._expect(":")
            b = self._ternary()
            return _Val(F.when(c.col, a.col).otherwise(b.col), a.is_str or b.is_str)
        return c

    def _or(self) -> _Val:
        left = self._and()
        while self._peek()[1] == "||":
            self._next()
            right = self._and()
            left = _Val(
                F.coalesce(left.col, F.lit(False)) | F.coalesce(right.col, F.lit(False)),
                False,
            )
        return left

    def _and(self) -> _Val:
        left = self._cmp()
        while self._peek()[1] == "&&":
            self._next()
            right = self._cmp()
            left = _Val(
                F.coalesce(left.col, F.lit(False)) & F.coalesce(right.col, F.lit(False)),
                False,
            )
        return left

    def _cmp(self) -> _Val:
        left = self._add()
        op = self._peek()[1]
        if op in ("==", "===", "!=", "!==", "<", "<=", ">", ">="):
            self._next()
            right = self._add()
            # `x == null` in JS is the idiomatic missing-field guard; a
            # three-valued `col == NULL` is never true, so compile the
            # null literal to isNull()/isNotNull() instead.
            if op in ("==", "===", "!=", "!=="):
                neg = op in ("!=", "!==")
                if left.is_null and right.is_null:
                    return _Val(F.lit(neg is False), False)
                if right.is_null:
                    return _Val(left.col.isNotNull() if neg else left.col.isNull(), False)
                if left.is_null:
                    return _Val(right.col.isNotNull() if neg else right.col.isNull(), False)
            # Mixed string/non-string comparison: JS coerces the string
            # side with Number(); try_cast keeps malformed rows alive.
            if left.is_str != right.is_str:
                a, b = _num(left), _num(right)
            else:
                a, b = left.col, right.col
            out = {
                "==": a == b, "===": a == b,
                "!=": a != b, "!==": a != b,
                "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
            }[op]
            return _Val(out, False)
        return left

    def _add(self) -> _Val:
        left = self._mul()
        while self._peek()[1] in ("+", "-"):
            op = self._next()[1]
            right = self._mul()
            if op == "+" and (left.is_str or right.is_str):
                left = _Val(
                    F.concat(left.col.cast("string"), right.col.cast("string")), True
                )
            else:
                a, b = _num(left), _num(right)
                left = _Val(a + b if op == "+" else a - b, False)
        return left

    def _mul(self) -> _Val:
        left = self._unary()
        while self._peek()[1] in ("*", "/", "%"):
            op = self._next()[1]
            right = self._unary()
            a, b = _num(left), _num(right)
            col = {"*": a * b, "/": a / b, "%": a % b}[op]
            left = _Val(col, False)
        return left

    def _unary(self) -> _Val:
        if self._peek()[1] == "!":
            self._next()
            v = self._unary()
            return _Val(~F.coalesce(v.col, F.lit(False)), False)
        if self._peek()[1] == "-":
            self._next()
            v = self._unary()
            return _Val(-_num(v), False)
        return self._postfix()

    def _postfix(self) -> _Val:
        v = self._primary()
        while self._peek()[1] == ".":
            self._next()
            _, name = self._next()
            if name == "length":
                v = _Val(F.length(v.col), False)
                continue
            self._expect("(")
            args = []
            if self._peek()[1] != ")":
                args.append(self.expr())
                while self._peek()[1] == ",":
                    self._next()
                    args.append(self.expr())
            self._expect(")")
            v = self._method(v, name, args)
        return v

    def _method(self, v: _Val, name: str, args: list[_Val]) -> _Val:
        s = v.col.cast("string")
        if name == "toLowerCase":
            return _Val(F.lower(s), True)
        if name == "toUpperCase":
            return _Val(F.upper(s), True)
        if name == "trim":
            return _Val(F.trim(s), True)
        if name == "includes":
            return _Val(s.contains(args[0].col), False)
        if name == "startsWith":
            return _Val(s.startswith(args[0].col), False)
        if name == "endsWith":
            return _Val(s.endswith(args[0].col), False)
        raise JsSubsetError(f"unsupported method .{name}()")

    def _primary(self) -> _Val:
        kind, v = self._next()
        if kind == "string":
            return _Val(F.lit(_unquote(v)), True)
        if kind == "number":
            return _Val(F.lit(float(v) if "." in v else int(v)), False)
        if v == "(":
            out = self.expr()
            self._expect(")")
            return out
        if v == "true":
            return _Val(F.lit(True), False)
        if v == "false":
            return _Val(F.lit(False), False)
        if v == "null":
            return _Val(F.lit(None), False, is_null=True)
        if v == "event":
            self._expect(".")
            _, m = self._next()
            if m != "Get":
                raise JsSubsetError(f"only event.Get() is allowed in expressions, got event.{m}")
            self._expect("(")
            field = self._str_arg()
            self._expect(")")
            return self._cur(field)
        if v == "String":
            self._expect("(")
            inner = self.expr()
            self._expect(")")
            return _Val(inner.col.cast("string"), True)
        if v in ("parseInt", "parseFloat"):
            self._expect("(")
            inner = self.expr()
            self._expect(")")
            t = "long" if v == "parseInt" else "double"
            return _Val(inner.col.try_cast(t), False)
        if v == "Math":
            self._expect(".")
            _, fn = self._next()
            self._expect("(")
            inner = self.expr()
            self._expect(")")
            fns = {"floor": F.floor, "ceil": F.ceil, "abs": F.abs, "round": F.round}
            if fn not in fns:
                raise JsSubsetError(f"unsupported Math.{fn}()")
            return _Val(fns[fn](inner.col), False)
        if kind == "ident" and v in self.vars:
            return self.vars[v]
        raise JsSubsetError(f"unsupported expression at {v!r}")


_BODY_RE = re.compile(
    r"function\s+process\s*\(\s*[A-Za-z_$][\w$]*\s*\)\s*\{", re.DOTALL
)


def extract_process_body(source: str) -> str:
    """The body of ``function process(event) { ... }`` (brace-matched,
    string-aware enough for the supported subset)."""
    m = _BODY_RE.search(source)
    if not m:
        raise JsSubsetError("script must define function process(event) { ... }")
    depth, i = 1, m.end()
    while i < len(source) and depth:
        ch = source[i]
        if ch in "'\"":
            q = ch
            i += 1
            while i < len(source) and source[i] != q:
                i += 2 if source[i] == "\\" else 1
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        i += 1
    if depth:
        raise JsSubsetError("unbalanced braces in process()")
    return source[m.end() : i - 1]


def compile_js(df: DataFrame, source: str) -> _Compiler:
    """Parse+compile a process() script against ``df``'s schema.
    Returns the compiler carrying env/drops/tags/cancel."""
    body = extract_process_body(source)
    comp = _Compiler(df, _tokenize(body))
    comp.run()
    if comp._peek()[0] != "eof":
        raise JsSubsetError(f"trailing tokens at {comp._peek()[1]!r}")
    return comp
