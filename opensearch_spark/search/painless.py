"""Painless expression subset → Spark-SQL expression compiler.

Reference: the default scripting language for `script_score`, `script`
queries/sorts/fields is Painless (``modules/lang-painless/``, wired via
``script/ScriptService.java``; ``ScriptScoreQueryBuilder.java`` and
``ScriptQueryBuilder.java`` accept ``{"source": ..., "lang": "painless",
"params": {...}}``). A user migrating from the reference writes Painless,
not SQL — this module compiles the expression subset that covers the
reference's own documented examples into a Spark-SQL string, so the
script stays a Catalyst expression inside whole-stage codegen (the
performance-correct path: a Painless interpreter as a pandas UDF would
drop every scripted query out of the JVM).

Supported subset (one expression, no statements — the shape of every
scoring script in the reference docs and rest-api-spec tests):

- doc access: ``doc['f'].value``, ``doc["f"].value``, ``doc.f.value``,
  ``doc['f'].size()``, ``doc['f'].length()`` (string length),
  ``doc['f'].value.length()``, ``doc['f'].value.contains(x)``
- ``params.x`` / ``params['x']`` — inlined as typed literals at compile
  time (exactly what the reference does: params are per-request
  constants, and inlining keeps the whole expression foldable)
- ``_score`` — the enclosing query's score column
- operators with Java precedence: ``?:`` (ternary, right-assoc), ``||``,
  ``&&``, ``== !=``, ``< <= > >=``, ``+ -``, ``* / %``, unary ``- !``,
  parentheses
- ``Math.log/log10/sqrt/abs/exp/floor/ceil/pow/max/min``, ``Math.E``,
  ``Math.PI``
- string methods on any value: ``.length()``, ``.contains(s)``,
  ``.startsWith(s)``, ``.endsWith(s)``, ``.toLowerCase()``,
  ``.toUpperCase()``, ``.equals(s)`` (→ ``=``)
- literals: ints, doubles, single- or double-quoted strings, ``true``,
  ``false``, ``null``

Documented divergence: ``/`` compiles to SQL division, which returns a
DOUBLE for integer operands (Painless/Java long/long truncates). Scripts
relying on integer-truncating division must write
``Math.floor(a / b)`` explicitly — the compiler cannot see column types,
so it cannot decide Java vs SQL semantics per expression.

The emitted SQL deliberately sticks to functions DuckDB also implements
with identical semantics (ln, log10, sqrt, abs, exp, floor, ceil, power,
greatest, least, length, contains, instr, lower, upper) so a gate's
DuckDB oracle can reuse the translation verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(r"""
    (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?[fFdD]?|\d+(?:[eE][+-]?\d+)?[fFdDlL]?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op>\?|:|\|\||&&|==|!=|<=|>=|<|>|\+|-|\*|/|%|!|\(|\)|\[|\]|\.|,)
  | (?P<ws>\s+)
""", re.VERBOSE)

_MATH_FNS = {
    "log": "ln", "log10": "log10", "sqrt": "sqrt", "abs": "abs",
    "exp": "exp", "floor": "floor", "ceil": "ceil", "pow": "power",
    "max": "greatest", "min": "least",
}
_MATH_CONSTS = {"E": "2.718281828459045", "PI": "3.141592653589793"}


@dataclass
class _Tok:
    kind: str
    text: str


def _lex(src: str) -> list[_Tok]:
    out: list[_Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"painless: bad character at {i}: {src[i:i+10]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append(_Tok(kind, m.group()))
    return out


def _sql_str(s: str) -> str:
    """Portable single-quoted SQL string. Spark's parser interprets
    backslash escapes inside '...' while DuckDB does not, so a literal
    backslash can't be spelled the same way in both — emit it via
    ``chr(92)`` concat parts instead (identical semantics in both
    engines, keeps the emitted SQL a valid DuckDB oracle verbatim)."""
    def q(part: str) -> str:
        return "'" + part.replace("'", "''") + "'"

    if "\\" not in s:
        return q(s)
    parts: list[str] = []
    for i, seg in enumerate(s.split("\\")):
        if i:
            parts.append("chr(92)")
        if seg:
            parts.append(q(seg))
    if len(parts) == 1:
        return parts[0]
    return "concat(" + ", ".join(parts) + ")"


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # a bare `100.0` literal parses as DECIMAL in Spark SQL, but a
        # Painless double param means double arithmetic (Java semantics) —
        # emit an explicit DOUBLE so mixed expressions stay double-typed
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, int):
        return repr(v)
    return _sql_str(str(v))


class _Parser:
    """Recursive-descent over the token stream, emitting SQL fragments.

    Every emit site parenthesizes compound results, so Java precedence is
    preserved structurally regardless of SQL precedence quirks."""

    def __init__(self, toks: list[_Tok], params: dict, score_col: str):
        self.toks = toks
        self.i = 0
        self.params = params
        self.score_col = score_col

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> _Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def eat(self, text: str | None = None, kind: str | None = None) -> _Tok:
        t = self.peek()
        if t is None:
            raise ValueError("painless: unexpected end of expression")
        if text is not None and t.text != text:
            raise ValueError(f"painless: expected {text!r}, got {t.text!r}")
        if kind is not None and t.kind != kind:
            raise ValueError(f"painless: expected {kind}, got {t.text!r}")
        self.i += 1
        return t

    def at(self, text: str) -> bool:
        t = self.peek()
        return t is not None and t.text == text

    # -- grammar ----------------------------------------------------------
    def parse(self) -> str:
        out = self.ternary()
        if self.peek() is not None:
            raise ValueError(
                f"painless: trailing tokens from {self.peek().text!r}")
        return out

    def ternary(self) -> str:
        cond = self.or_()
        if not self.at("?"):
            return cond
        self.eat("?")
        a = self.ternary()
        self.eat(":")
        b = self.ternary()
        return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"

    def _binop(self, sub, ops: dict[str, str]) -> str:
        left = sub()
        while (t := self.peek()) is not None and t.text in ops:
            self.eat(t.text)
            right = sub()
            left = f"({left} {ops[t.text]} {right})"
        return left

    def or_(self) -> str:
        return self._binop(self.and_, {"||": "OR"})

    def and_(self) -> str:
        return self._binop(self.eq, {"&&": "AND"})

    def eq(self) -> str:
        return self._binop(self.rel, {"==": "=", "!=": "<>"})

    def rel(self) -> str:
        return self._binop(self.add,
                           {"<": "<", "<=": "<=", ">": ">", ">=": ">="})

    def add(self) -> str:
        return self._binop(self.mul, {"+": "+", "-": "-"})

    def mul(self) -> str:
        return self._binop(self.unary, {"*": "*", "/": "/", "%": "%"})

    def unary(self) -> str:
        if self.at("-"):
            self.eat("-")
            return f"(- {self.unary()})"
        if self.at("!"):
            self.eat("!")
            return f"(NOT {self.unary()})"
        return self.postfix()

    def postfix(self) -> str:
        """Primary followed by any chain of ``.method(args)`` calls."""
        out = self.primary()
        while self.at("."):
            nxt = self.peek(1)
            if nxt is None or nxt.kind != "name":
                raise ValueError("painless: expected method name after '.'")
            # only consume when it really is a method call; bare members
            # are handled inside primary() (doc/params/Math chains)
            if (self.peek(2) is None or self.peek(2).text != "("):
                raise ValueError(
                    f"painless: unsupported member access .{nxt.text}")
            self.eat(".")
            name = self.eat(kind="name").text
            self.eat("(")
            args = []
            if not self.at(")"):
                args.append(self.ternary())
                while self.at(","):
                    self.eat(",")
                    args.append(self.ternary())
            self.eat(")")
            out = self._method(out, name, args)
        return out

    def _method(self, recv: str, name: str, args: list[str]) -> str:
        if name == "length" and not args:
            return f"length({recv})"
        if name == "contains" and len(args) == 1:
            return f"contains({recv}, {args[0]})"
        if name == "startsWith" and len(args) == 1:
            return f"(instr({recv}, {args[0]}) = 1)"
        if name == "endsWith" and len(args) == 1:
            a = args[0]
            return (f"(instr({recv}, {a}) > 0 AND "
                    f"instr(reverse({recv}), reverse({a})) = 1)")
        if name == "toLowerCase" and not args:
            return f"lower({recv})"
        if name == "toUpperCase" and not args:
            return f"upper({recv})"
        if name == "equals" and len(args) == 1:
            return f"({recv} = {args[0]})"
        raise ValueError(f"painless: unsupported method .{name}/{len(args)}")

    def _field_key(self) -> str:
        """doc['f'] / doc["f"] / doc.f — returns the raw field name."""
        if self.at("["):
            self.eat("[")
            t = self.eat(kind="str")
            self.eat("]")
            return t.text[1:-1]
        self.eat(".")
        return self.eat(kind="name").text

    def primary(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("painless: unexpected end of expression")
        if t.text == "(":
            self.eat("(")
            out = self.ternary()
            self.eat(")")
            return f"({out})"
        if t.kind == "num":
            txt = t.text
            self.eat(kind="num")
            if txt[-1] in "fFdDlL" and not txt[-1].isdigit():
                txt = txt[:-1]
            if "." in txt or "e" in txt or "E" in txt:
                # same rule as _lit: a bare `0.1` parses as DECIMAL in
                # Spark SQL, but Painless decimal literals are Java
                # doubles — keep mixed arithmetic double-typed
                return f"CAST({txt} AS DOUBLE)"
            return txt
        if t.kind == "str":
            self.eat(kind="str")
            raw = t.text[1:-1]
            # unescape left-to-right so `\\'` is backslash+quote, not a
            # double-processed escape
            raw = (raw.replace("\\\\", "\x00").replace("\\'", "'")
                   .replace('\\"', '"').replace("\x00", "\\"))
            return _sql_str(raw)
        if t.kind != "name":
            raise ValueError(f"painless: unexpected token {t.text!r}")
        name = t.text
        if name in ("true", "false"):
            self.eat()
            return name.upper()
        if name == "null":
            self.eat()
            return "NULL"
        if name == "_score":
            self.eat()
            return self.score_col
        if name == "doc":
            self.eat()
            field = self._field_key()
            # .value / .size() / direct method chain on the accessor
            if self.at(".") and (n := self.peek(1)) is not None \
                    and n.kind == "name":
                if n.text == "value":
                    self.eat(".")
                    self.eat("value")
                    return field
                if n.text == "size" and (p2 := self.peek(2)) is not None \
                        and p2.text == "(":
                    self.eat(".")
                    self.eat("size")
                    self.eat("(")
                    self.eat(")")
                    return f"(CASE WHEN {field} IS NULL THEN 0 ELSE 1 END)"
                # other methods (length/contains/…) apply to the value:
                # fall through to postfix() with the bare column
                return field
            return field
        if name == "params":
            self.eat()
            key = self._field_key()
            if key not in self.params:
                raise ValueError(f"painless: missing param {key!r}")
            return _lit(self.params[key])
        if name == "Math":
            self.eat()
            self.eat(".")
            m = self.eat(kind="name").text
            if m in _MATH_CONSTS and not self.at("("):
                return _MATH_CONSTS[m]
            if m not in _MATH_FNS:
                raise ValueError(f"painless: unsupported Math.{m}")
            self.eat("(")
            args = [self.ternary()]
            while self.at(","):
                self.eat(",")
                args.append(self.ternary())
            self.eat(")")
            return f"{_MATH_FNS[m]}({', '.join(args)})"
        # bare identifier: pass through as a column reference (matches the
        # engine's existing SQL-script convention, so painless mode is a
        # strict superset of what gates already send)
        self.eat()
        return name


def painless_to_sql(source: str, params: dict | None = None,
                    score_col: str = "score") -> str:
    """Compile a Painless expression to an equivalent Spark-SQL expression
    string (also valid DuckDB SQL — see module docstring)."""
    return _Parser(_lex(source), dict(params or {}), score_col).parse()


class _AnyParams(dict):
    """Permissive params map for put-time compile validation: the
    reference compiles stored scripts with no runtime params bound, so
    any params.X reference resolves to a placeholder instead of raising.
    Callers must invoke the parser directly (painless_to_sql's dict()
    copy would collapse this back into a strict dict)."""

    def __contains__(self, key):
        return True

    def __getitem__(self, key):
        return 0


def looks_like_painless(source: str) -> bool:
    """Heuristic used by the DSL parser when no explicit lang is given:
    Painless-only surface syntax that can never be valid Spark SQL.
    Deliberately excludes ``||``/``==``/``&&`` — Spark SQL accepts ``||``
    (string concat) and ``==``, so those would misroute valid SQL
    sources; an operator-only Painless script must pass ``lang:
    "painless"`` explicitly (real scripts reference doc/params/_score
    anyway, all unambiguous markers)."""
    return bool(re.search(
        r"doc\[|doc\.[A-Za-z_]\w*\.value|params\.|params\[|Math\."
        r"|(?<!\w)_score(?!\w)|\?[^?]*:", source))


# --- lang-expression (Lucene expressions) adapter -------------------------
# modules/lang-expression ExpressionScriptEngine.java compiles scripts with
# JavascriptCompiler.DEFAULT_FUNCTIONS: BARE Math function names
# (abs/ln/sqrt/...), doc['f'] with .value optional, _score, and params
# bound as BARE variables. The arithmetic surface is a subset of what the
# Painless compiler above handles, so the adapter rewrites the dialect
# (bare fn -> Math.X, bare param var -> params.X) and reuses _Parser.
# Date/geo member methods (getSeconds()/.lat etc.) are out of scope.
_EXPR_FUNC_MAP = {
    "abs": "abs", "ceil": "ceil", "exp": "exp", "floor": "floor",
    "ln": "log", "log10": "log10", "max": "max", "min": "min",
    "pow": "pow", "sqrt": "sqrt",
}

_EXPR_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_EXPR_NUM = re.compile(r"(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def expression_to_sql(source: str, params: dict | None = None,
                      score_col: str = "score") -> str:
    """Compile a Lucene-expressions script (lang: "expression") to SQL by
    rewriting it onto the Painless grammar. Unknown bare variables raise,
    like the reference's binding step (ExpressionScriptEngine: a variable
    is _score, a doc-values access, or a params key — nothing else).
    ``params`` may be a permissive mapping (``_AnyParams``) for put-time
    validation — it is used as-is, never dict()-copied."""
    params = params if params is not None else {}
    out, i, n = [], 0, len(source)
    while i < n:
        ch = source[i]
        if ch in "'\"":  # string literal (doc['field'] keys): copy verbatim
            j = i + 1
            while j < n and source[j] != ch:
                j += 2 if source[j] == "\\" else 1
            out.append(source[i:j + 1])
            i = j + 1
            continue
        if ch.isdigit() or (ch == "." and i + 1 < n and source[i + 1].isdigit()):
            # numeric literal incl. exponent form (1e-3, 2E5 — valid
            # Lucene-expressions DECIMAL syntax): copy as a unit so the
            # exponent's 'e' is never scanned as a variable
            mnum = _EXPR_NUM.match(source, i)
            out.append(mnum.group(0))
            i = mnum.end()
            continue
        m = _EXPR_IDENT.match(source, i)
        if not m:
            out.append(ch)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        prev = out and out[-1].endswith(".")
        rest = source[j:].lstrip()
        if prev or name == "_score":
            out.append(name)  # member name after a dot / the score marker
        elif name in ("doc", "params", "Math") and rest[:1] in (".", "["):
            # painless-style marker CHAINS pass through; a bare variable
            # that merely shares the name falls through to params/error
            out.append(name)
        elif rest.startswith("("):
            fn = _EXPR_FUNC_MAP.get(name)
            if fn is None:
                raise ValueError(
                    f"expression: unsupported function {name!r}")
            out.append(f"Math.{fn}")
        elif name in params:
            out.append(f"params.{name}")
        else:
            raise ValueError(
                f"expression: unknown variable {name!r} (not _score, "
                f"doc[...], or a params key)")
        i = j
    # parser invoked directly (not via painless_to_sql) so a permissive
    # _AnyParams mapping survives for put-time validation
    return _Parser(_lex("".join(out)), params, score_col).parse()
