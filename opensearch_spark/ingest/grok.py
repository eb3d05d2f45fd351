"""Grok and dissect processors: pattern-bank compilation to codegen columns.

Reference surface:
- grok processor — `modules/ingest-common/.../GrokProcessor.java`, engine in
  `libs/grok/src/main/java/org/opensearch/grok/Grok.java:61,309`
  (``captures()`` walks named regex groups; typed captures via
  ``GrokCaptureType``: ``%{SYNTAX:name:int|float}``), pattern bank shipped
  as `libs/grok/src/main/resources/patterns/grok-patterns`.
- dissect processor — `modules/ingest-common/.../DissectProcessor.java`,
  engine in `libs/dissect/src/main/java/org/opensearch/dissect/
  DissectParser.java` with key modifiers in `DissectKey.java:173-177`
  (``+`` append, ``+name/n`` append-with-order, ``?``/empty skip, ``->``
  right padding).

Spark-first design: both compilers run ON THE DRIVER, once per pipeline
definition, and emit one ``F.regexp_extract(col, regex, group_i)``
(Java-regex, whole-stage codegen) per captured field plus one ``rlike``
match guard — g+1 JVM regex passes per row for g captures. Catalyst does
NOT merge them (the group index differs per expression); a single-pass
extractor would need a Python UDF, and at typical g (≤ ~8) the extra JVM
regex passes are far cheaper than an Arrow round-trip — zero Python in
the hot path is the invariant that matters at 100 TB.
"""
from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the subset of the reference's grok-patterns bank the engine ships
# (each verified Java-regex-compatible; DATA/GREEDYDATA are the dissect-ish
# free-text catches, the rest are the typed primitives log pipelines use)
GROK_BANK: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": "%{BASE10NUM}",
    "POSINT": r"\d+",
    "IPV4": (r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)"
             r"(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d?\d)){3}"),
    "IP": "%{IPV4}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|FATAL|SEVERE)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": "%{USERNAME}",
    "TIMESTAMP_ISO8601": (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
                          r"(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?"),
    "UUID": r"[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH)",
    "QUOTEDSTRING": r'"[^"]*"',
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(int|long|float|double|boolean|string))?\}")

_CAST = {"int": "long", "long": "long", "float": "double",
         "double": "double", "boolean": "boolean", "string": "string"}


class GrokError(ValueError):
    pass


def _neutralize_groups(seg: str) -> str:
    """Rewrite bare capturing groups ``(`` in literal regex text to
    non-capturing ``(?:`` so user parentheses can never shift the
    named-capture group numbering (escapes and character classes are
    honored). Matching semantics are unchanged."""
    out: list[str] = []
    i, n = 0, len(seg)
    in_class = False
    while i < n:
        ch = seg[i]
        if ch == "\\" and i + 1 < n:
            out.append(seg[i:i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
        elif ch == "(" and not seg.startswith("(?", i):
            out.append("(?:")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_BACKREF = re.compile(r"\\[1-9]")


def _reject_backrefs(seg: str) -> None:
    """User backreferences cannot survive group neutralization: a ``\\N``
    would silently re-target a named capture group (wrong matching) or
    dangle (PatternSyntaxException inside the Spark job) — reject at
    compile time with a clear error (round-4 review)."""
    i, n = 0, len(seg)
    while i < n:
        if seg[i] == "\\" and i + 1 < n:
            if seg[i + 1].isdigit() and seg[i + 1] != "0":
                raise GrokError(
                    "grok: backreferences (\\N) are not supported in "
                    "literal pattern text — capture groups are "
                    "renumbered during compilation")
            i += 2
            continue
        i += 1


def compile_grok(expr: str, bank: dict[str, str] | None = None,
                 _depth: int = 0) -> tuple[str, list[tuple[str, str]]]:
    """Expand ``%{SYNTAX[:name[:type]]}`` references into one Java regex.

    Returns ``(regex, captures)`` where captures is the ordered list of
    ``(field_name, spark_cast_type)`` — field i is regex group i+1 (bank
    expansions are wrapped non-capturing, so group numbering tracks the
    NAMED captures only, mirroring Grok.java's named-group walk). Unnamed
    references match without capturing; unknown syntax or reference cycles
    raise GrokError like the reference's bank validation
    (Grok.java ``validatePatternBank``)."""
    if _depth > 20:
        raise GrokError("grok pattern bank reference cycle")
    bank = GROK_BANK if bank is None else bank
    captures: list[tuple[str, str]] = []
    out: list[str] = []
    pos = 0
    for m in _GROK_REF.finditer(expr):
        _reject_backrefs(expr[pos:m.start()])
        out.append(_neutralize_groups(expr[pos:m.start()]))
        pos = m.end()
        syntax, name, typ = m.group(1), m.group(2), m.group(3)
        if syntax not in bank:
            raise GrokError(f"unknown grok pattern %{{{syntax}}}")
        sub, sub_caps = compile_grok(bank[syntax], bank, _depth + 1)
        if sub_caps:
            raise GrokError(
                f"bank pattern {syntax} must not itself capture")
        if name:
            captures.append((name, _CAST.get(typ or "string", "string")))
            out.append(f"({sub})")
        else:
            out.append(f"(?:{sub})")
    _reject_backrefs(expr[pos:])
    out.append(_neutralize_groups(expr[pos:]))
    regex = "".join(out)
    if _depth == 0 and "%{" in regex:
        # a %{...} that _GROK_REF could not parse (bad type token, illegal
        # name chars) would otherwise pass through as literal regex text —
        # the reference's bank validation raises, so do we
        raise GrokError(f"malformed grok reference left in pattern: {expr!r}")
    if _depth == 0:
        names = [n for n, _ in captures]
        dups = {n for n in names if names.count(n) > 1}
        if dups:
            # a duplicate capture name would silently keep only the LAST
            # group's column (dict assignment) — raise like the duplicate
            # dissect-key check (round-4 review)
            raise GrokError(
                f"duplicate grok capture name(s): {sorted(dups)}")
    return regex, captures


def grok_columns(col: Column | str, expr: str,
                 bank: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-capture typed columns (the GrokProcessor field writes).

    A non-matching row (unanchored find fails, like Grok.java's Matcher
    walk) yields NULL in every capture — the relaxed ``ignore_failure``
    posture; combine with :func:`grok_matches` to reproduce the default
    raise-on-miss as a filter or a validity column. A capture that
    legitimately matches the empty string on a MATCHING row stays ''
    (the reference sets the empty field value)."""
    regex, captures = compile_grok(expr, bank)
    c = F.col(col) if isinstance(col, str) else col
    matched = c.rlike(regex)
    out: dict[str, Column] = {}
    for i, (name, typ) in enumerate(captures):
        v = F.regexp_extract(c, regex, i + 1)
        if typ != "string":
            v = F.when(v == "", None).otherwise(v).cast(typ)
        out[name] = F.when(matched, v)
    return out


def grok_matches(col: Column | str, expr: str,
                 bank: dict[str, str] | None = None) -> Column:
    """Boolean whole-string match (GrokProcessor's "Provided Grok
    expressions do not match field value" check)."""
    regex, _ = compile_grok(expr, bank)
    c = F.col(col) if isinstance(col, str) else col
    # \A/\z, not ^/$: Java '$' matches BEFORE a final line terminator, so
    # 'GET\n' would pass a whole-string HTTPMETHOD check (round-4 review)
    return c.rlike(f"\\A(?:{regex})\\z")


def grok_extract(df: DataFrame, col: str, expr: str,
                 bank: dict[str, str] | None = None) -> DataFrame:
    """GrokProcessor over a column: df plus one typed column per capture."""
    return df.withColumns(grok_columns(col, expr, bank))


# ---------------------------------------------------------------------------
# dissect
# ---------------------------------------------------------------------------

_DISSECT_KEY = re.compile(r"%\{([^}]*)\}")


def compile_dissect(pattern: str) \
        -> tuple[str, list[tuple[str, int | None]], list[str]]:
    """Parse a dissect pattern into ``(regex, slots, field_order)``.

    slots: ordered ``(field_name_or_None, append_order_or_None)`` — one per
    regex group; ``None`` name = skip key (``%{}`` / ``%{?name}``,
    DissectKey.java NAMED_SKIP). Append keys (``%{+name}`` /
    ``%{+name/n}``) share a field whose final value is the order-sorted
    (else pattern-ordered) concatenation (dissect_columns applies the
    append separator at projection time) —
    DissectParser.java's APPEND / APPEND_WITH_ORDER semantics. A trailing
    ``->`` on any key makes the following literal separator greedy
    (right padding skip)."""
    slots: list[tuple[str | None, int | None]] = []
    order_seen: dict[str, int] = {}
    plain_seen: set[str] = set()
    regex_parts: list[str] = []
    pos = 0
    matches = list(_DISSECT_KEY.finditer(pattern))
    if not matches:
        raise GrokError("dissect pattern has no %{keys}")
    lead = pattern[:matches[0].start()]
    regex_parts.append(re.escape(lead))
    for i, m in enumerate(matches):
        key = m.group(1)
        pad = key.endswith("->")
        if pad:
            key = key[:-2]
        name: str | None
        order: int | None = None
        if key == "" or key.startswith("?"):
            name = None
        elif key.startswith("+"):
            body = key[1:]
            if "/" in body:
                body, o = body.rsplit("/", 1)
                try:
                    order = int(o)
                except ValueError:
                    raise GrokError(
                        f"dissect: bad append order in %{{+{body}/{o}}}")
                if order < 0:
                    raise GrokError(
                        f"dissect: negative append order in "
                        f"%{{+{body}/{o}}}")
            else:
                order_seen[body] = order_seen.get(body, -1) + 1
                order = order_seen[body]
            name = body
        else:
            name = key
            if name in plain_seen:
                # DissectParser.java throws on duplicate non-append keys —
                # a typo'd duplicate must not silently become an append
                raise GrokError(f"duplicate dissect key %{{{name}}}")
            plain_seen.add(name)
        slots.append((name, order))
        nxt = matches[i + 1].start() if i + 1 < len(matches) else len(pattern)
        sep = pattern[m.end():nxt]
        last = i + 1 == len(matches)
        if not last and sep == "" and not pad:
            # two keys with NO separator: the lazy first group would
            # always match empty — DissectParser.java rejects the
            # pattern at compile time, so do we
            raise GrokError(
                f"dissect: keys %{{{key}}} and the next key have no "
                "separator between them")
        if last and sep == "":
            if pad:
                # trailing '->' on the LAST key: strip right padding —
                # the lazy group + \s* hands all trailing whitespace to
                # the pad, so b in '%{a} %{b->}' excludes it (this
                # branch was previously dead and the pad silently
                # retained; round-4 review)
                regex_parts.append(r"(.*?)\s*")
            else:
                regex_parts.append("(.*)")
        else:
            regex_parts.append("(.*?)")
            if sep:
                esc = re.escape(sep)
                regex_parts.append(f"(?:{esc})+" if pad else esc)
            elif pad:
                regex_parts.append(r"\s+")
    fields: list[str] = []
    for name, _ in slots:
        if name is not None and name not in fields:
            fields.append(name)
    return "".join(regex_parts), slots, fields


def dissect_columns(col: Column | str, pattern: str,
                    append_separator: str = "") -> dict[str, Column]:
    """Per-field string columns for a dissect pattern (DissectProcessor)."""
    regex, slots, fields = compile_dissect(pattern)
    c = F.col(col) if isinstance(col, str) else col
    # extraction uses the SAME anchored pattern as the match guard: an
    # unanchored regexp_extract can return groups from a shorter first
    # match than the whole-string parse the guard validated ('1:2;3;'
    # under '%{a}:%{b};' validated with b='2;3' but extracted b='2').
    # (?s) + \A/\z, not ^/$: dissect is SUBSTRING parsing in the
    # reference (DissectParser.java) — field values may contain
    # newlines, and Java '$' would silently drop a final terminator
    # while reporting the row matched (round-4 review)
    anchored = f"(?s)\\A(?:{regex})\\z"
    by_field: dict[str, list[tuple[int, int]]] = {}
    for gi, (name, order) in enumerate(slots):
        if name is not None:
            by_field.setdefault(name, []).append((order or 0, gi + 1))
    out: dict[str, Column] = {}
    for name in fields:
        parts = sorted(by_field[name])
        cols = [F.regexp_extract(c, anchored, g) for _, g in parts]
        v = cols[0] if len(cols) == 1 else \
            F.concat_ws(append_separator, *cols)
        out[name] = F.when(c.rlike(anchored), v)
    return out


def dissect_extract(df: DataFrame, col: str, pattern: str,
                    append_separator: str = "") -> DataFrame:
    return df.withColumns(dissect_columns(col, pattern, append_separator))
