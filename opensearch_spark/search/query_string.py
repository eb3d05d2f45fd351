"""query_string / simple_query_string parser (SURVEY §2.2).

Reference: ``index/query/QueryStringQueryBuilder.java`` (979 LoC) and
``SimpleQueryStringBuilder.java`` parse the Lucene query syntax. This is a
small recursive-descent parser over the practical subset:

    expr      := or_expr
    or_expr   := and_expr (OR and_expr)*
    and_expr  := unary ((AND)? unary)*        # bare adjacency = default op
    unary     := (NOT | '-' | '+') unary | primary
    primary   := '(' expr ')'
               | [field':'] ( '"' phrase '"' ['~'slop] | range | term )
                 ['^'boost]
    range     := ('['|'{') (term|'*') TO (term|'*') (']'|'}')
    term      := word | word'*' | word('*'|'?')word | word'~'[edits]

``term*`` → Prefix, interior ``*``/``?`` → Wildcard, ``term~``/``term~n``
→ Fuzzy (AUTO / n edits), quoted → MatchPhrase (``~n`` sets slop),
``[a TO b]``/``{a TO b}`` → Range (inclusive/exclusive per bracket, ``*``
= open end, numeric-looking bounds coerced), ``^n`` multiplies the
clause boost, ``+`` marks a must clause — the classic Lucene syntax
surface of ``QueryStringQueryBuilder.java``. Else Match on the field.
Produces the same AST the JSON DSL produces — one IR, one executor.
"""

from __future__ import annotations

import re

from opensearch_spark.search import queries as Q

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<quoted>"[^"]*") |
        (?P<caret>\^[0-9]+(?:\.[0-9]+)?) |
        (?P<tilde>~[0-9]*) |
        (?P<lbracket>[\[{]) | (?P<rbracket>[\]}]) |
        (?P<minus>-) |
        (?P<plus>\+) |
        (?P<word>[^\s()":^~\[\]{}]+) |
        (?P<colon>:)
    )""",
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    s = s.strip()  # reference parser tolerates surrounding whitespace
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            raise ValueError(f"query_string: cannot lex at {s[i:]!r}")
        i = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], default_field: str,
                 default_operator: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.default_operator = default_operator.lower()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Q.Query:
        node = self.or_expr()
        if self.peek()[0] is not None:
            raise ValueError(f"query_string: trailing tokens {self.toks[self.i:]}")
        return node

    def or_expr(self) -> Q.Query:
        parts = [self.and_expr()]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return Q.Bool(should=parts, minimum_should_match=1)

    def and_expr(self) -> Q.Query:
        """AND binds only the adjacent clause pair (Lucene classic parser:
        'a AND b c' with default OR → +a +b c, not +a +b +c)."""
        items: list[tuple[Q.Query, bool]] = [self.unary()]
        links: list[bool] = []  # links[i]: explicit AND between items[i], items[i+1]
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rparen" or (kind, val) == ("word", "OR"):
                break
            is_and = False
            if (kind, val) == ("word", "AND"):
                is_and = True
                self.next()
            links.append(is_and)
            items.append(self.unary())
        must, should, must_not = [], [], []
        for i, (node, mark) in enumerate(items):
            if mark == "-":
                must_not.append(node)
                continue
            linked = (i > 0 and links[i - 1]) or (i < len(links) and links[i])
            if mark == "+" or linked or self.default_operator == "and":
                must.append(node)
            else:
                should.append(node)
        if not must and not must_not and len(should) == 1:
            return should[0]
        return Q.Bool(must=must, should=should, must_not=must_not,
                      minimum_should_match=1 if (should and not must) else None)

    def unary(self) -> tuple[Q.Query, str]:
        kind, val = self.peek()
        if (kind, val) == ("word", "NOT") or kind == "minus":
            self.next()
            node, mark = self.unary()
            # NOT flips; a '+' under NOT is just NOT (Lucene drops the +)
            return node, ("" if mark == "-" else "-")
        if kind == "plus":
            self.next()
            node, mark = self.unary()
            return node, (mark or "+")
        return self.primary(), ""

    def _boost_suffix(self, node: Q.Query) -> Q.Query:
        """Consume an optional '^n' and fold it into the clause boost
        (QueryParserBase#handleBoost — boosts multiply)."""
        if self.peek()[0] == "caret":
            _, val = self.next()
            node.boost = node.boost * float(val[1:])
        return node

    def _range(self, field: str, inclusive_lo: bool) -> Q.Query:
        """'[a TO b]' / '{a TO b}' — mixed brackets allowed, '*' = open
        end, numeric-looking bounds coerced (RangeQueryBuilder.java via
        the classic parser's range production)."""
        def bound():
            kind, val = self.next()
            if kind == "minus":
                # negative numeric bound: the lexer emits '-' standalone
                # ([-5 TO 5] is valid classic syntax — round-4 review)
                kind, val = self.next()
                val = "-" + val
            if kind != "word":
                raise ValueError(f"query_string: bad range bound {val!r}")
            if val == "*":
                return None
            try:
                return float(val) if "." in val else int(val)
            except ValueError:
                return val
        lo = bound()
        if self.next() != ("word", "TO"):
            raise ValueError("query_string: expected TO in range")
        hi = bound()
        kind, val = self.next()
        if kind != "rbracket":
            raise ValueError("query_string: expected ] or } to close range")
        inclusive_hi = val == "]"
        kw = {}
        if lo is not None:
            kw["gte" if inclusive_lo else "gt"] = lo
        if hi is not None:
            kw["lte" if inclusive_hi else "lt"] = hi
        return Q.Range(field=field, **kw)

    def primary(self) -> Q.Query:
        kind, val = self.next()
        if kind == "lparen":
            node = self.or_expr()
            if self.next()[0] != "rparen":
                raise ValueError("query_string: expected ')'")
            return self._boost_suffix(node)
        field = self.default_field
        if kind == "word" and self.peek()[0] == "colon":
            self.next()
            field = val
            kind, val = self.next()
        if kind == "lparen":
            # field-scoped group — field:(a b) applies the field to every
            # clause inside (classic parser; was a hard error — round-4
            # review). Implemented by re-binding the default field for
            # the duration of the group.
            saved = self.default_field
            self.default_field = field
            try:
                node = self.or_expr()
            finally:
                self.default_field = saved
            if self.next()[0] != "rparen":
                raise ValueError("query_string: expected ')'")
            return self._boost_suffix(node)
        if kind == "lbracket":
            return self._boost_suffix(self._range(field, val == "["))
        if kind == "quoted":
            node = Q.MatchPhrase(field=field, text=val.strip('"'))
            if self.peek()[0] == "tilde":
                _, tval = self.next()
                # digits required for phrase proximity; a bare '~' after a
                # phrase is the fuzzy marker, meaningless here — ignored
                # (Lucene classic parser leniency)
                if tval[1:]:
                    node.slop = int(tval[1:])
            return self._boost_suffix(node)
        if kind == "word":
            if self.peek()[0] == "tilde":
                _, tval = self.next()
                fuzz = int(tval[1:]) if tval[1:] else None  # None → AUTO
                return self._boost_suffix(
                    Q.Fuzzy(field=field, value=val, fuzziness=fuzz))
            if val.endswith("*") and len(val) > 1 and "*" not in val[:-1] \
                    and "?" not in val[:-1]:
                # a '?' in the body means single-char wildcard (te?t* is
                # a Wildcard, not a Prefix with a literal '?')
                return self._boost_suffix(Q.Prefix(field=field, value=val[:-1]))
            if "*" in val or "?" in val:
                return self._boost_suffix(Q.Wildcard(field=field, value=val))
            return self._boost_suffix(Q.Match(field=field, text=val))
        raise ValueError(f"query_string: unexpected token {kind}:{val}")


def parse_query_string(s: str, default_field: str = "content",
                       default_operator: str = "or") -> Q.Query:
    tokens = _lex(s)
    if not tokens:
        # Lucene's classic parser yields an empty BooleanQuery (matches
        # nothing) for an empty/whitespace-only query string.
        return Q.MatchNone()
    return _Parser(tokens, default_field, default_operator).parse()


# ---------------------------------------------------------------------------
# simple_query_string — a DIFFERENT syntax family from query_string
# (``SimpleQueryStringBuilder.java`` / Lucene SimpleQueryParser): ``+`` is
# the infix AND operator, ``|`` infix OR, prefix ``-`` negates, ``"..."``
# phrase (``~n`` = slop), trailing ``*`` = prefix, ``~n`` after a term =
# fuzzy, ``(...)`` groups; AND binds tighter than OR. The parser NEVER
# throws: like the reference it is lenient — a malformed string degrades
# to matching its plain words (specials stripped), not an error.
# ---------------------------------------------------------------------------

_SIMPLE_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<quoted>"[^"]*") |
        (?P<orop>\|) |
        (?P<andop>\+) |
        (?P<minus>-) |
        (?P<tilde>~[0-9]*) |
        (?P<word>[^\s()"|+~-]+)
    )""",
    re.VERBOSE,
)


def _lex_simple(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    s = s.strip()
    while i < len(s):
        m = _SIMPLE_TOKEN.match(s, i)
        if not m:
            raise ValueError(f"simple_query_string: cannot lex at {s[i:]!r}")
        i = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


class _SimpleParser:
    def __init__(self, tokens, default_field: str, default_operator: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.default_operator = default_operator.lower()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Q.Query:
        node = self.or_expr()
        if self.peek()[0] is not None:
            raise ValueError(
                f"simple_query_string: trailing tokens {self.toks[self.i:]}")
        return node

    def or_expr(self) -> Q.Query:
        parts = [self.and_expr()]
        while self.peek()[0] == "orop":
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return Q.Bool(should=parts, minimum_should_match=1)

    def and_expr(self) -> Q.Query:
        items = [self.unary()]
        links = []  # True where an explicit '+' joined the pair
        while True:
            kind, val = self.peek()
            if kind in (None, "rparen", "orop"):
                break
            is_and = False
            if kind == "andop":
                is_and = True
                self.next()
            links.append(is_and)
            items.append(self.unary())
        must, should, must_not = [], [], []
        for i, (node, neg) in enumerate(items):
            if neg:
                must_not.append(node)
                continue
            linked = (i > 0 and links[i - 1]) or (i < len(links) and links[i])
            if linked or self.default_operator == "and":
                must.append(node)
            else:
                should.append(node)
        if not must and not must_not and len(should) == 1:
            return should[0]
        return Q.Bool(must=must, should=should, must_not=must_not,
                      minimum_should_match=1 if (should and not must) else None)

    def unary(self):
        kind, _ = self.peek()
        if kind == "minus":
            self.next()
            node, neg = self.unary()
            return node, not neg
        return self.primary(), False

    def primary(self) -> Q.Query:
        kind, val = self.next()
        if kind == "lparen":
            node = self.or_expr()
            if self.next()[0] != "rparen":
                raise ValueError("simple_query_string: expected ')'")
            return node
        if kind == "quoted":
            node = Q.MatchPhrase(field=self.default_field,
                                 text=val.strip('"'))
            if self.peek()[0] == "tilde":
                tval = self.next()[1][1:]
                if tval:  # a bare '~' after a phrase carries no slop
                    node.slop = int(tval)
            return node
        if kind == "word":
            if self.peek()[0] == "tilde":
                tval = self.next()[1][1:]
                # reference SimpleQueryParser: bare '~' = fuzzy with the
                # default 2 edits (was: lex failure degraded the whole
                # query to a plain match — round-4 review)
                fz = int(tval) if tval else 2
                return Q.Fuzzy(field=self.default_field, value=val,
                               fuzziness=fz)
            if val.endswith("*") and len(val) > 1 and "*" not in val[:-1]:
                return Q.Prefix(field=self.default_field, value=val[:-1])
            return Q.Match(field=self.default_field, text=val)
        raise ValueError(f"simple_query_string: unexpected {kind}:{val}")


def parse_simple_query_string(s: str, default_field: str = "content",
                              default_operator: str = "or") -> Q.Query:
    """Lenient by contract (SimpleQueryStringBuilder.java): any string
    parses — malformed syntax degrades to a plain match of its words."""
    try:
        tokens = _lex_simple(s)
        if not tokens:
            return Q.MatchNone()
        return _SimpleParser(tokens, default_field, default_operator).parse()
    except ValueError:
        words = re.sub(r'[()"|+~*-]', " ", s).split()
        if not words:
            return Q.MatchNone()
        return Q.Match(field=default_field, text=" ".join(words))
