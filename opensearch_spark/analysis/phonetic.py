"""Phonetic analysis (reference: plugins/analysis-phonetic,
``PhoneticTokenFilterFactory.java`` — encoders include soundex,
metaphone, …; the filter replaces each token with its phonetic code so
that sound-alike terms match).

Encoder implemented here: SIMPLIFIED SOUNDEX — the classic 4-character
American Soundex with one documented deviation: H and W act like vowels
(code 0 separators) instead of being transparent between same-code
consonants. The deviation buys an exactly shared SQL spelling: the SAME
generated expression string runs in Spark (Catalyst codegen, no UDF) and
in DuckDB (the oracle), so engine/oracle parity holds by construction
rather than by two independent implementations agreeing.

Algorithm (single SQL expression, both dialects):
  clean    = upper(token) with non-letters stripped
  t        = translate(clean, A-Z, digit codes)      # vowels/H/W → 0
  collapsed= adjacent equal digits collapsed          # log2 replace passes
  stripped = collapsed with '0' removed               # vowels separate runs
  digits   = stripped minus its first digit when the FIRST LETTER is a
             coded consonant (its code heads the run it may have merged
             into); kept whole when the first letter is a vowel/H/W
  code     = first letter ++ rpad(first 3 of digits, 3, '0')
"""

from __future__ import annotations

ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
CODES = "01230120022455012623010202"

# tokens are analyzer output (bounded length); a run of equal codes of
# length L collapses after ceil(log2(L)) global-replace passes — 8 passes
# cover runs up to 256, past the analyzer's MAX_TOKEN_LENGTH of 255, so
# the SQL spelling can never diverge from soundex_py on any legal token
_COLLAPSE_PASSES = 8


def soundex_sql(col: str, dialect: str = "spark") -> str:
    """The soundex code of ``col`` as ONE SQL expression.

    Identical text for both engines except regexp_replace's global flag
    (implicit in Spark, explicit ``'g'`` in DuckDB)."""
    if dialect == "duckdb":
        clean = f"regexp_replace(upper({col}), '[^A-Z]', '', 'g')"
    else:
        clean = f"regexp_replace(upper({col}), '[^A-Z]', '')"
    t = f"translate({clean}, '{ALPHA}', '{CODES}')"
    x = t
    for _ in range(_COLLAPSE_PASSES):
        for d in "0123456":
            x = f"replace({x}, '{d}{d}', '{d}')"
    stripped = f"replace({x}, '0', '')"
    digits = (f"CASE WHEN substr({t}, 1, 1) = '0' THEN {stripped} "
              f"ELSE substr({stripped}, 2) END")
    return (f"concat(substr({clean}, 1, 1), "
            f"rpad(substr({digits}, 1, 3), 3, '0'))")


_SOUNDEX_TRANS = str.maketrans(ALPHA, CODES)


def soundex_py(token: str) -> str:
    """Driver-side twin of ``soundex_sql`` (query-token coding and the
    preloaded-dictionary fast path). Bit-equality with the SQL spelling
    is property-tested in tests/test_phonetic.py."""
    clean = "".join(ch for ch in token.upper() if "A" <= ch <= "Z")
    t = clean.translate(_SOUNDEX_TRANS)
    collapsed = []
    for ch in t:
        if not collapsed or collapsed[-1] != ch:
            collapsed.append(ch)
    stripped = "".join(c for c in collapsed if c != "0")
    if t[:1] != "0":
        stripped = stripped[1:]
    return clean[:1] + (stripped[:3] + "000")[:3]
