"""DuckDB-runnable oracle SQL generators.

For every gated query in ``__spark_entry__.queries()`` there is an
equivalent ANSI-ish SQL statement here. The BM25 formula string is shared
with the Spark plan (``scoring.bm25.bm25_sql_expr``) so both engines compute
the same float64 expression; scores are rounded to 4 decimals on both sides
and ties broken by ascending doc_id, making the top-k set deterministic.

The oracle tokenizer — ``string_split_regex(text, '\\s+')`` — matches the
``standard`` analyzer exactly on the ``documents`` table (its text is
lowercase space-separated words; asserted in tests).
"""

from __future__ import annotations

K1 = 1.2
B = 0.75

# CTE prelude: tokens, doc lengths, collection stats over `documents`
TOK_CTES = """
tok AS (
    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
    FROM documents
),
tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
stats AS (
    SELECT (SELECT count(*) FROM documents) AS N,
           (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
)
"""


# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET — must stay identical to
# analysis.analyzer.ENGLISH_STOP_WORDS
ENGLISH_STOP_SQL = (
    "('a','an','and','are','as','at','be','but','by','for','if','in',"
    "'into','is','it','no','not','of','on','or','such','that','the',"
    "'their','then','there','these','they','this','to','was','will','with')"
)


def stem_minimal_sql(col: str = "term") -> str:
    """SQL twin of analysis.analyzer.stem_minimal_english (Lucene
    EnglishMinimalStemFilter): plural-only s-stemmer as a CASE expression."""
    return f"""CASE
      WHEN length({col}) < 3 OR substr({col}, -1) <> 's' THEN {col}
      WHEN substr({col}, -2, 1) IN ('u','s') THEN {col}
      WHEN substr({col}, -2, 1) = 'e' THEN CASE
        WHEN length({col}) > 3 AND substr({col}, -3, 1) = 'i'
             AND substr({col}, -4, 1) NOT IN ('a','e')
          THEN substr({col}, 1, length({col}) - 3) || 'y'
        WHEN substr({col}, -3, 1) IN ('i','a','o','e') THEN {col}
        ELSE substr({col}, 1, length({col}) - 1)
      END
      ELSE substr({col}, 1, length({col}) - 1)
    END"""


# deterministic pluralizing rewrite used by the stemmer gates (the corpus
# vocabulary has no plural forms); applied identically on the Spark side
PLURALIZE_SQL = ("regexp_replace(regexp_replace(text, '\\btable\\b', "
                 "'tables', 'g'), '\\bquery\\b', 'queries', 'g')")


def _terms_list(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({inner})"


def bm25_term(tf="tf", dl="dl", df="df", N="N", avgdl="avgdl",
              k1: float = K1, b: float = B, boost: float = 1.0) -> str:
    s = (
        f"ln(1.0 + ({N} - {df} + 0.5) / ({df} + 0.5)) * ({k1} + 1.0) * {tf} "
        f"/ ({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl}))"
    )
    if boost != 1.0:
        s = f"{boost} * {s}"
    return s


def match_sql(terms: list[str], k: int = 10, n_required: int = 1,
              boost: float = 1.0, extra_filter: str = "") -> str:
    """Top-k BM25 match. n_required=1 → OR; =len(terms) → AND; else msm."""
    tl = _terms_list(sorted(set(terms)))
    return f"""
WITH {TOK_CTES},
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM tok2
    WHERE term IN {tl} GROUP BY doc_id, term
),
dfreq AS (
    SELECT term, count(DISTINCT doc_id) AS df FROM tok2
    WHERE term IN {tl} GROUP BY term
),
scored AS (
    SELECT tf.doc_id,
           sum({bm25_term(boost=boost)}) AS raw_score,
           count(*) AS nt
    FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scored {('JOIN documents USING (doc_id)') if extra_filter else ''}
WHERE nt >= {n_required} {('AND ' + extra_filter) if extra_filter else ''}
ORDER BY round(raw_score, 4) DESC, doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# language-analyzer twins (analysis.analyzer french/german/spanish chains;
# each mirrors the Python rules byte-for-byte — see the *_light docstrings)
# ---------------------------------------------------------------------------

# deterministic French-form injection for the `french` analyzer gate (the
# corpus vocabulary is English-ish); Spark twin: entry_queries._frenchified
FRENCHIFY_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(text, "
    "'\\bwindow\\b', 'd''fenêtres', 'g'), "
    "'\\bmerge\\b', 'les fusions', 'g'), "
    "'\\bsort\\b', 'qu''journaux', 'g')")

FRENCH_STOP_SQL = (
    "('le','la','les','de','des','du','un','une','et','en','au','aux',"
    "'ce','qui','que','dans','pour','sur','pas','plus','par')")

GERMAN_STOP_SQL = (
    "('der','die','das','und','in','den','von','zu','mit','ist','im',"
    "'ein','eine','auf','als','auch')")

SPANISH_STOP_SQL = (
    "('el','la','los','las','de','del','y','en','un','una','que','es',"
    "'por','con','para','no','se','su')")

# ElisionFilter twin on a whitespace token (the engine elides at the char
# level pre-tokenize; on this corpus apostrophes only occur at injected
# elisions, so token-prefix stripping is equivalent)
def french_elide_sql(col: str = "rt") -> str:
    return ("regexp_replace(" + col +
            ", '^(?:jusqu|quoiqu|lorsqu|puisqu|qu|[lmtnsjdc])['']', '')")


def french_stem_select(col: str = "t0") -> str:
    """SELECT-items chain (lateral aliases) ending in alias ``term`` —
    twin of analysis.analyzer.stem_french_light; the guard g is measured
    once on the entry form like the Lucene filter."""
    return f"""length({col}) >= 6 AS g,
  CASE WHEN length({col}) >= 6 AND {col} LIKE '%aux'
         THEN substr({col}, 1, length({col}) - 3) || 'al'
       WHEN length({col}) >= 6 AND {col} LIKE '%x'
         THEN substr({col}, 1, length({col}) - 1)
       ELSE {col} END AS t1,
  CASE WHEN g AND t1 LIKE '%s' THEN substr(t1, 1, length(t1) - 1)
       ELSE t1 END AS t2,
  CASE WHEN g AND t2 LIKE '%r' THEN substr(t2, 1, length(t2) - 1)
       ELSE t2 END AS t3,
  CASE WHEN g AND t3 LIKE '%e' THEN substr(t3, 1, length(t3) - 1)
       ELSE t3 END AS t4,
  CASE WHEN g AND t4 LIKE '%é' THEN substr(t4, 1, length(t4) - 1)
       ELSE t4 END AS t5,
  CASE WHEN g AND length(t5) >= 2 AND substr(t5, -1) = substr(t5, -2, 1)
       THEN substr(t5, 1, length(t5) - 1) ELSE t5 END AS term"""


def german_normalize_sql(col: str = "rt") -> str:
    """Twin of analysis.analyzer.normalize_german."""
    return (f"replace(replace(replace(replace({col}, 'ä', 'a'), 'ö', 'o'),"
            f" 'ü', 'u'), 'ß', 'ss')")


def suffix_stem_sql(col: str, suffixes: tuple, min_len: int,
                    min_rem: int) -> str:
    """Twin of analysis.analyzer.suffix_stem: one longest-first suffix
    stripped when ≥ min_len chars total and ≥ min_rem remain."""
    branches = []
    for suf in suffixes:
        n = len(suf)
        branches.append(
            f"WHEN {col} LIKE '%{suf}' AND length({col}) - {n} >= {min_rem} "
            f"THEN substr({col}, 1, length({col}) - {n})")
    body = "\n       ".join(branches)
    return (f"CASE WHEN length({col}) < {min_len} THEN {col}\n       "
            f"{body}\n       ELSE {col} END")


def german_stem_sql(col: str = "t0") -> str:
    """Twin of analysis.analyzer.stem_german_light."""
    from opensearch_spark.analysis.analyzer import _GERMAN_SUFFIXES

    return suffix_stem_sql(col, _GERMAN_SUFFIXES, 5, 4)


def polish_normalize_sql(col: str = "rt") -> str:
    """Twin of analysis.analyzer.normalize_polish (ł→l included — it is
    a distinct letter, not a combining accent, so strip_accents would
    miss it)."""
    out = col
    for a, b in zip("ąćęłńóśźż", "acelnoszz"):
        out = f"replace({out}, '{a}', '{b}')"
    return out


def polish_stem_sql(col: str = "t0") -> str:
    from opensearch_spark.analysis.analyzer import _POLISH_SUFFIXES

    return suffix_stem_sql(col, _POLISH_SUFFIXES, 5, 4)


def ukrainian_stem_sql(col: str = "t0") -> str:
    from opensearch_spark.analysis.analyzer import _UKRAINIAN_SUFFIXES

    return suffix_stem_sql(col, _UKRAINIAN_SUFFIXES, 4, 3)


POLISH_STOP_SQL = (
    "('i','w','na','z','do','sie','jest','nie','to','ze','dla','od',"
    "'po','przy')")

UKRAINIAN_STOP_SQL = (
    "('і','в','на','з','до','не','це','що','як','та','у','за')")


def spanish_stem_select(col: str = "t0") -> str:
    """SELECT-items chain ending in alias ``term`` — twin of
    analysis.analyzer.stem_spanish_light (input already deaccented)."""
    return f"""length({col}) >= 5 AS g,
  CASE WHEN length({col}) >= 5 AND {col} LIKE '%ces'
         THEN substr({col}, 1, length({col}) - 3) || 'z'
       ELSE {col} END AS s1,
  CASE WHEN g AND s1 LIKE '%s' THEN substr(s1, 1, length(s1) - 1)
       ELSE s1 END AS s2,
  CASE WHEN g AND s2 <> '' AND substr(s2, -1) IN ('a','o','e')
       THEN substr(s2, 1, length(s2) - 1) ELSE s2 END AS term"""
