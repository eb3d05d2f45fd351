"""Analyzers: text → token stream.

Re-implements the behavioral contract of the reference's default analysis
chain (reference: ``indices/analysis/AnalysisModule.java:248-260`` registers
``standard`` = Unicode UAX#29-style word break + lowercase, no stopwords,
``max_token_length=255`` per ``StandardAnalyzerProvider.java:54-56``), plus a
code-aware variant (word_delimiter-style sub-token splitting) used for source
code per the project north star.

Pure-Python ``tokenize()`` is the single source of truth — the Spark side
wraps it in a vectorized pandas UDF (Arrow batches, no per-row Python serde),
and tests / fixture generation call it directly so index-time and query-time
analysis are byte-identical by construction (mirrors the reference running
the same analyzer in ``TransportAnalyzeAction`` and the index write path).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TOKEN_LENGTH = 255  # StandardAnalyzerProvider.java:54 default

# UAX#29 approximation: word chars incl. underscore (ExtendNumLet joins
# snake_case, as Lucene's StandardTokenizer does); apostrophes/dots split.
_WORD_RE = re.compile(r"\w+", re.UNICODE)

# code-aware sub-token boundaries: underscore, camelCase humps, letter<->digit
_CODE_SPLIT_RE = re.compile(
    r"_+"                       # snake_case
    r"|(?<=[a-z0-9])(?=[A-Z])"  # fooBar -> foo|Bar
    r"|(?<=[A-Z])(?=[A-Z][a-z])"  # HTTPServer -> HTTP|Server
    r"|(?<=[A-Za-z])(?=[0-9])"  # utf8 -> utf|8
    r"|(?<=[0-9])(?=[A-Za-z])"  # 8bit -> 8|bit
)


def _chunk255(tok: str) -> Iterator[str]:
    # Lucene splits (not truncates) tokens longer than max_token_length
    if len(tok) <= MAX_TOKEN_LENGTH:
        yield tok
    else:
        for i in range(0, len(tok), MAX_TOKEN_LENGTH):
            yield tok[i : i + MAX_TOKEN_LENGTH]


def tokenize_standard(text: str) -> list[str]:
    """standard analyzer: UAX#29-ish word break + lowercase."""
    if not text:
        return []
    out: list[str] = []
    for m in _WORD_RE.finditer(text):
        for t in _chunk255(m.group(0).lower()):
            out.append(t)
    return out


def tokenize_standard_code(text: str) -> list[str]:
    """standard + word_delimiter-style code splitting (sub-tokens only).

    ``parseHTTPResponse_v2`` → [parse, http, response, v, 2]. Splitting
    happens before lowercasing so camel humps are visible.
    """
    if not text:
        return []
    out: list[str] = []
    for m in _WORD_RE.finditer(text):
        for sub in _CODE_SPLIT_RE.split(m.group(0)):
            if not sub:
                continue
            for t in _chunk255(sub.lower()):
                out.append(t)
    return out


def _ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def tokenize_standard_code_ngram(text: str, n: int = 2) -> list[str]:
    """code tokens + appended word n-gram shingles (index_phrases-style fast
    path, reference ``TextFieldMapper.java:318-321``)."""
    toks = tokenize_standard_code(text)
    return toks + _ngrams(toks, n)


def tokenize_shingle_2(text: str) -> list[str]:
    """ONLY the 2-word shingles of the standard token stream — the
    ``._2gram`` subfield a search_as_you_type mapping indexes
    (``SearchAsYouTypeFieldMapper.java`` ShingleFieldMapper,
    output_unigrams=false)."""
    return _ngrams(tokenize_standard(text), 2)


def tokenize_shingle_3(text: str) -> list[str]:
    """``._3gram`` subfield twin of tokenize_shingle_2."""
    return _ngrams(tokenize_standard(text), 3)


ANALYZERS = {
    "standard": tokenize_standard,
    "standard_code": tokenize_standard_code,
    "standard_code_ngram": tokenize_standard_code_ngram,
    "shingle_2": tokenize_shingle_2,
    "shingle_3": tokenize_shingle_3,
}


# ---------------------------------------------------------------------------
# token filters (reference: modules/common-analysis registers these factories
# in CommonAnalysisModulePlugin.java — stop, asciifolding, edge_ngram,
# synonym, stemmer; semantics below follow the public Lucene filters).
# Chained analyzers renumber token positions after removal (Lucene's
# StopFilter instead leaves position-increment gaps); indexes built with a
# filter chain therefore default to with_positions=False and position-based
# queries over them are a documented divergence.
# ---------------------------------------------------------------------------

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)


def stem_minimal_english(t: str) -> str:
    """Plural-only s-stemmer (Harman 1991), Lucene EnglishMinimalStemFilter:
    tables→table, queries→query; -ss/-us and -[iaoe]es forms unchanged."""
    n = len(t)
    if n < 3 or t[-1] != "s":
        return t
    c = t[-2]
    if c in ("u", "s"):
        return t
    if c == "e":
        if n > 3 and t[-3] == "i" and t[-4] not in ("a", "e"):
            return t[:-3] + "y"
        if t[-3] in ("i", "a", "o", "e"):
            return t
        return t[:-1]
    return t[:-1]


def ascii_fold(t: str) -> str:
    """asciifolding filter: strip combining marks (NFKD), e.g. café→cafe."""
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", t)
        if not unicodedata.combining(ch)
    )


# ---------------------------------------------------------------------------
# language analyzers (analysis-common language providers: AnalysisModule
# registers french/german/spanish via the Lucene language analyzers;
# reference registration in indices/analysis/AnalysisModule.java). Each
# chain is a deterministic light variant — elision/normalization + stop +
# minimal-stemmer rules in the spirit of the corresponding Lucene
# *MinimalStemFilter — with byte-identical SQL twins in oracle.py so the
# gates can hash-compare against DuckDB.
# ---------------------------------------------------------------------------

# Lucene FrenchAnalyzer DEFAULT_ARTICLES (ElisionFilter)
FRENCH_ELISION = ("qu", "l", "m", "t", "n", "s", "j", "d", "c",
                  "jusqu", "quoiqu", "lorsqu", "puisqu")
_ELISION_RE = re.compile(
    r"\b(?:" + "|".join(sorted(FRENCH_ELISION, key=len, reverse=True))
    + r")['’]", re.IGNORECASE)

FRENCH_STOP_WORDS = frozenset(
    "le la les de des du un une et en au aux ce qui que dans pour sur "
    "pas plus par".split())

GERMAN_STOP_WORDS = frozenset(
    "der die das und in den von zu mit ist im ein eine auf als auch".split())

SPANISH_STOP_WORDS = frozenset(
    "el la los las de del y en un una que es por con para no se su".split())


def elide_french_text(text: str) -> str:
    """ElisionFilter as a char filter: drop the article + apostrophe
    (``d'fenêtres`` → ``fenêtres``) BEFORE tokenization — the standard
    tokenizer splits on the apostrophe, so the reference's token-filter
    placement and this char-filter placement yield the same stream."""
    return _ELISION_RE.sub("", text)


def stem_french_light(t: str) -> str:
    """Sequential truncation rules after FrenchMinimalStemFilter
    (plural -x/-aux→-al, -s, mute final -r/-e/-é, final double letter);
    the length guard is measured once on entry like the Lucene filter.
    SQL twin: oracle.french_stem_steps_sql."""
    if len(t) < 6:
        return t
    if t.endswith("aux"):
        t = t[:-3] + "al"
    elif t.endswith("x"):
        t = t[:-1]
    if t.endswith("s"):
        t = t[:-1]
    if t.endswith("r"):
        t = t[:-1]
    if t.endswith("e"):
        t = t[:-1]
    if t.endswith("é"):
        t = t[:-1]
    if len(t) >= 2 and t[-1] == t[-2]:
        t = t[:-1]
    return t


def tokenize_french(text: str) -> list[str]:
    """`french` analyzer: elision char filter + standard + french stop +
    light stemmer."""
    return [stem_french_light(t)
            for t in tokenize_standard(elide_french_text(text or ""))
            if t not in FRENCH_STOP_WORDS]


ANALYZERS["french"] = tokenize_french


def normalize_german(t: str) -> str:
    """GermanNormalizationFilter core mappings: umlauts to base vowel,
    ß→ss (the snowball German2 forms)."""
    return (t.replace("ä", "a").replace("ö", "o")
             .replace("ü", "u").replace("ß", "ss"))


_GERMAN_SUFFIXES = ("nen", "en", "se", "es", "er", "e", "s", "n")


def suffix_stem(t: str, suffixes: tuple, min_len: int, min_rem: int) -> str:
    """Generic one-suffix minimal stemmer: strip the first (longest-first
    ordered) matching suffix when the token is ≥ ``min_len`` chars and
    ≥ ``min_rem`` chars remain. SQL twin: oracle.suffix_stem_sql — the
    suffix tuple orders the CASE branches, so keep longest first."""
    if len(t) < min_len:
        return t
    for suf in suffixes:
        if t.endswith(suf) and len(t) - len(suf) >= min_rem:
            return t[:-len(suf)]
    return t


def stem_german_light(t: str) -> str:
    """One longest-matching plural/inflection suffix stripped when ≥4
    chars remain (GermanMinimalStemFilter discipline). SQL twin:
    oracle.german_stem_sql."""
    return suffix_stem(t, _GERMAN_SUFFIXES, 5, 4)


def tokenize_german(text: str) -> list[str]:
    """`german` analyzer: standard + normalization + stop + light stemmer
    (normalization first so umlaut spellings conflate before stopping)."""
    out = []
    for t in tokenize_standard(text):
        t = normalize_german(t)
        if t in GERMAN_STOP_WORDS:
            continue
        out.append(stem_german_light(t))
    return out


ANALYZERS["german"] = tokenize_german

_SPANISH_DEACCENT = str.maketrans("áéíóúüñ", "aeiouun")


def stem_spanish_light(t: str) -> str:
    """Post-deaccent sequential rules in the spirit of
    SpanishLightStemFilter: -ces→-z (luces→luz), plural -s, final
    gender/theme vowel a/o/e; guard measured once on entry. SQL twin:
    oracle.spanish_stem_steps_sql."""
    if len(t) < 5:
        return t
    if t.endswith("ces"):
        t = t[:-3] + "z"
    if t.endswith("s"):
        t = t[:-1]
    if t and t[-1] in "aoe":
        t = t[:-1]
    return t


def tokenize_spanish(text: str) -> list[str]:
    """`spanish` analyzer: standard + deaccent + stop + light stemmer."""
    out = []
    for t in tokenize_standard(text):
        t = t.translate(_SPANISH_DEACCENT)
        if t in SPANISH_STOP_WORDS:
            continue
        out.append(stem_spanish_light(t))
    return out


ANALYZERS["spanish"] = tokenize_spanish

# analysis-stempel plugin (Polish). The reference's StempelFilter is a
# trained statistical stemmer (stempel tables, absent here); the engine
# ships the deterministic light variant: diacritic normalization (ł has no
# combining mark, so strip_accents-style folding is NOT enough) + stop +
# one-suffix stemmer.
POLISH_STOP_WORDS = frozenset(  # normalized forms (post-diacritic-fold)
    "i w na z do sie jest nie to ze dla od po przy".split())
_POLISH_MAP = str.maketrans("ąćęłńóśźż", "acelnoszz")
_POLISH_SUFFIXES = ("owie", "ami", "ach", "ego", "emu",
                    "ow", "om", "em", "ie", "y", "a", "e", "i", "u")


def normalize_polish(t: str) -> str:
    return t.translate(_POLISH_MAP)


def stem_polish_light(t: str) -> str:
    return suffix_stem(t, _POLISH_SUFFIXES, 5, 4)


def tokenize_polish(text: str) -> list[str]:
    """`polish` analyzer (analysis-stempel registration shape): standard +
    diacritic fold + stop + light suffix stemmer."""
    out = []
    for t in tokenize_standard(text):
        t = normalize_polish(t)
        if t in POLISH_STOP_WORDS:
            continue
        out.append(stem_polish_light(t))
    return out


ANALYZERS["polish"] = tokenize_polish

# analysis-ukrainian plugin. The reference wraps a morfologik dictionary
# (absent here); deterministic light variant: stop + one-suffix stemmer
# over the Cyrillic token stream (standard tokenizer handles Cyrillic
# word chars natively).
UKRAINIAN_STOP_WORDS = frozenset("і в на з до не це що як та у за".split())
_UKRAINIAN_SUFFIXES = ("ення", "ння", "ами", "ові", "ою", "ах", "ів",
                       "и", "а", "у", "і", "я")


def stem_ukrainian_light(t: str) -> str:
    return suffix_stem(t, _UKRAINIAN_SUFFIXES, 4, 3)


def tokenize_ukrainian(text: str) -> list[str]:
    """`ukrainian` analyzer (analysis-ukrainian registration shape):
    standard + stop + light suffix stemmer."""
    return [stem_ukrainian_light(t) for t in tokenize_standard(text)
            if t not in UKRAINIAN_STOP_WORDS]


ANALYZERS["ukrainian"] = tokenize_ukrainian


def make_filter_chain(base: str = "standard", *,
                      stopwords: frozenset | None = None,
                      synonyms: dict[str, str] | None = None,
                      synonyms_multi: dict[tuple, str] | None = None,
                      keyword_marker: frozenset | None = None,
                      stemmer_override: dict[str, str] | None = None,
                      stem: bool = False,
                      fold: bool = False,
                      edge_ngram: tuple[int, int] | None = None):
    """Compose a tokenizer + token-filter chain into a tokenize() callable.

    Filter order mirrors a typical reference mapping (fold → stop →
    synonym_graph → synonym → stemmer_override/keyword_marker → stem →
    edge_ngram). Synonyms are single-token equivalence classes mapped to
    a canonical term (index- and query-time symmetric, the reference's
    `synonym` filter with `a, b => canon` rules). ``synonyms_multi`` is
    the multi-token side of SynonymGraphFilterFactory (`"machine
    learning" => ml` rules): a greedy longest-match scan over the token
    stream replaces each rule phrase with its canonical term — contracted
    single-token output keeps the downstream positions dense, so the
    graph filter is safe at query AND index time (Lucene restricts the
    expanding form to query time; the contracting form used here has no
    stacked tokens). ``keyword_marker`` protects terms from stemming
    (KeywordMarkerFilterFactory); ``stemmer_override`` maps terms to
    explicit stems before the algorithmic stemmer and implicitly protects
    them (StemmerOverrideTokenFilterFactory)."""
    tok = ANALYZERS[base]
    max_phrase = max((len(k) for k in synonyms_multi), default=0) \
        if synonyms_multi else 0

    def chain(text: str) -> list[str]:
        out = tok(text)
        if fold:
            out = [ascii_fold(t) for t in out]
        if stopwords:
            out = [t for t in out if t not in stopwords]
        if synonyms_multi:
            merged: list[str] = []
            i = 0
            n = len(out)
            while i < n:
                # longest match first, down to single-token rules (a
                # 1-token key in synonyms_multi is valid, same as the
                # plain `synonyms` map)
                for L in range(min(max_phrase, n - i), 0, -1):
                    canon = synonyms_multi.get(tuple(out[i:i + L]))
                    if canon is not None:
                        merged.append(canon)
                        i += L
                        break
                else:
                    merged.append(out[i])
                    i += 1
            out = merged
        if synonyms:
            out = [synonyms.get(t, t) for t in out]
        overridden: set[int] = set()
        if stemmer_override:
            # StemmerOverrideFilter sets KeywordAttribute only on the
            # token INSTANCES it rewrote — a natural token that merely
            # equals some override VALUE still stems normally
            new = []
            for j, t in enumerate(out):
                r = stemmer_override.get(t)
                if r is not None:
                    overridden.add(j)
                    new.append(r)
                else:
                    new.append(t)
            out = new
        if stem:
            protected = keyword_marker or frozenset()
            out = [t if (j in overridden or t in protected)
                   else stem_minimal_english(t)
                   for j, t in enumerate(out)]
        if edge_ngram:
            lo, hi = edge_ngram
            out = [t[:k] for t in out for k in range(lo, min(len(t), hi) + 1)]
        return out

    return chain


def register_analyzer(name: str, fn) -> None:
    ANALYZERS[name] = fn


# built-in chained analyzers used by the query catalogue
register_analyzer(
    "english_light",
    make_filter_chain("standard", stopwords=ENGLISH_STOP_WORDS, stem=True))
register_analyzer("edge_ngram_1_8",
                  make_filter_chain("standard", edge_ngram=(1, 8)))
register_analyzer("fold", make_filter_chain("standard", fold=True))
register_analyzer(
    "synonym_demo",
    make_filter_chain("standard",
                      synonyms={"tbl": "table", "rapid": "fast"}))
register_analyzer(
    "synonym_graph_demo",
    make_filter_chain("standard",
                      synonyms_multi={("key", "order"): "sort",
                                      ("hash", "join", "probe"): "join"},
                      synonyms={"tbl": "table"}))
register_analyzer(
    "english_protected",
    make_filter_chain("standard", stem=True,
                      keyword_marker=frozenset({"pandas"}),
                      stemmer_override={"indices": "index"}))


def icu_normalize_nfkc_cf(text: str) -> str:
    """icu_normalizer char filter, default mode ``nfkc_cf`` (analysis-icu
    plugin: IcuNormalizerCharFilterFactory / ICUNormalizer2CharFilter):
    NFKC compatibility normalization + Unicode case folding — ligatures
    decompose (ﬁ→fi), fullwidth forms narrow (Ａ→a, ２→2), superscripts
    flatten (²→2), case folds (ß→ss). Applied BEFORE tokenization, as the
    char-filter form is, so compatibility characters can't skew the word
    break."""
    return unicodedata.normalize("NFKC", text or "").casefold()


def tokenize_icu(text: str) -> list[str]:
    """`icu` analyzer: icu_normalizer(nfkc_cf) char filter + standard
    word break — the analysis-icu plugin's default analyzer shape."""
    return tokenize_standard(icu_normalize_nfkc_cf(text))


register_analyzer("icu", tokenize_icu)


def icu_collation_key(t: str) -> str:
    """icu_collation_keyword sort key, primary strength (analysis-icu:
    ICUCollationKeywordFieldMapper with strength=primary): accents and
    case are ignored at the primary level — NFKD, drop combining marks,
    case fold. Callers tie-break equal primary keys by the original
    string (deterministic codepoint order), which stands in for the
    collator's higher strength levels."""
    return icu_normalize_nfkc_cf(ascii_fold(t))


def icu_collation_key_udf():
    """Arrow-vectorized icu_collation_key for DataFrame sort expressions
    (the field mapper stores the collation key at index time; computing
    it in the sort projection is the query-time equivalent)."""

    @F.pandas_udf("string")
    def _key(s: pd.Series) -> pd.Series:
        return s.map(icu_collation_key)

    return _key


def tokenize_char_trigram(text: str) -> list[str]:
    """Character trigrams of each standard token (the reference `wildcard`
    field type, WildcardFieldMapper.java: ngram-indexed acceleration for
    wildcard/regexp — grams prefilter candidates, the pattern verifies).
    Tokens shorter than 3 chars are emitted whole."""
    out: list[str] = []
    for tok in tokenize_standard(text):
        if len(tok) < 3:
            out.append(tok)
        else:
            out.extend(tok[i:i + 3] for i in range(len(tok) - 2))
    return out


register_analyzer("char_trigram", tokenize_char_trigram)


_CJK_RANGE = "\\u4e00-\\u9fff\\u3040-\\u30ff"  # ideographs + kana
_CJK_RUN_RE = re.compile(f"[{_CJK_RANGE}]+|[^{_CJK_RANGE}]+")
_CJK_CHAR_RE = re.compile(f"[{_CJK_RANGE}]")


def _tokenize_cjk(text: str, run_handler) -> list[str]:
    """Shared CJK scaffold (word scan → lowercase → run partition →
    per-run dispatch): both CJK analyzers differ ONLY in how an
    ideographic run becomes tokens — one authoring site so the run
    handling can never silently diverge (round-4 review)."""
    out: list[str] = []
    for m in _WORD_RE.finditer(text or ""):
        w = m.group(0).lower()
        for run in _CJK_RUN_RE.findall(w):
            if _CJK_CHAR_RE.match(run):
                out.extend(run_handler(run))
            else:
                out.extend(_chunk255(run))
    return out


def _cjk_bigrams(run: str) -> list[str]:
    if len(run) == 1:
        return [run]
    return [run[i:i + 2] for i in range(len(run) - 1)]


def tokenize_cjk_bigram(text: str) -> list[str]:
    """cjk_bigram token filter (analysis-common
    CommonAnalysisModulePlugin.java registration; Lucene CJKBigramFilter
    — the dictionary-less CJK strategy the reference's CJK analyzer
    uses): the standard tokenizer emits ideographic chars as single
    tokens, adjacent ones combine into overlapping bigrams, a lone
    ideogram stays a unigram, non-CJK tokens pass through the standard
    chain unchanged."""
    return _tokenize_cjk(text, _cjk_bigrams)


register_analyzer("cjk_bigram", tokenize_cjk_bigram)


# ---------------------------------------------------------------------------
# dictionary-driven CJK segmentation — the mechanism behind the reference's
# analysis-smartcn (HMMChineseTokenizer), analysis-kuromoji
# (JapaneseTokenizer: dictionary lattice + Viterbi) and analysis-nori
# plugins. Their shipped dictionaries aren't available in this environment,
# so the engine demonstrates the segmentation mechanism itself with a
# deterministic demo lexicon: greedy longest-match against the dictionary
# inside each ideographic run, single-character fallback for
# out-of-vocabulary chars (smartcn's unknown-word posture), non-CJK runs
# through the standard chain.
# ---------------------------------------------------------------------------

# two-char words from one codepoint block, three-char words from a disjoint
# block: greedy longest-match then provably re-segments any concatenation
# (no cross-word window can be a lexicon entry)
CJK_DEMO_LEXICON_2 = tuple(
    chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1) for i in range(8))
CJK_DEMO_LEXICON_3 = tuple(
    chr(0x5B00 + 3 * i) + chr(0x5B00 + 3 * i + 1) + chr(0x5B00 + 3 * i + 2)
    for i in range(6))
CJK_DEMO_LEXICON = CJK_DEMO_LEXICON_2 + CJK_DEMO_LEXICON_3


def segment_cjk_dict(run: str, lexicon: frozenset, max_len: int = 3) \
        -> list[str]:
    """Greedy longest-match word segmentation of one ideographic run."""
    out: list[str] = []
    i, n = 0, len(run)
    while i < n:
        for L in range(min(max_len, n - i), 1, -1):
            w = run[i:i + L]
            if w in lexicon:
                out.append(w)
                i += L
                break
        else:
            out.append(run[i])  # OOV char → unigram token
            i += 1
    return out


_CJK_DEMO_SET = frozenset(CJK_DEMO_LEXICON)


def tokenize_cjk_dict(text: str) -> list[str]:
    """`cjk_dict` analyzer: dictionary segmentation of CJK runs (greedy
    longest match over CJK_DEMO_LEXICON, OOV unigram fallback), standard
    analysis for everything else."""
    return _tokenize_cjk(
        text, lambda run: segment_cjk_dict(run, _CJK_DEMO_SET))


register_analyzer("cjk_dict", tokenize_cjk_dict)


def tokenize(text: str, analyzer: str = "standard") -> list[str]:
    return ANALYZERS[analyzer](text)


def analyze_udf(analyzer: str = "standard"):
    """Vectorized pandas UDF: content:string → tokens:array<string>."""
    fn = ANALYZERS[analyzer]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _analyze(s: pd.Series) -> pd.Series:
        return s.map(lambda x: fn(x) if x is not None else [])

    return _analyze


#: joined-token separator: ASCII record separator — never produced by any
#: tokenizer, so SHINGLE analyzers (whose tokens contain spaces) round-trip
#: through join/split losslessly where a space join would silently
#: re-split them into unigrams
TOKEN_SEP = "\x1e"


def analyze_join_udf(analyzer: str = "standard"):
    """content:string → TOKEN_SEP-joined token string. Cheaper than the
    array UDF when the result is cached or shuffled: one compact string per
    row crosses Arrow and sits in the block cache instead of an
    array<string> (measured ~2× on the 600k-doc build); the JVM ``split``
    that re-derives the array is whole-stage-codegen."""
    fn = ANALYZERS[analyzer]

    @F.pandas_udf(T.StringType())
    def _analyze(s: pd.Series) -> pd.Series:
        return s.map(lambda x: TOKEN_SEP.join(fn(x)) if x is not None else "")

    return _analyze


def termfreq_udf(analyzer: str = "standard", with_positions: bool = False):
    """content:string → struct<dl, terms[], tfs[][, poss[][]]> — analysis AND
    per-doc term-frequency aggregation in ONE python pass.

    This is map-side combine pushed into the tokenizer: the (term, doc_id)
    groupBy that would otherwise hash-aggregate the full exploded token
    stream (~dl rows/doc) disappears; the build's only wide shuffle is the
    (term, bucket) repartition of the already-aggregated postings (~distinct
    terms/doc rows). Parallel primitive arrays (not array<struct>) keep the
    Arrow conversion allocation-free."""
    fn = ANALYZERS[analyzer]
    if with_positions:
        out_t = ("dl int, terms array<string>, tfs array<int>, "
                 "poss array<array<int>>")
    else:
        out_t = "dl int, terms array<string>, tfs array<int>"

    @F.pandas_udf(out_t)
    def _tf(s: pd.Series) -> pd.DataFrame:
        dls, terms_col_, tfs_col, poss_col = [], [], [], []
        for x in s:
            toks = fn(x) if x is not None else []
            dls.append(len(toks))
            if with_positions:
                pos: dict[str, list[int]] = {}
                for i, t in enumerate(toks):
                    pos.setdefault(t, []).append(i)
                terms_col_.append(list(pos.keys()))
                tfs_col.append([len(v) for v in pos.values()])
                poss_col.append(list(pos.values()))
            else:
                cnt: dict[str, int] = {}
                for t in toks:
                    cnt[t] = cnt.get(t, 0) + 1
                terms_col_.append(list(cnt.keys()))
                tfs_col.append(list(cnt.values()))
        out = {"dl": dls, "terms": terms_col_, "tfs": tfs_col}
        if with_positions:
            out["poss"] = poss_col
        return pd.DataFrame(out)

    return _tf


def tokens_col(tokstr_col: str):
    """array<string> tokens from a joined token string (empty-safe)."""
    return F.when(
        F.length(F.col(tokstr_col)) > 0, F.split(F.col(tokstr_col), TOKEN_SEP)
    ).otherwise(F.array().cast("array<string>"))
