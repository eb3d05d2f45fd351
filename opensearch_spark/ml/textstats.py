"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting. All built-in-function plans
(JVM-side, codegen) — no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS_EN = ["the", "a", "an", "of", "to", "and", "in", "is", "it", "for"]

# tiny per-language marker lists for the n-gram/stopword-heuristic langid
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
    "zh": ["de5", "shi4", "le5", "zai4"],
}


def _toks(text_col: str):
    """Whitespace tokens; NULL and blank text yield an EMPTY array — an
    unguarded split would emit [''] (1 phantom token) for blank text and
    NULL for NULL text, which size() then reports as the -1 sentinel
    that silently corrupts downstream sums/thresholds."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def token_stats(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """token count / distinct count / unique ratio / mean token length.
    mean_token_len is the TRUE mean of per-token lengths — the
    chars-minus-separators shortcut assumes exactly one whitespace char
    between tokens and arbitrarily inflates on multi-space/newline-
    separated text (code, markdown), skewing any threshold on it."""
    toks = _toks(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(F.transform(toks, F.length),
                            F.lit(0), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nd.alias("n_unique"),
        F.round(F.when(n > 0, nd / n), 6).alias("unique_ratio"),
        F.round(F.when(n > 0, tok_chars / n), 6).alias("mean_token_len"),
    )


BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_count_bpe(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token counting: a GPT-style pre-tokenizer regex (letter runs,
    digit runs, single punctuation) over the lowercased text — the cheap
    proxy for 'how many LLM tokens is this document'. JVM-side
    regexp_extract_all, no Python."""
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(BPE_ISH), 0))
        .alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length band + uniqueness + stopword
    presence (the classic Gopher/C4-style filters, SQL-expressible)."""
    toks = _toks(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.array_intersect(toks, sw))
    score = (
        F.when((n >= 10) & (n <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.round(F.when(n > 0, 0.3 * nd / n).otherwise(0.0), 6)
        + F.when(n_stop >= 1, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """OpenRefine-style fingerprint: md5 of the sorted distinct token set —
    catches token-order/duplication variants that exact dedup misses."""
    toks = _toks(text_col)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def lang_id(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax over per-language hit counts,
    deterministic tie-break by language code; 'und' when nothing hits.
    Tokens are lowercased and stripped of edge punctuation before
    matching — sentence-initial 'The' or 'et.' must hit their markers."""
    toks = F.transform(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: F.regexp_replace(t, "^[^a-z0-9]+|[^a-z0-9]+$", ""))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.array_intersect(F.array_distinct(toks), markers))
        scores.append((lang, hits))
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, hits in scores:  # later langs only win strictly more hits
        cond = hits > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits).otherwise(best_n)
    return df.select(F.col(id_col), best.alias("pred_lang"))


# PII patterns (defensive scrubbing for training-data hygiene): email,
# phone-like digit runs, IPv4 — conservative regexes, applied in order
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+?\d[\d\- ]{7,}\d"),
]


def pii_scrub(df: DataFrame, text_col: str, id_col: str = "doc_id",
              replacement: str = "[PII]") -> DataFrame:
    """PII scrubbing (training-data hygiene): replace email / IPv4 /
    phone-like spans with a placeholder, reporting per-doc hit counts.
    Pure JVM regexp_replace chain — codegen, no UDF; the regex set is a
    conservative public-pattern baseline, extensible per deployment.
    NULL text counts 0 hits (size() of a null extract is -1, which would
    otherwise report n_pii = -3 per null doc and corrupt hygiene sums)."""
    cleaned = F.coalesce(F.col(text_col), F.lit(""))
    n_hits = F.lit(0)
    for _, pat in PII_PATTERNS:
        n_hits = n_hits + F.size(F.regexp_extract_all(cleaned, F.lit(pat), F.lit(0)))
        cleaned = F.regexp_replace(cleaned, pat, replacement)
    return df.select(
        F.col(id_col),
        n_hits.cast("int").alias("n_pii"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
         .otherwise(cleaned).alias("clean_text"),
    )
