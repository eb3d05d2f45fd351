"""french/german/spanish analyzer chains: Python rules vs their DuckDB SQL
twins (oracle.py) — byte-identical on a generated word pool, plus pinned
examples for each rule. No Spark needed."""
import duckdb
import pytest

import opensearch_spark.oracle as O
from opensearch_spark.analysis.analyzer import (
    ANALYZERS, elide_french_text, normalize_german, stem_french_light,
    stem_german_light, stem_spanish_light,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _lits(words):
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


# word pool exercising every rule boundary (lengths 2..9, each suffix)
POOL = [
    "ab", "abc", "abcd", "abcde", "abcdef",
    "fenêtres", "fusions", "journaux", "chevaux", "tableaux", "passe",
    "aa", "xxx", "stream", "filter", "customer", "order", "tische",
    "grosse", "innen", "abcdnen", "luces", "tablas", "cosas", "ces",
    "cancion", "canciones", "spark", "table", "query", "aux", "eaux",
    "masses", "verres", "heureux",
]


def test_french_stem_sql_twin(duck):
    q = f"""WITH t AS (SELECT unnest([{_lits(POOL)}]) AS t0)
    SELECT t0, term FROM (SELECT t0, {O.french_stem_select('t0')} FROM t)"""
    for t0, term in duck.execute(q).fetchall():
        assert term == stem_french_light(t0), t0


def test_german_stem_sql_twin(duck):
    q = f"""WITH t AS (SELECT unnest([{_lits(POOL)}]) AS t0)
    SELECT t0, {O.german_stem_sql('t0')} AS term FROM t"""
    for t0, term in duck.execute(q).fetchall():
        assert term == stem_german_light(t0), t0


def test_spanish_stem_sql_twin(duck):
    q = f"""WITH t AS (SELECT unnest([{_lits(POOL)}]) AS t0)
    SELECT t0, term FROM (SELECT t0, {O.spanish_stem_select('t0')} FROM t)"""
    for t0, term in duck.execute(q).fetchall():
        assert term == stem_spanish_light(t0), t0


def test_french_elision_sql_twin(duck):
    toks = ["d'fenêtres", "qu'journaux", "l'avion", "plain", "jusqu'ici",
            "m'a", "s'il"]
    q = f"""WITH t AS (SELECT unnest([{_lits(toks)}]) AS rt)
    SELECT rt, {O.french_elide_sql('rt')} AS e FROM t"""
    for rt, e in duck.execute(q).fetchall():
        assert e == elide_french_text(rt), rt


def test_german_normalize_sql_twin(duck):
    words = ["größe", "müller", "straße", "bär", "plain"]
    q = f"""WITH t AS (SELECT unnest([{_lits(words)}]) AS w)
    SELECT w, {O.german_normalize_sql('w')} AS n FROM t"""
    for w, n in duck.execute(q).fetchall():
        assert n == normalize_german(w), w


def test_french_chain_pinned():
    assert ANALYZERS["french"]("d'fenêtres les fusions qu'journaux") == \
        ["fenêtr", "fusion", "journal"]
    # -aux→-al (chevaux→cheval), double-letter collapse runs after
    assert stem_french_light("chevaux") == "cheval"
    # guard: short tokens untouched
    assert stem_french_light("aux") == "aux"


def test_german_chain_pinned():
    assert ANALYZERS["german"]("die größe der tische") == ["gros", "tisch"]
    # remainder-≥4 guard: 'order' keeps its -er
    assert stem_german_light("order") == "order"


def test_spanish_chain_pinned():
    assert ANALYZERS["spanish"]("las luces y canción") == ["luz", "cancion"]
    assert stem_spanish_light("tablas") == "tabl"


def test_cjk_dict_segmentation():
    from opensearch_spark.analysis.analyzer import (
        CJK_DEMO_LEXICON, segment_cjk_dict)
    lex = frozenset(CJK_DEMO_LEXICON)
    w2a, w2b = CJK_DEMO_LEXICON[0], CJK_DEMO_LEXICON[1]
    w3 = CJK_DEMO_LEXICON[9]
    oov = chr(0x6C03)
    # unbroken run of mixed-length words + OOV re-segments exactly
    assert segment_cjk_dict(w2a + w3 + oov + w2b, lex) == [w2a, w3, oov, w2b]
    # all-OOV run falls back to unigrams
    assert segment_cjk_dict(oov * 3, lex) == [oov, oov, oov]


def test_cjk_dict_mixed_script():
    from opensearch_spark.analysis.analyzer import ANALYZERS, CJK_DEMO_LEXICON
    w = CJK_DEMO_LEXICON[2]
    assert ANALYZERS["cjk_dict"](f"Spark {w}{w} merge") == \
        ["spark", w, w, "merge"]


def test_polish_ukrainian_twins(duck):
    from opensearch_spark.analysis.analyzer import (
        normalize_polish, stem_polish_light, stem_ukrainian_light)

    pool = ["stolami", "stolow", "okna", "ab", "krakowie", "domu",
            "вікнами", "столи", "аб", "читання", "грошима", "оу"]
    q = f"""WITH t AS (SELECT unnest([{_lits(pool)}]) AS t0)
    SELECT t0, {O.polish_stem_sql('t0')} AS pl,
           {O.ukrainian_stem_sql('t0')} AS uk FROM t"""
    for t0, pl, uk in duck.execute(q).fetchall():
        assert pl == stem_polish_light(t0), t0
        assert uk == stem_ukrainian_light(t0), t0
    qn = f"SELECT {O.polish_normalize_sql(_lits(['stołów źdźbło']))}"
    assert duck.execute(qn).fetchone()[0] == normalize_polish("stołów źdźbło")


def test_polish_ukrainian_chains_pinned():
    assert ANALYZERS["polish"]("stołami w stołów") == ["stol", "stol"]
    assert ANALYZERS["ukrainian"]("вікнами і столи") == ["вікн", "стол"]
