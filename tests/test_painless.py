"""Painless-subset compiler tests (search/painless.py).

Semantics cross-check: each Painless expression is compiled to SQL and
evaluated by DuckDB over a small table, against an independent Python
evaluation of the same expression — two implementations, one contract.
"""

import math

import duckdb
import pytest

from opensearch_spark.search.painless import (looks_like_painless,
                                              painless_to_sql)

ROWS = [
    {"n": 0, "v": 1.5, "lang": "py", "path": "src/a/b.py", "score": 2.0},
    {"n": 7, "v": 0.25, "lang": "md", "path": "docs/x.md", "score": 0.5},
    {"n": 14, "v": 9.0, "lang": "java", "path": "src/Main.java", "score": 1.0},
    {"n": 3, "v": 4.0, "lang": "py", "path": "src/c.py", "score": 3.5},
]


def _duck(sql_expr: str):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(n BIGINT, v DOUBLE, lang VARCHAR, path VARCHAR,"
        " score DOUBLE)")
    for r in ROWS:
        con.execute("INSERT INTO t VALUES (?,?,?,?,?)",
                    [r["n"], r["v"], r["lang"], r["path"], r["score"]])
    return [x[0] for x in con.sql(f"SELECT {sql_expr} FROM t").fetchall()]


CASES = [
    # (painless source, params, python evaluator over a row dict)
    ("Math.log(1 + doc['v'].value) * params.f + _score", {"f": 2.5},
     lambda r: math.log(1 + r["v"]) * 2.5 + r["score"]),
    ("doc['lang'].value == 'py' ? 2.0 : 1.0", {},
     lambda r: 2.0 if r["lang"] == "py" else 1.0),
    ("doc['n'].value % 7 == 0 && !doc['lang'].value.equals('md')", {},
     lambda r: r["n"] % 7 == 0 and not r["lang"] == "md"),
    ("params['b'] * Math.pow(doc['v'].value, 0.5)", {"b": 3},
     lambda r: 3 * r["v"] ** 0.5),
    ("Math.max(doc['v'].value, params.floor) - Math.min(doc['n'].value, 2)",
     {"floor": 1.0},
     lambda r: max(r["v"], 1.0) - min(r["n"], 2)),
    ("-doc['v'].value + Math.E", {},
     lambda r: -r["v"] + math.e),
    ("doc['path'].value.startsWith('src/') && doc['path'].value.endsWith('.py')",
     {}, lambda r: r["path"].startswith("src/") and r["path"].endswith(".py")),
    ("doc['path'].value.toUpperCase().contains('MAIN')", {},
     lambda r: "MAIN" in r["path"].upper()),
    ("doc['lang'].value.length() >= 3 ? doc['n'].value : -1", {},
     lambda r: r["n"] if len(r["lang"]) >= 3 else -1),
    # nested ternary, right-associative like Java
    ("doc['n'].value > 10 ? 'hi' : doc['n'].value > 2 ? 'mid' : 'lo'", {},
     lambda r: "hi" if r["n"] > 10 else ("mid" if r["n"] > 2 else "lo")),
    ("(doc['n'].value + 1) * 2 - 6 / 3", {},
     lambda r: (r["n"] + 1) * 2 - 6 / 3),
    ("doc['v'].size() > 0", {}, lambda r: True),
]


@pytest.mark.parametrize("src,params,py", CASES,
                         ids=[c[0][:40] for c in CASES])
def test_compiled_sql_matches_python(src, params, py):
    got = _duck(painless_to_sql(src, params, score_col="score"))
    want = [py(r) for r in ROWS]
    for g, w in zip(got, want):
        if isinstance(w, float):
            assert g == pytest.approx(w, rel=1e-12)
        else:
            assert g == w


def test_java_precedence_pinned():
    # && binds tighter than ||; == tighter than &&
    sql = painless_to_sql("true || false && false", {})
    assert _duck(sql)[0] is True
    sql2 = painless_to_sql("1 + 2 * 3 == 7", {})
    assert _duck(sql2)[0] is True


def test_params_inlined_as_typed_literals():
    assert painless_to_sql("params.s", {"s": "it's"}) == "'it''s'"
    assert painless_to_sql("params.i", {"i": 42}) == "42"
    assert painless_to_sql("params.b", {"b": True}) == "TRUE"
    assert painless_to_sql("params.n", {"n": None}) == "NULL"


def test_errors_are_loud():
    with pytest.raises(ValueError, match="missing param"):
        painless_to_sql("params.absent", {})
    with pytest.raises(ValueError, match="unsupported Math"):
        painless_to_sql("Math.tanh(1)", {})
    with pytest.raises(ValueError, match="trailing|unexpected"):
        painless_to_sql("1 2", {})
    with pytest.raises(ValueError):
        painless_to_sql("doc['x'].value ? 1", {})


def test_detection_heuristic():
    assert looks_like_painless("doc['x'].value + 1")
    assert looks_like_painless("params.f * 2")
    assert looks_like_painless("a == b ? 1 : 0")
    assert looks_like_painless("Math.log(1 + x) * _score")
    # plain SQL must NOT be rewritten
    assert not looks_like_painless("ln(1.0 + n_chars) * score")
    assert not looks_like_painless("score >= 2.0 AND lang = 'py'")
    # Spark SQL accepts || (concat) and == — operator syntax alone must
    # never reroute a SQL source through the painless compiler
    assert not looks_like_painless("lang || '-' || source")
    assert not looks_like_painless("lang == 'py' AND n_chars > 5")


def test_typed_float_literals():
    assert painless_to_sql("doc['v'].value * 2.5f", {}) \
        == "(v * CAST(2.5 AS DOUBLE))"
    # bare decimal literals must emit as DOUBLE, not Spark DECIMAL —
    # Painless/Java decimal literals are doubles (10.0/3.0 must be
    # 3.3333333333333335, not the scale-limited decimal quotient)
    assert painless_to_sql("0.1d + 3L", {}) == "(CAST(0.1 AS DOUBLE) + 3)"


def test_dsl_script_object_strictness():
    from opensearch_spark.search.queries import from_dsl

    with pytest.raises(ValueError, match="source"):
        from_dsl({"script_score": {"query": {"match_all": {}},
                                   "script": {"params": {"f": 1}}}})
    with pytest.raises(ValueError, match="nested 'script'"):
        from_dsl({"script": {"source": "n_chars % 7 == 0"}})


def test_spark_side_execution(spark):
    """The compiled expression is a valid Catalyst expression too."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(r["n"], r["v"], r["lang"]) for r in ROWS], "n long, v double, lang string")
    sql = painless_to_sql(
        "doc['n'].value % 7 == 0 && !doc['lang'].value.equals('md')", {})
    got = sorted(r["n"] for r in df.where(F.expr(sql)).collect())
    assert got == [0, 14]


def test_expression_lang_adapter():
    """lang-expression dialect (ExpressionScriptEngine.java): bare Math
    functions map to the shared SQL fns, bare variables resolve from
    params, unknown variables/functions raise like the reference's
    binding step."""
    import pytest

    from opensearch_spark.search.painless import expression_to_sql
    from opensearch_spark.search.queries import _script_src

    assert expression_to_sql("doc['foo'] + abs(1)", None) == "(foo + abs(1))"
    assert expression_to_sql("min(doc['a'], max(doc['b'], 3))", None) \
        == "least(a, greatest(b, 3))"
    assert expression_to_sql("_score * ln(1 + doc['x'].value) / w",
                             {"w": 2.0}, "score") \
        == "((score * ln((1 + x))) / CAST(2.0 AS DOUBLE))"
    with pytest.raises(ValueError):
        expression_to_sql("doc['a'] + zz", None)
    with pytest.raises(ValueError):
        expression_to_sql("haversin(1, 2, 3, 4)", None)
    # DSL routing: lang "expression" reaches the adapter
    assert _script_src({"source": "sqrt(doc['x'])", "lang": "expression"}) \
        == "sqrt(x)"
    # exponent numeric literals are valid expressions DECIMAL syntax —
    # the 'e' must never scan as a variable
    assert expression_to_sql("_score * 1e-3", None, "score") \
        == "(score * CAST(1e-3 AS DOUBLE))"
    assert expression_to_sql("2E5 + doc['x']", None) \
        == "(CAST(2E5 AS DOUBLE) + x)"
    # a bare variable that merely SHARES a marker name ('value', 'params',
    # 'doc', 'Math' not followed by a member chain) binds as a param...
    assert expression_to_sql("doc['a'].value * value", {"value": 2.0}) \
        == "(a * CAST(2.0 AS DOUBLE))"
    # ...and raises when it is not a params key, instead of leaking a raw
    # column reference into the SQL
    with pytest.raises(ValueError):
        expression_to_sql("value + 1", None)
    with pytest.raises(ValueError):
        expression_to_sql("doc + 1", None)


def test_script_id_and_source_both_rejected():
    """Script.java's parse rejects a script carrying both a stored id and
    an inline source — the DSL must 400, not silently pick one."""
    import pytest

    from opensearch_spark.search.queries import _script_src

    with pytest.raises(ValueError, match="not both"):
        _script_src({"id": "x", "source": "_score"})


def test_put_stored_script_validates_expression_lang():
    """put-time compile check covers lang=expression too (the reference
    compiles every stored script into the cache on put)."""
    import pytest

    from opensearch_spark.search.apis import (_STORED_SCRIPTS,
                                              put_stored_script)

    put_stored_script("__t_expr_ok", "sqrt(w) * _score", lang="expression")
    assert _STORED_SCRIPTS.pop("__t_expr_ok")["lang"] == "expression"
    with pytest.raises(ValueError):
        put_stored_script("__t_expr_bad", "sqrt(", lang="expression")
    assert "__t_expr_bad" not in _STORED_SCRIPTS


def test_decimal_literals_are_double_typed(spark):
    """Painless decimal literals are Java doubles: 10.0/3.0 must be the
    double quotient, not Spark's scale-limited DECIMAL division."""
    from pyspark.sql import functions as F

    sql = painless_to_sql("10.0 / 3.0", {})
    got = spark.range(1).select(F.expr(sql).alias("v")).first()["v"]
    assert got == 10.0 / 3.0  # 3.3333333333333335
    # params path and literal path agree
    sql2 = painless_to_sql("params.a / params.b", {"a": 10.0, "b": 3.0})
    got2 = spark.range(1).select(F.expr(sql2).alias("v")).first()["v"]
    assert got2 == got


def test_backslash_in_string_param_and_literal(spark):
    """Backslashes survive both engines: emitted via chr(92) concat since
    Spark interprets '\\t' inside quoted SQL strings and DuckDB does not."""
    import duckdb
    from pyspark.sql import functions as F

    sql = painless_to_sql("params.p", {"p": "C:\\temp"})
    got = spark.range(1).select(F.expr(sql).alias("v")).first()["v"]
    assert got == "C:\\temp"
    assert duckdb.sql(f"SELECT {sql} AS v").fetchone()[0] == "C:\\temp"
    # painless string literal with an escaped backslash
    sql2 = painless_to_sql('doc["lang"].value == "a\\\\b"', {})
    dd = duckdb.sql(f"SELECT ('a' || chr(92) || 'b') = 'x' AS v").fetchone()
    assert "chr(92)" in sql2
