"""Property test: random Painless expression trees compile to SQL that
evaluates (DuckDB) exactly like an independent Python evaluation.

Division is excluded by design — the compiler documents SQL double
semantics for ``/`` (Painless/Java would truncate long/long)."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from opensearch_spark.search.painless import painless_to_sql

ROWS = [
    {"n": 0, "v": 1.5},
    {"n": 7, "v": -0.25},
    {"n": 13, "v": 4.0},
]
PARAMS = {"p": 3, "q": 0.5}


def _leaf():
    return st.sampled_from([
        ("doc['n'].value", lambda r: r["n"]),
        ("doc['v'].value", lambda r: r["v"]),
        ("params.p", lambda r: PARAMS["p"]),
        ("params.q", lambda r: PARAMS["q"]),
        ("2", lambda r: 2),
        ("0.5", lambda r: 0.5),
        ("3.0", lambda r: 3.0),
    ])


def _combine(children):
    def node(op):
        a_src, a_py = op[1]
        b_src, b_py = op[2]
        kind = op[0]
        if kind == "+":
            return (f"({a_src} + {b_src})", lambda r: a_py(r) + b_py(r))
        if kind == "-":
            return (f"({a_src} - {b_src})", lambda r: a_py(r) - b_py(r))
        if kind == "*":
            return (f"({a_src} * {b_src})", lambda r: a_py(r) * b_py(r))
        if kind == "max":
            return (f"Math.max({a_src}, {b_src})",
                    lambda r: max(a_py(r), b_py(r)))
        if kind == "min":
            return (f"Math.min({a_src}, {b_src})",
                    lambda r: min(a_py(r), b_py(r)))
        if kind == "abs":
            return (f"Math.abs({a_src} - {b_src})",
                    lambda r: abs(a_py(r) - b_py(r)))
        # ternary on a comparison
        return (f"({a_src} > {b_src} ? {a_src} : {b_src})",
                lambda r: a_py(r) if a_py(r) > b_py(r) else b_py(r))

    return st.tuples(
        st.sampled_from(["+", "-", "*", "max", "min", "abs", "?"]),
        children, children).map(node)


EXPRS = st.recursive(_leaf(), _combine, max_leaves=12)


@settings(max_examples=150, deadline=None)
@given(EXPRS)
def test_compiled_sql_equals_python_eval(expr):
    src, py = expr
    sql = painless_to_sql(src, PARAMS)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT, v DOUBLE)")
    for r in ROWS:
        con.execute("INSERT INTO t VALUES (?,?)", [r["n"], r["v"]])
    got = [x[0] for x in con.sql(f"SELECT {sql} FROM t").fetchall()]
    want = [py(r) for r in ROWS]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12, abs=1e-12)
