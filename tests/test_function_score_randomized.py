"""Randomized function_score vs an independent Python evaluation.

Gates pin one decay/fvf/random_score configuration each; this seeded
sweep draws random function stacks (gauss/exp/linear decays with random
origin/scale/offset/decay, field_value_factor with every modifier,
deterministic random_score), random score_mode/boost_mode combinations
and weights, and recomputes every score in plain Python from the
published formulas (DecayFunctionBuilder.java / 
FieldValueFactorFunctionBuilder.java math)."""

import math
import random

import pytest

from opensearch_spark.entry_queries import get_searcher
from opensearch_spark.search import queries as Q

SF = "/root/testdata/sf0.001"


def _py_function(fn, row):
    if fn.kind in ("gauss", "exp", "linear"):
        dist = max(abs(float(row[fn.field]) - fn.origin) - fn.offset, 0.0)
        if fn.kind == "gauss":
            sigma2 = -(fn.scale ** 2) / (2.0 * math.log(fn.decay))
            v = math.exp(-(dist * dist) / (2.0 * sigma2))
        elif fn.kind == "exp":
            v = math.exp(math.log(fn.decay) / fn.scale * dist)
        else:
            s = fn.scale / (1.0 - fn.decay)
            v = max((s - dist) / s, 0.0)
    elif fn.kind == "field_value_factor":
        x = (row[fn.field] if row[fn.field] is not None else fn.missing) \
            * fn.factor
        v = {"none": x, "log1p": math.log10(x + 1.0),
             "ln1p": math.log(x + 1.0), "sqrt": math.sqrt(x),
             "square": x * x, "reciprocal": 1.0 / x}[fn.modifier]
    elif fn.kind == "random_score":
        v = ((row["doc_id"] * 48271 + fn.seed) % 2147483647) / 2147483647.0
    else:
        raise AssertionError(fn.kind)
    return v * fn.weight


def test_function_score_randomized_vs_python(spark):
    s = get_searcher(spark, SF)
    base_q = Q.Term("lang", "en")
    docs = {r["doc_id"]: r for r in
            s.index.docs(spark).select("doc_id", "n_chars", "lang")
            .collect()}
    matches = [d for d, r in docs.items() if r["lang"] == "en"]
    rng = random.Random(0xF5)
    for case in range(12):
        fns = []
        for _ in range(rng.randint(1, 3)):
            kind = rng.choice(["gauss", "exp", "linear",
                               "field_value_factor", "random_score"])
            if kind in ("gauss", "exp", "linear"):
                fns.append(Q.ScoreFunction(
                    kind=kind, field="n_chars",
                    origin=rng.uniform(0, 500),
                    scale=rng.uniform(20, 300),
                    offset=rng.uniform(0, 50),
                    decay=rng.uniform(0.1, 0.9),
                    weight=rng.uniform(0.5, 2.0)))
            elif kind == "field_value_factor":
                fns.append(Q.ScoreFunction(
                    kind=kind, field="n_chars",
                    factor=rng.uniform(0.01, 2.0),
                    modifier=rng.choice(["none", "log1p", "ln1p", "sqrt",
                                         "square", "reciprocal"]),
                    missing=1.0, weight=rng.uniform(0.5, 2.0)))
            else:
                fns.append(Q.ScoreFunction(
                    kind=kind, seed=rng.randrange(10_000),
                    weight=rng.uniform(0.5, 2.0)))
        score_mode = rng.choice(["multiply", "sum", "avg", "max", "min"])
        boost_mode = rng.choice(["replace", "multiply", "sum", "avg",
                                 "max", "min"])
        boost = rng.choice([1.0, 2.0, 0.5])
        q = Q.FunctionScore(query=base_q, functions=fns,
                            score_mode=score_mode, boost_mode=boost_mode,
                            boost=boost)
        got = {r["doc_id"]: r["score"] for r in s.score(q).collect()}
        assert set(got) == set(matches), f"case {case}: match set"
        for d in matches:
            vals = [_py_function(fn, docs[d]) for fn in fns]
            comb = {"multiply": math.prod(vals), "sum": sum(vals),
                    "avg": sum(vals) / len(vals), "max": max(vals),
                    "min": min(vals)}[score_mode]
            sub = 1.0  # Term in scoring context: constant boost 1.0
            want = {"replace": comb, "multiply": sub * comb,
                    "sum": sub + comb, "avg": (sub + comb) / 2.0,
                    "max": max(sub, comb),
                    "min": min(sub, comb)}[boost_mode] * boost
            assert got[d] == pytest.approx(want, rel=1e-9), \
                f"case {case} doc {d}: {score_mode}/{boost_mode}"
