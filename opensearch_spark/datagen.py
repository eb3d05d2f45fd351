"""Deterministic synthetic source-code corpus — the input table of the
north rule: ``corpus(repo, path, commit, lang, content)`` (FIXTURES.md §1).

Seed=42, no RNG objects in Spark tasks: every value is a pure function of
the row index (hash-mixed), so any scale regenerates identically and
distributed generation needs no coordination. Guaranteed hot terms
(``import``, ``def``, ``return`` in >60% of docs) exercise term-skew
salting; ``uniq_<i>`` markers give every doc an exact-match handle.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "py", "py", "java", "go", "js", "rs", "c", "md"]  # zipf-ish
_VOCAB = [
    "parse", "reader", "writer", "buffer", "stream", "index", "block",
    "parquet", "schema", "column", "row", "batch", "merge", "sort", "hash",
    "join", "scan", "filter", "query", "score", "token", "term", "doc",
    "shard", "segment", "cache", "flush", "commit", "split", "encode",
    "decode", "vector", "matrix", "graph", "node", "edge", "tree", "heap",
    "queue", "stack", "list", "map", "set", "iter", "util", "core", "api",
]


def _h(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{i}:42".encode()).hexdigest()[:8], 16)


def _zipf_word(x: int) -> str:
    # zipf-skewed pick: rank r with prob ∝ 1/(r+1)
    n = len(_VOCAB)
    v = x % (n * (n + 1) // 2)
    r = 0
    acc = n
    while v >= acc:
        r += 1
        acc += n - r
    return _VOCAB[r]


def gen_row(i: int) -> tuple[str, str, str, str, str]:
    repo = f"org{i % 7}/proj{i % 23}"
    lang = LANGS[_h(i, "lang") % len(LANGS)]
    path = f"src/mod{_h(i, 'dir') % 17}/file_{i}.{lang}"
    commit = hashlib.sha1(f"{repo}:{path}:42".encode()).hexdigest()
    words = []
    n_funcs = 2 + _h(i, "nf") % 4
    for f in range(n_funcs):
        base = _h(i, f"fn{f}")
        name1 = _zipf_word(base)
        name2 = _zipf_word(base >> 7)
        if base % 10 < 7:  # hot terms in ~70% of functions
            words += ["import", name1]
        words += ["def", f"{name1}_{name2}", "(", "x", ")", ":"]
        body_len = 5 + (base % 20)
        for w in range(body_len):
            words.append(_zipf_word(_h(i, f"w{f}:{w}")))
        words += ["return", name2]
    words.append(f"uniq_{i}")
    content = " ".join(words)
    return (repo, path, commit, lang, content)


def generate_corpus(spark: SparkSession, n_rows: int,
                    n_partitions: int = 32) -> DataFrame:
    """Distributed deterministic generation: each partition derives its row
    range from its index — no driver-side materialization, scales to any
    n_rows."""
    rows_per = (n_rows + n_partitions - 1) // n_partitions
    seed_df = spark.range(0, n_partitions, 1, n_partitions)

    def gen(batches):
        for pdf in batches:
            for pid in pdf["id"]:
                start = int(pid) * rows_per
                end = min(start + rows_per, n_rows)
                if start >= end:
                    continue
                data = [gen_row(i) for i in range(start, end)]
                yield pd.DataFrame(
                    data, columns=["repo", "path", "commit", "lang", "content"])

    return seed_df.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string")
