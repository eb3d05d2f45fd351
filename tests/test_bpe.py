"""BPE training/encoding tests (ml/bpe.py).

Semantics pinned by an INDEPENDENT in-test reference implementation
(textbook Sennrich pair-merge loop written from scratch below), and the
distributed path is property-checked byte-identical to the local path.
"""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.ml.bpe import (EOW, bpe_encode, bpe_train,
                                     word_counts)


# --- independent reference (deliberately separate code path) -------------
def ref_train(texts: list[str], n_merges: int, min_freq: int = 2):
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split() if w)
    vocab = {}
    for w, c in wc.items():
        syms = tuple(w[:-1]) + (w[-1] + EOW,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for rank in range(n_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        top_f = max(stats.values())
        if top_f < min_freq:
            break
        pair = min(p for p, f in stats.items() if f == top_f)
        merges.append((rank, pair[0], pair[1], top_f))
        joined = pair[0] + pair[1]
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            nv[k] = nv.get(k, 0) + c
        vocab = nv
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest widest new",
]


def test_train_matches_independent_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in bpe_train(df, "text", n_merges=10).collect()]
    assert got == ref_train(TEXTS, 10)
    assert len(got) == 10


def test_distributed_path_identical_to_local(spark):
    # the core property: on the SAME word table, the batched distributed
    # loop is byte-identical to the local loop (min_freq=1 disables the
    # over-threshold prune so both postures see identical input)
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    local = bpe_train(df, "text", n_merges=8, min_freq=1).collect()
    stats: dict = {}
    dist = bpe_train(df, "text", n_merges=8, min_freq=1,
                     collect_threshold=0, stats_out=stats).collect()
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    assert stats["posture"] == "distributed"
    # batching must beat one-round-per-merge on this corpus
    assert stats["rounds"] <= stats["n_merges"]


ADVERSARIAL_BATCH_CASES = [
    # flat frequency ties everywhere: every pair freq 2, maximal
    # same-tier interference -> batches collapse to the sequential
    # fallback; output must still equal the reference exactly
    ["ab ab cd cd ad ad db db", "ba ba dc dc"],
    # chained interference: merging (a,b) creates ab, whose pairs
    # compete with the next-ranked candidates
    ["aab aab aab abb abb ab ab ab", "aabb aabb"],
    # single-char runs (overlap counting) + merged-symbol collision:
    # 'aa' produced by rank-0 merge also pre-exists as a pair context
    ["aaaa aaaa aaa aa aa aa", "a aa aaa"],
    # distinct tiers, fully disjoint pairs: the whole vocabulary should
    # batch in very few rounds
    ["xy " * 9 + "uv " * 8 + "pq " * 7 + "mn " * 6 + "jk " * 5],
]


@pytest.mark.parametrize("texts", ADVERSARIAL_BATCH_CASES)
def test_distributed_batching_exact_on_adversarial_corpora(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    stats: dict = {}
    dist = [(r["rank"], r["left"], r["right"], r["freq"])
            for r in bpe_train(df, "text", n_merges=12, min_freq=1,
                               collect_threshold=0,
                               stats_out=stats).collect()]
    assert dist == ref_train(texts, 12, min_freq=1)


def test_over_threshold_posture_prunes_then_trains_locally(spark):
    # above collect_threshold with min_freq>1, the word table is pruned
    # to words with count >= min_freq (the HF/SentencePiece floor) and —
    # pruned table fitting — trained LOCALLY, never one-job-per-merge
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    stats: dict = {}
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in bpe_train(df, "text", n_merges=8, min_freq=2,
                              collect_threshold=4,
                              stats_out=stats).collect()]
    assert stats["posture"] == "local_pruned"
    from collections import Counter
    wc = Counter(w for t in TEXTS for w in t.split() if w)
    kept = [w for t in TEXTS for w in t.split() if w and wc[w] >= 2]
    # reference trained over the pruned corpus (each kept word repeated
    # its original number of times)
    assert got == ref_train([" ".join(kept)], 8, min_freq=2)


def test_incremental_local_trainer_matches_reference_property():
    """_train_local's incremental pair-stats + lazy-heap selection must
    be byte-identical to the textbook rebuild loop on random corpora
    (overlap counting, lex tie-breaks, min_freq stop — all of it)."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from opensearch_spark.ml.bpe import _train_local

    words = st.text(alphabet="abc", min_size=1, max_size=6)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(words, min_size=1, max_size=30),
           st.integers(min_value=1, max_value=12),
           st.integers(min_value=1, max_value=3))
    def run(ws, n_merges, min_freq):
        wc = sorted(Counter(ws).items())
        got = _train_local(wc, n_merges, min_freq)
        want = ref_train([" ".join(ws)], n_merges, min_freq)
        assert got == want

    run()


def test_min_freq_stops_training(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    # every pair occurs once -> nothing reaches min_freq=2
    assert bpe_train(df, "text", n_merges=5).count() == 0


def test_encode_applies_merges_in_rank_order(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = [(r["left"], r["right"])
              for r in bpe_train(df, "text", n_merges=10).collect()]
    enc = spark.createDataFrame(
        [(0, "low lowest"), (1, "newest")], "doc_id long, text string")
    rows = {r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in bpe_encode(enc, "text", merges).collect()}
    # every word reassembles to itself + EOW terminator
    for did, (toks, n) in rows.items():
        assert n == len(toks)
    joined0 = "".join(rows[0][0])
    assert joined0 == "low" + EOW + "lowest" + EOW
    # 'newest' seen 7x in training -> should compress to few tokens
    assert rows[1][1] <= 3


def test_word_counts_is_single_shuffle(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    plan = word_counts(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_eow_prevents_cross_word_merges(spark):
    # 'ab ba' repeated: without EOW, (b, a) would be countable across the
    # word boundary; with EOW the only 2-freq pairs are within words
    df = spark.createDataFrame([("ab ab ba ba",)], "text string")
    merges = [(r["left"], r["right"]) for r in
              bpe_train(df, "text", n_merges=2).collect()]
    for left, right in merges:
        assert not (left.endswith(EOW))  # never merge past a word end


# --- the DuckDB SQL-oracle twin vs the independent reference -------------
# (no Spark: validates the generated recursive-CTE SQL in entry_queries
# against ref_train / a test-local encode on adversarial corpora)

ORACLE_CASES = [
    ["low low low low low", "lower lower newest newest newest"],
    # ties in pair frequency -> (left, right) ASC must break them
    ["ab ab", "cd cd", "ef ef"],
    # runs of one char: greedy left-to-right overlap semantics
    ["aaaa aaaa aaa", "aaaaa"],
    # single-char words (no pairs from them) + min_freq cutoff tail
    ["a b c d", "a a b b", "xyz"],
    # multi-space / tab separators; trailing whitespace
    ["one  two\tthree  ", "  one one\ttwo"],
    # words where a merged token could prefix another pair
    ["abc abc bcd bcd abcd abcd"],
]


def _duck_with_docs(texts):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents", pdf)
    return con


@pytest.mark.parametrize("texts", ORACLE_CASES)
def test_train_sql_oracle_matches_reference(texts):
    from opensearch_spark.entry_queries import _bpe_train_sql

    con = _duck_with_docs(texts)
    got = [tuple(r) for r in con.sql(_bpe_train_sql()).fetchall()]
    want = ref_train(texts, 16)
    assert got == want


@pytest.mark.parametrize("texts", ORACLE_CASES)
def test_encode_sql_oracle_matches_reference(texts):
    from opensearch_spark.entry_queries import _bpe_encode_sql

    merges = [(l, r) for _, l, r, _ in ref_train(texts, 16)]

    def enc_len(word):  # rank-order replay, greedy left-to-right
        syms = list(word[:-1]) + [word[-1] + EOW]
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    con = _duck_with_docs(texts)
    got = {r[0]: r[1]
           for r in con.sql(_bpe_encode_sql(max_doc=len(texts))).fetchall()}
    want = {i: sum(enc_len(w) for w in t.split() if w)
            for i, t in enumerate(texts)}
    assert got == want
