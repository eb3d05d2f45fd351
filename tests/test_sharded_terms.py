"""Sharded terms aggregation: distributed approximation contract.

Reference behavior: ``search/aggregations/bucket/terms/
TermsAggregator.java`` + ``InternalTerms.java`` (per-shard top
shard_size lists merged with doc-count error accounting).
"""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from opensearch_spark.search.sharded_terms import sharded_terms

NSHARDS, SHARD_SIZE, SIZE = 8, 10, 5


def _independent_oracle(rows, nshards, shard_size, size):
    """Pure-Python reimplementation from the reference's description —
    dict/Counter based, no SQL, no window functions."""
    by_shard = defaultdict(Counter)
    for key, term in rows:
        by_shard[key % nshards][term] += 1
    tops, shard_min = {}, {}
    for shard, counts in by_shard.items():
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        taken = ordered[:shard_size]
        tops[shard] = dict(taken)
        # a shard that returned fewer than shard_size buckets reported
        # everything it had -> contributes 0; at exactly shard_size the
        # coordinator cannot tell and stays conservative (min of taken)
        shard_min[shard] = taken[-1][1] if len(taken) >= shard_size else 0
    s = sum(shard_min.values())
    merged = {}
    for term in {t for top in tops.values() for t in top}:
        cnt = sum(top.get(term, 0) for top in tops.values())
        err = sum(shard_min[sh] for sh, top in tops.items()
                  if term not in top)
        merged[term] = (cnt, err)
    topk = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))[:size]
    other = len(rows) - sum(c for _, (c, _) in topk)
    return [(term, cnt, err, other, s) for term, (cnt, err) in topk]


@pytest.fixture(scope="module")
def orders_rows(spark, sf_dir):
    return [(r["o_orderkey"], r["o_custkey"]) for r in
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderkey", "o_custkey").collect()]


@pytest.fixture(scope="module")
def got(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return sharded_terms(
        df, "o_custkey", F.pmod(F.col("o_orderkey"), F.lit(NSHARDS)),
        NSHARDS, SHARD_SIZE, SIZE).collect()


class TestShardedTerms:
    def test_matches_independent_oracle(self, orders_rows, got):
        want = _independent_oracle(orders_rows, NSHARDS, SHARD_SIZE, SIZE)
        assert [(r["term"], r["doc_count"], r["doc_count_error"],
                 r["sum_other_doc_count"], r["error_upper_bound"])
                for r in got] == want

    def test_error_bound_covers_exact_counts(self, orders_rows, got):
        # the contract the reference documents: the true count of any
        # returned term is within [doc_count, doc_count + doc_count_error]
        exact = Counter(term for _, term in orders_rows)
        for r in got:
            assert r["doc_count"] <= exact[r["term"]] <= \
                r["doc_count"] + r["doc_count_error"]

    def test_approximation_is_real_here(self, orders_rows, got):
        # fixture sanity: with document routing the merged counts genuinely
        # under-count (per-shard truncation hides tail contributions), so
        # this gate exercises the distributed path, not a degenerate case
        exact = Counter(term for _, term in orders_rows)
        assert any(r["doc_count"] < exact[r["term"]] for r in got)
        assert all(r["error_upper_bound"] > 0 for r in got)

    def test_exhaustive_shards_have_zero_error(self, spark):
        # every shard holds fewer distinct terms than shard_size -> every
        # shard reports everything -> all errors 0 and counts exact
        rows = [(i, i % 3) for i in range(60)]
        df = spark.createDataFrame(rows, "k long, term long")
        out = sharded_terms(df, "term", F.pmod(F.col("k"), F.lit(4)),
                            4, 10, 3).collect()
        assert [(r["term"], r["doc_count"]) for r in out] == \
            [(0, 20), (1, 20), (2, 20)]
        assert all(r["doc_count_error"] == 0 and r["error_upper_bound"] == 0
                   for r in out)
        assert out[0]["sum_other_doc_count"] == 0
