"""query_then_fetch vs dfs_query_then_fetch shard-statistics semantics.

Reference: action/search/SearchType.java:55,62 — the default
query_then_fetch scores with shard-local term statistics (routing-
dependent scores); dfs_query_then_fetch aggregates df/collection stats
globally first and is rank-identical to a single-index search.
"""

import pytest

from opensearch_spark.entry_queries import get_searcher
from opensearch_spark.search.dfs import sharded_search
from opensearch_spark.search.queries import Match

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def s(spark):
    return get_searcher(spark, SF)


def _rows(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def test_dfs_identical_to_global_search(s, spark):
    """dfs=True must reproduce the plain single-index match top-k exactly
    (same docs, same scores) — AggregatedDfs makes sharding invisible."""
    got = sharded_search(s, "spark merge", n_shards=4, k=10, dfs=True)
    want = s.search(Match(field="text", text="spark merge"), k=10,
                    mode="exhaustive", round_scores=4)
    assert _rows(got) == _rows(want)


def test_single_shard_equals_global_either_mode(s, spark):
    """With one shard, local stats ARE global stats: both modes match the
    plain search."""
    want = _rows(s.search(Match(field="text", text="spark merge"), k=10,
                          mode="exhaustive", round_scores=4))
    for dfs in (False, True):
        got = _rows(sharded_search(s, "spark merge", n_shards=1, k=10, dfs=dfs))
        assert got == want, f"dfs={dfs}"


def test_query_then_fetch_scores_are_routing_dependent(s, spark):
    """Shard-local df/avgdl must actually move the numbers: at 4 shards
    the default search type's scores differ from the global ones for at
    least one returned doc (the skew dfs_query_then_fetch exists to fix)."""
    local = dict(_rows(sharded_search(s, "spark merge", n_shards=4, k=10,
                                      dfs=False)))
    glob = dict(_rows(s.search(Match(field="text", text="spark merge"),
                               k=200, mode="exhaustive", round_scores=4)))
    overlap = set(local) & set(glob)
    assert overlap, "no common docs to compare"
    assert any(local[d] != glob[d] for d in overlap)


def test_shard_column_is_routing(s, spark):
    rows = sharded_search(s, "spark merge", n_shards=4, k=10,
                          dfs=False).collect()
    assert rows and all(r.shard == r.doc_id % 4 for r in rows)


def test_empty_query_terms(s, spark):
    out = sharded_search(s, "", n_shards=4, k=10, dfs=False)
    assert out.count() == 0
    assert out.columns == ["doc_id", "shard", "score"]
