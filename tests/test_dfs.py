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


def test_dfs_identity_survives_soft_deletes(spark, tmp_path_factory):
    """AggregatedDfs ships the coordinator's (delete-inclusive) Lucene
    stats, so the dfs≡global identity must hold with tombstones present:
    both sides drop the deleted doc from HITS but keep scoring with the
    stale df/N/avgdl until an expunging rebuild."""
    from opensearch_spark.index.build import (IndexConfig, InvertedIndex,
                                              build_index, delete_docs)
    from opensearch_spark.search import Searcher

    corpus = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    path = str(tmp_path_factory.mktemp("dfsdel") / "idx")
    build_index(spark, corpus, path,
                IndexConfig(field="text", analyzer="standard",
                            keyword_cols=("lang",), n_parts=4,
                            bucket_span=1 << 12, with_positions=False))
    s0 = Searcher(spark, InvertedIndex(path))
    base = s0.search(Match(field="text", text="spark merge"), k=5,
                     mode="exhaustive", round_scores=4).collect()
    assert base
    delete_docs(spark, path, [base[0].doc_id])
    s1 = Searcher(spark, InvertedIndex(path))

    got = sharded_search(s1, "spark merge", n_shards=4, k=10, dfs=True)
    want = s1.search(Match(field="text", text="spark merge"), k=10,
                     mode="exhaustive", round_scores=4)
    assert _rows(got) == _rows(want)
    assert base[0].doc_id not in {d for d, _ in _rows(got)}


def test_honors_index_k1_b(spark, tmp_path_factory):
    """sharded_search must score with the index's configured BM25
    parameters, not the library defaults."""
    from opensearch_spark.index.build import (IndexConfig, InvertedIndex,
                                              build_index)
    from opensearch_spark.search import Searcher

    corpus = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    path = str(tmp_path_factory.mktemp("dfskb") / "idx")
    build_index(spark, corpus, path,
                IndexConfig(field="text", analyzer="standard",
                            keyword_cols=("lang",), n_parts=4,
                            bucket_span=1 << 12, with_positions=False,
                            k1=0.9, b=0.3))
    s1 = Searcher(spark, InvertedIndex(path))
    got = sharded_search(s1, "spark merge", n_shards=4, k=10, dfs=True)
    want = s1.search(Match(field="text", text="spark merge"), k=10,
                     mode="exhaustive", round_scores=4)
    assert _rows(got) == _rows(want)
