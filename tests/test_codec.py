"""Varbyte/delta posting-block codec round-trip + property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_block,
    make_blocks,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_known():
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert list(varbyte_decode(b"\x80\x01")) == [128]


@settings(max_examples=200)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**56 - 1), min_size=0, max_size=500
    )
)
def test_varbyte_round_trip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == xs


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
def test_block_round_trip(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    docs_vb, tfs_vb = encode_block(docs, tfs)
    d2, t2 = decode_block(int(docs[0]), docs_vb, tfs_vb, len(postings))
    assert list(d2) == list(docs)
    assert list(t2) == list(tfs)


def test_make_blocks_chunks_and_metadata():
    n = 300
    docs = np.arange(n) * 3
    tfs = (np.arange(n) % 7) + 1
    imp = tfs / (tfs + 1.0)
    rows = make_blocks(docs, tfs, imp)
    assert len(rows) == 3
    assert [r[3] for r in rows] == [BLOCK_SIZE, BLOCK_SIZE, n - 2 * BLOCK_SIZE]
    # blocks are disjoint, sorted ranges
    assert rows[0][2] < rows[1][1] and rows[1][2] < rows[2][1]
    # decode all and compare
    got_docs, got_tfs = [], []
    for seq, first, last, cnt, max_tf, max_imp, dvb, tvb in rows:
        d, t = decode_block(first, dvb, tvb, cnt)
        assert d[-1] == last and t.max() == max_tf
        got_docs += list(d)
        got_tfs += list(t)
    assert got_docs == list(docs) and got_tfs == list(tfs)
    assert abs(rows[0][5] - float(imp[:BLOCK_SIZE].max())) < 1e-12


def test_make_blocks_batch_equals_make_blocks():
    import numpy as np

    from opensearch_spark.index.codec import make_blocks, make_blocks_batch

    rng = np.random.default_rng(7)
    rows = []
    for term, bucket, n in [("a", 0, 1), ("a", 1, 300), ("b", 0, 128),
                            ("c", 2, 129), ("d", 0, 5)]:
        docs = np.sort(rng.choice(100000, size=n, replace=False))
        tfs = rng.integers(1, 50, size=n)
        dls = rng.integers(10, 400, size=n)
        rows.append((term, bucket, docs, tfs, dls))
    k1, b, avgdl = 1.2, 0.75, 120.0
    # reference: per-group make_blocks
    expected = []
    for term, bucket, docs, tfs, dls in rows:
        imp = tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
        for r in make_blocks(docs, tfs, imp, dls=dls):
            expected.append((term, bucket) + r)
    # batch path over the concatenated arrays
    terms = np.concatenate([[t] * len(d) for t, _b, d, _t, _l in rows])
    buckets = np.concatenate([[bk] * len(d) for _t, bk, d, _tf, _l in rows])
    docs = np.concatenate([d for _t, _b, d, _tf, _l in rows])
    tfs = np.concatenate([t for _x, _b, _d, t, _l in rows])
    dls = np.concatenate([l for _x, _b, _d, _t, l in rows])
    starts = np.cumsum([0] + [len(d) for _t, _b, d, _tf, _l in rows][:-1])
    imp = tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
    got = make_blocks_batch(terms, buckets, docs, tfs, imp, dls,
                            np.asarray(starts))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == e, (g[:6], e[:6])
