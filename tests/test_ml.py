"""Dedup / similarity / multimodal semantics vs brute-force baselines."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_spark.ml import dedup as D
from opensearch_spark.ml import similarity as S
from opensearch_spark.ml.multimodal import extract_features, fake_decode, frame_sample

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_simhash_banded_pairs_equal_bruteforce(spark, docs):
    fp = D.simhash(docs.limit(120), "text").persist()
    banded = {(r["a"], r["b"]) for r in D.simhash_pairs(fp, max_hamming=6).collect()}
    rows = fp.collect()
    brute = set()
    for i, ra in enumerate(rows):
        for rb in rows[i + 1:]:
            a, b = sorted((ra["doc_id"], rb["doc_id"]))
            if bin(ra["simhash"] ^ rb["simhash"]).count("1") <= 6:
                brute.add((a, b))
    assert banded == brute


def test_simhash64_banded_pairs_equal_bruteforce(spark, docs):
    """The 64-bit real-corpus posture (16-bit band keys at k=3 — the
    non-quadratic banding; round-4 scale fix): banded pairs must equal
    the brute-force hamming enumeration, including negative-long
    fingerprints (xxhash64 sign bit)."""
    fp = D.simhash(docs.limit(120), "text", bits=64).persist()
    banded = {(r["a"], r["b"])
              for r in D.simhash_pairs(fp, max_hamming=3,
                                       bits=64).collect()}
    rows = fp.collect()
    assert any(r["simhash"] < 0 for r in rows), \
        "need sign-bit coverage for the unsigned-shift path"
    brute = set()
    for i, ra in enumerate(rows):
        for rb in rows[i + 1:]:
            a, b = sorted((ra["doc_id"], rb["doc_id"]))
            x = (ra["simhash"] ^ rb["simhash"]) & ((1 << 64) - 1)
            if bin(x).count("1") <= 3:
                brute.add((a, b))
    assert banded == brute


def test_minhash_candidates_are_true_jaccard(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, "text", n=2, threshold=0.5).collect()
    # verified jaccard really >= threshold, and LSH pairs ⊆ exact pairs
    sh = D.shingles(docs, "text", n=2)
    exact = {(r["a"], r["b"]): r["jaccard"]
             for r in D.jaccard_pairs(sh, 0.5).collect()}
    for r in pairs:
        assert (r["a"], r["b"]) in exact
        assert r["jaccard"] == exact[(r["a"], r["b"])]


def test_lsh_topk_recall(spark, emb):
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qv, k=10, exclude_id=0).collect()]
    approx = [r["vec_id"] for r in
              S.lsh_topk(emb, qv, k=10, n_planes=6, multiprobe=2,
                         exclude_id=0).collect()]
    recall = len(set(exact) & set(approx)) / 10.0
    assert recall >= 0.4  # multiprobe LSH on 500 vecs; exactness not expected
    # every LSH hit carries its true cosine (re-rank is exact)
    exact_all = {r["vec_id"]: r["cosine"]
                 for r in S.cosine_scores(emb, qv).collect()}
    for r in S.lsh_topk(emb, qv, k=10, n_planes=6, multiprobe=2,
                        exclude_id=0).collect():
        assert r["cosine"] == exact_all[r["vec_id"]]


def test_embedding_near_dup_bucket_subset_of_exact(spark, emb):
    sub = emb.limit(150)
    got = {(r["a"], r["b"]) for r in
           S.embedding_near_dup_pairs(sub, threshold=0.8).collect()}
    rows = sub.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    brute = set()
    for i, a in enumerate(sorted(vecs)):
        for b in sorted(vecs)[i + 1:]:
            va, vb = vecs[a], vecs[b]
            c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if round(c, 4) >= 0.8:
                brute.add((a, b))
    assert got <= brute  # LSH may miss; must never invent


def test_multimodal_feature_plumbing(spark):
    rows = [(i, "image", bytes([i] * (100 + i)), 8, 8) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary, width int, height int")
    feats = extract_features(df).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feat"]) == 2 * 2 * 3  # grid² cells × RGB
        assert r["n_bytes"] == 100 + r["doc_id"]
    # deterministic: same payload → same features
    again = extract_features(df).collect()
    assert sorted((r["doc_id"], tuple(r["feat"])) for r in feats) == \
           sorted((r["doc_id"], tuple(r["feat"])) for r in again)
    # decode parity with direct call
    img = fake_decode(bytes([0] * 100), 8, 8)
    assert img.shape == (8, 8, 3)


def test_multimodal_real_decoder_stub():
    from opensearch_spark.ml.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"x", 1, 1)


def test_frame_sample(spark):
    df = spark.createDataFrame(
        [(1, "video", bytes(6 * 1024), 0, 0)],
        "doc_id long, media_type string, payload binary, width int, height int")
    idx = [r["frame_idx"] for r in frame_sample(df, every_n=2).collect()]
    assert idx == [0, 2, 4]  # 6 KiB → 6 fake frames (0..5), step 2


def test_exact_dedup_finds_planted_dups(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["dup_count"])
           for r in D.exact_dedup(df, "text").collect()}
    assert got == {(1, 3), (3, 1)}


def test_textstats_quality_and_fingerprint(spark):
    from opensearch_spark.ml.textstats import fingerprint, lang_id, quality_score

    rows = [(1, "the cat sat of the mat now then"),
            (2, "der die das und etwas"),
            (3, "zz qq ww")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = {r["doc_id"]: r for r in quality_score(df, "text").collect()}
    assert q[1]["n_stopwords"] >= 2 and q[1]["quality"] > q[3]["quality"]
    langs = {r["doc_id"]: r["pred_lang"] for r in lang_id(df, "text").collect()}
    assert langs[1] == "en" and langs[2] == "de" and langs[3] == "und"
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "text").collect()}
    df2 = spark.createDataFrame([(9, "mat the of cat sat now then the")],
                                "doc_id long, text string")
    fp9 = fingerprint(df2, "text").first()["fingerprint"]
    assert fp9 == fp[1]  # order/duplication-invariant


def test_hybrid_rrf_fusion_properties(spark, sf_dir):
    """Docs present in BOTH legs outrank equal-rank single-leg docs; the
    fused frame is bounded by k and sorted by fused score."""
    from opensearch_spark.entry_queries import get_searcher
    from opensearch_spark.ml import similarity as S
    from opensearch_spark.search import queries as Q
    from pyspark.sql import functions as F

    s = get_searcher(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    q = Q.Match(field="text", text="spark table")
    out = S.hybrid_rrf(s, q, emb, qv, k=10, n_candidates=30).collect()
    assert 0 < len(out) <= 10
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    bm_ids = {r["doc_id"] for r in
              s.search(q, k=30, mode="exhaustive").collect()}
    cos_ids = {r["vec_id"] for r in S.cosine_topk(emb, qv, k=30).collect()}
    both = bm_ids & cos_ids
    both_scores = [r["rrf_score"] for r in out if r["doc_id"] in both]
    if both_scores:
        # a doc in both lists has strictly higher fused score than the
        # best possible single-leg score at its ranks' sum
        assert max(both_scores) > 1.0 / (60 + 30)


def test_hybrid_minmax_bounds(spark, sf_dir):
    """Min-max hybrid scores lie in [0, 1] for equal weights and the
    best doc of a leg gets that leg's full weight."""
    from opensearch_spark.entry_queries import get_searcher
    from opensearch_spark.ml import similarity as S
    from opensearch_spark.search import queries as Q
    from pyspark.sql import functions as F

    s = get_searcher(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = S.hybrid_minmax(s, Q.Match(field="text", text="spark table"),
                          emb, qv, k=10, n_candidates=30).collect()
    assert out and all(0.0 <= r["hybrid_score"] <= 1.0 for r in out)
    # vec_id 0 is its own nearest neighbour → cosine leg max → >= 0.5
    top = max(r["hybrid_score"] for r in out)
    assert top >= 0.5


def test_sq8_topk_close_to_exact(spark):
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [r["vec_id"]
             for r in S.cosine_topk(emb, qv, k=10, exclude_id=0).collect()]
    quant = [r["vec_id"]
             for r in S.sq8_topk(emb, qv, k=10, exclude_id=0).collect()]
    # 8-bit quantization on 64-dim unit-ish vectors: top-10 nearly identical
    assert len(set(exact) & set(quant)) >= 8
    # deterministic
    again = [r["vec_id"]
             for r in S.sq8_topk(emb, qv, k=10, exclude_id=0).collect()]
    assert quant == again


def test_sq8_constant_corpus_raises(spark):
    import pytest as _pytest

    from opensearch_spark.ml import similarity as S

    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(3)], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        S.sq8_topk(df, [1.0, 1.0], k=2)


# ---------------- ExactSubstr duplicated spans ----------------
def test_substring_dup_spans_hand_checked(spark):
    from opensearch_spark.ml.dedup import substring_dup_spans

    # W=3. doc1 and doc2 share the run "a b c d" → windows "a b c" and
    # "b c d" are each seen twice; doc3 is unique; doc4 repeats "x y z"
    # TWICE WITHIN ITSELF (within-doc duplication must count).
    df = spark.createDataFrame(
        [(1, "a b c d e"),
         (2, "z a b c d"),
         (3, "p q r s t"),
         (4, "x y z w x y z")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           substring_dup_spans(df, "text", "doc_id", window_tokens=3).collect()}
    # doc1: windows at pos 0 ("a b c"), 1 ("b c d"), 2 ("c d e");
    # dup at 0,1 → union covers tokens [0,4) = 4 positions
    assert out[1].n_windows == 3
    assert out[1].n_dup_windows == 2 and out[1].dup_token_cov == 4
    # doc2: dup windows at pos 1,2 → coverage 4
    assert out[2].n_dup_windows == 2 and out[2].dup_token_cov == 4
    # doc3: nothing duplicated
    assert out[3].n_dup_windows == 0 and out[3].dup_token_cov == 0
    # doc4: "x y z" at pos 0 and 4 → two windows, NON-overlapping → 6
    assert out[4].n_dup_windows == 2 and out[4].dup_token_cov == 6
    # short doc: fewer tokens than the window → zero windows, no crash
    tiny = substring_dup_spans(
        spark.createDataFrame([(9, "a b")], "doc_id long, text string"),
        window_tokens=3).collect()
    assert tiny[0].n_windows == 0 and tiny[0].dup_token_cov == 0


def test_pq_adc_matches_numpy_reference(spark):
    """pq_encode + pq_adc_topk reproduce an independent numpy PQ exactly
    (codes AND rounded ADC distances) — pinning the fold semantics the
    oracle mirrors (first-max argmax, left-to-right distance-table sum)."""
    import numpy as np
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = S.pq_codebooks_fixed(4, 8, 16)
    qv = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    got = {r["vec_id"]: r["adc"]
           for r in S.pq_adc_topk(emb, qv, books, k=500).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    V = np.asarray([[float(x) for x in r["embedding"]] for r in rows],
                   dtype=np.float64)
    B = np.asarray(books)  # (4, 8, 16)
    ref = {}
    for r, v in zip(rows, V):
        adc = 0.0
        for m in range(4):
            sub = v[m * 16:(m + 1) * 16]
            # argmax 2*dot - ||c||^2, first max wins (np.argmax semantics)
            score = 2.0 * (B[m] @ sub) - (B[m] * B[m]).sum(axis=1)
            code = int(score.argmax())
            qsub = qv[m * 16:(m + 1) * 16]
            s = 0.0
            for x, y in zip(qsub, B[m][code]):
                s += (float(x) - float(y)) ** 2
            adc += s
        ref[r["vec_id"]] = round(adc, 6)
    assert set(got) == set(ref)
    for vid, adc in got.items():
        assert abs(adc - ref[vid]) < 1e-9, (vid, adc, ref[vid])


def test_pq_trained_beats_fixed_codebooks(spark):
    """Lloyd-trained codebooks (pq_train) reconstruct the corpus strictly
    better than the fixed md5 codebooks: mean ADC of each vector to its
    own reconstruction is lower — and recall@10 vs exact L2 is sane."""
    import numpy as np
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    trained = S.pq_train(emb, n_sub=4, ksub=8)
    fixed = S.pq_codebooks_fixed(4, 8, 16)
    assert len(trained) == 4 and all(len(b) == 8 for b in trained)
    rows = emb.select("vec_id", "embedding").collect()
    V = np.asarray([[float(x) for x in r["embedding"]] for r in rows])

    def mse(books):
        B = np.asarray(books)
        tot = 0.0
        for v in V:
            for m in range(4):
                sub = v[m * 16:(m + 1) * 16]
                d = ((B[m] - sub) ** 2).sum(axis=1)
                tot += float(d.min())
        return tot / len(V)

    assert mse(trained) < mse(fixed)
    # recall of trained-PQ ADC top-10 vs exact squared-L2 top-10, at a
    # finer geometry (16x16 = 64-bit codes): the synthetic embeddings are
    # near-random (no inter-subspace correlation for PQ to exploit), so
    # the bar is modest; the hard equality check is the numpy-parity test
    fine = S.pq_train(emb, n_sub=16, ksub=16)
    qv = [float(x) for x in rows[0]["embedding"]]
    exact = sorted(range(len(V)),
                   key=lambda i: float(((V[i] - np.asarray(qv)) ** 2).sum()))
    exact_ids = {rows[i]["vec_id"] for i in exact[:10]}
    got = {r["vec_id"]
           for r in S.pq_adc_topk(emb, qv, fine, k=10).collect()}
    assert len(got & exact_ids) >= 2


def test_pq_index_serving_parity_and_codes_only_scan(spark):
    """The materialized PqIndex serving path returns byte-identical
    results to the direct encode+score path, and its query plan reads
    ONLY the codes table (never the embedding column)."""
    import shutil
    import tempfile
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = S.pq_codebooks_fixed(4, 8, 16)
    qv = [float(x) for x in emb.where("vec_id = 2").first()["embedding"]]
    out = tempfile.mkdtemp(prefix="pqidx_")
    try:
        idx = S.PqIndex.build(emb, out, books)
        served = [tuple(r) for r in idx.topk(spark, qv, k=10).collect()]
        direct = [tuple(r)
                  for r in S.pq_adc_topk(emb, qv, books, k=10).collect()]
        assert served == direct
        plan = idx.topk(spark, qv, k=10)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "embedding" not in plan
        assert "code_0" in plan
        # reload from disk round-trips the codebooks
        again = S.PqIndex(out)
        assert again.codebooks == books
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_mjpg_video_features_real_decode(spark):
    """End-to-end real video pipeline: AVI/MJPG payloads decoded in
    mapInPandas, sampled-frame luma features match a driver-side
    reference decode exactly."""
    import numpy as np
    from opensearch_spark.ml.codecs import encode_avi_mjpg, decode_avi_mjpg
    from opensearch_spark.ml.multimodal import mjpg_video_features

    ones = np.ones((8, 8), np.int32)
    payloads = []
    for did in (1, 2):
        frames = [np.full((16, 16, 3), 30 * (did + i), dtype=np.uint8)
                  for i in range(5)]
        payloads.append((did, bytearray(encode_avi_mjpg(
            frames, fps=10, quant_luma=ones, quant_chroma=ones))))
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {(r["doc_id"], r["frame_idx"]): (r["fps"], r["n_frames"],
                                           r["mean_luma"], r["max_luma"])
           for r in mjpg_video_features(df, every_n=2).collect()}
    assert len(got) == 6  # frames 0,2,4 per doc
    for did, payload in payloads:
        fps, frames = decode_avi_mjpg(bytes(payload))
        for i in range(0, len(frames), 2):
            f = frames[i]
            luma = (0.299 * f[..., 0] + 0.587 * f[..., 1]
                    + 0.114 * f[..., 2])
            fps_g, n_g, mean_g, max_g = got[(did, i)]
            assert (fps_g, n_g) == (10, 5)
            assert abs(mean_g - float(luma.mean())) < 1e-9
            assert abs(max_g - float(luma.max())) < 1e-9


# ---------------------------------------------------------------- IVF-PQ

@pytest.fixture(scope="module")
def ivfpq_index(spark, sf_dir, tmp_path_factory):
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    cents = S.hyperplanes(8, dim)
    books = S.pq_codebooks_fixed(4, 8, dim // 4)
    out = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    return S.IvfPqIndex.build(emb, out, cents, books), cents, books


def test_ivfpq_prunes_partitions(ivfpq_index, spark, sf_dir):
    """The probe set must reach the codes scan as directory-level
    partition pruning — the nprobe/n_centroids I/O saving is structural,
    not a filter evaluated after the read."""
    idx, _, _ = ivfpq_index
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    df = idx.topk(spark, qv, k=5, nprobe=2, exclude_id=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "_c" in plan.split("PartitionFilters")[1][:200]
    # and the pruned scan never touches the raw vectors
    assert "embedding" not in plan.split("ReadSchema")[-1][:300]


def test_ivfpq_matches_numpy_reference(ivfpq_index, spark, sf_dir):
    """Engine codes + ADC vs an independent numpy IVF-PQ: coarse assign
    (argmin L2, ties to smallest j), residual encode, per-probe distance
    tables — exact agreement on codes and 1e-9 agreement on distances."""
    import numpy as np
    from opensearch_spark.ml import similarity as S

    idx, cents, books = ivfpq_index
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
              for r in emb.where(F.col("vec_id") < 40).collect()}
    C = np.array(cents)
    B = [np.array(b) for b in books]
    subdim = C.shape[1] // len(B)

    def np_encode(v):
        c = int(((v - C) ** 2).sum(axis=1).argmin())  # first-min ties
        res = v - C[c]
        codes = []
        for m, book in enumerate(B):
            sub = res[m * subdim:(m + 1) * subdim]
            codes.append(int(((sub - book) ** 2).sum(axis=1).argmin()))
        return c, codes

    got = {r[idx.id_col]: (int(r["_c"]), [int(r[f"code_{m}"])
                                          for m in range(len(B))])
           for r in idx.codes(spark)
           .where(F.col(idx.id_col) < 40).collect()}
    for vid, v in sample.items():
        c, codes = np_encode(v)
        assert got[vid] == (c, codes), f"vec {vid}: {got[vid]} != {(c, codes)}"

    # ADC distances: engine top-k values equal the numpy reconstruction
    qv = [float(x) for x in sample[0]]
    rows = idx.topk(spark, qv, k=10, nprobe=2).collect()
    probes = set(idx.probes(qv, 2))
    q = np.array(qv)
    for r in rows:
        vid = r[idx.id_col]
        c, codes = np_encode(sample[vid]) if vid in sample else (None, None)
        if c is None:
            continue
        assert c in probes
        qres = q - C[c]
        want = sum(((qres[m * subdim:(m + 1) * subdim] - B[m][codes[m]]) ** 2).sum()
                   for m in range(len(B)))
        assert abs(r["adc"] - round(float(want), 6)) < 1e-6


# ------------------------------------------------- batched encode + rerank

def test_pq_encode_batched_matches_expression_encode(spark, sf_dir):
    """The Arrow-batched numpy encode (production codebook sizes) emits
    the SAME codes as the literal Catalyst argmin fold (oracle-parity
    sizes) — plain and residual (IVF) modes both. Ties are measure-zero
    on md5-random codebooks, so exact equality is the right check."""
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    books = S.pq_codebooks_fixed(4, 8, dim // 4)

    expr = {r["vec_id"]: tuple(int(r[f"code_{m}"]) for m in range(4))
            for r in S.pq_encode(emb, books).collect()}
    batched = {r["vec_id"]: tuple(int(r[f"code_{m}"]) for m in range(4))
               for r in S.pq_encode_batched(emb, books).collect()}
    assert batched == expr

    # residual mode vs the IvfPq expression encode
    cents = S.hyperplanes(8, dim)
    assigned = emb.withColumn("_c", S._nearest_centroid_expr("embedding", cents))
    cols = [S._pq_res_code_expr("embedding", book, m, dim // 4, cents, "_c")
            .alias(f"code_{m}") for m, book in enumerate(books)]
    expr_res = {r["vec_id"]: (int(r["_c"]),
                              tuple(int(r[f"code_{m}"]) for m in range(4)))
                for r in assigned.select("vec_id", "_c", *cols).collect()}
    batched_res = {r["vec_id"]: (int(r["_c"]),
                                 tuple(int(r[f"code_{m}"]) for m in range(4)))
                   for r in S.pq_encode_batched(emb, books, cents=cents).collect()}
    assert batched_res == expr_res


def test_pq_index_rerank_exact_refine(spark, sf_dir, tmp_path):
    """store_vec + rerank: the refine step returns the EXACT-L2 top-k
    among the ADC top-R candidates (faiss IndexRefineFlat semantics),
    verified against a driver-side numpy reference; rerank on an index
    built without store_vec raises."""
    import numpy as np
    import pytest as _pytest
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    books = S.pq_codebooks_fixed(4, 8, dim // 4)
    qv = [float(x) for x in emb.where("vec_id = 5").first()["embedding"]]

    idx = S.PqIndex.build(emb, str(tmp_path / "pq"), books, store_vec=True)
    got = [(r["vec_id"], r["d2"])
           for r in idx.topk(spark, qv, k=10, rerank=100).collect()]

    # reference: exact L2 over the ADC top-100 candidate ids
    cand = [r["vec_id"] for r in idx.topk(spark, qv, k=100).collect()]
    V = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
         for r in emb.where(F.col("vec_id").isin(cand)).collect()}
    q = np.array(qv)
    want = sorted(((round(float(((V[i] - q) ** 2).sum()), 6), i)
                   for i in cand))[:10]
    assert got == [(i, d2) for d2, i in want]
    # the query's own vector is candidate #1 at distance 0
    assert got[0] == (5, 0.0)

    # rerank == k is the refine-exactly-the-top-k config, not a no-op:
    # output is the exact-L2 reorder of the ADC top-10, schema (id, d2)
    rk = [(r["vec_id"], r["d2"])
          for r in idx.topk(spark, qv, k=10, rerank=10).collect()]
    cand10 = [r["vec_id"] for r in idx.topk(spark, qv, k=10).collect()]
    # ADC top-10 ⊆ ADC top-100, so V already holds every candidate
    want10 = sorted((round(float(((V[i] - q) ** 2).sum()), 6), i)
                    for i in cand10)
    assert rk == [(i, d2) for d2, i in want10]
    # rerank < k is a contradiction: raise, never silently degrade
    with _pytest.raises(ValueError, match="must be >= k"):
        idx.topk(spark, qv, k=10, rerank=5)

    plain = S.PqIndex.build(emb, str(tmp_path / "pq2"), books)
    with _pytest.raises(ValueError, match="store_vec"):
        plain.topk(spark, qv, k=5, rerank=50).collect()


def test_ivfpq_rerank_exact_within_probes(spark, sf_dir, tmp_path):
    """IVF-PQ rerank refines within the probed partitions only: results
    are the exact-L2 top-k of the ADC top-R candidate set, and every id
    lives in a probed coarse cell."""
    import numpy as np
    from opensearch_spark.ml import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    cents = S.hyperplanes(8, dim)
    books = S.pq_codebooks_fixed(4, 8, dim // 4)
    qv = [float(x) for x in emb.where("vec_id = 7").first()["embedding"]]

    idx = S.IvfPqIndex.build(emb, str(tmp_path / "ivfpq"), cents, books,
                             store_vec=True)
    got = [(r["vec_id"], r["d2"])
           for r in idx.topk(spark, qv, k=8, nprobe=3, rerank=64).collect()]
    cand = [r["vec_id"]
            for r in idx.topk(spark, qv, k=64, nprobe=3).collect()]
    V = {r["vec_id"]: np.array([float(x) for x in r["embedding"]])
         for r in emb.where(F.col("vec_id").isin(cand)).collect()}
    q = np.array(qv)
    want = sorted(((round(float(((V[i] - q) ** 2).sum()), 6), i)
                   for i in cand))[:8]
    assert got == [(i, d2) for d2, i in want]


def test_persist_rotating_releases_previous_generation(spark):
    """Repeated operator calls must not accumulate persisted frames:
    persist_rotating under one tag keeps exactly one generation cached."""
    from opensearch_spark.ml.dedup import _PERSIST_LAST, persist_rotating

    d1 = persist_rotating(spark.range(10), "rot.test")
    d1.count()
    assert d1.storageLevel.useMemory or d1.storageLevel.useDisk
    d2 = persist_rotating(spark.range(20), "rot.test")
    d2.count()
    assert d2.count() == 20 and _PERSIST_LAST["rot.test"] is d2
    # previous generation no longer cached (recompute still works)
    assert not d1.storageLevel.useMemory and not d1.storageLevel.useDisk
    assert d1.count() == 10
    _PERSIST_LAST.pop("rot.test").unpersist(False)


class TestUrlDedup:
    CASES = [
        # (raw, canonical)
        ("HTTP://WWW.EX.COM:80/A/b?x=1&utm_source=t#frag",
         "http://www.ex.com/A/b?x=1"),
        ("https://Ex.Com/p/?id=2&utm_campaign=z", "https://ex.com/p?id=2"),
        ("http://ex.com:80", "http://ex.com"),
        ("http://ex.com/Path/Q?utm_medium=a&id=3", "http://ex.com/Path/Q?id=3"),
        # utm rules are separator-anchored: a param NAMED xutm_* survives
        ("http://ex.com/a?xutm_source=1&id=2",
         "http://ex.com/a?xutm_source=1&id=2"),
        # consecutive utm params, first position
        ("http://ex.com/a?utm_a=1&utm_b=2&id=3", "http://ex.com/a?id=3"),
        ("http://ex.com/a?utm_a=1&utm_b=2", "http://ex.com/a"),
        # default-port strip is per-scheme and authority-only: an embedded
        # ':80' in a query value survives; https' default is :443, and
        # an EXPLICIT :80 on https is a real non-default port
        ("http://ex.com/a?next=http://b.com:80/x",
         "http://ex.com/a?next=http://b.com:80/x"),
        ("https://ex.com:443/x", "https://ex.com/x"),
        ("https://ex.com:80/x", "https://ex.com:80/x"),
        # '/?' collapse happens only at the real path->query boundary
        ("http://ex.com/a?next=/search/?q=1",
         "http://ex.com/a?next=/search/?q=1"),
        # no query: trailing slash is NOT stripped
        ("http://ex.com/p/", "http://ex.com/p/"),
    ]

    def test_canonical_rules(self, spark):
        from pyspark.sql import functions as F
        from opensearch_spark.ml.dedup import canonical_url
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = [r["c"] for r in
               df.select(canonical_url(F.col("url")).alias("c")).collect()]
        assert got == [c for _, c in self.CASES]

    def test_dedup_keeps_min_id(self, spark):
        from opensearch_spark.ml.dedup import url_dedup
        rows = [(1, "http://ex.com/a?utm_source=x"),
                (2, "HTTP://EX.COM/a"),
                (3, "http://ex.com/b")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = {r["canon_url"]: (r["keep_id"], r["n_dups"])
               for r in url_dedup(df).collect()}
        assert out["http://ex.com/a"] == (1, 2)
        assert out["http://ex.com/b"] == (3, 1)


class TestReviewFixEdgeCases:
    """Pins the review-fix semantics: NULL/short/degenerate inputs must
    degrade explicitly (0 counts, empty arrays), never via sentinel
    leakage (size(null)=-1) or silent row loss."""

    def test_token_stats_true_mean_token_len(self, spark):
        # "ab   cd" (multi-space): true mean token len is 2.0; the old
        # chars-minus-separators shortcut would report (7-1)/2 = 3.0
        from opensearch_spark.ml.textstats import token_stats
        df = spark.createDataFrame([(1, "ab   cd")], "doc_id long, text string")
        r = token_stats(df, "text").first()
        assert r["n_tokens"] == 2 and r["mean_token_len"] == 2.0

    def test_lang_id_case_and_punctuation_normalized(self, spark):
        # sentence-initial capital + trailing punctuation must still hit
        from opensearch_spark.ml.textstats import lang_id
        df = spark.createDataFrame(
            [(1, "The cat, of the mat; now then!")],
            "doc_id long, text string")
        assert lang_id(df, "text").first()["pred_lang"] == "en"

    def test_pii_scrub_null_text(self, spark):
        from opensearch_spark.ml.textstats import pii_scrub
        df = spark.createDataFrame([(1, None), (2, "mail a@b.io now")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in pii_scrub(df, "text").collect()}
        assert out[1]["n_pii"] == 0 and out[1]["clean_text"] is None
        assert out[2]["n_pii"] == 1

    def test_repetition_stats_keeps_short_docs(self, spark):
        # 1-token doc emits zero bigrams -> must still appear with 0.0
        from opensearch_spark.ml import curation as CU
        df = spark.createDataFrame([(1, "solo"), (2, "a b a b")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in CU.repetition_stats(df).collect()}
        assert set(out) == {1, 2}
        assert out[1]["n_tokens"] == 1
        assert out[1]["top2gram_frac"] == 0.0
        assert out[1]["dup2gram_frac"] == 0.0

    def test_pack_sequences_null_text_counts_zero(self, spark):
        from opensearch_spark.ml import curation as CU
        df = spark.createDataFrame([(1, "a b c"), (2, None), (3, "d e")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in CU.pack_sequences(df, 5).collect()}
        assert out[2]["n_tokens"] == 0
        # doc 3 starts right after doc 1's 3 tokens (null contributed 0)
        assert out[3]["start_seq"] == out[1]["start_seq"]
        assert out[3]["offset_in_seq"] == 3

    def test_bpe_encode_null_and_unicode_ws(self, spark):
        from opensearch_spark.ml.bpe import bpe_train, bpe_encode
        df = spark.createDataFrame(
            [(1, "low low lower"), (2, None)], "doc_id long, text string")
        merges = [(r["left"], r["right"]) for r in
                  bpe_train(df, "text", n_merges=3).collect()]
        out = {r["doc_id"]: r for r in
               bpe_encode(df, "text", merges).collect()}
        assert out[2]["tokens"] == [] and out[2]["n_tokens"] == 0
        assert out[1]["n_tokens"] > 0


def test_knn_join_lsh_no_duplicate_pairs_and_multiprobe2(spark, emb):
    """Round-4 review: the probe values are pairwise distinct so a
    (query, neighbor) pair joins at most once (no dedup shuffle needed),
    and multiprobe=2 must actually add the 2-bit-flip probes (it was
    silently identical to 1)."""
    sub = emb.limit(60)
    out1 = S.knn_join_lsh(sub, k=3, multiprobe=1)
    rows1 = out1.collect()
    pairs1 = [(r["query_id"], r["neighbor_id"]) for r in rows1]
    assert len(pairs1) == len(set(pairs1))
    plan = out1._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan  # the no-op distinct is gone
    out2 = S.knn_join_lsh(sub, k=3, multiprobe=2).collect()
    # wider probes can only find equal-or-better neighbors per query
    best1 = {r["query_id"]: r["cosine"] for r in rows1 if r["rank"] == 1}
    best2 = {r["query_id"]: r["cosine"] for r in out2 if r["rank"] == 1}
    assert set(best1) <= set(best2)
    assert all(best2[q] >= best1[q] for q in best1)


def test_pq_encode_batched_preserves_id_type(spark, emb):
    """Round-4 review: the batched encoder hardcoded 'long' ids; a
    string-id build must encode, matching the expression path."""
    sub = emb.limit(40).withColumn(
        "sid", F.concat(F.lit("v"), F.col("vec_id").cast("string")))
    books = S.pq_train(sub, n_sub=2, ksub=4, vec_col="embedding")
    got = {r["sid"]: (r["code_0"], r["code_1"])
           for r in S.pq_encode_batched(
               sub, books, vec_col="embedding", id_col="sid").collect()}
    want = {r["sid"]: (r["code_0"], r["code_1"])
            for r in S.pq_encode(
                sub, books, vec_col="embedding", id_col="sid").collect()}
    assert got == want and len(got) == 40


def test_dup_clusters_raises_on_non_convergence(spark):
    """Round-4 review: exhausting max_iters must RAISE, not silently
    return labels that split a true component."""
    # a 64-node path needs ~log2(64)=6 pointer-jump rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a long, b long")
    with pytest.raises(RuntimeError, match="not converged"):
        D.dup_clusters(pairs, max_iters=1)
    # and with enough rounds it converges to one component
    out = D.dup_clusters(pairs, max_iters=12)
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_simhash_auto_bit_posture(spark, docs, monkeypatch):
    """The r4-flagged manual escape hatch is now an auto posture:
    ``bits=None`` selects 32 at gate scale and 64 above
    SIMHASH_64BIT_MIN_DOCS, and banded ≡ brute-force holds on BOTH sides
    of the switch point (threshold lowered so the 64-bit side runs at
    test size). ``simhash`` and ``simhash_pairs`` resolve the width from
    the same row count, so None/None callers cannot disagree."""
    monkeypatch.setattr(D, "SIMHASH_64BIT_MIN_DOCS", 60)
    below, above = docs.limit(50), docs.limit(120)
    assert D._simhash_bits_posture(below, None) == 32
    assert D._simhash_bits_posture(above, None) == 64
    for frame, width in ((below, 32), (above, 64)):
        fp = D.simhash(frame, "text").persist()
        rows = fp.collect()
        if width == 32:
            assert all(0 <= r["simhash"] < 2 ** 32 for r in rows)
        else:
            assert any(r["simhash"] < 0 or r["simhash"] >= 2 ** 32
                       for r in rows)
        banded = {(r["a"], r["b"])
                  for r in D.simhash_pairs(fp, max_hamming=3).collect()}
        mask = (1 << width) - 1
        brute = set()
        for i, ra in enumerate(rows):
            for rb in rows[i + 1:]:
                a, b = sorted((ra["doc_id"], rb["doc_id"]))
                if bin((ra["simhash"] ^ rb["simhash"]) & mask).count("1") <= 3:
                    brute.add((a, b))
        assert banded == brute, f"width={width}"
        fp.unpersist()


def test_simhash_auto_width_survives_null_text_docs(spark, docs, monkeypatch):
    """Review r5: null-text docs are dropped before fingerprinting, so a
    corpus just above the auto threshold can yield a fingerprint frame
    just below it — count-based resolution in simhash_pairs would pick
    32 against the producer's 64. Value-based resolution must follow the
    producer regardless."""
    from pyspark.sql import functions as F

    monkeypatch.setattr(D, "SIMHASH_64BIT_MIN_DOCS", 100)
    base = docs.limit(120)
    nulled = base.withColumn(
        "text", F.when(F.col("doc_id") % 3 == 0, F.lit(None))
                 .otherwise(F.col("text")))
    # 120 docs > 100 -> producer picks 64; ~40 null-text docs dropped ->
    # fp has ~80 rows < 100, the count trap
    fp = D.simhash(nulled, "text").persist()
    rows = fp.collect()
    assert len(rows) < 100 < 120
    assert any(r["simhash"] < 0 or r["simhash"] >= 2 ** 32 for r in rows)
    banded = {(r["a"], r["b"])
              for r in D.simhash_pairs(fp, max_hamming=3).collect()}
    brute = set()
    for i, ra in enumerate(rows):
        for rb in rows[i + 1:]:
            a, b = sorted((ra["doc_id"], rb["doc_id"]))
            if bin((ra["simhash"] ^ rb["simhash"])
                   & ((1 << 64) - 1)).count("1") <= 3:
                brute.add((a, b))
    assert banded == brute
    fp.unpersist()


def test_simhash_pairs_64bit_exact_duplicates(spark):
    """Round-4 review: bits=64 with max_hamming=0 (exact-fingerprint
    dedup) must not overflow the band-mask literal."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")],
        "doc_id long, text string")
    fp = D.simhash(df, "text", bits=64)
    got = {(r["a"], r["b"]) for r in
           D.simhash_pairs(fp, max_hamming=0, bits=64).collect()}
    assert got == {(1, 2)}


def test_canonical_url_preserves_ampersand_paths(spark):
    """Round-4 review: '&' is a legal unencoded PATH character — utm
    stripping must only touch the query string."""
    df = spark.createDataFrame(
        [(1, "http://x.com/a&utm_source=feed"),      # utm text in PATH
         (2, "http://x.com/a"),
         (3, "http://x.com/a?utm_source=feed"),      # utm in query
         (4, "http://x.com/a?id=1&utm_source=f")],
        "doc_id long, url string")
    canon = {r["doc_id"]: r["c"] for r in
             df.select("doc_id",
                       D.canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[1] == "http://x.com/a&utm_source=feed"  # path untouched
    assert canon[1] != canon[2]
    assert canon[3] == "http://x.com/a"
    assert canon[4] == "http://x.com/a?id=1"


def test_hnsw_build_guards_and_safe_blob(spark, emb, tmp_path):
    """Round-4 review: empty input and m<2 fail loudly; blobs are npz
    (allow_pickle=False) so tampered bytes raise instead of executing."""
    from opensearch_spark.ml.hnsw import HnswGraph, HnswIndex, build_graph

    empty = emb.limit(0)
    with pytest.raises(ValueError, match="no rows"):
        HnswIndex.build(empty, str(tmp_path / "idx0"))
    with pytest.raises(ValueError, match="m must be"):
        build_graph(np.array([1, 2]), np.eye(2), m=1)
    with pytest.raises(ValueError, match="local path"):
        HnswIndex.build(emb.limit(5), "s3a://bucket/idx")
    # round-trip determinism through the npz format
    sub = emb.limit(50).collect()
    ids = np.array([r["vec_id"] for r in sub], dtype=np.int64)
    vecs = np.array([r["embedding"] for r in sub], dtype=np.float64)
    g = build_graph(ids, vecs, m=4)
    # vectors quantize to float32 in the blob (as before the format
    # change), so compare two round-tripped graphs, not g itself
    g2 = HnswGraph.from_blob(g.to_blob())
    g3 = HnswGraph.from_blob(g2.to_blob())
    q = vecs[0]
    assert g2.search(q, 5, 32) == g3.search(q, 5, 32)
    assert g2.search(q, 5, 32)[0][0] == int(ids[0])  # self is top hit
    assert g2.to_blob() == g3.to_blob()  # bit-reproducible
    # a pickle payload is REFUSED, never loaded
    import pickle as _p
    with pytest.raises(ValueError, match="npz"):
        HnswGraph.from_blob(__import__("zlib").compress(_p.dumps({"x": 1})))


def test_dup_clusters_randomized_vs_union_find(spark):
    """Seeded randomized connected components: random edge sets
    (chains, stars, cycles, isolated pairs) vs a Python union-find with
    min-id labels — the pointer-jumping path must produce the exact
    same partition on every topology."""
    import random

    rng = random.Random(0xC1)
    for case in range(6):
        n = rng.randint(10, 60)
        edges = set()
        # random edges + a guaranteed long chain (pointer-jump stressor)
        for _ in range(rng.randint(5, n)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        chain = rng.sample(range(n), min(12, n))
        edges |= {(min(a, b), max(a, b))
                  for a, b in zip(chain, chain[1:])}
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {x: find(x) for x in touched}
        pairs = spark.createDataFrame(sorted(edges), "a long, b long")
        got = {r["doc_id"]: r["cluster_id"]
               for r in D.dup_clusters(pairs, max_iters=16).collect()}
        assert got == want, f"case {case}: n={n} |E|={len(edges)}"


def test_dedup_chunks_global_randomized_vs_reference(spark):
    """Seeded randomized corpus-global chunk dedup vs an independent
    Python evaluation of the first-occurrence rule (min (doc_id,
    chunk_no) keeps; later repeats drop; per-doc order preserved)."""
    import random

    rng = random.Random(0xC4)
    for case in range(5):
        chunk_tokens = rng.choice([2, 3])
        vocab = ["aa", "bb", "cc", "dd"]
        rows = []
        for d in range(rng.randint(4, 10)):
            n = rng.randint(1, 5) * chunk_tokens + rng.randint(0, chunk_tokens - 1)
            rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["text_dedup"], r["n_chunks"], r["n_kept"])
               for r in D.dedup_chunks_global(
                   df, chunk_tokens=chunk_tokens).collect()}
        # independent reference
        first = {}
        chunks_by_doc = {}
        for d, text in rows:
            toks = text.split()
            cs = [" ".join(toks[i:i + chunk_tokens])
                  for i in range(0, len(toks), chunk_tokens)]
            chunks_by_doc[d] = cs
            for i, c in enumerate(cs):
                if c not in first or (d, i) < first[c]:
                    first[c] = (d, i)
        for d, text in rows:
            cs = chunks_by_doc[d]
            kept = [c for i, c in enumerate(cs) if first[c] == (d, i)]
            want = (" ".join(kept), len(cs), len(kept))
            assert got[d] == want, f"case {case} doc {d}: {got[d]} != {want}"
