"""Unit tests for the training-data curation operators
(opensearch_spark/ml/curation.py): eval-set decontamination and
token-budget sequence packing."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from opensearch_spark.ml import curation as CU


def _docs(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


class TestDecontaminate:
    def test_flags_overlapping_doc_only(self, spark):
        train = _docs(spark, [
            {"doc_id": 1, "text": "a b c d e"},      # shares trigram "c d e"
            {"doc_id": 2, "text": "x y z w v"},      # clean
            {"doc_id": 3, "text": "c d e c d e f"},  # shares, twice distinct? one distinct trigram match + "d e c"... only those in eval
        ])
        ev = _docs(spark, [{"doc_id": 100, "text": "q q c d e q"}])
        out = {r["doc_id"]: r["n_contaminated"]
               for r in CU.decontaminate(train, ev, n=3).collect()}
        # eval trigrams: "q q c", "q c d", "c d e", "d e q"
        assert out == {1: 1, 3: 1}

    def test_n_longer_than_doc_yields_nothing(self, spark):
        train = _docs(spark, [{"doc_id": 1, "text": "a b"}])
        ev = _docs(spark, [{"doc_id": 2, "text": "a b"}])
        assert CU.decontaminate(train, ev, n=3).count() == 0
        # but unigram overlap is caught
        assert CU.decontaminate(train, ev, n=1).count() == 1

    def test_counts_distinct_shingles(self, spark):
        # doc repeats a contaminated trigram: counted once (distinct)
        train = _docs(spark, [{"doc_id": 1, "text": "a b c z a b c"}])
        ev = _docs(spark, [{"doc_id": 9, "text": "a b c"}])
        rows = CU.decontaminate(train, ev, n=3).collect()
        assert rows[0]["n_contaminated"] == 1

    def test_plan_broadcasts_eval_side(self, spark):
        train = _docs(spark, [{"doc_id": 1, "text": "a b c d"}])
        ev = _docs(spark, [{"doc_id": 2, "text": "c d e"}])
        plan = CU.decontaminate(train, ev, n=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestDecontaminateFuzzy:
    def test_near_dup_found_clean_doc_not(self, spark):
        # near = base + one trailing word: bigram jaccard 11/12 ≈ 0.92 —
        # high enough that the fixed deterministic permutations land a
        # full-band match (LSH recall at j≈0.7 is only ~0.6; don't test
        # band behavior with mid-similarity pairs)
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base + " postscript"
        train = _docs(spark, [
            {"doc_id": 1, "text": near},
            {"doc_id": 2, "text": "completely different words here entirely"},
        ])
        ev = _docs(spark, [{"doc_id": 100, "text": base}])
        out = CU.decontaminate_fuzzy(train, ev, n=2, threshold=0.5).collect()
        assert [(r["doc_id"], r["eval_id"]) for r in out] == [(1, 100)]
        assert 0.5 <= out[0]["jaccard"] < 1.0

    def test_exact_dup_jaccard_one(self, spark):
        t = "alpha beta gamma delta epsilon"
        train = _docs(spark, [{"doc_id": 7, "text": t}])
        ev = _docs(spark, [{"doc_id": 70, "text": t}])
        out = CU.decontaminate_fuzzy(train, ev, n=2).collect()
        assert out[0]["jaccard"] == 1.0

    def test_eval_side_broadcasts(self, spark):
        train = _docs(spark, [{"doc_id": 1, "text": "a b c d e"}])
        ev = _docs(spark, [{"doc_id": 2, "text": "a b c d e"}])
        plan = CU.decontaminate_fuzzy(train, ev)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestRepetitionStats:
    def test_hand_computed_fracs(self, spark):
        # "a b a b c": bigrams [a b, b a, a b, b c]; top = "a b" ×2
        # top2gram_frac = 2*2/5 = 0.8 ; dup2gram_frac = 2*2/5 = 0.8
        df = _docs(spark, [{"doc_id": 1, "text": "a b a b c"},
                           {"doc_id": 2, "text": "x y z"}])
        out = {r["doc_id"]: r for r in CU.repetition_stats(df).collect()}
        assert out[1]["top2gram_frac"] == 0.8
        assert out[1]["dup2gram_frac"] == 0.8
        # no repeats: top frac = 2/3, dup frac = 0
        assert out[2]["top2gram_frac"] == round(2 / 3, 6)
        assert out[2]["dup2gram_frac"] == 0.0

    def test_frac_capped_at_one(self, spark):
        # "a a a a": bigram "a a" ×3 -> 3*2/4 = 1.5, capped to 1.0
        df = _docs(spark, [{"doc_id": 1, "text": "a a a a"}])
        r = CU.repetition_stats(df).collect()[0]
        assert r["top2gram_frac"] == 1.0 and r["dup2gram_frac"] == 1.0

    def test_mismatched_n_rejected(self, spark):
        df = _docs(spark, [{"doc_id": 1, "text": "a b"}])
        import pytest
        with pytest.raises(ValueError):
            CU.repetition_stats(df, top_n=2, dup_n=5)


class TestSampleStratified:
    def test_exact_count_and_determinism(self, spark):
        rows = [{"doc_id": i, "lang": "py" if i % 2 else "go",
                 "text": "a"} for i in range(40)]
        df = _docs(spark, rows)
        s1 = sorted(r["doc_id"] for r in
                    CU.sample_stratified(df, "lang", 3, salt="s").collect())
        s2 = sorted(r["doc_id"] for r in
                    CU.sample_stratified(df, "lang", 3, salt="s").collect())
        assert s1 == s2 and len(s1) == 6  # 3 per stratum × 2 strata
        # a different salt draws a different sample
        s3 = sorted(r["doc_id"] for r in
                    CU.sample_stratified(df, "lang", 3, salt="t").collect())
        assert s3 != s1

    def test_small_stratum_fully_kept(self, spark):
        df = _docs(spark, [{"doc_id": 1, "lang": "rs", "text": "a"},
                           {"doc_id": 2, "lang": "py", "text": "a"},
                           {"doc_id": 3, "lang": "py", "text": "a"}])
        out = CU.sample_stratified(df, "lang", 5).collect()
        assert len(out) == 3


class TestSourceMix:
    def test_rates_and_drops(self, spark):
        rows = ([{"doc_id": i, "source": "big", "text": "a b c d"}
                 for i in range(50)]
                + [{"doc_id": 100 + i, "source": "small", "text": "a b"}
                   for i in range(5)]
                + [{"doc_id": 200, "source": "unlisted", "text": "a"}])
        df = _docs(spark, rows)
        out = CU.source_mix(df, {"big": 0.5, "small": 0.5}).collect()
        # unlisted source dropped entirely
        assert all(r["source"] != "unlisted" for r in out)
        # small side is tiny -> rate caps at 1.0, every doc kept
        small = [r for r in out if r["source"] == "small"]
        assert len(small) == 5 and all(r["keep_rate"] == 1.0 for r in small)
        # big side thinned: grand=210, target 105, big tokens 200 -> 0.525
        big = [r for r in out if r["source"] == "big"]
        assert 0 < len(big) < 50
        assert all(r["keep_rate"] == 0.525 for r in big)

    def test_no_corpus_shuffle(self, spark):
        df = _docs(spark, [{"doc_id": 1, "source": "s", "text": "a b"}])
        plan = CU.source_mix(df, {"s": 1.0})._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # pure filter scan, no shuffle


class TestPackSequences:
    def test_boundary_spanning_doc(self, spark):
        # tape (no part_col): doc 1 = 3 tok, doc 2 = 4 tok, max_tokens = 5
        # doc1: [0,3) -> seq 0, offset 0 ; doc2: [3,7) -> spans seq 0..1, offset 3
        df = _docs(spark, [
            {"doc_id": 1, "text": "a b c"},
            {"doc_id": 2, "text": "d e f g"},
        ])
        out = {r["doc_id"]: r for r in
               CU.pack_sequences(df, 5).collect()}
        assert (out[1]["start_seq"], out[1]["end_seq"],
                out[1]["offset_in_seq"]) == (0, 0, 0)
        assert (out[2]["start_seq"], out[2]["end_seq"],
                out[2]["offset_in_seq"]) == (0, 1, 3)

    def test_exact_fit_does_not_spill(self, spark):
        # doc ends exactly at the boundary: end_seq stays in its sequence
        df = _docs(spark, [
            {"doc_id": 1, "text": "a b c d e"},   # [0,5) with max 5 -> seq 0 only
            {"doc_id": 2, "text": "f"},           # [5,6) -> seq 1, offset 0
        ])
        out = {r["doc_id"]: r for r in CU.pack_sequences(df, 5).collect()}
        assert (out[1]["start_seq"], out[1]["end_seq"]) == (0, 0)
        assert (out[2]["start_seq"], out[2]["offset_in_seq"]) == (1, 0)

    def test_per_group_independent_tapes(self, spark):
        df = _docs(spark, [
            {"doc_id": 1, "lang": "py", "text": "a b c d e f"},
            {"doc_id": 2, "lang": "go", "text": "x y z"},
        ])
        out = {r["doc_id"]: r for r in
               CU.pack_sequences(df, 4, part_col="lang").collect()}
        # each lang starts its own tape at 0
        assert out[1]["start_seq"] == 0 and out[1]["end_seq"] == 1
        assert out[2]["start_seq"] == 0 and out[2]["offset_in_seq"] == 0


_WORDS = st.sampled_from(["a", "b", "c", "d", "e"])
#: may be EMPTY (zero tokens) — pack_sequences supports 0-token docs and
#: must pin end_seq = start_seq for them (round-4 fix)
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


class TestCurationProperties:
    @settings(max_examples=10, deadline=None)
    @given(docs=st.lists(_DOC, min_size=1, max_size=8),
           max_tokens=st.integers(min_value=1, max_value=9))
    def test_pack_matches_reference_tape(self, spark, docs, max_tokens):
        """pack_sequences == a literal python token tape walk."""
        df = _docs(spark, [{"doc_id": i, "text": t}
                           for i, t in enumerate(docs)])
        got = {r["doc_id"]: (r["n_tokens"], r["start_seq"], r["end_seq"],
                             r["offset_in_seq"])
               for r in CU.pack_sequences(df, max_tokens).collect()}
        pos = 0
        for i, t in enumerate(docs):
            n = len(t.split())
            end_seq = (pos // max_tokens if n == 0
                       else (pos + n - 1) // max_tokens)
            want = (n, pos // max_tokens, end_seq, pos % max_tokens)
            assert got[i] == want, (i, got[i], want)
            pos += n

    @settings(max_examples=10, deadline=None)
    @given(train=st.lists(_DOC, min_size=1, max_size=6),
           ev=st.lists(_DOC, min_size=1, max_size=3),
           n=st.integers(min_value=1, max_value=3))
    def test_decontaminate_matches_bruteforce(self, spark, train, ev, n):
        """decontaminate == brute-force n-gram set intersection."""
        tdf = _docs(spark, [{"doc_id": i, "text": t}
                            for i, t in enumerate(train)])
        edf = _docs(spark, [{"doc_id": 100 + i, "text": t}
                            for i, t in enumerate(ev)])
        got = {r["doc_id"]: r["n_contaminated"]
               for r in CU.decontaminate(tdf, edf, n=n).collect()}

        def grams(t):
            w = t.split()
            return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

        eset = set().union(*(grams(t) for t in ev))
        want = {i: len(grams(t) & eset) for i, t in enumerate(train)
                if grams(t) & eset}
        assert got == want


def test_unigram_logppl_ranks_rare_docs_higher(spark):
    from opensearch_spark.ml.curation import unigram_logppl

    df = spark.createDataFrame(
        [(1, "common common common common"),
         (2, "common common rare1 rare2")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_logppl(df).collect()}
    assert rows[2]["logppl"] > rows[1]["logppl"]
    assert rows[1]["n_tokens"] == 4 and rows[2]["n_tokens"] == 4
    # doc 1 is all 'common' (p = 6/8): logppl = -ln(0.75)
    import math
    assert abs(rows[1]["logppl"] - (-math.log(6 / 8))) < 1e-9


def test_unigram_logppl_posture_both_sides_of_threshold(spark):
    """Verdict r2 ask: the probability-table join must broadcast under
    the vocab threshold and fall back to a plain shuffle join above it
    (an open-web vocabulary would OOM a broadcast)."""
    from opensearch_spark.ml.curation import unigram_logppl

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string")

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    below = plan(unigram_logppl(df))  # 4-term vocab, default threshold
    assert "BroadcastHashJoin" in below
    above = plan(unigram_logppl(df, broadcast_vocab_max=0))
    assert "BroadcastHashJoin" not in above
    # same answers either way
    a = sorted(map(tuple, unigram_logppl(df).collect()))
    b = sorted(map(tuple,
                   unigram_logppl(df, broadcast_vocab_max=0).collect()))
    assert a == b


def test_quality_classifier_features_and_plan(spark):
    from opensearch_spark.ml.curation import quality_classifier

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha"), (3, "x y")],
        "doc_id long, text string")
    out = quality_classifier(df, "text")
    rows = {r.doc_id: r for r in out.collect()}
    # n tokens -> n unigrams + (n-1) bigrams
    assert rows[1].n_features == 5
    assert rows[2].n_features == 1
    assert rows[3].n_features == 3
    for r in rows.values():
        assert 0.0 < r.quality < 1.0
        assert r.keep == (r.quality >= 0.5)
    # scale shape: the dim-row weight table is broadcast; the corpus side
    # is never broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quality_classifier_sparse_weight_table(spark):
    """A pruned (sparse) weight table must not drop features: missing
    buckets pool as weight 0 and still count in n_features."""
    from opensearch_spark.ml.curation import quality_classifier
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "alpha beta gamma")],
                               "doc_id long, text string")
    empty_w = spark.createDataFrame([], "b long, w double")
    out = quality_classifier(df, "text", weights=empty_w).collect()[0]
    assert out.n_features == 5
    # mean weight 0 -> quality = sigmoid(bias) = sigmoid(-0.1)
    import math
    assert abs(out.quality - 1.0 / (1.0 + math.exp(0.1))) < 1e-12


def test_dsir_prefers_target_domain(spark):
    """DSIR sanity: documents made of target-domain vocabulary score
    higher log-importance than off-domain documents; the target docs
    themselves are kept, disjoint-vocab docs are not."""
    from opensearch_spark.ml.curation import dsir_log_importance

    rows = (
        [(i, "alpha beta gamma delta", "tgt") for i in range(10)]
        + [(100 + i, "omega sigma theta kappa", "other") for i in range(10)]
        + [(200, "alpha beta omega sigma", "mixed")]
    )
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = {r["doc_id"]: r for r in dsir_log_importance(
        df, df.where("source = 'tgt'")).collect()}
    tgt, off, mixed = out[0], out[100], out[200]
    assert tgt["log_importance"] > mixed["log_importance"] > off["log_importance"]
    assert tgt["keep"] and not off["keep"]
    assert tgt["n_tokens"] == 4


def test_dsir_is_codegen_with_broadcast_weights(spark):
    from opensearch_spark.ml.curation import dsir_log_importance

    df = spark.createDataFrame(
        [(0, "a b", "s")], "doc_id LONG, text STRING, source STRING")
    plan = dsir_log_importance(df, df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # weights join the docs broadcast


def test_chunk_documents_semantics(spark):
    from opensearch_spark.ml.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
         (2, "solo"),                                 # 1 token -> 1 chunk
         (3, "   ")],                                 # blank -> no chunks
        "doc_id long, text string")
    out = {(r["doc_id"], r["chunk_id"]): r for r in
           chunk_documents(df, chunk_tokens=8, overlap=4).collect()}
    # doc 1: stride 4, starts run to size-overlap-1=5 -> [0, 4]
    assert {k for k in out if k[0] == 1} == {(1, 0), (1, 1)}
    assert out[(1, 0)]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert out[(1, 1)]["start_token"] == 4
    assert out[(1, 1)]["chunk_text"].split() == [f"t{i}" for i in range(4, 10)]
    assert out[(1, 1)]["n_chunk_tokens"] == 6
    # overlap: chunk 1 repeats chunk 0's last 4 tokens, adds new ones
    assert out[(2, 0)]["chunk_text"] == "solo"
    assert not any(k[0] == 3 for k in out)
    # no trailing all-overlap chunk
    assert max(k[1] for k in out if k[0] == 1) == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunk_documents_no_shuffle(spark):
    from opensearch_spark.ml.curation import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


class TestTemperatureMix:
    def _df(self, spark):
        rows = ([("big", "w " * 90)] * 9) + [("small", "w " * 10)]
        return spark.createDataFrame(rows, "source string, text string")

    def test_alpha_one_is_natural_mix(self, spark):
        out = {r["source"]: r for r in
               CU.temperature_mix(self._df(spark), alpha=1.0).collect()}
        for r in out.values():
            assert abs(r["sample_factor"] - 1.0) < 1e-9
            assert abs(r["temp_share"] - r["natural_share"]) < 1e-9

    def test_low_alpha_upweights_minority(self, spark):
        out = {r["source"]: r for r in
               CU.temperature_mix(self._df(spark), alpha=0.3).collect()}
        assert out["small"]["sample_factor"] > 1.0
        assert out["big"]["sample_factor"] < 1.0
        assert out["small"]["temp_share"] > out["small"]["natural_share"]

    def test_shares_sum_to_one(self, spark):
        out = CU.temperature_mix(self._df(spark), alpha=0.5).collect()
        assert abs(sum(r["temp_share"] for r in out) - 1.0) < 1e-5
        assert abs(sum(r["natural_share"] for r in out) - 1.0) < 1e-5


class TestNullBlankTokenGuards:
    """Round-4 review: every token-total op must treat NULL text as 0
    tokens (size(split(NULL)) is -1) and blank text as 0 (split('') is
    ['']), and score-emitting ops must not silently drop token-less
    docs."""

    def _mixed(self, spark):
        return _docs(spark, [
            {"doc_id": 1, "text": "a b c d", "source": "wiki"},
            {"doc_id": 2, "text": None, "source": "wiki"},
            {"doc_id": 3, "text": "   ", "source": "wiki"},
            {"doc_id": 4, "text": "x y", "source": "code"},
        ])

    def test_source_mix_token_totals_guarded(self, spark):
        df = self._mixed(spark)
        out = CU.source_mix(df, {"wiki": 0.5, "code": 0.5}, salt="s")
        # wiki totals 4 (not 4 - 1 + 1): with equal shares and grand=6,
        # wiki rate = min(1, 3/4) — a corrupted total would change it
        rates = {r["source"]: r["keep_rate"] for r in out.collect()}
        if "wiki" in rates:
            assert rates["wiki"] == 0.75
        if "code" in rates:
            assert rates["code"] == 1.0

    def test_temperature_mix_guarded_no_nan(self, spark):
        import math

        df = self._mixed(spark)
        rows = {r["source"]: r for r in
                CU.temperature_mix(df, alpha=0.5).collect()}
        assert rows["wiki"]["tokens"] == 4 and rows["code"]["tokens"] == 2
        for r in rows.values():
            assert not math.isnan(r["temp_share"])

    def test_repetition_stats_guarded(self, spark):
        df = self._mixed(spark)
        rows = {r["doc_id"]: r for r in
                CU.repetition_stats(df, top_n=1, dup_n=1).collect()}
        assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
        # blank doc must NOT get top1gram_frac=1.0 from the phantom ''
        assert rows[3]["top1gram_frac"] == 0.0
        assert rows[2]["top1gram_frac"] == 0.0

    def test_score_ops_keep_tokenless_docs(self, spark):
        df = self._mixed(spark)
        ql = {r["doc_id"]: r for r in CU.unigram_logppl(df).collect()}
        assert set(ql) == {1, 2, 3, 4}
        assert ql[2]["n_tokens"] == 0 and ql[2]["logppl"] == 0.0
        qc = {r["doc_id"]: r for r in
              CU.quality_classifier(df, "text").collect()}
        assert set(qc) == {1, 2, 3, 4}
        assert qc[3]["n_features"] == 0
        target = _docs(spark, [{"doc_id": 9, "text": "a b"}])
        ds = {r["doc_id"]: r for r in
              CU.dsir_log_importance(df, target).collect()}
        assert set(ds) == {1, 2, 3, 4}
        assert ds[2]["n_tokens"] == 0 and ds[2]["keep"] is False
