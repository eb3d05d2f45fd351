"""Unit tests for the training-data curation operators
(opensearch_spark/ml/curation.py): eval-set decontamination and
token-budget sequence packing."""

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
