"""Randomized rank-eval metrics vs independent Python formulas.

The gates pin fixed judgment sets; these seeded tests sweep random
rankings/judgments and recompute P@k, recall, MRR, DCG, ERR and NDCG
from the published formulas (PrecisionAtK.java / MeanReciprocalRank /
DiscountedCumulativeGain / ExpectedReciprocalRank.java semantics) in
plain Python."""

import math
import random

import pytest

from opensearch_spark.search.rankeval import graded_metrics, rank_metrics


def test_rank_metrics_randomized_vs_python(spark):
    rng = random.Random(0x4E1)
    for case in range(10):
        n_ranked = rng.randint(1, 15)
        k = rng.choice([3, 5, 10])
        ranked_ids = rng.sample(range(100), n_ranked)
        ranked = spark.createDataFrame(
            [(d, i + 1) for i, d in enumerate(ranked_ids)],
            "doc_id long, rank int")
        rel_ids = set(rng.sample(range(100), rng.randint(1, 20)))
        relevant = spark.createDataFrame(
            [(d,) for d in sorted(rel_ids)], "doc_id long")
        row = rank_metrics(ranked, relevant, k=k).collect()[0]
        top = ranked_ids[:k]
        hits = [d for d in top if d in rel_ids]
        first = next((i + 1 for i, d in enumerate(top) if d in rel_ids),
                     None)
        p = len(hits) / max(len(top), 1)
        r = len(hits) / max(len(rel_ids), 1)
        mrr = 1.0 / first if first else 0.0
        dcg = sum(1.0 / math.log2(i + 2)
                  for i, d in enumerate(top) if d in rel_ids)
        assert row["precision_at_k"] == pytest.approx(p, abs=1e-6), case
        assert row["recall_at_k"] == pytest.approx(r, abs=1e-6), case
        assert row["mrr"] == pytest.approx(mrr, abs=1e-6), case
        assert row["dcg_at_k"] == pytest.approx(dcg, abs=1e-6), case


def test_graded_metrics_randomized_vs_python(spark):
    rng = random.Random(0x6D2)
    max_grade = 3
    for case in range(8):
        n_ranked = rng.randint(1, 12)
        k = rng.choice([3, 5, 10])
        ranked_ids = rng.sample(range(60), n_ranked)
        ranked = spark.createDataFrame(
            [(d, i + 1) for i, d in enumerate(ranked_ids)],
            "doc_id long, rank int")
        graded_ids = rng.sample(range(60), rng.randint(1, 25))
        grade_of = {d: rng.randint(0, max_grade) for d in graded_ids}
        grades = spark.createDataFrame(
            sorted(grade_of.items()), "doc_id long, grade int")
        row = graded_metrics(ranked, grades, k=k,
                             max_grade=max_grade).collect()[0]
        top = ranked_ids[:k]
        err, prior = 0.0, 1.0
        dcg = 0.0
        for i, d in enumerate(top):
            g = grade_of.get(d, 0)
            R = (2 ** g - 1) / float(2 ** max_grade)
            err += prior * R / (i + 1)
            prior *= (1 - R)
            dcg += (2 ** g - 1) / math.log2(i + 2)
        ideal = sorted(((g, d) for d, g in grade_of.items()),
                       key=lambda x: (-x[0], x[1]))[:k]
        idcg = sum((2 ** g - 1) / math.log2(i + 2)
                   for i, (g, _d) in enumerate(ideal))
        ndcg = dcg / max(idcg, 1e-12)
        assert row["err"] == pytest.approx(err, abs=1e-6), case
        assert row["ndcg_at_k"] == pytest.approx(ndcg, abs=1e-6), case
