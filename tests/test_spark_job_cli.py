"""End-to-end test of the spark-submit driver program (scripts/spark_job.py).

Runs main() in-process (getOrCreate reuses the test session) through the
full lifecycle the north rule requires: synth corpus -> resumable build
with lineage manifests -> DSL query -> per-row sha256 verify.
"""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import spark_job  # noqa: E402


@pytest.fixture(scope="module")
def job_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("spark_job")
    corpus = str(root / "corpus")
    index = str(root / "index")
    rc = spark_job.main(["synth", "--rows", "300", "--output", corpus,
                         "--partitions", "4"])
    assert rc == 0
    rc = spark_job.main(["build", "--input", corpus, "--output", index,
                         "--positions", "--resumable", "--segments", "3"])
    assert rc == 0
    return corpus, index


def test_build_manifests(job_dirs):
    _, index = job_dirs
    from opensearch_spark.index.segments import read_manifest
    man = read_manifest(index)
    assert len(man) == 3
    assert all(m["status"] == "committed" and m["rows"] > 0
               for m in man.values())
    meta = json.load(open(os.path.join(index, "meta.json")))
    assert meta["doc_count"] == 300


def test_query_returns_topk(job_dirs, capsys):
    _, index = job_dirs
    rc = spark_job.main([
        "query", "--index", index, "--k", "5",
        "--dsl", json.dumps({"match": {"content": {"query": "import spark"}}}),
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    hits, meta = lines[:-1], lines[-1]
    assert meta["cmd"] == "query" and meta["hits"] == len(hits) > 0
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)


def test_verify_sha256_ok(job_dirs, capsys):
    corpus, index = job_dirs
    rc = spark_job.main(["verify", "--index", index, "--input", corpus])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["mismatches"] == 0


def test_rebuild_is_idempotent(job_dirs, capsys):
    corpus, index = job_dirs
    rc = spark_job.main(["build", "--input", corpus, "--output", index,
                         "--positions", "--resumable", "--segments", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # committed segments are skipped on re-run: attempt counters stay at 1
    assert all(s["attempt"] == 1 for s in out["segments"].values())
