"""The driver-gate dry run: every queries() entry runs at sf0.01 and its
result matches its oracle_sql() twin in DuckDB (row count + sorted-column
values), exactly like the driver's CORRECTNESS check."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


#: DuckDB output types every oracle must stay inside.  The driver's
#: value-hash serializes types, not just magnitudes: r4 proved a DuckDB
#: HUGEINT column (sum() over BIGINT, // division) hash-mismatches a
#: Spark bigint even when every value is identical.  DECIMAL/HUGEINT/
#: nested types are therefore banned at the oracle layer — CAST in the
#: SQL instead.
ORACLE_TYPE_ALLOW = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                     "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}

#: Spark simpleString dtypes mapped to a comparison "kind"; the DuckDB
#: types map into the same kinds.  A kind mismatch between a gate's
#: Spark column and its oracle column is exactly the class of divergence
#: the driver's hash sees and the old value-equality comparator (3 ==
#: 3.0, int128 == int64) could not.
_KIND = {"bigint": "i", "int": "i", "smallint": "i", "tinyint": "i",
         "BIGINT": "i", "INTEGER": "i", "SMALLINT": "i", "TINYINT": "i",
         "double": "f", "float": "f", "DOUBLE": "f", "FLOAT": "f",
         "string": "s", "VARCHAR": "s", "boolean": "b", "BOOLEAN": "b",
         "date": "d", "DATE": "d",
         "timestamp": "t", "timestamp_ntz": "t", "TIMESTAMP": "t"}


# the in-repo analog of the driver's row hash: int and float serialize
# differently (``i:3`` vs ``f:3.0``), so a type-level divergence the old
# ``3 == 3.0`` comparator silently accepted now fails loudly; ONE shared
# definition with scripts/window_audit.py
from opensearch_spark.contract_hash import as_multiset  # noqa: E402


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(rows) >= 0  # rows-only check
        return
    res = duck.sql(oracles[name])
    ocols = [c for c in res.columns]
    otypes = [str(t) for t in res.types]
    orows = res.fetchall()
    assert sorted(cols) == sorted(ocols), f"{name}: schema mismatch"
    # driver-hash parity, type level: oracle types inside the allowlist
    # (no HUGEINT/DECIMAL/nested — the r4 driver reds), and each column's
    # comparison kind equal between the Spark schema and the oracle
    bad = [(c, t) for c, t in zip(ocols, otypes) if t not in ORACLE_TYPE_ALLOW]
    assert not bad, f"{name}: oracle emits banned types {bad}"
    skinds = {f.name: _KIND.get(f.dataType.simpleString(), "?")
              for f in df.schema.fields}
    okinds = {c: _KIND.get(t, "?") for c, t in zip(ocols, otypes)}
    kind_diff = [(c, skinds[c], okinds[c]) for c in skinds
                 if skinds[c] != okinds[c]]
    assert not kind_diff, f"{name}: Spark/oracle type-kind mismatch {kind_diff}"
    assert len(rows) == len(orows), f"{name}: row count {len(rows)} != {len(orows)}"
    got, want = as_multiset(cols, rows), as_multiset(ocols, orows)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_all_oracle_output_types_canonical(duck):
    """Spark-free sweep of EVERY oracle's DuckDB output types: none may
    emit HUGEINT/DECIMAL/nested types (the r4 driver-hash failure class)
    — the per-gate kind check above only runs for gates whose Spark side
    executes, this one covers the whole catalogue in seconds."""
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        res = duck.sql(sql)
        bad = [(c, str(t)) for c, t in zip(res.columns, res.types)
               if str(t) not in ORACLE_TYPE_ALLOW]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score"}


def test_rotation_reads_correctness_files(tmp_path, monkeypatch):
    """Rounds after r1 need no manual bookkeeping: a green row in any
    CORRECTNESS_r*.json rotates that gate out of the driver window."""
    import opensearch_spark.entry_queries as eq

    import glob as _glob
    import os as _os

    v = eq._driver_verified()
    assert set(eq._DRIVER_VERIFIED_R1) <= v
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(eq.__file__)))
    if _glob.glob(_os.path.join(root, "CORRECTNESS_r*.json")) == \
            [_os.path.join(root, "CORRECTNESS_r01.json")]:
        # r01's only red row (err: no_oracle) must NOT count as verified
        assert "search_more_like_this" not in v
    ks = list(eq.QUERIES)
    # every unverified gate must sort strictly before every verified one
    # (window-size-independent: once fewer than 50 unverified remain,
    # verified gates legitimately enter the window's tail)
    n_unverified = sum(1 for k in ks if k not in v)
    assert all(k not in v for k in ks[:n_unverified])
    assert all(k in v for k in ks[n_unverified:])
    # r4 policy: the never-verified ML-pipeline families (the gates the
    # r1-r3 newest-first rotation kept displacing) lead the window
    n_ml_unv = sum(1 for k in ks[:n_unverified] if eq._is_ml_family(k))
    assert all(eq._is_ml_family(k) for k in ks[:n_ml_unv])


def test_bench_queries_exist():
    """Every bench.py headline op must be a real queries() gate — a
    renamed/removed gate must fail here, not in the driver's bench run."""
    import bench

    qs = entry_mod.queries()
    missing = [q for q in bench.BENCH_QUERIES if q not in qs]
    assert not missing, missing
