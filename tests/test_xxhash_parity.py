"""Driver-side XXH64 must be bit-identical to Spark's xxhash64 — the
posting-partition pruning in InvertedIndex.postings_for_terms depends on
it (a silent mismatch would make queries scan the wrong partition and
return empty results)."""
import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from opensearch_spark.index.xxhash import spark_pmod_part, spark_xxhash64_str


def test_parity_on_fixed_corpus(spark):
    vals = ["", "a", "ab", "abc", "spark", "café", "日本語テスト", "𝔘𝔫𝔦",
            "x" * 7, "y" * 8, "z" * 31, "w" * 32, "q" * 33, "v" * 100,
            "import numpy as np\n" * 20, "\x00\x01", "snake_case_term"]
    rows = (spark.createDataFrame([(v,) for v in vals], "s string")
            .select("s", F.xxhash64("s").alias("h"),
                    F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("p"))
            .collect())
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
        assert spark_pmod_part(r["s"], 8) == r["p"], repr(r["s"])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=string.printable + "é日𝔘", min_size=0,
                        max_size=64), min_size=1, max_size=8, unique=True))
def test_parity_property(spark, vals):
    rows = (spark.createDataFrame([(v,) for v in vals], "s string")
            .select("s", F.xxhash64("s").alias("h")).collect())
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
