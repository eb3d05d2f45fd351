"""flat_object field type (FlatObjectFieldMapper.java).

The reference's flat_object mapper indexes an arbitrary JSON sub-object
as two keyword streams without creating per-leaf mappings:

- the ROOT field carries every leaf VALUE as a keyword term, so
  ``term: {f: v}`` matches a doc where ANY leaf equals v;
- the ``f._valueAndPath`` sub-field carries ``path.to.leaf=value``
  terms, so ``term: {"f.path.to.leaf": v}`` rewrites to one
  value-and-path term (DocValueFetcher over the same two streams).

Spark-first shape: the flatten is a bounded-depth iteration of
``from_json(map<string,string>)`` + ``explode`` — nested objects arrive
as raw JSON strings and are re-parsed one level per round with their
dotted path prefix. Pure codegen (no UDF); depth rounds are plan
unions, not driver loops over data; the explode multiplies rows by leaf
count, which IS the output (same posture as chunking). Like the
reference, leaf values are indexed as strings (keyword semantics).

Caveat shared with the reference's parser: a leaf STRING value that is
itself VALID JSON-object text is indistinguishable from a nested object
at this representation and is descended into ('{'-prefixed strings that
don't parse stay leaves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MAP = "map<string,string>"


def flatten_json(df: DataFrame, json_col: str, id_col: str = "doc_id",
                 max_depth: int = 4) -> DataFrame:
    """(id, path, value) leaf triples of a JSON-object column, paths
    dotted, depth bounded by ``max_depth`` (deeper objects are kept as
    their raw JSON string — the reference also caps flat_object depth)."""
    # descend ONLY into values from_json actually parses as an object:
    # a '{'-prefixed string that is NOT valid JSON (from_json → null map)
    # stays a leaf instead of silently vanishing in the explode, and a
    # null-valued leaf (three-valued startswith → NULL predicate) is
    # coalesced into the leaf branch rather than dropping out of both.
    # '{}' parses to an EMPTY map and yields no leaves — the reference's
    # empty-object semantics.
    # _parsed is PROJECTED ONCE per level and the object test reads it —
    # putting from_json inside each where() predicate re-parsed every
    # value up to three times per round (leaf branch, object branch,
    # next level's explode; round-4 review)
    def _with_parsed(frame: DataFrame) -> DataFrame:
        return frame.withColumn(
            "_parsed",
            F.when(F.col("value").startswith("{"),
                   F.from_json(F.col("value"), _MAP)))

    is_obj = F.col("_parsed").isNotNull()
    lvl = _with_parsed(df.select(
        F.col(id_col),
        F.explode(F.from_json(F.col(json_col), _MAP)).alias("path", "value")))
    out = lvl.where(~is_obj).drop("_parsed")
    cur = lvl.where(is_obj)
    for _ in range(max_depth - 1):
        nxt = _with_parsed(
            cur.select(
                F.col(id_col), F.col("path").alias("_p"),
                F.explode(F.col("_parsed")).alias("k", "value"))
            .select(F.col(id_col),
                    F.concat_ws(".", "_p", "k").alias("path"), "value"))
        out = out.unionByName(nxt.where(~is_obj).drop("_parsed"))
        cur = nxt.where(is_obj)
    # depth-capped remnants kept as raw terms
    return out.unionByName(cur.drop("_parsed"))


def flat_object_match(df: DataFrame, json_col: str, value: str,
                      path: str | None = None,
                      id_col: str = "doc_id") -> DataFrame:
    """Doc ids whose flat_object field matches a term: value-only (ANY
    leaf == value — the root-field stream) or dotted-path
    (``path=value`` — the _valueAndPath stream). One flatten + filter +
    distinct; the flatten is materializable at build time like every
    derived index table."""
    leaves = flatten_json(df, json_col, id_col)
    cond = F.col("value") == value
    if path is not None:
        cond = cond & (F.col("path") == path)
    return leaves.where(cond).select(id_col).distinct()
