"""Training-data curation operators: eval-set decontamination and
token-budget sequence packing.

Both are standard steps in an LLM data pipeline that the reference engine
has no analog for (SURVEY §2 "beyond the reference" ops). Plans are
built-in-function only — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _shingle_expr(text_col: str, n: int):
    """Word n-gram shingles as an array expression (NOT distinct, NOT
    exploded) — per-row, fully codegen."""
    if n == 1:
        return F.split(F.trim(F.col(text_col)), r"\s+")
    # NB: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than n tokens need an explicit empty-array branch.
    toks = f"split(trim({text_col}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} "
        f"THEN transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def decontaminate(df: DataFrame, eval_df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Eval-set decontamination by exact n-gram overlap (the GPT-3 /
    Pile-style "13-gram decontamination", here with configurable n):
    a training doc is contaminated if it shares ANY word n-gram with any
    eval document. Returns (id_col, n_contaminated) for flagged docs —
    anti-join against this to drop them.

    Scale shape: the eval set is small by construction (thousands of
    benchmark items vs 10^9 training docs), so its distinct shingle set
    is collected into a broadcast hash join against the exploded training
    shingles — the 100 TB side is never shuffled; the per-doc distinct
    count happens AFTER the join has shrunk it to contaminated rows only.
    """
    train_sh = df.select(
        F.col(id_col), F.explode(_shingle_expr(text_col, n)).alias("shingle")
    ).where(F.col("shingle") != "")
    eval_sh = (eval_df.select(F.explode(_shingle_expr(text_col, n)).alias("shingle"))
               .where(F.col("shingle") != "").distinct())
    return (train_sh.join(F.broadcast(eval_sh), "shingle")
            .groupBy(id_col)
            .agg(F.count_distinct("shingle").alias("n_contaminated")))


def pack_sequences(df: DataFrame, max_tokens: int, text_col: str = "text",
                   id_col: str = "doc_id", part_col: str | None = None) -> DataFrame:
    """Token-budget sequence packing (concat-and-split, the standard LLM
    pretraining packing): documents are laid out in ``id_col`` order on a
    contiguous token tape, which is then chunked into fixed
    ``max_tokens``-sized training sequences; a doc may span a boundary
    (it is split, not padded). Per doc returns

        (id_col, n_tokens, start_seq, end_seq, offset_in_seq)

    where start_seq/end_seq are the first/last sequence ids the doc lands
    in and offset_in_seq is its start offset inside start_seq.

    Scale shape: a single global cumulative sum is a one-partition
    bottleneck, so packing is windowed per ``part_col`` group (default:
    the ``lang`` column if present, else one global group) — each group
    is an independent tape with its own sequence numbering, exactly how a
    1000-executor job packs per shard. Sequence ids are (group, seq)
    pairs; downstream shuffles on them stay balanced.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    out = df.select(F.col(id_col), n_tokens.alias("n_tokens"),
                    *( [F.col(part_col)] if part_col else [] ))
    if part_col:
        w = Window.partitionBy(part_col).orderBy(id_col)
    else:
        w = Window.orderBy(id_col)
    end = F.sum("n_tokens").over(w)
    start = end - F.col("n_tokens")
    return out.select(
        id_col,
        *( [part_col] if part_col else [] ),
        F.col("n_tokens"),
        F.floor(start / max_tokens).cast("long").alias("start_seq"),
        F.floor((end - 1) / max_tokens).cast("long").alias("end_seq"),
        (start % max_tokens).cast("long").alias("offset_in_seq"),
    )
