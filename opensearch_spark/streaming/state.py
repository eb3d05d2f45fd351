"""Custom stateful streaming operators (SURVEY §2.12 extension): the
training-data-pipeline ops that need cross-micro-batch state, expressed
with ``applyInPandasWithState`` (Structured Streaming's arbitrary-state
API — Spark's analog of the reference's versioned per-doc state in the
translog/live-version-map, ``index/engine/LiveVersionMap.java``).

``streaming_dedup``: exactly-once emission of the FIRST document seen per
content fingerprint across the whole stream — streaming exact dedup. The
per-group state is one tiny "seen" marker per fingerprint; groups are
hash-partitioned by fingerprint, so state is distributed and the operator
scales with the state store, not the stream length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "fingerprint string, doc_id long"
DEDUP_STATE_SCHEMA = "seen boolean, first_doc long"


def _dedup_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    batch_min: int | None = None
    for pdf in pdfs:
        # NULL ids surface as NaN in the pandas frame; a group of only
        # NULL-id rows would make int(NaN) kill the whole streaming
        # query — skip them (a doc with no id has no dedup identity)
        ids = pdf["doc_id"].dropna()
        if len(ids):
            m = int(ids.min())
            batch_min = m if batch_min is None else min(batch_min, m)
    if state.exists:
        # fingerprint already emitted in an earlier micro-batch → drop
        yield pd.DataFrame({"fingerprint": pd.Series([], dtype="object"),
                            "doc_id": pd.Series([], dtype="int64")})
        return
    if batch_min is None:
        return
    state.update((True, batch_min))
    yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [batch_min]})


def streaming_dedup(stream_df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Streaming exact dedup: emit (fingerprint, first doc_id) once per
    distinct content fingerprint, across micro-batches. Input must be a
    streaming DataFrame; fingerprint = md5 of the content column."""
    keyed = stream_df.select(
        F.md5(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("long").alias("doc_id"))
    return (keyed.groupBy("fingerprint")
            .applyInPandasWithState(
                _dedup_fn, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
