"""Stateful streaming deduplication — exact dedup at ingest time.

A 100 TB training-data pipeline dedups WHILE ingesting, not after: the
first document with a given content hash passes through, every later
arrival — in the same micro-batch, a later batch, or after a restart —
is suppressed.  The reference has no streaming engine (its incremental
story is WritableDatabase commits); this is the Structured Streaming
custom stateful operator the engine adds on top:

    groupBy(content_sha256).applyInPandasWithState(...)

State = one row per distinct content hash (the docid that claimed it),
kept in the streaming state store and persisted in the checkpoint, so
dedup decisions survive restarts.  State size is O(distinct hashes) —
the same bitmap-of-seen-keys any exact-dedup ingest keeps, sharded by
the state store across executors.

Scale notes: the groupBy key is a uniform 256-bit digest, so state and
shuffle are skew-free; per group the handler touches only that group's
rows (Arrow-batched pandas, no per-row Python in the driver).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output: the surviving (first-seen) rows
_OUT_SCHEMA = (
    "id long, content_sha256 string, text string, n_duplicates long"
)
# state: the docid that claimed this hash + how many dups it absorbed
_STATE_SCHEMA = "first_id long, n_duplicates long"


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = [pdf for pdf in pdfs if len(pdf)]
    n_new = sum(len(p) for p in rows)
    if state.exists:
        # hash already claimed in an earlier batch: suppress everything,
        # keep counting absorbed duplicates
        first_id, n_dup = state.get
        state.update((int(first_id), int(n_dup) + n_new))
        return
    if not n_new:
        return
    first = rows[0].iloc[[0]]
    state.update((int(first["id"].iloc[0]), n_new - 1))
    out = first.copy()
    out["n_duplicates"] = n_new - 1  # in-batch dups absorbed right away
    yield out[["id", "content_sha256", "text", "n_duplicates"]]


def dedup_stream(
    stream_docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """First-seen exact dedup over a streaming DataFrame.

    Returns a streaming DataFrame of the SURVIVING rows
    (id, content_sha256, text, n_duplicates-at-first-sight); wire it to
    any sink.  Requires a checkpointLocation on the sink for the state
    to persist across restarts (standard Structured Streaming
    contract)."""
    keyed = stream_docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias(
            "content_sha256"
        ),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("content_sha256").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["dedup_stream"]
