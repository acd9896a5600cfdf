"""Streaming exact deduplication — keyed stateful first-wins dedup
over an unbounded document stream (``applyInPandasWithState``).

Batch exact dedup (operators/dedup.dedup_exact) keeps the MIN doc id
per identical text. The streaming form cannot retract an already
emitted row, so its contract is FIRST-ARRIVAL-wins with a
deterministic within-batch tiebreak: the state key is the content
hash, a micro-batch's rows for one hash are reduced to their minimum
doc id, and a hash that is already in state emits nothing. When the
stream is fed in ascending-id order (backfills replaying a sorted
table — the parity row's shape), first-arrival == global min id and
the survivor set is byte-identical to the batch operator's.

Scale notes: state is one short marker row per DISTINCT hash, sharded
by Spark's state store across executors — bounded by unique-content
count, not stream length. For unbounded production streams pair with
a state TTL (``timeout_ms``) so cold hashes age out: dedup then
degrades gracefully to a sliding-window guarantee, the standard
trade at 100-TB stream scale.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id long, content_hash string"
STATE_SCHEMA = "seen boolean"


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """First-wins streaming exact dedup: emits ``(doc_id,
    content_hash)`` for the first document carrying each content hash;
    later duplicates are dropped. ``timeout_ms`` (processing-time)
    ages out state for unbounded streams; ``None`` keeps state forever
    (parity/backfill mode)."""
    hashed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )

    def dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None or m < best else best
        if state.exists:
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            return  # hash already emitted — drop all later arrivals
        if best is None:
            return
        state.update((True,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"doc_id": [best], "content_hash": [key[0]]})

    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
