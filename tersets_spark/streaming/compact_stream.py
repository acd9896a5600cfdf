"""Streaming token compaction — the custom stateful operator of the
streaming surface (``applyInPandasWithState``).

Batch compaction (operators/compress.compress_blocks) slices each
series into deterministic CHUNK-token blocks; this operator does the
same over an UNBOUNDED stream of per-doc token fragments: per-key state
buffers the open tail, every full CHUNK emits a compressed block with
the same deterministic ``chunk_id = first_pos / CHUNK`` boundaries as
the batch path (so a backfill job and the live stream produce
byte-comparable block tables), and the open tail flushes on an explicit
flush record or on processing-time timeout.

Scale notes: state per key is at most CHUNK-1 tokens (bounded memory);
blocks leave state as soon as they fill, so watermark-less state growth
is impossible; the emitted schema matches compress.BLOCKS_SCHEMA minus
the bytes column.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..methods import Method

OUT_SCHEMA = (
    "doc_id string, chunk_id int, method tinyint, blob binary, "
    "n_values int, first_pos long"
)
STATE_SCHEMA = "n_done long, buf array<int>"

#: input contract: (doc_id string, seq long, tokens array<int>,
#: flush boolean) — seq orders fragments of one doc within a batch
INPUT_COLS = ("doc_id", "seq", "tokens", "flush")


def _emit_blocks(
    doc_id: str, n_done: int, buf: list[int], chunk: int, method_code: int, final: bool
) -> tuple[list[dict], int, list[int]]:
    from ..kernels import registry

    rows = []
    m = Method(method_code)
    while len(buf) >= chunk or (final and buf):
        take = min(chunk, len(buf))
        vals = np.asarray(buf[:take], dtype=np.float64)
        blob = registry.compress(vals, m)
        rows.append(
            {
                "doc_id": doc_id,
                "chunk_id": int(n_done),
                "method": np.int8(method_code),
                "blob": blob,
                "n_values": int(take),
                "first_pos": int(n_done) * chunk,
            }
        )
        buf = buf[take:]
        n_done += 1
        if final and not buf:
            break
    return rows, n_done, buf


def stream_compact(
    tokens_stream: DataFrame,
    chunk: int = 4096,
    method: Method = Method.BitPackedDeltaEncoding,
    timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Stateful streaming compaction: group by doc_id, buffer fragments,
    emit compressed blocks with batch-identical chunk boundaries.

    ``timeout_ms`` flushes idle tails via processing-time timeout (the
    production mode — note the engine then never goes trigger-idle, as
    Spark schedules batches to fire timeouts). ``timeout_ms=None``
    flushes ONLY on explicit flush records, which keeps
    ``processAllAvailable`` semantics for tests and bounded replays.

    Late fragments: a flush leaves a tombstone ``(n_done, [])`` in state,
    so a fragment arriving after the flush continues chunk numbering at
    ``n_done`` (no block-key collisions). If the flushed tail was a
    partial chunk, the flush is treated as end-of-that-logical-position:
    late chunks are numbered after it and their ``first_pos`` is the
    nominal ``chunk_id * chunk``."""
    method_code = int(method)
    use_timeout = timeout_ms is not None

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.exists:
            n_done, buf = state.get
            buf = list(buf)
        else:
            n_done, buf = 0, []
        timed_out = bool(state.hasTimedOut)
        flush = timed_out
        # a group's rows may arrive as SEVERAL Arrow chunks in arbitrary
        # order (maxRecordsPerBatch splits) — concatenate first, then one
        # global seq sort, or fragments would interleave across chunks
        frames = [pdf for pdf in pdfs]
        if frames:
            allrows = pd.concat(frames, ignore_index=True).sort_values("seq")
            for toks, fl in zip(allrows["tokens"], allrows["flush"]):
                if toks is not None:
                    buf.extend(int(t) for t in toks)
                flush = flush or bool(fl)
        rows, n_done, buf = _emit_blocks(
            doc_id, n_done, buf, chunk, method_code, final=flush
        )
        if flush and not buf:
            # keep a tombstone (n_done, []) so a LATE fragment for this doc
            # continues chunk numbering instead of silently restarting at
            # chunk_id=0 and colliding with already-emitted block keys; the
            # tombstone itself expires on the next idle timeout (an
            # empty-input timed-out invocation), which bounds state. With
            # timeouts disabled (test/replay mode) tombstones persist for
            # the bounded run.
            if timed_out and not frames and not rows:
                state.remove()
            else:
                state.update((n_done, buf))
                if use_timeout:
                    state.setTimeoutDuration(timeout_ms)
        else:
            state.update((n_done, buf))
            if use_timeout:
                state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(rows)

    return (
        tokens_stream.select(*INPUT_COLS)
        .groupBy("doc_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
