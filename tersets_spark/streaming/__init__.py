"""Structured Streaming variants of the engine's continuous
aggregates, stateful compaction, exact dedup, and incremental fuzzy
(near-duplicate) dedup."""

from .compact_stream import stream_compact  # noqa: F401
from .dedup_stream import stream_dedup_exact  # noqa: F401
from .fuzzy_dedup_stream import (  # noqa: F401
    fuzzy_dedup_stream,
    process_fuzzy_batch,
    read_decisions,
)
from .rollup_stream import stream_rollup  # noqa: F401
