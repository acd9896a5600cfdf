"""Structured Streaming variants of the engine's continuous
aggregates, stateful compaction, and exact dedup."""

from .compact_stream import stream_compact  # noqa: F401
from .dedup_stream import stream_dedup_exact  # noqa: F401
from .rollup_stream import stream_rollup  # noqa: F401
