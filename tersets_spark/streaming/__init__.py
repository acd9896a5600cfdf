"""Structured Streaming variants of the engine's continuous aggregates."""

from .rollup_stream import stream_rollup  # noqa: F401
