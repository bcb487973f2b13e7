"""Structured Streaming surface (SURVEY.md §2.8, extension E4).

The reference is batch-only (a bounded ``beam.Create``); these are the
streaming re-expressions of the engine's operators: watermarked
event-time windows, streaming sessionization via ``session_window``,
and the convert pipeline as an incremental ``foreachBatch`` sink."""

from .convert_stream import convert_stream  # noqa: F401
from .windows import streaming_hourly_rollup, streaming_sessionize  # noqa: F401
