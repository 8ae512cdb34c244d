"""Structured Streaming: continuous tile assignment + per-cell windowed
stats over a document stream.

The reference is batch-only (SURVEY.md §2.6); this is the engine-native
streaming path: readStream → decode geo span (same JVM expressions as
batch — one code path) → cell_id → watermarked windowed aggregation.
"""

from .tile_stream import streaming_tile_assign, streaming_cell_counts  # noqa: F401
