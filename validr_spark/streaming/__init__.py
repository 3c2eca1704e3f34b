"""Structured Streaming validation: same compiled plans over streams."""

from .quality import windowed_encoding_quality
from .referential import stream_orphans, windowed_orphan_counts
from .sessions import streaming_sessions
from .stateful import running_verdicts
from .validate import (stream_violations, validate_stream, windowed_verdicts,
                       windowed_violation_rates, write_violations_stream)

__all__ = ["validate_stream", "stream_violations", "windowed_verdicts",
           "windowed_violation_rates",
           "write_violations_stream", "running_verdicts",
           "streaming_sessions", "stream_orphans", "windowed_orphan_counts",
           "windowed_encoding_quality"]
