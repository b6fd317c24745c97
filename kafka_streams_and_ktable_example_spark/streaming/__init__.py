"""Structured Streaming drivers for the engine's incremental semantics."""

from .pipeline import (
    ChangelogStreamJob,
    run_shareholders_stream,
    run_events_windowed_stream,
)

__all__ = [
    "ChangelogStreamJob",
    "run_shareholders_stream",
    "run_events_windowed_stream",
]
