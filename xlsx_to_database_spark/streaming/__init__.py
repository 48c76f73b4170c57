"""Structured Streaming layer (SURVEY.md §2.9): the events table
replayed as a file stream, windowed/stateful aggregations, and sinks."""

from xlsx_to_database_spark.streaming.engine import events_stream, run_to_memory

__all__ = ["events_stream", "run_to_memory"]
