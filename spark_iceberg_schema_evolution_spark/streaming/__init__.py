"""Structured Streaming operators: windows, watermarks, stateful dedup, sinks."""
