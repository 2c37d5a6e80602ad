"""Structured Streaming wrapper for the extraction kernel."""

from .extract_stream import extraction_query, stream_extract  # noqa: F401
