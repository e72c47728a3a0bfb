"""Structured Streaming incremental load (the reference's Snowpipe+task layer)."""
