"""Structured Streaming restatement of the reference pipeline plus
standard stateful operators (windows, watermarks, streaming dedup,
arbitrary state)."""
