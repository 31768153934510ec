"""Driver-facing query keys for Structured Streaming operators
(SURVEY §2B streaming table). Populated in M3 — streaming results are
materialized via memory-sink runs so the callables still return a
DataFrame for the rows-only driver check.
"""
