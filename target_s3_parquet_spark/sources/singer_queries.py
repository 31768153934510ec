"""Driver-facing query keys for the Singer ingestion pipeline (the
reference's core capability, SURVEY §2A R1-R13). Filled in by the
singer batch/streaming modules; registered here so the driver exercises
ingestion through the same contract as the relational operators.

Populated in M1 (see sources/singer.py).
"""
