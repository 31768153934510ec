"""Relational + extension operators, each expressed Spark-first.

Modules register query keys with :mod:`target_s3_parquet_spark.registry`;
the implementations are thin declarative compositions so Catalyst keeps
full visibility (pushdown, pruning, join planning) at any scale.
"""
