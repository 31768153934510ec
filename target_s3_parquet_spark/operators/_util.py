"""Shared helpers for operator/query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from target_s3_parquet_spark.session import load_table

# Exact-summation scale: doubles are cast to DECIMAL(38,6) before SUM so
# the aggregate is order-independent (decimal addition is exact) and
# bit-identical across engines and across cluster partitionings. The
# per-row double arithmetic *before* the cast is IEEE-754-deterministic.
DEC = "decimal(38,6)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table."""
    return load_table(spark, sf_dir, name)


def dec(c: Column | str) -> Column:
    """Cast a (possibly computed) double column to the exact-sum decimal."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Order-independent SUM over doubles: decimal-exact, surfaced as double."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(col)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
