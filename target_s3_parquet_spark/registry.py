"""Query registry — the driver-facing catalog of implemented operators.

Every operator from ``SURVEY.md §2`` registers here with a callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string. ``__spark_entry__.py`` re-exports these dicts.

Column-name discipline: the driver's comparator sorts columns by name
and hashes values, so every computed column is aliased identically in
the Spark code and the oracle SQL.

Float discipline: cross-engine aggregate sums over ``double`` columns
are order-dependent in the last ulp. Where a query aggregates doubles
we cast to ``DECIMAL(38,6)`` pre-aggregation in BOTH engines — decimal
addition is exact and order-independent, so the hashes match and the
result is deterministic on any cluster size/partitioning.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: streaming state,
    LSH, iterative algorithms).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every query module exactly once (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    # Imported lazily so `import target_s3_parquet_spark` stays cheap.
    from target_s3_parquet_spark.operators import (  # noqa: F401
        aggregates,
        dedup,
        joins,
        pipeline,
        relational,
        similarity,
        timeseries,
        tpch,
        windows,
    )
    from target_s3_parquet_spark.functions import (  # noqa: F401
        scalars,
        text_analysis,
        udfs,
    )
    from target_s3_parquet_spark.sources import (  # noqa: F401
        formats,
        multimodal,
        singer_queries,
        txlog,
    )
    from target_s3_parquet_spark.streaming import stream_queries  # noqa: F401

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
