"""Shared helpers for operator/query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


# Live cache handles created by two_phase_rank, released in bulk by
# release_rank_caches() AFTER the caller materializes (collect,
# snapshot, parquet write). Unpersisting earlier is a correctness
# hazard — see the docstring below.
_RANK_CACHES: list[DataFrame] = []


def release_rank_caches() -> int:
    """Unpersist every cache two_phase_rank has created since the last
    release and drop the Python handles. Safe ONLY after the results
    built on them are materialized (the lazy plans would otherwise
    resample range bounds on re-execution). Returns the number of
    caches released; harnesses call this per key to keep storage
    memory flat across hundreds of invocations."""
    n = len(_RANK_CACHES)
    for df in _RANK_CACHES:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session already stopped
            pass
    _RANK_CACHES.clear()
    return n


def fan_out_scan(df: DataFrame) -> DataFrame:
    """Adaptive scan fan-out (guide §2.5 "input skew: one huge
    unsplittable file — repartition immediately after the read").

    The synthetic tables are single-row-group parquet files, so every
    scan is ONE split and all map-side work before the first exchange
    runs on ONE core (thread-dump evidence: the whole 4.5M-pair
    Levenshtein pass of er_fellegi_sunter_weights inside `task 0.0 in
    stage 2`). For operators whose PER-ROW work upstream of the first
    shuffle is heavy (pair Levenshtein, per-word md5 fingerprints,
    Arrow-batched Python chunkers), a round-robin repartition to the
    session's parallelism unlocks every core for the price of one tiny
    shuffle of the narrow input rows.

    ADAPTIVE, not a constant: it fires only when the scan has fewer
    splits than the session's default parallelism — at 100 TB the same
    scan arrives in thousands of row-group splits and this helper is a
    no-op, so no pointless full-table shuffle is added at scale (the
    exact `repartition(n) "for parallelism"` accident guide §2.4 warns
    about). Do NOT use it on light scans feeding plain aggregates —
    the added exchange costs more than the single-task partial
    aggregate it parallelizes."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def register_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with the handle registered in ``_RANK_CACHES`` so
    :func:`release_rank_caches` drops it alongside the rank caches.
    For operator-internal caches (graph edge lists, survival curves,
    ...) whose release must wait until the caller materializes — a
    long-lived session that runs many keys outside the gate/bench
    harnesses would otherwise accumulate cached DataFrames unless it
    remembered to ``spark.catalog.clearCache()`` itself."""
    local = df.cache()
    _RANK_CACHES.append(local)
    return local


def two_phase_rank(
    df: DataFrame,
    order_cols: list,
    sum_col: str | None = None,
    nparts: int = 8,
    rank_name: str = "rnk",
    cum_name: str = "cum",
) -> DataFrame:
    """Global ROW_NUMBER (and optionally a running SUM) in total
    ``order_cols`` order WITHOUT a single-partition window — the
    distributed prefix-sum shape shared with ``assign_dense_ids``
    (`operators/pipeline.py`), generalized to multi-column orderings
    (ascending or descending) and an optional accumulated measure:

    1. ``repartitionByRange`` on the order columns — partition p holds
       rows strictly below partition p+1 in the total order (boundary
       sampling affects balance, never the result);
    2. partition-LOCAL row_number / running sum (sort stays inside each
       partition — no cross-partition data motion);
    3. per-partition (count, sum) — a num-partitions-row aggregate —
       cumsum'd into starting offsets and BROADCAST back;
    4. rank = offset_n[pid] + local_rn; cum = offset_s[pid] + local_cum.

    The only global coordination is the tiny offsets table; the one
    unpartitioned window in the plan orders NUM-PARTITIONS rows, never
    the data. With a decimal ``sum_col`` the running sum is exact and
    order-stable, so the result is bit-identical to the naive global
    window the oracle states.

    ``local`` must be CACHED before fanning out: repartitionByRange
    samples its bounds per RDD id, so two independent materializations
    could pick different ranges and offsets would disagree with pids.
    The cache is NOT unpersisted here (the returned lazy plan still
    references it, and dropping it BEFORE materialization would let
    the two plan references resample different range bounds — a
    correctness event, not a perf one); instead every cache handle is
    registered in ``_RANK_CACHES`` and callers release them AFTER
    materializing/snapshotting via :func:`release_rank_caches` — the
    gate, bench, and test harnesses do so per key (alongside their
    ``spark.catalog.clearCache()``), so repeated invocations keep
    storage memory flat.
    """
    ordering = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    local = (
        df.repartitionByRange(nparts, *ordering)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*ordering)
    local = local.withColumn("_local_rn", F.row_number().over(w_local))
    if sum_col is not None:
        local = local.withColumn(
            "_local_cum",
            F.sum(sum_col).over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    local = local.cache()
    _RANK_CACHES.append(local)
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_s"))
    # partitionBy(pmod(_pid, 1)): ONE bounded group, declared
    # deliberately — this window orders the NUM-PARTITIONS-row offsets
    # table, never the data. Identical execution to an unpartitioned
    # window (all <= nparts rows land in one task) but exempt from the
    # WindowExec "No Partition Defined" footgun warning, which exists
    # to catch accidental data-sized single-task sorts. pmod(x, 1) = 0
    # rather than lit(0) because Catalyst folds literal partition
    # expressions away, restoring the empty-spec warning.
    w_off = (
        Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1)))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_pid")
        .agg(*aggs)
        .withColumn(
            "_off_n", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
        )
    )
    if sum_col is not None:
        offsets = offsets.withColumn("_off_s", F.sum("_s").over(w_off))
    # LONG, not int: these are the declared 100 TB / billions-of-rows
    # forms, and a 32-bit global rank overflows past ~2.1B rows (ANSI
    # runtime error, silent wrap in legacy) at exactly the scale the
    # helper exists for. ntile_from_rank consumes the rank as a Column
    # and is long-safe; the comparator stringifies cells, so the
    # int->long widening is oracle-neutral (DuckDB ROW_NUMBER is BIGINT).
    out = (
        local.join(F.broadcast(offsets.drop("_n", "_s")), "_pid")
        .withColumn(rank_name, (F.col("_off_n") + F.col("_local_rn")).cast("long"))
    )
    if sum_col is not None:
        out = out.withColumn(
            cum_name,
            F.when(
                F.col("_off_s").isNull(), F.col("_local_cum")
            ).otherwise(F.col("_off_s") + F.col("_local_cum")),
        )
    return out.drop("_pid", "_local_rn", "_local_cum", "_off_n", "_off_s")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Closed-form NTILE(k) from an exact 1-based global rank and the
    total row count: the first ``n mod k`` buckets take ``n div k + 1``
    rows, the rest ``n div k`` — bit-identical to the window function
    at any scale, with no global sort. ``greatest(q, 1)`` guards the
    n < k case (where the second branch is unreachable anyway) against
    a NULL from integer division by zero."""
    q = (n / k).cast("long")
    m = n % k
    big = (q + 1) * m  # rows covered by the size-(q+1) buckets
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(
            m + ((rank - big - 1) / F.greatest(q, F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )
