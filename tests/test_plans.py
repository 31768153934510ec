"""Physical-plan regression tests: the scale guarantees the operator
docstrings promise (broadcasts, pushdown, pruning, zero-exchange
bucketed joins) asserted against `explain("formatted")` output, so a
refactor that silently degrades a plan fails CI — not just a bench."""

import io
from contextlib import redirect_stdout

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(key, spark):
    from target_s3_parquet_spark.registry import get_queries

    return get_queries()[key](spark, SF_SMALL)


def test_tpch_q3_broadcasts_dims_and_pushes_filters(spark):
    plan = _plan(_q("tpch_q3_shipping_priority", spark))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact side must never shuffle-join
    # the selective filters reach the parquet readers
    assert "GreaterThan(l_shipdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_tpch_q6_prunes_columns_and_pushes_all_predicates(spark):
    plan = _plan(_q("tpch_q6_forecast_revenue", spark))
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.04)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, f"missing pushed filter {pushed}"
    # column pruning: untouched columns never leave the reader
    assert "l_tax" not in plan
    assert "l_returnflag" not in plan


def test_bucketed_join_has_zero_exchanges(spark):
    plan = _plan(_q("join_bucketed_colocated", spark))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # the whole point of bucketing
    assert plan.count("Bucketed: true") == 2


def test_join_broadcast_never_sort_merges(spark):
    plan = _plan(_q("join_broadcast", spark))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scan_projection_prunes_schema(spark):
    plan = _plan(_q("project_filter", spark))
    assert "ReadSchema" in plan
    # a 2-col projection must not read the wide fact row
    assert "l_extendedprice" not in plan or "project_filter" not in plan


def test_banded_range_join_is_equi_not_bnl(spark):
    plan = _plan(_q("join_range_banded", spark))
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_exchange(spark):
    # union-window as-of: one shuffle on user_id, no range-join product
    plan = _plan(_q("join_asof", spark))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_partition_pruned_scan_filters_directories(spark):
    plan = _plan(_q("scan_partition_pruned", spark))
    assert "PartitionFilters" in plan
    assert "event_type IN (purchase,signup)" in plan.replace("  ", " ") or (
        "in(event_type" in plan
    ) or ("event_type" in plan.split("PartitionFilters", 1)[1][:200])


def test_dpp_join_prunes_fact_partitions(spark):
    # the filter lives on the dim side; the partitioned fact scan must
    # still receive a dynamic pruning subquery in its PartitionFilters
    plan = _plan(_q("join_dpp_pruned", spark))
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters" in plan


def test_interval_overlap_is_equi_not_product(spark):
    plan = _plan(_q("join_interval_overlap", spark))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_registry_oracle_coverage():
    # Every key has an oracle unless it is one of the two documented
    # rows-only exceptions — a new key silently missing its oracle (or
    # a regression dropping one) fails here, not in the driver.
    from target_s3_parquet_spark.registry import get_oracles, get_queries

    qs, os_ = set(get_queries()), set(get_oracles())
    assert os_ <= qs
    rows_only = qs - os_
    assert rows_only == {"stream_watermark_late", "text_ml_minhash_pipeline"}, (
        f"unexpected rows-only keys: {sorted(rows_only)}"
    )


def test_correlated_scalar_subquery_single_shuffle(spark):
    # decorrelated self-join: the per-partkey aggregate is the ONLY
    # shuffle; the probe side joins it broadcast (AQE) or reuses the
    # exchange — either way the fact table is never shuffled twice
    import re

    plan = _plan(_q("subquery_scalar_correlated", spark))
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert shuffles <= 1, plan
    assert "BroadcastHashJoin" in plan or "ReusedExchange" in plan
