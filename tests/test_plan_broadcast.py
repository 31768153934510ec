"""No-pinned-broadcast-of-fact-tables audit (VERDICT r1 item 1).

With `spark.sql.autoBroadcastJoinThreshold=-1` the planner never
broadcasts from size stats, so any BroadcastExchange left in the
physical plan was *pinned* by an `F.broadcast(...)` hint in our code.
At 100 TB a pinned hint does not degrade — it OOMs — so a hint is only
legitimate when the broadcast side is bounded by construction:

- a constant-size dimension (nation = 25 rows, region = 5 rows at ANY
  scale factor), or
- a derived aggregate (HashAggregate in the subtree ⇒ cardinality is
  the group count, and every pinned aggregate in the repo is a 1-row
  scalar: q11's threshold, q15's max, q22's avg).

Every multi-join query key is audited; a new `F.broadcast(orders)`
anywhere in those plans fails here, not in a 1000-executor postmortem.
"""

import re

import pytest

from tests.conftest import SF_SMALL

# Tables whose size is independent of the scale factor (TESTDATA.md:
# region=5, nation=25 at sf0.001/0.01/0.1 alike). Everything else
# (customer/supplier/part/orders/lineitem/events/documents/embeddings)
# grows with SF and must never be pinned-broadcast as a raw scan.
CONSTANT_SIZE_TABLES = {"nation", "region"}

# Multi-join keys worth auditing: all TPC-H shapes plus the pipeline /
# join-family keys that touch fact-scale tables.
AUDITED_KEYS = [
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_by_lateness",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_stock",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    "events_wide_denorm",
    "data_quality_checks",
    "sessionize_events",
    "join_inner_hash",
    "join_sortmerge",
    "join_left",
    "join_semi",
    "join_anti",
]


def _walk(jnode, fn):
    fn(jnode)
    children = jnode.children()
    for i in range(children.size()):
        _walk(children.apply(i), fn)


def _scan_tables(jnode):
    """Table names of every parquet scan in the subtree."""
    tables = set()

    def visit(n):
        if "FileSourceScan" in n.getClass().getSimpleName():
            for m in re.finditer(r"([A-Za-z_]+)\.parquet", n.toString()):
                tables.add(m.group(1))

    _walk(jnode, visit)
    return tables


def _has_aggregate(jnode):
    found = [False]

    def visit(n):
        if "Aggregate" in n.getClass().getSimpleName():
            found[0] = True

    _walk(jnode, visit)
    return found[0]


def _pinned_broadcast_violations(df):
    """Broadcast subtrees that scan an sf-proportional table without an
    intervening aggregate — i.e. pinned broadcasts that OOM at scale."""
    violations = []

    def visit(n):
        if "BroadcastExchange" not in n.getClass().getSimpleName():
            return
        tables = _scan_tables(n)
        if tables <= CONSTANT_SIZE_TABLES:
            return
        if _has_aggregate(n):
            # a derived aggregate: cardinality = group count, and the
            # repo only pins 1-row scalar aggregates (asserted by the
            # companion test below)
            return
        violations.append(sorted(tables - CONSTANT_SIZE_TABLES))

    _walk(df._jdf.queryExecution().sparkPlan(), visit)
    return violations


@pytest.fixture()
def no_auto_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize("key", AUDITED_KEYS)
def test_no_pinned_broadcast_of_fact_tables(no_auto_broadcast, key):
    from target_s3_parquet_spark.registry import get_queries

    df = get_queries()[key](no_auto_broadcast, SF_SMALL)
    bad = _pinned_broadcast_violations(df)
    assert not bad, (
        f"{key}: pinned F.broadcast over sf-proportional table(s) {bad} — "
        "remove the hint and let AQE choose from runtime stats"
    )


def test_stats_still_broadcast_dims_at_small_sf(spark):
    """Removing the pins must not cost the small-SF plan: with the
    default threshold the planner still picks broadcast joins for q3
    from file-size stats — the hint was redundant where it was safe
    and fatal where it wasn't."""
    from target_s3_parquet_spark.registry import get_queries

    df = get_queries()["tpch_q3_shipping_priority"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan
