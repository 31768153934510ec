"""Relational core: scans, projections, predicates, sorts, limits, set ops.

All plain DataFrame compositions — Catalyst pushes the filters and the
column pruning into the parquet scan (verify with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``), so at
100 TB only the referenced columns/row groups are read.

Reference parity note: the reference engine is write-only (SURVEY §1.5);
its query surface is what a consumer runs over the Parquet it writes.
These keys are that surface, per SURVEY §2B.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import dec, dsum, sql_dsum, t
from target_s3_parquet_spark.registry import query


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary. Scan → pushed filter →
# hash-agg (partial+final automatic) → small sort. The groupBy keys have
# tiny cardinality so the shuffle moves only partial aggregates —
# this plan is flat-scalable: 100 TB in, a few KB shuffled.
# --------------------------------------------------------------------------
_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("l_extendedprice")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Scans & projections
# --------------------------------------------------------------------------
@query("scan_parquet", "SELECT * FROM region")
def scan_parquet(spark, sf_dir):
    """Bare parquet scan with its file-declared schema."""
    return t(spark, sf_dir, "region")


@query(
    "project_filter",
    """
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_discount > 0.05
    """,
)
def project_filter(spark, sf_dir):
    """Projection + predicate; both reach the parquet reader (pushdown +
    column pruning), so a 2-column projection reads 2 column chunks."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )


@query(
    "filter_pred_combo",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F')
           AND o_totalprice BETWEEN 1000.0 AND 150000.0
           AND o_orderpriority LIKE '1-%')
       OR (NOT o_orderstatus = 'P' AND o_orderdate IS NULL)
       OR (o_custkey IS NOT NULL AND o_totalprice > 400000.0)
    """,
)
def filter_pred_combo(spark, sf_dir):
    """AND/OR/NOT, IN, BETWEEN, LIKE, null-tests in one predicate tree."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000.0, 150000.0)
            & F.col("o_orderpriority").like("1-%")
        )
        | ((~(F.col("o_orderstatus") == "P")) & F.col("o_orderdate").isNull())
        | (F.col("o_custkey").isNotNull() & (F.col("o_totalprice") > 400000.0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# Sorts & limits
# --------------------------------------------------------------------------
@query(
    "sort_order",
    """
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def sort_order(spark, sf_dir):
    """Global sort (range-partitioned exchange) with explicit null order."""
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey"),
        )
    )


@query(
    "limit_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def limit_topk(spark, sf_dir):
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heap of k,
    then a k-row merge on the driver; no global sort even at 100 TB.
    Tie-broken on the unique key so results are deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Set operations (customer vs supplier nation footprints)
# --------------------------------------------------------------------------
@query(
    "set_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionAll(s)


@query(
    "set_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    """
    SELECT DISTINCT l_orderkey AS orderkey FROM lineitem
    EXCEPT
    SELECT o_orderkey AS orderkey FROM orders WHERE o_totalprice > 100000.0
    """,
)
def set_except(spark, sf_dir):
    """Order keys present in lineitem but not among high-value orders."""
    l = t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("orderkey"))
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000.0)
        .select(F.col("o_orderkey").alias("orderkey"))
    )
    return l.distinct().subtract(o)


@query(
    "set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "set_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "union_by_name",
    """
    SELECT n_nationkey AS k, n_name AS name FROM nation
    UNION ALL
    SELECT r_regionkey AS k, r_name AS name FROM region
    """,
)
def union_by_name(spark, sf_dir):
    """Column-name-aware union (schema evolution building block)."""
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
    )
    r = t(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.col("r_regionkey").alias("k")
    )
    return n.unionByName(r)


@query(
    "sql_parameterized_query",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_totalprice >= 1000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized_query(spark, sf_dir):
    """Named-parameter SQL (`spark.sql(query, args={...})`, Spark 3.4+):
    parameter markers bind as LITERALS in the parse tree — injection-
    safe by construction AND fully optimizable (the bound values
    constant-fold and push down to the parquet scan like any literal,
    unlike string-concatenated SQL which risks injection, or driver-
    side f-strings which defeat plan caching by making every query
    text unique). The shape every reporting service should use against
    the engine. Oracle inlines the same bindings."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS total
        FROM orders_param
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 1000.0, "status": "F"},
    )


def _recursive_rollup_sql(intdiv: str) -> str:
    """One SQL text for both engines; only the integer-division
    spelling differs (Spark `DIV`, DuckDB `//`)."""
    return f"""
    WITH RECURSIVE anc(node, anc, cents) AS (
      SELECT o_orderkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      FROM orders
      UNION ALL
      SELECT node, anc {intdiv} 10, cents FROM anc WHERE anc >= 10
    )
    SELECT anc AS node_id,
           COUNT(*) AS n_desc,
           CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS subtree_cents
    FROM anc
    WHERE anc < 100000
    GROUP BY anc
    """


@query("sql_recursive_hierarchy_rollup", _recursive_rollup_sql("//"))
def sql_recursive_hierarchy_rollup(spark, sf_dir):
    """Native `WITH RECURSIVE` (new in Spark 4): roll revenue up an
    order-key decimal-digit hierarchy (parent = key DIV 10 — an
    acyclic stand-in for the org-chart / category-tree / BOM walks
    recursive SQL exists for). Each order seeds the recursion and
    climbs its ancestor chain; the aggregate then reports every
    internal node's descendant count and subtree revenue (in exact
    integer cents through the DECIMAL(18,2)*100 channel, summed as
    DECIMAL(38,0)). Both engines execute the SAME query text modulo
    the integer-division spelling (`DIV` vs `//`).

    Engine notes, probed on this container (pyspark 4.1.2): recursion
    supports UNION ALL only ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]),
    so this key walks a DAG where duplicate-elimination is not needed;
    CYCLIC reachability (where UNION dedup is the fixpoint) stays on
    the driver-loop form (`graph_connected_components`,
    `graph_shortest_path_bfs`). Scale shape: each recursive step is
    one distributed projection+filter; depth is log10(maxkey) (~12 at
    100 TB key ranges), and the WHERE anc < 100000 cap bounds the
    reported tree to the top levels while the walk itself stays
    distributed.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_recursive_rollup_sql("DIV"))


@query(
    "sql_session_variables",
    f"""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS v
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_above,
           {sql_dsum('c_acctbal', 'sum_bal_above')}
    FROM customer, thr
    WHERE c_acctbal > thr.v
    GROUP BY c_mktsegment
    """,
)
def sql_session_variables(spark, sf_dir):
    """SQL session variables (Spark 4 `DECLARE VARIABLE` / `SET VAR`):
    a data-derived threshold is staged into a session variable and a
    second statement consumes it — the imperative style BI notebooks
    and migration-from-warehouse SQL actually use. The oracle states
    the equivalent single query (variables are syntactic staging; the
    RESULT is what must match). The threshold is the decimal-channel
    mean so the staged double is bit-identical in both engines and
    every `>` boundary decision agrees.

    Plan note: the consuming query embeds the variable as a LITERAL
    (resolved at parse time), so the filter pushes down to the scan —
    staging a scalar through a variable is plan-wise FREE, unlike the
    correlated subquery form the oracle uses.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE seg_thr DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        """SET VAR seg_thr = (
             SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(*)
             FROM customer)"""
    )
    return spark.sql(
        """SELECT c_mktsegment,
                  COUNT(*) AS n_above,
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                    AS sum_bal_above
           FROM customer
           WHERE c_acctbal > seg_thr
           GROUP BY c_mktsegment"""
    )


@query(
    "sql_scripting_control_flow",
    """
    WITH RECURSIVE bounds AS (
      SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
    ),
    walk(lo, k) AS (
      SELECT mn, 0 FROM bounds
      UNION ALL
      SELECT lo * 2, k + 1 FROM walk, bounds
      WHERE lo > 0 AND lo * 2 <= mx
    )
    SELECT CAST(MAX(k) AS BIGINT) AS doublings,
           CAST(MAX_BY(lo, k) AS DOUBLE) AS final_value
    FROM walk
    """,
)
def sql_scripting_control_flow(spark, sf_dir):
    """SQL procedural scripting (Spark 4 `BEGIN ... END`;
    `spark.sql.scripting.enabled` defaults to true on 4.1 — set
    explicitly here and restored, guarding deployments that disable
    it): a WHILE loop doubles the minimum
    order price until it exceeds the maximum — the imperative
    binary-range computation (how many doublings span the column) that
    a stored-procedure migration would write exactly this way. The
    oracle replays the SAME loop declaratively as a recursive CTE:
    doubling is an exact IEEE operation and min/max are exact reads,
    so the loop trip count and final value are bit-identical across
    the imperative/declarative pair — procedural scripting and
    recursion are the same fixpoint, which is the point of the key.
    Both loop forms guard on lo > 0: doubling a zero or negative
    minimum never terminates (0 stays 0, negatives diverge downward),
    so on such data the loop exits with k = 0 instead of hanging.

    Scripting executes statements sequentially on the driver; each
    statement's PLAN is ordinary distributed SQL (the two scalar reads
    here are combinable min/max aggregates), so scripting adds control
    flow without changing the execution model — same posture as the
    driver-loop graph operators.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # snapshot with a NO-DEFAULT get (a caller default would be
    # restored as if it had been set — the r6 conf-restore footgun)
    try:
        prev = spark.conf.get("spark.sql.scripting.enabled")
    except Exception:  # noqa: BLE001 — key never set
        prev = None
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        out = spark.sql(
            """BEGIN
                 DECLARE lo DOUBLE;
                 DECLARE hi DOUBLE;
                 DECLARE k INT DEFAULT 0;
                 SET lo = (SELECT MIN(o_totalprice) FROM orders);
                 SET hi = (SELECT MAX(o_totalprice) FROM orders);
                 WHILE lo > 0 AND lo * 2 <= hi DO
                   SET lo = lo * 2;
                   SET k = k + 1;
                 END WHILE;
                 SELECT CAST(k AS BIGINT) AS doublings,
                        lo AS final_value;
               END"""
        )
        # the script's result must materialize before the conf restore
        from target_s3_parquet_spark._snapshot import snapshot_small

        return snapshot_small(out)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)
