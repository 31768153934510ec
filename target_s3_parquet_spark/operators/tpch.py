"""Compound analytical queries (TPC-H-shaped) over the synthetic star
schema — multi-join, selective-filter, agg-then-topk plans that exercise
the optimizer end-to-end the way single-operator keys can't.

The reference has no query surface at all (it is a write-only Singer
target — see SURVEY.md §1.5), so these are extension operators: the
query capability a user of the written Parquet actually runs, expressed
so Catalyst produces the plan we'd want at 100 TB:

- dimension tables (region/nation/customer/supplier/part) broadcast —
  the fact table never shuffles for a dim join;
- selective date/segment filters sit below the joins (pushed to the
  parquet scan — verify with .explain showing PushedFilters);
- aggregates use the DECIMAL(38,6) exact-sum discipline so results are
  partitioning-independent (same answer on 1 or 1000 executors).

Q-numbers follow the classic TPC-H queries these are shaped after,
adapted to the driver's slimmer synthetic schema (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import dec, dsum, sql_dsum, t
from target_s3_parquet_spark.registry import query

_REV_SQL = "l_extendedprice * (1.0 - l_discount)"


def _rev():
    # Built lazily: Column construction needs an active SparkContext.
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


@query(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum(_REV_SQL, "revenue")},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15'
      AND l.l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3: unshipped-order revenue for one market segment, top 10.

    Plan shape: orders and customer are fact-scale (sf-proportional), so
    no pinned broadcast hints — AQE picks broadcast vs shuffle join from
    runtime stats (broadcast at test SF, sort-merge at 100 TB; the plan
    degrades gracefully instead of OOMing a pinned build side). The
    selective date/segment filters are pushed to the parquet scans so
    whatever join strategy wins sees the reduced inputs. Top-10 via
    TakeOrderedAndProject, no global sort."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name, {sql_dsum(_REV_SQL, "revenue")}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """Q5: revenue by nation where customer and supplier share the
    nation, one region, two-year window. Six-table join: only the
    constant-size dims (nation=25 rows, region=5 rows at any SF) carry
    pinned broadcast hints; orders/customer/supplier are sf-proportional
    so AQE chooses their join strategy from runtime sizes — broadcast at
    test SF, shuffle join at 100 TB without a plan rewrite."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24.0
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan-filter-aggregate — the pushdown showcase. All four
    predicates reach the parquet reader (PushedFilters), only three
    columns are read (ReadSchema), and the aggregate is a map-side
    partial + single-row final. At 100 TB this is I/O bound, exactly
    as it should be."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, {sql_dsum(_REV_SQL, "revenue")},
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: top-20 customers by returned-item revenue in a quarter.
    Fact-side filter on returnflag prunes before the join; only nation
    (25 rows at any SF) is pinned-broadcast — orders/customer are
    sf-proportional, so AQE decides their join strategy from runtime
    stats; TakeOrdered caps the result."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q18_large_volume",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.sum_qty
    FROM (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 120
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
)
def tpch_q18_large_volume(spark, sf_dir):
    """Q18: customers with orders whose total quantity exceeds the
    threshold. The HAVING-aggregate runs first (one shuffle on the
    fact's own key — unavoidable and maximally pruned: two columns in,
    one row per qualifying order out). No pinned broadcasts: `big` is
    the small side but its size is only known after the HAVING filter,
    which is exactly what AQE measures at the shuffle boundary — it
    broadcasts `big` when small and falls back to shuffle join when the
    threshold turns out unselective, instead of a hint forcing a
    multi-GB build of orders/customer at 100 TB."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey", F.col("q").cast("double").alias("sum_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "subquery_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def subquery_exists(spark, sf_dir):
    """Correlated EXISTS — decorrelates to a left-semi join (Catalyst
    does the same rewrite when expressed in SQL). Semi join keeps the
    probe side unexpanded: no fan-out however many urgent orders a
    customer has."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "subquery_not_in",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity >= 45.0)
    """,
)
def subquery_not_in(spark, sf_dir):
    """NOT IN over a non-nullable key — decorrelates to a left-anti
    join. (With a nullable subquery column NOT IN needs null-aware
    anti join semantics; l_partkey is non-null so plain anti is
    exact.)"""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45.0)
    return p.join(
        l, p.p_partkey == l.l_partkey, "left_anti"
    ).select("p_partkey", "p_name")


@query(
    "subquery_scalar_correlated",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    JOIN (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity > 1.8 * pa.avg_qty
    """,
)
def subquery_scalar_correlated(spark, sf_dir):
    """Q17-shaped correlated scalar subquery: rows exceeding 1.8× the
    per-partkey average. Decorrelated form: aggregate once per partkey,
    join back. The aggregate is the only shuffle; at runtime AQE sees
    its small output and broadcasts it into the probe side (the fact
    table never shuffles), falling back to exchange reuse when the
    aggregate is too big to broadcast."""
    l = t(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        l.join(pa, "l_partkey")
        .filter(F.col("l_quantity") > 1.8 * F.col("avg_qty"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "tpch_q4_priority_count",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_priority_count(spark, sf_dir):
    """Q4 (adapted: 'late' = shipped >90 days after order date — the
    synthetic schema has no commit/receipt dates): order counts by
    priority where at least one line shipped late. EXISTS over a
    correlated date comparison decorrelates to a semi join carrying the
    order date through — the fact side collapses to distinct orderkeys
    BEFORE the join via the semi-join's early-out, never fanning out."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = l.join(
        o,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT 100.0 *
           CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1.0 - l.l_discount)
                              ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    GROUP BY 1=1
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14: promo share of one month's revenue. Conditional aggregation
    (CASE inside SUM) computes both numerator and denominator in ONE
    pass over the month's lineitem slice; part is sf-proportional so no
    pinned broadcast — AQE decides. Both sums decimal-exact, the final
    ratio a single double division."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(dec(promo)).cast("double")
                / F.sum(dec(rev)).cast("double")
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q19_disjunctive",
    f"""
    SELECT {sql_dsum(_REV_SQL, "revenue")}, COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    GROUP BY 1=1
    """,
)
def tpch_q19_disjunctive(spark, sf_dir):
    """Q19: disjunction of conjunctive brand/size/quantity ranges
    across the join. Catalyst pushes the common `p_partkey` equi key as
    the join condition and evaluates the OR-of-ANDs as a post-join
    residual; the per-side implied filters (brand IN (...), size/qty
    range hulls) are derivable and pushed to each scan, so neither
    input is read unfiltered."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(_rev(), "revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "sql_api_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_api_pricing_summary(spark, sf_dir):
    """The SQL-string surface: the same engine through `spark.sql(...)`
    over registered temp views — what a BI tool or notebook user runs.
    Identical Catalyst plan to the DataFrame form (`q1_pricing_summary`
    is this query's DataFrame twin); the API is syntax, the optimizer
    is shared."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqlapi")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_base_price,
               COUNT(*) AS count_order
        FROM li_sqlapi
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "sql_recursive_cte",
    """
    WITH RECURSIVE walk(node, root, depth) AS (
      SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
      FROM customer WHERE c_custkey < 8
      UNION ALL
      SELECT c.c_custkey, w.root, w.depth + 1
      FROM customer c JOIN walk w
        ON CAST(FLOOR(c.c_custkey / 8.0) AS BIGINT) = w.node
      WHERE c.c_custkey >= 8
    )
    SELECT node, root, depth FROM walk
    """,
)
def sql_recursive_cte(spark, sf_dir):
    """Native WITH RECURSIVE (Spark 4.x): hierarchy traversal — every
    customer key walks up a synthetic 8-ary tree (parent = key div 8)
    to its root, carrying depth. Iterative self-reference the optimizer
    executes as repeated joins until fixpoint; each iteration is a
    keyed equi-join, so at scale it's O(depth) shuffles over a
    SHRINKING frontier, the same shape as the label-propagation
    loop `text_dedup_clusters` hand-rolls for connected components
    (that key predates engine support and keeps its manual form as the
    bounded-iteration variant)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
        WITH RECURSIVE walk(node, root, depth) AS (
          SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
          FROM customer_rcte WHERE c_custkey < 8
          UNION ALL
          SELECT c.c_custkey, w.root, w.depth + 1
          FROM customer_rcte c JOIN walk w
            ON CAST(FLOOR(c.c_custkey / 8.0) AS BIGINT) = w.node
          WHERE c.c_custkey >= 8
        )
        SELECT node, root, depth FROM walk
        """
    )


@query(
    "tpch_q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1.0 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark, sf_dir):
    """Q7: trade volume between two nations by year, both directions.
    The nation filter is a disjunction across two different join paths
    (supplier's nation vs customer's nation) — it can't push below
    either join alone, but both nation dims broadcast (25 rows at any
    SF) and the residual evaluates on the joined row. The
    sf-proportional sides (orders/customer/supplier) carry no pinned
    hints — AQE picks broadcast-vs-shuffle from runtime sizes so the
    plan survives a 100× scale-up."""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1.0 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
    ) nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: one supplier nation's share of a region's revenue by year —
    conditional-sum numerator over total denominator in ONE aggregate
    pass (no second scan for the denominator). Customer-side region
    filter prunes the fact early; constant-size dims (nation/region)
    broadcast, sf-proportional sides are left to AQE."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    vol = _rev()
    share_num = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    from target_s3_parquet_spark.operators._util import dec as _dec

    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(_dec(share_num)).cast("double")
                / F.sum(_dec(vol)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts (how many
    customers placed k orders) — the double-aggregation shape: count
    per key, then histogram of the counts. LEFT join keeps
    zero-order customers in the k=0 bucket (an inner join would
    silently drop them — the classic Q13 trap); the join-side filter
    lives in the ON clause for the same reason."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_REV_SQL, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: the supplier(s) with maximum quarterly revenue — argmax
    over an aggregate. The scalar MAX subquery broadcasts as a 1-row
    literal filter over the same aggregated view (Spark computes the
    revenue view once; the max re-aggregates its small output, no
    second fact scan). Decimal-exact revenue makes the equality
    comparison against MAX well-defined — with float sums, '= MAX'
    over independently-computed aggregates is a correctness bug."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the classic TPC-H table the synthetic schema lacks,
# generated deterministically from part x supplier so BOTH engines
# construct the identical relation (4 suppliers per part; cost/qty from
# md5 arithmetic). Unlocks the q2/q9/q11 family.
# ---------------------------------------------------------------------------
_PS_PER_PART = 4

_PARTSUPP_SQL = f"""
    partsupp AS (
      SELECT p.p_partkey AS ps_partkey,
             (p.p_partkey * 7 + i.i) % (SELECT COUNT(*) FROM supplier)
               AS ps_suppkey,
             1 + CAST(('0x' || substring(md5('ps:' || p.p_partkey || ':' || i.i), 1, 8))
                      AS BIGINT) % 9999 AS ps_availqty,
             1.0 + (CAST(('0x' || substring(md5('ps:' || p.p_partkey || ':' || i.i), 9, 8))
                         AS BIGINT) % 100000) / 100.0 AS ps_supplycost
      FROM part p, (SELECT UNNEST(range(0, {_PS_PER_PART})) AS i) i
    )
"""


def _partsupp(spark, sf_dir):
    """Spark twin of ``_PARTSUPP_SQL`` — broadcast-friendly generated
    dimension (|part| x 4 rows, no storage)."""
    p = t(spark, sf_dir, "part")
    n_supp = t(spark, sf_dir, "supplier").count()  # tiny dim; driver-side scalar
    i = F.explode(F.sequence(F.lit(0), F.lit(_PS_PER_PART - 1))).alias("i")
    base = p.select("p_partkey", i)
    h1 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ps:"), F.col("p_partkey"), F.lit(":"), F.col("i"))),
            1, 8,
        ), 16, 10,
    ).cast("long")
    h2 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ps:"), F.col("p_partkey"), F.lit(":"), F.col("i"))),
            9, 8,
        ), 16, 10,
    ).cast("long")
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") * 7 + F.col("i")) % n_supp).alias("ps_suppkey"),
        (1 + h1 % 9999).alias("ps_availqty"),
        (1.0 + (h2 % 100000) / 100.0).alias("ps_supplycost"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT s.s_name, n.n_name, p.p_partkey, p.p_name, ps.ps_supplycost
    FROM part p
    JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY p_partkey, s_name
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2: the minimum-cost supplier per qualifying part within a
    region — the correlated-MIN pattern. Decorrelated form: compute
    min cost per partkey over the region-filtered partsupp once, join
    back on (partkey, cost). Only the constant-size nation/region dims
    carry pinned broadcast hints; supplier, part, and the per-partkey
    min_cost aggregate are all sf-proportional, so AQE chooses their
    join strategy at runtime (the min_cost back-join becomes a
    co-partitioned shuffle join at scale — both sides already hash on
    ps_partkey, so the exchange is reused)."""
    ps = _partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    regional = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_cost = regional.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        regional.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select("s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy("p_partkey", "s_name")
    )


@query(
    "tpch_q9_product_profit",
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1.0 - l.l_discount)
               - ps.ps_supplycost * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                      AND ps.ps_suppkey = (l.l_suppkey % (SELECT COUNT(*) FROM supplier))
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9: profit (revenue minus supply cost) by nation and year for
    one product line. The partsupp join carries the cost basis onto
    every lineitem; since the derived partsupp keys 4 suppliers per
    part, the lineitem's supplier maps into that space by modulus
    (adapted join — classic q9 joins on the exact pair). Decimal-exact
    profit sums; only nation (constant 25 rows) is pinned-broadcast —
    part/supplier/partsupp/orders are sf-proportional, left to AQE."""
    ps = _partsupp(spark, sf_dir)
    n_supp = t(spark, sf_dir, "supplier").count()
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    amount = _rev() - F.col("ps_supplycost") * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey") % n_supp),
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    f"""
    WITH {_PARTSUPP_SQL},
    national AS (
      SELECT ps.ps_partkey,
             SUM(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(38,6))) AS val
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY ps.ps_partkey
    )
    SELECT ps_partkey, CAST(val AS DOUBLE) AS part_value
    FROM national
    WHERE val > (SELECT SUM(val) * 0.001 FROM national)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11: parts whose stock value within one nation exceeds a
    fraction of that nation's total — aggregate, then filter against a
    scalar re-aggregate of the SAME result (computed once, broadcast
    as a 1-row threshold). The fraction comparison runs on exact
    decimal values; only the final projection casts to double."""
    ps = _partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    national = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                (F.col("ps_supplycost") * F.col("ps_availqty")).cast(
                    "decimal(38,6)"
                )
            ).alias("val")
        )
    )
    threshold = national.agg((F.sum("val") * 0.001).alias("thr"))
    return (
        national.join(F.broadcast(threshold), F.col("val") > F.col("thr"))
        .select("ps_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "tpch_q16_supplier_count",
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_count(spark, sf_dir):
    """Q16: how many suppliers can provide each qualifying part class,
    excluding a supplier blacklist. The NOT IN subquery decorrelates to
    a left-anti join against the blacklist; the part-attribute filters
    prune before the distinct-count, which runs two-phase on (brand,
    type, size, suppkey). No pinned broadcasts: part and the blacklist
    are sf-proportional, so AQE chooses per-join at runtime."""
    ps = _partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(bad, "ps_suppkey", "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "tpch_q20_excess_stock",
    f"""
    WITH {_PARTSUPP_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey % (SELECT COUNT(*) FROM supplier) AS sk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey % (SELECT COUNT(*) FROM supplier)
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.sk = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * sh.qty)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_excess_stock(spark, sf_dir):
    """Q20 (adapted to the derived partsupp key space): suppliers
    holding more than half a year's shipped quantity of a part line —
    the overstock report. Three-way chain: year's shipments aggregate
    once on (partkey, supplier-slot); partsupp joins it with the
    availability predicate; the survivor supplier set semi-joins back.
    Everything after the one lineitem aggregation is dimension-sized."""
    n_supp = t(spark, sf_dir, "supplier").count()
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = l.groupBy(
        "l_partkey", (F.col("l_suppkey") % n_supp).alias("sk")
    ).agg(F.sum(dec("l_quantity")).cast("double").alias("qty"))
    ps = _partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    excess = (
        ps.join(p, F.col("ps_partkey") == p.p_partkey)
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("sk") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q12_priority_by_lateness",
    """
    SELECT late,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM (
      SELECT l_orderkey,
             l_shipdate > o2.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l JOIN orders o2 ON o2.o_orderkey = l.l_orderkey) ls
    JOIN orders o ON o.o_orderkey = ls.l_orderkey
    GROUP BY late
    """,
)
def tpch_q12_priority_by_lateness(spark, sf_dir):
    """Q12 (adapted: 'late' = shipped >60 days after order, standing in
    for the missing shipmode/commit-date columns): conditional counts
    of high- vs low-priority orders split by lateness. The CASE-inside-
    COUNT pair computes both columns in one pass — Q12's signature
    shape survives the column adaptation intact."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = l.join(o, l.l_orderkey == o.o_orderkey)
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).alias("late")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy(late).agg(
        F.count(F.when(high, 1)).alias("high_line_count"),
        F.count(F.when(~high, 1)).alias("low_line_count"),
    )


@query(
    "tpch_q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) pa
      ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.2 * pa.avg_qty
    GROUP BY 1=1
    """,
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """Q17: lost-revenue estimate from small-quantity orders of one
    brand — the correlated-average subquery, decorrelated to a
    per-partkey aggregate joined back (Spark reuses the lineitem
    exchange or broadcasts the small aggregate, per AQE). The brand
    filter applies AFTER the average — the average is over ALL orders
    of the part, the classic q17 subtlety."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    multi AS (
      SELECT DISTINCT a.l_orderkey, a.l_suppkey
      FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT lt.l_orderkey, lt.l_suppkey
          FROM late lt
          JOIN multi m ON m.l_orderkey = lt.l_orderkey
                      AND m.l_suppkey = lt.l_suppkey
          WHERE NOT EXISTS (
            SELECT 1 FROM late lt2
            WHERE lt2.l_orderkey = lt.l_orderkey
              AND lt2.l_suppkey <> lt.l_suppkey)) w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 (adapted lateness): suppliers who were the ONLY late
    supplier on finalized multi-supplier orders — the famous
    EXISTS + NOT EXISTS double-correlated query. Decorrelated form:
    the late set joins itself semi (another supplier exists on the
    order) and anti (no OTHER supplier was late) — two keyed joins on
    l_orderkey over the already-small late set, no correlated
    re-execution anywhere."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .cache()
    )
    pairs = l.select("l_orderkey", "l_suppkey").distinct()
    other_exists = pairs.alias("b")
    multi = (
        pairs.alias("a")
        .join(
            other_exists,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
            "left_semi",
        )
    )
    sole_late = late.alias("lt").join(
        late.alias("lt2"),
        (F.col("lt.l_orderkey") == F.col("lt2.l_orderkey"))
        & (F.col("lt.l_suppkey") != F.col("lt2.l_suppkey")),
        "left_anti",
    )
    w = sole_late.join(
        multi,
        ["l_orderkey", "l_suppkey"],
        "left_semi",
    )
    s = t(spark, sf_dir, "supplier")
    return (
        w.join(s, w.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "tpch_q22_sales_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c.c_nationkey % 10 AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_nationkey % 10 IN (1, 3, 5, 7)
        AND c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(c2.c_acctbal)
          FROM customer c2
          WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 10 IN (1, 3, 5, 7))
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_sales_opportunity(spark, sf_dir):
    """Q22 (adapted: country code := nationkey % 10, standing in for
    the missing phone prefix): wealthy-but-inactive customers per
    country — a scalar average subquery (broadcast 1-row threshold)
    plus NOT EXISTS (anti join against orders; scoped to recent orders
    since every synthetic customer has SOME order in 7 years of
    history). With q12/q17/q21 this
    completes all 22 classic TPC-H query SHAPES in the engine (schema-
    adapted where the synthetic tables lack columns)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    code = (F.col("c_nationkey") % 10).alias("cntrycode")
    eligible = c.filter((F.col("c_nationkey") % 10).isin(1, 3, 5, 7))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")
        ).alias("thr")
    )
    return (
        eligible.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("thr"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")),
            eligible.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(code)
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
