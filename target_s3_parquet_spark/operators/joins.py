"""Join operators: equi (broadcast / shuffle-hash / sort-merge), all outer
shapes, semi/anti, theta/range, and as-of.

Strategy notes for the 100 TB point:
- Dimension tables (region/nation/supplier/part at TPC-H ratios) stay
  far under the broadcast threshold at any SF — `F.broadcast` pins the
  hint so the fact table never shuffles for those joins.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  splits skewed partitions (`spark.sql.adaptive.skewJoin.enabled`).
- The theta/range join is bounded by an equi prefix wherever possible —
  a pure BNL join over two 100 TB inputs is never acceptable; see
  `join_theta_range` (equi on suppkey, range residual) and
  `operators.asof.as_of_join` (union + window, no cross product).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from target_s3_parquet_spark.operators._util import (
    dec,
    dsum,
    register_cache,
    sql_dsum,
    t,
)
from target_s3_parquet_spark.registry import query


@query(
    "join_inner_hash",
    f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_inner_hash(spark, sf_dir):
    """Large-large equi join on the fact key, aggregated. Both sides
    shuffle-partition on l_orderkey/o_orderkey; AQE picks SMJ or
    shuffled-hash from runtime sizes."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@query(
    "join_broadcast",
    f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal', 'sum_acctbal')}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark, sf_dir):
    """Star-schema join: both dims broadcast, fact never shuffles for the
    join (only for the final aggregation)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "sum_acctbal"))
    )


@query(
    "join_sortmerge",
    f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum('o.o_totalprice', 'sum_price')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def join_sortmerge(spark, sf_dir):
    """Explicit sort-merge hint — the strategy of record for two huge
    sorted-shuffle sides when neither fits a hash table."""
    l = t(spark, sf_dir, "lineitem").hint("merge")
    o = t(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000.0
    """,
)
def join_left(spark, sf_dir):
    """Left outer with a join-side residual predicate (kept in the ON
    clause — moving it to WHERE would change the semantics)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000.0), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_right",
    """
    SELECT n.n_name, s.s_suppkey, s.s_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "join_full",
    """
    SELECT ck.nationkey AS c_side, sk.nationkey AS s_side,
           ck.n_cust, sk.n_supp
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
          FROM customer GROUP BY c_nationkey) ck
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
          FROM supplier GROUP BY s_nationkey) sk
      ON ck.nationkey = sk.nationkey
    """,
)
def join_full(spark, sf_dir):
    ck = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sk = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return ck.join(sk, ck.nationkey == sk.nationkey, "full").select(
        ck.nationkey.alias("c_side"),
        sk.nationkey.alias("s_side"),
        "n_cust",
        "n_supp",
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    """,
)
def join_semi(spark, sf_dir):
    """EXISTS as left-semi: no row duplication, probe side streams."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000.0)
    """,
)
def join_anti(spark, sf_dir):
    """NOT EXISTS as left-anti (customers with no high-value orders)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_theta_range",
    """
    SELECT s.s_suppkey, l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM supplier s JOIN lineitem l
      ON s.s_suppkey = l.l_suppkey
     AND l.l_quantity > s.s_acctbal / 1000.0
    """,
)
def join_theta_range(spark, sf_dir):
    """Theta join with an equi prefix: Catalyst plans the equi part as a
    hash/SMJ join and evaluates the range residual post-match — never a
    cartesian product. (A pure theta join with NO equi conjunct must be
    banded first — see `operators.asof` for the banding pattern.)"""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    return s.join(
        l,
        (s.s_suppkey == l.l_suppkey) & (l.l_quantity > s.s_acctbal / 1000.0),
    ).select("s_suppkey", "l_orderkey", "l_linenumber", "l_quantity")


@query(
    "join_cross_bounded",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross_bounded(spark, sf_dir):
    """Explicit cartesian — only ever legal between bounded inputs (both
    dims here are O(constant) at any SF)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_asof",
    """
    SELECT purchase_id, user_id, view_id, view_ts FROM (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             v.event_id AS view_id, v.ts AS view_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts)
    WHERE rn = 1
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase matched to the latest view at-or-before
    it by the same user (ties broken by larger event_id), unmatched
    purchases kept with nulls.

    NOT implemented as a range join (the oracle's p×v product blows up
    quadratically per user at scale). Instead the union-window trick:
    tag both sides, union, ONE shuffle on user_id, sort by (ts, side,
    event_id) inside each partition, and `last(view, ignoreNulls)` over
    an unbounded-preceding frame carries the most recent view forward
    into every purchase row. Cost is a single sort-shuffle of
    |views| + |purchases| rows regardless of match fan-out."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    tagged = views.unionAll(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    view_struct = F.when(
        F.col("side") == 0, F.struct(F.col("event_id"), F.col("ts"))
    )
    carried = tagged.withColumn(
        "last_view", F.last(view_struct, ignorenulls=True).over(w)
    )
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("last_view.event_id").alias("view_id"),
        F.col("last_view.ts").alias("view_ts"),
    )


@query(
    "join_skew_salted",
    """
    SELECT n.n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-mitigation pattern: salt the hot key space S ways.

    The fact side gets a deterministic salt (hash of its row key mod
    S); the dim side explodes S replicas, one per salt value; the join
    key becomes (key, salt), splitting each hot key's rows across S
    tasks. Result set is IDENTICAL to the plain join (the oracle is the
    unsalted SQL) — only the physical distribution changes, which is
    the point: correctness is partitioning-independent, so the salt is
    free to vary with observed skew. Spark 3+ AQE does this rewrite
    automatically for sort-merge joins (skewJoin.enabled); the explicit
    form is for the cases AQE can't see, e.g. skewed aggregations or
    pre-AQE shuffle plans. Partial aggregation happens per (key, salt)
    before the final merge — two small shuffles instead of one hot one.
    """
    SALT = 8
    c = t(spark, sf_dir, "customer").withColumn(
        "salt", (F.xxhash64("c_custkey") % SALT + SALT) % SALT
    )
    n = (
        t(spark, sf_dir, "nation")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
        .withColumn("salt", F.col("salt").cast("bigint"))
    )
    joined = c.join(
        F.broadcast(n), (c.c_nationkey == n.n_nationkey) & (c.salt == n.salt)
    )
    salted = joined.groupBy("n_name", c.salt).agg(
        F.count("*").alias("pc"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("pb"),
    )
    return salted.groupBy("n_name").agg(
        F.sum("pc").alias("n_customers"),
        F.sum("pb").cast("double").alias("total_bal"),
    )


@query(
    "join_bucketed_colocated",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Shuffle-free large-large join via bucketing.

    Both tables are written once as bucketed datasets (16 buckets,
    hashed + sorted on the join key); the sort-merge join then reads
    bucket i against bucket i directly — ZERO exchange on either side,
    and the groupBy on the same key reuses the bucket partitioning too.
    This is the co-location strategy for repeated fact-fact joins at
    100 TB: pay one bucketed write, then every subsequent join/agg on
    that key is exchange-free. (AQE can't remove a shuffle it never
    sees; bucketing removes it at the source.) The `merge` hint pins
    SMJ so the demo doesn't degenerate to broadcast at toy scale."""
    import atexit
    import hashlib
    import os
    import shutil

    # pid in the tag: the bucketed path must be process-private — two
    # concurrent runs (gate + pytest) sharing one dir race overwrite
    # against bucket reads. Each process pays its own one-time write
    # (the catalog is per-process anyway) and removes it at exit.
    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_p{os.getpid()}"
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".bucketed", f"pid{os.getpid()}")
    atexit.register(lambda: shutil.rmtree(base, ignore_errors=True))
    names = {}
    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tname = f"{tbl}_bkt_{tag}"
        names[tbl] = tname
        if not spark.catalog.tableExists(tname):
            (
                t(spark, sf_dir, tbl)
                .write.bucketBy(16, key)
                .sortBy(key)
                .option("path", os.path.join(base, tname))
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tname)
            )
    l = spark.table(names["lineitem"])
    o = spark.table(names["orders"]).filter(F.col("o_orderstatus") == "F")
    return (
        o.hint("merge")
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "join_range_banded",
    """
    SELECT b.band_id, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN (SELECT r AS band_id, r * 50000.0 AS lo, (r + 1) * 50000.0 AS hi
          FROM range(0, 12) t(r)) b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id
    """,
)
def join_range_banded(spark, sf_dir):
    """Pure range join (no equi conjunct) made scalable by banding.

    The naive plan for `fact JOIN bands ON value BETWEEN lo AND hi` is
    a broadcast nested loop — O(|fact| x |bands|) comparisons. When the
    bands are aligned and non-overlapping, compute each row's band id
    arithmetically (floor(value / width)) and the range join COLLAPSES
    to an equi join — hash lookup, one comparison per row, and the
    bands side never ships at all at any scale. For overlapping or
    irregular bands the same trick applies per covering grid cell
    (each band explodes into the grid cells it spans; rows equi-join
    the grid then post-filter the exact range) — that generalization
    is the standard interval-join decomposition."""
    o = t(spark, sf_dir, "orders")
    bands = spark.range(0, 12).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0).alias("hi"),
    )
    with_band = o.withColumn(
        "band_id", F.floor(F.col("o_totalprice") / 50000.0).cast("int")
    )
    return (
        with_band.join(F.broadcast(bands), "band_id")
        .filter((F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")))
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "join_null_safe",
    """
    WITH l AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderstatus END AS k
               FROM orders),
         r AS (SELECT DISTINCT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                                    ELSE o_orderstatus END AS k
               FROM orders)
    SELECT l.o_orderkey, l.k
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — required when the join key
    legitimately carries NULL as a value (e.g. "no status"). Catalyst
    plans `<=>` as a hash join on a null-safe key, NOT a nested loop,
    so it scales like any equi join; the thing to avoid is `OR (a IS
    NULL AND b IS NULL)` spelled manually, which defeats the equi-join
    detection."""
    o = t(spark, sf_dir, "orders")
    l = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("k"),
    )
    r = (
        o.select(
            F.when(F.col("o_orderkey") % 5 == 0, None)
            .otherwise(F.col("o_orderstatus"))
            .alias("k")
        )
        .distinct()
        .withColumnRenamed("k", "rk")
    )
    return l.join(r, l.k.eqNullSafe(r.rk)).select("o_orderkey", "k")


@query(
    "join_asof_forward",
    """
    SELECT click_id, user_id, next_purchase_id, next_purchase_ts FROM (
      SELECT c.event_id AS click_id, c.user_id AS user_id,
             p.event_id AS next_purchase_id, p.ts AS next_purchase_ts,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts ASC, p.event_id ASC) AS rn
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click') c
      LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase') p
        ON p.user_id = c.user_id AND p.ts >= c.ts)
    WHERE rn = 1
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join (click → NEXT purchase at-or-after): the
    attribution query. Same union-window construction as `join_asof`
    but ordered descending, with `last` carrying the nearest FOLLOWING
    purchase backward; ties at equal ts broken toward the smaller
    event_id. One shuffle on user_id, no p×c product."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    tagged = purchases.unionAll(clicks)
    # Descending ts: by the time a click row is scanned, every purchase
    # at-or-after it (and at equal ts, preferring smaller event_id) has
    # already been seen in the frame.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "side", F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    purchase_struct = F.when(
        F.col("side") == 0, F.struct(F.col("event_id"), F.col("ts"))
    )
    carried = tagged.withColumn(
        "next_p", F.last(purchase_struct, ignorenulls=True).over(w)
    )
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("next_p.event_id").alias("next_purchase_id"),
        F.col("next_p.ts").alias("next_purchase_ts"),
    )


@query(
    "join_asof_partitioned",
    """
    SELECT purchase_id, user_id, view_id, view_ts FROM (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             v.event_id AS view_id, v.ts AS view_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts)
    WHERE rn = 1
    """,
)
def join_asof_partitioned(spark, sf_dir):
    """As-of join as a CUSTOM PHYSICAL STRATEGY (same semantics and
    oracle as `join_asof`, different execution): hash-repartition both
    sides by user_id, sort within each partition by (ts, side,
    event_id), then a single `mapInPandas` pass carries the last-seen
    view per user with a plain dict — the hand-rolled two-pointer
    merge, Arrow-batched.

    vs the window form: identical shuffle volume (one exchange + one
    partition-local sort), but no per-row window-frame machinery and
    no `last(ignoreNulls)` struct traffic — the carry state is O(users
    in partition) Python dict entries, batched through Arrow. Because
    partitioning is BY USER, a user never spans partitions, and the
    batch iterator runs sequentially per partition, so carry state
    across Arrow batches is correct by construction. This is the shape
    to reach for when as-of logic grows beyond what window functions
    express (multiple carried columns with custom staleness rules,
    conditional resets) — the partition-sort-scan skeleton stays the
    same."""
    from collections.abc import Iterator

    import pandas as pd

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    tagged = (
        views.unionAll(purchases)
        .repartition(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "side", "event_id")
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_view: dict = {}  # user_id -> (view_id, view_ts)
        for pdf in batches:
            out = {"purchase_id": [], "user_id": [], "view_id": [], "view_ts": []}
            for user, ts, side, eid in zip(
                pdf["user_id"], pdf["ts"], pdf["side"], pdf["event_id"]
            ):
                if side == 0:
                    last_view[user] = (eid, ts)
                else:
                    vid, vts = last_view.get(user, (None, None))
                    out["purchase_id"].append(eid)
                    out["user_id"].append(user)
                    out["view_id"].append(vid)
                    out["view_ts"].append(vts)
            yield pd.DataFrame(out)

    return tagged.mapInPandas(
        scan,
        schema="purchase_id long, user_id long, view_id long, view_ts timestamp",
    )


@query(
    "join_interval_overlap",
    """
    WITH sessions AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
    wins AS (
      SELECT day AS w_day, 'morning' AS label,
             day + INTERVAL 8 HOUR AS w_start,
             day + INTERVAL 12 HOUR AS w_end FROM days
      UNION ALL
      SELECT day, 'afternoon', day + INTERVAL 14 HOUR,
             day + INTERVAL 20 HOUR FROM days
      UNION ALL
      SELECT day, 'overnight', day + INTERVAL 20 HOUR,
             day + INTERVAL 28 HOUR FROM days
    )
    SELECT w.w_day, w.label,
           COUNT(*) AS n_sessions,
           COUNT(DISTINCT s.user_id) AS n_users
    FROM sessions s
    JOIN wins w ON s.s_start < w.w_end AND w.w_start < s.s_end
    GROUP BY w.w_day, w.label
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join (two sets of [start, end) intervals, pairs
    that intersect) via grid-cell decomposition — the general form of
    the banded range join.

    The naive plan for `A JOIN B ON a.start < b.end AND b.start <
    a.end` is a nested-loop product. Decomposing both sides onto a
    covering grid (here: calendar days) turns it into an EQUI join:
    each interval explodes into the cells it touches (`sequence` —
    the overnight window spans two), candidates equi-join on the cell,
    and the exact overlap predicate filters residually. Two
    overlapping intervals always share a covering cell, so recall is
    exact; a pair sharing multiple cells would dup, which the
    day-contained session side rules out here (the general case adds
    a `distinct` on the pair key). At 100 TB the cell width tunes
    candidate volume exactly like LSH band width — the join is a
    shuffle on cell, never a product."""
    e = t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    sessions = e.groupBy("user_id", day.alias("day")).agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    days = e.select(day.alias("day")).distinct()
    wins = days.select(
        F.col("day").alias("w_day"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("morning").alias("label"),
                    F.lit(8).alias("h0"),
                    F.lit(12).alias("h1"),
                ),
                F.struct(
                    F.lit("afternoon").alias("label"),
                    F.lit(14).alias("h0"),
                    F.lit(20).alias("h1"),
                ),
                F.struct(
                    F.lit("overnight").alias("label"),
                    F.lit(20).alias("h0"),
                    F.lit(28).alias("h1"),
                ),
            )
        ).alias("w"),
    ).select(
        "w_day",
        F.col("w.label").alias("label"),
        (F.col("w_day") + F.col("w.h0") * F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        (F.col("w_day") + F.col("w.h1") * F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    # windows explode into the day cells they cover (overnight -> 2)
    cells = wins.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.date_trunc("day", "w_start"),
                F.date_trunc("day", "w_end"),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    return (
        sessions.join(F.broadcast(cells), sessions.day == cells.cell)
        .filter(
            (F.col("s_start") < F.col("w_end")) & (F.col("w_start") < F.col("s_end"))
        )
        .groupBy("w_day", "label")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "join_asof_arrow",
    """
    SELECT purchase_id, user_id, view_id, view_ts FROM (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             v.event_id AS view_id, v.ts AS view_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts)
    WHERE rn = 1
    """,
)
def join_asof_arrow(spark, sf_dir):
    """As-of join, Arrow-native physical strategy: the same
    hash-partition + partition-local-sort + two-pointer carry as
    `join_asof_partitioned`, but through `mapInArrow` — the carry
    scans raw Arrow record batches and emits Arrow arrays directly,
    skipping the Arrow→pandas→Arrow conversion that is the pandas
    variant's dominant overhead (ROADMAP #1 round-2 note; same DuckDB
    oracle as both other as-of forms, proving all three strategies
    agree). Partition-local state only (one dict entry per user seen
    in the task's partition) — no global state, any executor count."""
    from collections.abc import Iterator

    import pyarrow as pa

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    tagged = (
        views.unionAll(purchases)
        .repartition(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "side", "event_id")
    )

    out_type = pa.timestamp("us", tz="UTC")

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        last_view: dict = {}  # user_id -> (view_id, view_ts_us)
        for b in batches:
            idx = {n: j for j, n in enumerate(b.schema.names)}
            users = b.column(idx["user_id"]).to_pylist()
            # epoch-µs ints: integer compare/carry, no datetime objects
            tss = b.column(idx["ts"]).cast(pa.int64()).to_pylist()
            sides = b.column(idx["side"]).to_pylist()
            eids = b.column(idx["event_id"]).to_pylist()
            pid, pu, vid, vts = [], [], [], []
            for user, ts_us, side, eid in zip(users, tss, sides, eids):
                if side == 0:
                    last_view[user] = (eid, ts_us)
                else:
                    v = last_view.get(user)
                    pid.append(eid)
                    pu.append(user)
                    vid.append(v[0] if v else None)
                    vts.append(v[1] if v else None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(pid, pa.int64()),
                    pa.array(pu, pa.int64()),
                    pa.array(vid, pa.int64()),
                    pa.array(vts, out_type),
                ],
                names=["purchase_id", "user_id", "view_id", "view_ts"],
            )

    return tagged.mapInArrow(
        scan,
        schema="purchase_id long, user_id long, view_id long, view_ts timestamp",
    )


@query(
    "join_lateral_topn",
    """
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
    """,
)
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL join — top-3 customers per nation expressed
    as a per-row subquery, the SQL shape analysts write before anyone
    teaches them window functions. Spark's Catalyst DECORRELATES it
    (DecorrelateInnerQuery): the executed plan is the same
    rank-filter-join as `window_topk_per_group` — one shuffle on the
    correlation key, no per-row execution — which is exactly why the
    lateral form is safe at 100 TB: it's sugar, not a nested loop.
    Registered through the SQL API because lateral has no DataFrame
    equivalent; the oracle is the identical query text."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation_lat n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_lat
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
        """
    )


@query(
    "join_bloom_semi_reduction",
    """
    SELECT l.l_orderkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS order_revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_orderkey
    """,
)
def join_bloom_semi_reduction(spark, sf_dir):
    """Semi-join reduction: the fact scan is pre-filtered down to keys
    that survive the dim-side predicate BEFORE the expensive shuffle
    join — the manual, exact form of Spark's runtime bloom filter
    (`spark.sql.optimizer.runtime.bloomFilter.*`, which injects
    `bloom_filter_agg`/`might_contain` around exactly this shape; see
    `tests/test_plan_bloom.py` for the native injection demonstrated
    under production thresholds).

    Here the reduction is a broadcast LEFT SEMI on the filtered order
    keys: ~20% of orders survive the priority predicate, so ~80% of
    lineitem rows are dropped map-side and never shuffle. At 100 TB
    the explicit semi stays correct at any dim size (AQE picks
    broadcast vs shuffled semi), while the native bloom variant trades
    exactness for a fixed 8 MB filter — both plans shuffle only the
    reduced fact. The final join then aggregates revenue per surviving
    order."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    keys = o.select("o_orderkey").distinct()
    # No pinned broadcast: the key set is sf-proportional (~20% of
    # orders), so the hint that is safe at sf0.1 would OOM at 100 TB.
    # AQE picks broadcast-semi while the set fits and degrades to a
    # shuffled semi beyond that — the bloom variant exists precisely
    # for the regime where even the key set is too big to broadcast.
    reduced = li.join(
        keys,
        li.l_orderkey == keys.o_orderkey,
        "left_semi",
    )
    joined = reduced.join(o, reduced.l_orderkey == o.o_orderkey)
    return joined.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(dec("l_extendedprice")).cast("double").alias("order_revenue"),
    )


@query(
    "data_skew_diagnostics",
    """
    WITH per_key AS (
      SELECT l_orderkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    stats AS (
      SELECT COUNT(*) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_cnt
      FROM per_key
    ),
    topk AS (
      SELECT k, cnt FROM (
        SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, k) AS rn
        FROM per_key) WHERE rn <= 3
    )
    SELECT s.n_keys, s.max_cnt, s.avg_cnt,
           CAST(s.max_cnt AS DOUBLE) / s.avg_cnt AS skew_ratio,
           t.k AS hot_key, t.cnt AS hot_cnt
    FROM stats s CROSS JOIN topk t
    """,
)
def data_skew_diagnostics(spark, sf_dir):
    """Join-key skew profiling — the diagnostic you run BEFORE picking
    a join strategy at scale: per-key cardinality stats (distinct
    keys, max/avg rows per key, skew ratio) plus the top hot keys.
    A skew ratio near 1 says hash-partition freely; a heavy tail says
    AQE skew-split or explicit salting (`join_skew_salted`), and the
    hot-key list is exactly the salting candidate set.

    One map-side-combinable count per key, then two tiny aggregates
    over the per-key table — at 100 TB this is the same cost as any
    groupBy on the join key, and in practice it runs on a sample or
    is maintained incrementally as table stats. (The synthetic
    lineitem is deliberately uniform — skew_ratio ~2 — while
    `tools/bench_skew.py` measures the 90%-hot-key regime this
    diagnostic exists to catch.)"""
    li = t(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("avg_cnt"),
    )
    # top-3 hot keys via orderBy+limit — TakeOrderedAndProject
    # (per-partition top-K + driver merge), not a row_number window
    # that would single-task-sort the whole per-key table
    topk = (
        per_key.orderBy(F.col("cnt").desc(), F.col("k"))
        .limit(3)
        .select(F.col("k").alias("hot_key"), F.col("cnt").alias("hot_cnt"))
    )
    return (
        F.broadcast(stats)
        .crossJoin(topk)
        .select(
            "n_keys",
            "max_cnt",
            "avg_cnt",
            (F.col("max_cnt").cast("double") / F.col("avg_cnt")).alias(
                "skew_ratio"
            ),
            "hot_key",
            "hot_cnt",
        )
    )


@query(
    "join_asof_nearest",
    """
    SELECT purchase_id, user_id, view_id, direction, gap_us FROM (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             v.event_id AS view_id,
             CASE WHEN v.event_id IS NULL THEN NULL
                  WHEN epoch_us(v.ts) <= epoch_us(p.ts) THEN 'back'
                  ELSE 'fwd' END AS direction,
             ABS(epoch_us(v.ts) - epoch_us(p.ts)) AS gap_us,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY ABS(epoch_us(v.ts) - epoch_us(p.ts)),
                        CASE WHEN epoch_us(v.ts) <= epoch_us(p.ts)
                             THEN 0 ELSE 1 END,
                        CASE WHEN epoch_us(v.ts) <= epoch_us(p.ts)
                             THEN -v.event_id ELSE v.event_id END) AS rn
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'view') v
        ON v.user_id = p.user_id)
    WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-neighbor as-of join (either direction): each purchase
    matches the view with the SMALLEST absolute time distance by the
    same user — ties prefer the backward match (the causal one), then
    the deterministic event-id rule each direction's carry implies.
    Completes the as-of family: backward (`join_asof`), forward
    (`join_asof_forward`), tolerance-bounded (`join_asof_tolerance`),
    and nearest — the sensor-fusion/alignment default.

    Plan: the SAME single union shuffle as the other as-of forms, with
    TWO carries over one partition sort — `last(view) ignoreNulls`
    looking back and `first(view) ignoreNulls` looking forward — then
    a stateless projection picks the closer side. Cost stays
    |views| + |purchases| rows through one exchange, independent of
    fan-out; the quadratic per-user product exists only in the
    oracle."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    tagged = views.unionAll(purchases)
    base = W.partitionBy("user_id").orderBy("ts", "side", "event_id")
    w_back = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    view_struct = F.when(
        F.col("side") == 0,
        F.struct(F.col("event_id"), F.unix_micros("ts").alias("us")),
    )
    carried = tagged.withColumn(
        "back", F.last(view_struct, ignorenulls=True).over(w_back)
    ).withColumn(
        "fwd", F.first(view_struct, ignorenulls=True).over(w_fwd)
    )
    p_us = F.unix_micros("ts")
    gap_back = p_us - F.col("back.us")
    gap_fwd = F.col("fwd.us") - p_us
    choose_back = F.col("back").isNotNull() & (
        F.col("fwd").isNull() | (gap_back <= gap_fwd)
    )
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(choose_back, F.col("back.event_id"))
        .otherwise(F.col("fwd.event_id"))
        .alias("view_id"),
        F.when(F.col("back").isNull() & F.col("fwd").isNull(), F.lit(None))
        .when(choose_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
        F.when(choose_back, gap_back).otherwise(gap_fwd).alias("gap_us"),
    )


@query(
    "join_yannakakis_program",
    """
    WITH asia_nat AS (
      SELECT n_nationkey FROM nation
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    c_semi AS (
      SELECT c_custkey FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM asia_nat)
    ),
    o_semi AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM c_semi)
    ),
    l_semi AS (
      SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM o_semi)
    ),
    o_back AS (
      SELECT o_orderkey, o_custkey FROM o_semi
      WHERE o_orderkey IN (SELECT l_orderkey FROM l_semi)
    ),
    c_back AS (
      SELECT c_custkey FROM c_semi
      WHERE c_custkey IN (SELECT o_custkey FROM o_back)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_customer_base,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM c_semi) AS n_customer_semi,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders_base,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM o_semi) AS n_orders_semi,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem_base,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM l_semi) AS n_lineitem_semi,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM o_back) AS n_orders_back,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM c_back) AS n_customer_back,
      (SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(38,6))) AS DOUBLE)
       FROM l_semi) AS asia_revenue
    """,
)
def join_yannakakis_program(spark, sf_dir):
    """YANNAKAKIS' SEMIJOIN-REDUCTION PROGRAM (Yannakakis 1981) made
    observable on the acyclic chain region -> nation -> customer ->
    orders -> lineitem (ASIA): the bottom-up semijoin pass (customer
    against the ASIA nations, orders against surviving customers,
    lineitem against surviving orders), the top-down back pass
    (orders against surviving lineitems, customers against surviving
    orders), and the final dangling-free aggregate — the classical
    guarantee that an acyclic join can run with ZERO intermediate
    blowup, which is exactly what a distributed engine buys with
    bloom-filter semijoins (`join_bloom_semi_reduction` is the
    one-edge version; this key runs the whole program). The stage
    counts ARE the result: they show how many tuples each reduction
    kills before the join ever runs.

    Exactness: every count is an exact integer; the revenue
    aggregate uses the order-free DECIMAL(38,6) channel (`dsum`).

    Distributed shape: each semijoin is a leftsemi hash join that
    Spark executes with the small side broadcast (nation keys, then
    the shrinking key sets); no stage materializes a wider row than
    its input, and AQE turns the orderkey semijoins into
    shuffle-hash with bloom pushdown at scale — the plan a 100 TB
    acyclic join WANTS. The final aggregate runs on the fully
    reduced lineitem only.

    Reference scope check: codeG12/target-s3-parquet has no query
    surface (605-LoC Singer->Parquet sink); this key belongs to the
    LLM-data-pipeline extension surface (SURVEY.md §2C)."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")

    asia = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    # Every reduced relation is CACHED: materializing the reduced
    # relations IS Yannakakis' program (each feeds the next reduction
    # AND its own observability count AND the back pass — uncached,
    # the 9 crossJoined aggregates re-ran the semijoin chain up to
    # 5x over; 5.3 s baseline sweep -> the chain runs once). At scale
    # these are the PRUNED relations (the whole point of the
    # reduction), persisted MEMORY_AND_DISK by the same handle.
    c_semi = register_cache(
        c.join(
            F.broadcast(asia),
            c.c_nationkey == F.col("n_nationkey"),
            "leftsemi",
        ).select("c_custkey")
    )
    o_semi = register_cache(
        o.join(
            c_semi, o.o_custkey == c_semi.c_custkey, "leftsemi"
        ).select("o_orderkey", "o_custkey")
    )
    l_semi = register_cache(
        l.join(
            o_semi, l.l_orderkey == o_semi.o_orderkey, "leftsemi"
        ).select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o_back = register_cache(
        o_semi.join(
            l_semi, o_semi.o_orderkey == l_semi.l_orderkey, "leftsemi"
        )
    )
    c_back = c_semi.join(
        o_back, c_semi.c_custkey == o_back.o_custkey, "leftsemi"
    )

    def cnt(df, alias):
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    rev = l_semi.agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "asia_revenue",
        )
    )
    out = (
        cnt(c, "n_customer_base")
        .crossJoin(F.broadcast(cnt(c_semi, "n_customer_semi")))
        .crossJoin(F.broadcast(cnt(o, "n_orders_base")))
        .crossJoin(F.broadcast(cnt(o_semi, "n_orders_semi")))
        .crossJoin(F.broadcast(cnt(l, "n_lineitem_base")))
        .crossJoin(F.broadcast(cnt(l_semi, "n_lineitem_semi")))
        .crossJoin(F.broadcast(cnt(o_back, "n_orders_back")))
        .crossJoin(F.broadcast(cnt(c_back, "n_customer_back")))
        .crossJoin(F.broadcast(rev))
    )
    return out
