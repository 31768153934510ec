"""Measured crossover evidence for the round-8 Kendall tau-b plan:
the concordant/discordant counts over n synthetic (quantity, price)
points computed two ways —

- dense: the naive full densification (|distinct prices| x 50 grid,
  per-quantity prefix + per-price suffix windows, sum of hlt*suf) —
  the form the DuckDB ORACLE states, data-proportional grid;
- prod:  the registered bounded merge-count plan
  (`agg_corr_kendall_tau` via `kendall_tau_from_points`): <=1024-price
  value-disjoint buckets, cross-bucket concordance from a (bucket x
  50) contingency with broadcast prefix arrays, within-bucket exact
  int64 numpy dominance in applyInPandas.

Both produce IDENTICAL (n, C, D, tau) — asserted — so the recorded
wall-clock ratio is a pure plan comparison. Folded into bench.py
extras as `tau_scale`.

    python tools/bench_tau.py [n_small] [n_large]   # 600_000, 2_400_000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _points(spark, n: int):
    """Synthetic (v in 1..50, g double with ties) — v correlates with g
    through a shared md5-derived component so tau is nontrivial, and
    ~n/3 distinct prices exercise the grid/bucket machinery."""
    from pyspark.sql import functions as F

    h = F.expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 13), 16, 10)"
        " AS BIGINT)"
    )
    return spark.range(n).select(
        (F.pmod(h, F.lit(50)) + 1).cast("int").alias("v"),
        (
            (F.pmod(h, F.lit(50)) + 1) * 100
            + F.pmod(h, F.lit(n)).cast("double") / 3
        ).alias("g"),
    )


def _tau_dense(pts):
    """The naive dense-grid form (the oracle's algorithm, in Spark)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    d19 = "decimal(19,0)"
    cnt = pts.groupBy("v", "g").agg(F.count(F.lit(1)).alias("c"))
    dense = (
        cnt.select("g")
        .distinct()
        .select(
            "g",
            F.explode(F.array(*[F.lit(i) for i in range(1, 51)])).alias("v"),
        )
        .join(cnt, ["v", "g"], "left")
        .fillna(0, subset=["c"])
    )
    w_h = (
        W.partitionBy("v").orderBy("g").rowsBetween(W.unboundedPreceding, -1)
    )
    w_g = W.partitionBy("g")
    w_pfx = (
        W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    )
    grid = dense.select(
        "c",
        F.coalesce(F.sum("c").over(w_h), F.lit(0)).cast("long").alias("hlt"),
        (F.sum("c").over(w_g) - F.sum("c").over(w_pfx))
        .cast("long")
        .alias("suf"),
    )
    cd = grid.agg(
        F.sum(F.col("hlt").cast(d19) * F.col("suf").cast(d19))
        .cast("decimal(38,0)")
        .alias("cc"),
        F.sum(F.col("c").cast(d19) * F.col("suf").cast(d19))
        .cast("decimal(38,0)")
        .alias("ew"),
    )
    nn = pts.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    t1 = (
        cnt.groupBy("v")
        .agg(F.sum("c").cast("long").alias("tv"))
        .agg(
            (
                F.sum(F.col("tv").cast(d19) * (F.col("tv") - 1).cast(d19))
                .cast("decimal(38,0)")
                / 2
            ).alias("n1")
        )
    )
    w = cd.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(t1))
    n = F.col("n")
    dd = n * (n - 1) / 2 - F.col("n1") - F.col("cc") - F.col("ew")
    return w.select(
        n.cast("long").alias("n_rows"),
        F.col("cc").cast("long").alias("n_concordant"),
        dd.cast("long").alias("n_discordant"),
    )


def run_tau_scale(spark, sizes=(600_000, 2_400_000)) -> dict:
    from target_s3_parquet_spark.operators._util import release_rank_caches
    from target_s3_parquet_spark.operators.aggregates import (
        kendall_tau_from_points,
    )

    out: dict = {}
    for n in sizes:
        pts = _points(spark, n)
        t0 = time.time()
        d = _tau_dense(pts).collect()[0]
        t_dense = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        p = kendall_tau_from_points(pts).collect()[0]
        t_prod = time.time() - t0
        spark.catalog.clearCache()
        release_rank_caches()
        assert (d.n_rows, d.n_concordant, d.n_discordant) == (
            p.n_rows,
            p.n_concordant,
            p.n_discordant,
        ), (n, d, p)
        tag = f"{n // 1000}k"
        out[f"dense_sec_{tag}"] = round(t_dense, 2)
        out[f"prod_sec_{tag}"] = round(t_prod, 2)
        out[f"ratio_{tag}"] = round(t_dense / t_prod, 2)
    return out


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    sizes = tuple(int(a) for a in sys.argv[1:]) or (600_000, 2_400_000)
    spark = get_spark("bench-tau")
    print(json.dumps(run_tau_scale(spark, sizes)))


if __name__ == "__main__":
    main()
