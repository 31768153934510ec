"""Measured parity audit for per-group top-k-by-measure: the
WindowGroupLimit rank-limit plan vs the naive whole-group shuffle —

- prod:  ROW_NUMBER() OVER (PARTITION BY g ORDER BY m DESC, id) with
  filter rn <= k. Spark compiles the adjacent window+filter to
  `WindowGroupLimit` (asserted on the plan): each map task keeps a
  per-group k-row heap BEFORE the shuffle, so shuffle volume is
  bounded by groups x k regardless of input size — the same pushdown
  `sample_reservoir_per_group` plan-pins.
- naive: groupBy(g).agg(collect_list(struct(...))) -> array_sort ->
  slice(k) -> explode. Ships EVERY row of every group through the
  shuffle as array payload and materializes whole groups in memory —
  the plan a user writes when they think "gather then cut".

Both produce IDENTICAL row sets — asserted — so the recorded ratio is
a pure plan comparison, the way `tools/bench_tau.py` records the
dense-vs-bucketed tau crossover. Folded into bench.py extras as
`topk_scale`.

    python tools/bench_topk.py [n_small] [n_large]   # 2_000_000, 8_000_000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_K = 4
_GROUPS = 1000


def _rows(spark, n: int):
    """Synthetic (g in 0..999, m double, id long) — md5-derived measure
    so group winners are scattered across input partitions."""
    from pyspark.sql import functions as F

    h = F.expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 13), 16, 10)"
        " AS BIGINT)"
    )
    return spark.range(n).select(
        F.col("id"),
        F.pmod(h, F.lit(_GROUPS)).cast("int").alias("g"),
        (h % 1_000_000).cast("double").alias("m"),
    )


def _topk_prod(rows):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("g").orderBy(F.desc("m"), "id")
    return (
        rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .select("g", "rn", "id", "m")
    )


def _topk_naive(rows):
    from pyspark.sql import functions as F

    return (
        rows.groupBy("g")
        .agg(F.collect_list(F.struct("m", "id")).alias("xs"))
        .select(
            "g",
            F.posexplode(
                F.slice(
                    F.reverse(
                        F.array_sort(
                            F.expr(
                                "transform(xs, x ->"
                                " struct(x.m AS m, -x.id AS nid))"
                            )
                        )
                    ),
                    1,
                    _K,
                )
            ).alias("pos", "x"),
        )
        .select(
            "g",
            (F.col("pos") + 1).cast("int").alias("rn"),
            (-F.col("x.nid")).alias("id"),
            F.col("x.m").alias("m"),
        )
    )


def run_topk_scale(spark, sizes=(2_000_000, 8_000_000)) -> dict:
    out: dict = {}
    plan = _topk_prod(_rows(spark, 1000))._jdf.queryExecution().toString()
    assert "WindowGroupLimit" in plan, plan[:800]
    out["prod_plan_has_window_group_limit"] = True
    # warm both plans once (codegen + exchange machinery) so the first
    # timed size doesn't charge JVM warmup to whichever plan runs first
    warm = _rows(spark, 100_000)
    _topk_naive(warm).count()
    _topk_prod(warm).count()
    spark.catalog.clearCache()
    for n in sizes:
        rows = _rows(spark, n)
        t0 = time.time()
        naive = _topk_naive(rows).collect()
        t_naive = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        prod = _topk_prod(rows).collect()
        t_prod = time.time() - t0
        spark.catalog.clearCache()
        assert sorted(map(tuple, naive)) == sorted(map(tuple, prod)), n
        tag = f"{n // 1000}k"
        out[f"naive_sec_{tag}"] = round(t_naive, 2)
        out[f"prod_sec_{tag}"] = round(t_prod, 2)
        out[f"ratio_{tag}"] = round(t_naive / t_prod, 2)
    return out


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    sizes = tuple(int(a) for a in sys.argv[1:]) or (2_000_000, 8_000_000)
    spark = get_spark("bench-topk")
    print(json.dumps(run_topk_scale(spark, sizes)))


if __name__ == "__main__":
    main()
