"""Measured crossover evidence for the round-6 global-window prod
twins: NTILE(10) bucket stats over n synthetic rows computed two ways —

- exact:  ntile(10) OVER (ORDER BY v, id)   (single-task global sort)
- prod:   two_phase_rank + ntile_from_rank  (range shuffle + offsets)

Both produce identical output (pinned by tests/test_r6_operators.py);
this harness records the WALL-CLOCK ratio at two sizes so the scaling
claim is a measured number, not an assertion: the exact form's cost is
one task sorting ALL rows (and grows superlinearly once it spills),
while the prod form stays data-parallel. Folded into bench.py extras
as `ntile_scale`.

    python tools/bench_ntile.py [n_small] [n_large]   # 1_000_000, 8_000_000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dataset(spark, n: int):
    from pyspark.sql import functions as F

    # deterministic pseudo-random sort key: md5 of the id — forces a
    # real sort (monotone ids would make the range exchange trivial)
    return spark.range(n).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )


def _exact(df):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.orderBy("v", "id")
    return (
        df.select("v", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"))
    )


def _prod(df, parallelism: int):
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.operators._util import (
        ntile_from_rank,
        two_phase_rank,
    )

    ranked = two_phase_rank(df, ["v", "id"], nparts=parallelism)
    total = ranked.agg(F.count(F.lit(1)).alias("_total"))
    decile = ntile_from_rank(F.col("rnk"), F.col("_total"), 10)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select("v", decile.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"))
    )


def run_ntile_scale(spark, n_small: int = 1_000_000, n_large: int = 8_000_000) -> dict:
    parallelism = spark.sparkContext.defaultParallelism
    out: dict = {"n_small": n_small, "n_large": n_large}
    for tag, n in (("small", n_small), ("large", n_large)):
        df = _dataset(spark, n)
        for name, build in (
            ("exact", lambda d: _exact(d)),
            ("prod", lambda d: _prod(d, parallelism)),
        ):
            best = None
            for _ in range(2):
                t0 = time.time()
                rows = build(df).collect()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            assert len(rows) == 10, rows
            out[f"{name}_{tag}_sec"] = round(best, 3)
            spark.catalog.clearCache()
    out["ratio_small"] = round(out["exact_small_sec"] / out["prod_small_sec"], 2)
    out["ratio_large"] = round(out["exact_large_sec"] / out["prod_large_sec"], 2)
    return out


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark("bench-ntile")
    print(json.dumps(run_ntile_scale(spark, n_small, n_large)))


if __name__ == "__main__":
    main()
