"""Measured crossover evidence for the round-7 rank-statistic channel:
the two-sample KS statistic over n synthetic scored rows computed two
ways —

- exact: CDFs from SUM(..) OVER (ORDER BY v) — a single-task global
  window over the per-value table (the naive oracle form);
- prod:  CDFs from chained `two_phase_rank` prefix sums (range shuffle
  + broadcast offsets) — `agg_ks_test_two_sample`'s registered plan.

Both produce the identical statistic (integer cross-product channel);
this harness records the WALL-CLOCK ratio at two value-table sizes so
the scaling claim for the whole rank-statistic family (KS, AUC,
Spearman) is a measured number. Folded into bench.py extras as
`rank_stats_scale`.

    python tools/bench_ranks.py [n_small] [n_large]  # 1_000_000, 8_000_000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _per_value(spark, n: int):
    """Synthetic per-VALUE count table with n distinct values — the
    shape the KS/AUC keys rank after their first combinable groupBy.
    Group A skews low, group B skews high (md5-derived, deterministic),
    so the statistic is nontrivial."""
    from pyspark.sql import functions as F

    h = F.expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 13), 16, 10)"
        " AS BIGINT)"
    )
    return spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("v"),
        (F.pmod(h, F.lit(100))).alias("_u"),
    ).select(
        "v",
        F.when(F.col("_u") < 40, 1).otherwise(0).alias("ca"),
        F.when(F.col("_u") >= 40, 1).otherwise(0).alias("cb"),
    )


def _ks_from_cdfs(s, tots):
    from pyspark.sql import functions as F

    gap = F.abs(
        F.col("cca").cast("decimal(19,0)") * F.col("n_b")
        - F.col("ccb").cast("decimal(19,0)") * F.col("n_a")
    )
    return (
        s.crossJoin(F.broadcast(tots))
        .groupBy("n_a", "n_b")
        .agg(F.max(gap).cast("double").alias("d_numer"))
        .select(
            (F.col("d_numer") / (F.col("n_a").cast("double") * F.col("n_b")))
            .alias("ks_d")
        )
    )


def _exact(df, tots):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    s = df.select(
        F.sum("ca").over(w).alias("cca"), F.sum("cb").over(w).alias("ccb")
    )
    return _ks_from_cdfs(s, tots)


def _prod(df, tots, parallelism: int):
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.operators._util import two_phase_rank

    s1 = two_phase_rank(
        df, ["v"], sum_col="ca", rank_name="_r1", cum_name="cca",
        nparts=parallelism,
    )
    s2 = two_phase_rank(
        s1, ["v"], sum_col="cb", rank_name="_r2", cum_name="ccb",
        nparts=parallelism,
    )
    return _ks_from_cdfs(s2.select("cca", "ccb"), tots)


def run_rank_stats_scale(
    spark, n_small: int = 1_000_000, n_large: int = 8_000_000
) -> dict:
    from pyspark.sql import functions as F

    parallelism = spark.sparkContext.defaultParallelism
    out: dict = {"n_small": n_small, "n_large": n_large}
    for tag, n in (("small", n_small), ("large", n_large)):
        df = _per_value(spark, n)
        tots = df.agg(
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
        )
        results = {}
        for name, build in (
            ("exact", lambda d: _exact(d, tots)),
            ("prod", lambda d: _prod(d, tots, parallelism)),
        ):
            best = None
            for _ in range(2):
                t0 = time.time()
                rows = build(df).collect()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            assert len(rows) == 1, rows
            results[name] = rows[0].ks_d
            out[f"{name}_{tag}_sec"] = round(best, 3)
            spark.catalog.clearCache()
        # identical statistic from both plans — the point of the channel
        assert results["exact"] == results["prod"], results
        out[f"ks_d_{tag}"] = results["prod"]
    out["ratio_small"] = round(out["exact_small_sec"] / out["prod_small_sec"], 2)
    out["ratio_large"] = round(out["exact_large_sec"] / out["prod_large_sec"], 2)
    return out


def main() -> None:
    from target_s3_parquet_spark.session import get_spark

    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark("bench-ranks")
    print(json.dumps(run_rank_stats_scale(spark, n_small, n_large)))


if __name__ == "__main__":
    main()
