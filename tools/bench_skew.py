"""Skew-join benchmark: measures the strategies SCALE.md prescribes on
a synthetically skewed join — 90% of fact rows share ONE hot key.

    python tools/bench_skew.py [n_fact_rows]      # default 5_000_000

Three runs over identical data:
  baseline  : sort-merge join, AQE skew handling OFF (the pathological
              plan — one straggler task owns the hot partition)
  aqe_skew  : AQE skewJoin ON (runtime splits the hot partition)
  salted    : explicit 16-way salt (works even where AQE can't see the
              skew, e.g. pre-aggregations)

Prints one JSON line per strategy; the point is the ratio, not the
absolute numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_skew(spark, n: int = 5_000_000) -> dict:
    """Run the three skew strategies on an existing session; returns
    {strategy: sec}. Session confs touched (broadcast threshold, AQE
    skew join) are restored on exit."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    # force the join to actually shuffle (no broadcast shortcut)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # fact: 90% of rows carry key 0, rest uniform over 100k keys
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.col("id") % 100_000)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    scratch = tempfile.mkdtemp(prefix="skew_bench_")
    out: dict = {"n_fact_rows": n}
    try:
        fact.write.mode("overwrite").parquet(f"{scratch}/fact")
        dim.write.mode("overwrite").parquet(f"{scratch}/dim")
        fact = spark.read.parquet(f"{scratch}/fact")
        dim = spark.read.parquet(f"{scratch}/dim")

        # untimed warm-up join (same shape, 1/20 size): absorbs codegen
        # compilation + shuffle-machinery start-up so the three timed
        # strategies compare steady-state cost, not who-paid-JIT-first
        fact.limit(n // 20).hint("merge").join(dim, "k").groupBy("k").agg(
            F.count("*")
        ).count()

        def timed(tag: str, df) -> None:
            t0 = time.time()
            df.count()
            out[tag] = round(time.time() - t0, 2)

        def plain_join():
            return (
                fact.hint("merge")
                .join(dim, "k")
                .groupBy("k")
                .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timed("baseline_skewed_smj", plain_join())

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        timed("aqe_skew_split", plain_join())

        SALT = 16
        fsalt = fact.withColumn("salt", (F.xxhash64("v") % SALT + SALT) % SALT)
        dsalt = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
        ).withColumn("salt", F.col("salt").cast("bigint"))
        salted = (
            fsalt.hint("merge")
            .join(dsalt, ["k", "salt"])
            .groupBy("k", "salt")
            .agg(F.count("*").alias("pn"), F.sum("v").alias("pv"))
            .groupBy("k")
            .agg(F.sum("pn").alias("n"), F.sum("pv").alias("sv"))
        )
        timed("explicit_salt_16", salted)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("bench_skew")
    res = run_skew(spark, n)
    for tag in ("baseline_skewed_smj", "aqe_skew_split", "explicit_salt_16"):
        print(json.dumps({"strategy": tag, "sec": res[tag]}))


if __name__ == "__main__":
    main()
