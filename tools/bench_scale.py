"""Scale-up evidence: run the flagship agg and join shapes on 1× and
10× replicated lineitem and report the wall-clock ratio.

The 100 TB argument everywhere in SCALE.md is "the plan is linear in
rows: map-side work + one hash shuffle". This harness measures that
claim on this container: replicate lineitem 10× executor-side
(`explode(sequence())` — no driver loop, no extra testdata), run the
same plans, and record sec(10×)/sec(1×). A healthy plan lands well
under 10 (fixed per-stage overhead amortizes); anything super-linear
(candidate blowup, accidental nested loop, broadcast of a grown side)
shows up immediately.

    python tools/bench_scale.py [sf_dir] [factor]

`run_scale(spark, sf_dir, factor)` is the embeddable form bench.py
folds into the per-round bench JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timed(df) -> float:
    t0 = time.time()
    df.count()
    return round(time.time() - t0, 3)


def run_scale(spark, sf_dir: str, factor: int = 10) -> dict:
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.operators._util import dec, t

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")

    def replicate(df, key):
        # executor-side replication; the key is shifted per replica so
        # join fan-out stays realistic instead of pure duplication
        shift = 10_000_000
        return (
            df.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn(key, F.col(key) + F.col("rep") * shift)
            .drop("rep")
        )

    def q1_shape(df):
        return (
            df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).alias("sum_qty"),
                F.sum(dec("l_extendedprice")).alias("sum_base"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def join_shape(li_df, o_df):
        return (
            li_df.join(o_df, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(dec("l_extendedprice")).alias("rev"),
            )
        )

    li10 = replicate(li, "l_orderkey")
    o10 = replicate(o, "o_orderkey")

    docs = t(spark, sf_dir, "documents")
    # replicas keep the TEXT identical, so every duplicate-group grows
    # by the factor — the realistic shape of dedup under corpus growth
    docs10 = (
        docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )

    def dedup_shape(df):
        return (
            df.groupBy(F.sha2(F.col("text"), 256).alias("h"))
            .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        )

    # min-of-2 per point, same policy as the headline bench
    def best(mk):
        return min(_timed(mk()) for _ in range(2))

    agg_1x = best(lambda: q1_shape(li))
    agg_10x = best(lambda: q1_shape(li10))
    join_1x = best(lambda: join_shape(li, o))
    join_10x = best(lambda: join_shape(li10, o10))
    dedup_1x = best(lambda: dedup_shape(docs))
    dedup_10x = best(lambda: dedup_shape(docs10))

    # Bucketed fact-fact join at 1x and factor-x: the repo's actual
    # scale answer for repeated fact-fact joins (join_bucketed_colocated)
    # measured under growth, not just argued. Both sides are written
    # ONCE as bucketed datasets (one-time prep, deliberately untimed —
    # at 100 TB that cost is paid once and amortized over every
    # subsequent join); the timed shape is the exchange-free
    # bucket-i-vs-bucket-i SMJ. The unbucketed join_ratio above is the
    # shuffle shape's ratio; this one is what the shape a real
    # deployment would use does under 10x growth.
    import hashlib

    tag = hashlib.md5(f"{sf_dir}:{factor}".encode()).hexdigest()[:8]
    base = os.path.join(REPO, ".bucketed")

    def ensure_bucketed(df, tname: str, key: str):
        if not spark.catalog.tableExists(tname):
            (
                df.write.bucketBy(16, key)
                .sortBy(key)
                .option("path", os.path.join(base, tname))
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tname)
            )
        return spark.table(tname)

    lb1 = ensure_bucketed(li, f"sc_li_1x_{tag}", "l_orderkey")
    ob1 = ensure_bucketed(o, f"sc_o_1x_{tag}", "o_orderkey")
    lbN = ensure_bucketed(
        replicate(li, "l_orderkey"), f"sc_li_{factor}x_{tag}", "l_orderkey"
    )
    obN = ensure_bucketed(
        replicate(o, "o_orderkey"), f"sc_o_{factor}x_{tag}", "o_orderkey"
    )

    def bkt_join_shape(l_df, o_df):
        # merge hint pins SMJ (no broadcast degenerate at toy scale);
        # same aggregate as join_shape so the two ratios are comparable
        return (
            o_df.hint("merge")
            .join(l_df, l_df.l_orderkey == o_df.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(dec("l_extendedprice")).alias("rev"),
            )
        )

    bkt_1x = best(lambda: bkt_join_shape(lb1, ob1))
    bkt_10x = best(lambda: bkt_join_shape(lbN, obN))

    return {
        "join_bucketed_1x_sec": bkt_1x,
        "join_bucketed_10x_sec": bkt_10x,
        "join_bucketed_10x_ratio": round(bkt_10x / max(bkt_1x, 1e-9), 2),
        "factor": factor,
        "agg_1x_sec": agg_1x,
        "agg_10x_sec": agg_10x,
        "agg_ratio": round(agg_10x / max(agg_1x, 1e-9), 2),
        "join_1x_sec": join_1x,
        "join_10x_sec": join_10x,
        "join_ratio": round(join_10x / max(join_1x, 1e-9), 2),
        "dedup_1x_sec": dedup_1x,
        "dedup_10x_sec": dedup_10x,
        "dedup_ratio": round(dedup_10x / max(dedup_1x, 1e-9), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("bench_scale")
    print(json.dumps(run_scale(spark, sf_dir, factor)))


if __name__ == "__main__":
    main()
