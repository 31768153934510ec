"""LSH parameter sweep: validates SCALE.md's R-growth rule by
measuring, for each (R bits/band, B bands) config, the candidate-pair
volume and the recall against brute-force ground truth at the
similarity threshold.

    python tools/bench_lsh.py [sf_dir] [tau]      # default sf0.1, 0.40

One JSON line per config:
    {"R": r, "B": b, "planes": r*b, "candidates": c,
     "verified": v, "recall": v/truth, "sec": s}
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64


def plane_weights(n_planes: int) -> list[list[int]]:
    # same construction as operators/similarity.py
    return [
        [
            1 if hashlib.md5(f"{p}:{i}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(DIM)
        ]
        for p in range(n_planes)
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tau = float(sys.argv[2]) if len(sys.argv) > 2 else 0.40

    from pyspark.sql import functions as F

    from target_s3_parquet_spark.session import get_spark, load_table

    spark = get_spark("bench_lsh")
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    e = e.select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
    ).cache()

    # brute-force ground truth
    a = e.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    truth = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select((dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("c"))
        .filter(F.col("c") >= tau)
        .count()
    )
    print(f"# ground truth pairs at tau={tau}: {truth}", file=sys.stderr)

    for r, bnum in [(2, 4), (3, 4), (4, 4), (4, 8), (6, 6), (8, 4)]:
        t0 = time.time()
        w = plane_weights(r * bnum)

        def sign(v, p):
            wcol = F.array(*[F.lit(float(x)) for x in w[p]])
            return F.when(dot(v, wcol) >= 0, F.lit("1")).otherwise(F.lit("0"))

        band_arr = F.array(
            *[
                F.concat(*[sign(F.col("v"), bb * r + rr) for rr in range(r)])
                for bb in range(bnum)
            ]
        )
        bands = e.select(
            "vec_id", F.posexplode(band_arr).alias("bno", "bkey")
        )
        x, y = bands.alias("x"), bands.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.bno") == F.col("y.bno"))
                & (F.col("x.bkey") == F.col("y.bkey"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select(F.col("x.vec_id").alias("ia"), F.col("y.vec_id").alias("ib"))
            .distinct()
            .cache()
        )
        n_cand = cand.count()
        verified = (
            cand.join(a, "ia")
            .join(b, "ib")
            .select(
                (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("c")
            )
            .filter(F.col("c") >= tau)
            .count()
        )
        cand.unpersist()
        print(
            json.dumps(
                {
                    "R": r,
                    "B": bnum,
                    "planes": r * bnum,
                    "candidates": n_cand,
                    "verified": verified,
                    "recall": round(verified / truth, 3) if truth else None,
                    "sec": round(time.time() - t0, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
