"""Scale-up evidence for the r10 key families (VERDICT r10 item 7):
run the ACTUAL graph-community / survival / LTV keys at 1× and 10×.

Unlike `bench_scale.py` (which re-states flagship plan SHAPES over
replicated DataFrames), this harness materializes a replicated
testdata directory once — customers, orders, and lineitem replicated
executor-side with keys shifted per replica so cohorts and edge-build
fan-in genuinely grow by the factor while the bounded dims (nation,
supplier) stay fixed — and calls the REGISTERED key functions on it.
That validates the cached-edge-list and ordered-fold claims off-SF on
the same code path the gate checks.

    python tools/bench_scale_r10.py [sf_dir] [factor]

`run_scale_r10(spark, sf_dir, factor)` is the embeddable form bench.py
folds into the per-round bench JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = [
    "graph_label_propagation",
    "graph_lpa_modularity",
    "graph_kcore_decomposition",
    "graph_hits_scores",
    "survival_kaplan_meier",
    "survival_median_landmarks",
    "cohort_ltv_curves",
]

_SHIFT = 10_000_000


def _materialize_scaled(spark, sf_dir: str, factor: int) -> str:
    """Write the replicated testdata dir (once per sf/factor)."""
    from pyspark.sql import functions as F

    out = os.path.join(REPO, ".scale10_r10", os.path.basename(sf_dir.rstrip("/")) + f"_x{factor}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def rep(df, shifts):
        df = df.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        for col in shifts:
            df = df.withColumn(col, F.col(col) + F.col("rep") * _SHIFT)
        return df.drop("rep")

    def load(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    # replicated facts: keys shifted per replica so cohorts (custkey)
    # and the edge-build fan-in (orderkey) genuinely multiply; dims
    # (nation, supplier) stay bounded, so graph node count stays 25
    rep(load("customer"), ["c_custkey"]).write.parquet(
        os.path.join(out, "customer.parquet")
    )
    rep(load("orders"), ["o_orderkey", "o_custkey"]).write.parquet(
        os.path.join(out, "orders.parquet")
    )
    rep(load("lineitem"), ["l_orderkey"]).write.parquet(
        os.path.join(out, "lineitem.parquet")
    )
    for name in ("nation", "region", "supplier", "part"):
        load(name).write.parquet(os.path.join(out, f"{name}.parquet"))
    open(done, "w").write("ok\n")
    return out


def run_scale_r10(spark, sf_dir: str, factor: int = 10) -> dict:
    from target_s3_parquet_spark.operators._util import release_rank_caches
    from target_s3_parquet_spark.registry import get_queries

    queries = get_queries()
    scaled = _materialize_scaled(spark, sf_dir, factor)
    out: dict = {"factor": factor}
    for key in KEYS:
        fn = queries[key]
        times = {}
        for tag, d in (("1x", sf_dir), (f"{factor}x", scaled)):
            t0 = time.time()
            fn(spark, d).count()
            times[tag] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            release_rank_caches()
        out[f"{key}_1x_sec"] = times["1x"]
        out[f"{key}_{factor}x_sec"] = times[f"{factor}x"]
        out[f"{key}_ratio"] = round(
            times[f"{factor}x"] / max(times["1x"], 1e-9), 2
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("bench_scale_r10")
    print(json.dumps(run_scale_r10(spark, sf_dir, factor)))


if __name__ == "__main__":
    main()
