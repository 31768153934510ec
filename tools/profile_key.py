"""Per-key profiling harness for the r12 optimization round (guide §1).

Times one or more registered keys at a scale-factor dir, min-of-N,
with BOTH actions side by side:

- ``count()`` — the bench's timed action (what the driver measures);
- the noop sink (``format("noop")``) — computes every column of every
  row, isolating the computation from column-pruning artifacts
  (guide §1.4).

Each run is labeled via ``setJobDescription`` (guide §1.5). Optionally
dumps ``explain("formatted")`` next to the timings.

    python tools/profile_key.py [sf_dir] key [key ...]
    SPARK_GRAFT_PROFILE_RUNS=3 (default)
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    keys = args[1:] if args and os.path.isdir(args[0]) else args
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    do_explain = os.environ.get("SPARK_GRAFT_PROFILE_EXPLAIN", "")

    from target_s3_parquet_spark.operators._util import release_rank_caches
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("profile")
    queries = get_queries()
    # same warm-up as bench.py so first-key numbers are comparable
    r = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    r.join(n, r.r_regionkey == n.n_regionkey).groupBy("r_name").count().collect()

    for key in keys:
        fn = queries[key]
        counts, noops = [], []
        nrows = -1
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{key} count run {i}")
            t0 = time.time()
            nrows = fn(spark, sf_dir).count()
            counts.append(time.time() - t0)
            spark.catalog.clearCache()
            release_rank_caches()
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{key} noop run {i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noops.append(time.time() - t0)
            spark.catalog.clearCache()
            release_rank_caches()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{key}: count min {min(counts):.3f}s {[round(x,3) for x in counts]}"
            f" | noop min {min(noops):.3f}s {[round(x,3) for x in noops]}"
            f" | {nrows} rows",
            flush=True,
        )
        if do_explain:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            release_rank_caches()
            spark.catalog.clearCache()
            out = os.path.join(do_explain, f"{key}.txt")
            os.makedirs(do_explain, exist_ok=True)
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"  plan -> {out}", flush=True)


if __name__ == "__main__":
    main()
