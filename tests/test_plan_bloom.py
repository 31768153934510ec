"""Native runtime-bloom-filter injection (the production regime of
`join_bloom_semi_reduction`).

At 100 TB the dim side of a selective join is too big to broadcast and
the fact scan is far above
`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
(10 GB default), so Catalyst injects `bloom_filter_agg` on the filtered
dim keys and `might_contain` ahead of the fact shuffle automatically.
Locally both sizes sit below the thresholds, so this test recreates the
regime by conf (no broadcast, zero app-side threshold) and asserts the
injection actually happens — proving the engine's scale path exists,
not just the manual semi-join form registered in queries().
"""

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL

_CONFS = {
    # the 100 TB regime, shrunk: dim not broadcastable, fact "big"
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def test_runtime_bloom_filter_injected_and_exact(spark):
    saved = {k: spark.conf.get(k) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized, optimized
        assert "might_contain" in optimized, optimized
        # the filter is a pure reduction: results match the plain join
        rows = j.collect()
        for k, v in saved.items():
            spark.conf.set(k, v)
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
            .collect()
        )
        assert sorted(map(tuple, rows)) == sorted(map(tuple, plain))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
