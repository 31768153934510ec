"""transformWithStateInPandas coverage (Spark 4 typed-state API).

The operator (`stream_queries.stream_transform_with_state`) is complete
but can only execute where `google.protobuf` is installed — the
transformWithState state-server protocol depends on it, and this
container ships without it. The test import-skips in that case, so on
a stock Spark 4 environment it runs and asserts the running-state
snapshot equals the batch aggregate.
"""

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState state server requires protobuf",
)

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMALL  # noqa: E402


def test_transform_with_state_matches_batch_aggregate(spark):
    from target_s3_parquet_spark.operators._util import dec, t
    from target_s3_parquet_spark.streaming.stream_queries import (
        stream_transform_with_state,
    )

    got = {
        r["user_id"]: r
        for r in stream_transform_with_state(spark, SF_SMALL).collect()
    }
    want = {
        r["user_id"]: r
        for r in t(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["total_events"] == w["total_events"]
        assert abs(g["total_value"] - w["total_value"]) < 1e-6
        assert g["n_types"] == w["n_types"]
