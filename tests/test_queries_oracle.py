"""Every registered query key vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs at sf0.01 (row count + sorted column names +
order-insensitive value hash, materialized through pandas on both sides
the way the driver's comparator does)."""

import pytest

from tests.conftest import SF_SMALL


def _keys():
    from target_s3_parquet_spark.registry import get_queries

    return sorted(get_queries())


@pytest.mark.parametrize("key", _keys())
def test_query_matches_oracle(key, spark, duck):
    import sys

    sys.path.insert(0, "/root/repo")
    from target_s3_parquet_spark.registry import get_oracles, get_queries
    from tools.check_correctness import _nonhashable_columns, frame_hash

    fn = get_queries()[key]
    sdf = fn(spark, SF_SMALL)
    oracle = get_oracles().get(key)
    if oracle is None:
        # rows-only contract: runs, stable schema
        assert sdf.schema.fields
        sdf.collect()
        return
    # the driver comparator cannot hash list-typed cells — oracle-checked
    # keys must serialize arrays or explode to rows
    assert not _nonhashable_columns(sdf), (
        f"{key}: array/map/struct output columns {_nonhashable_columns(sdf)}"
    )
    spdf = sdf.toPandas()
    dpdf = duck.sql(oracle).df()
    assert len(spdf) == len(dpdf), f"rowcount {len(spdf)} != {len(dpdf)}"
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    assert frame_hash(spdf) == frame_hash(dpdf)
