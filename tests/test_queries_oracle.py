"""Every registered query key vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs at sf0.01 (row count + sorted column names +
order-insensitive value hash)."""

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
    from tools.check_correctness import value_hash

    fn = get_queries()[key]
    sdf = fn(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    oracle = get_oracles().get(key)
    if oracle is None:
        # rows-only contract: runs, stable schema
        assert sdf.schema.fields
        return
    rel = duck.sql(oracle)
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert value_hash(srows, sdf.columns) == value_hash(drows, rel.columns)
