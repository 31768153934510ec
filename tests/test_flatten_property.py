"""Property-based flatten tests (SURVEY §5.4): random nested dicts →
schema derivation → from_json → flatten projection; invariants: leaf
count, ``__``-joined names, null preservation, value fidelity."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from target_s3_parquet_spark.plans.jsonschema import (
    flatten_schema,
    jsonschema_to_spark,
)

_key = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)
_leaf = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(alphabet="abcxyz ", max_size=8),
    st.booleans(),
    st.none(),
)


def _nested(depth: int):
    if depth == 0:
        return _leaf
    return st.one_of(
        _leaf,
        st.dictionaries(_key, _nested(depth - 1), min_size=1, max_size=3),
    )


_record = st.dictionaries(_key, _nested(2), min_size=1, max_size=4)


def _schema_of(value) -> dict:
    if isinstance(value, dict):
        return {
            "type": ["null", "object"],
            "properties": {k: _schema_of(v) for k, v in value.items()},
        }
    if isinstance(value, bool):
        return {"type": ["null", "boolean"]}
    if isinstance(value, int):
        return {"type": ["null", "integer"]}
    if isinstance(value, str):
        return {"type": ["null", "string"]}
    return {"type": ["null", "string"]}  # null leaf → permissive string


def _expected_flat(value, parent="", sep="__") -> dict:
    out = {}
    for k, v in value.items():
        key = f"{parent}{sep}{k}" if parent else k
        if isinstance(v, dict):
            out.update(_expected_flat(v, key, sep))
        else:
            out[key] = v
    return out


@given(_record)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_flatten_roundtrip(spark, record):
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.plans.jsonschema import flatten_df

    schema_json = _schema_of(record)
    struct = jsonschema_to_spark(schema_json)
    df = spark.createDataFrame([(json.dumps(record),)], ["j"]).select(
        F.from_json("j", struct).alias("r")
    ).select("r.*")
    flat = flatten_df(df)

    expected = _expected_flat(record)
    # leaf-name invariant: matches the schema-level flatten too
    assert sorted(flat.columns) == sorted(flatten_schema(schema_json))
    assert sorted(flat.columns) == sorted(expected)

    row = flat.collect()[0].asDict()
    for k, v in expected.items():
        assert row[k] == v, (k, row[k], v)
