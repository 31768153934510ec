"""Dual-mode smoke: the integer-exact scoring/aggregation keys must
produce IDENTICAL results under BOTH `spark.sql.ansi.enabled=true`
(the Spark 4 session default this repo runs under everywhere) and
legacy non-ANSI mode — i.e. none of them relies on ANSI-only implicit
coercions or on legacy overflow wrapping. The quality model's LEAST
clamps exist precisely so the cubic term cannot overflow; this test is
what keeps that guarantee live as keys evolve.

Conf-hygiene note (learned the hard way): `spark.conf.get(key,
default)` returns the CALLER's default when the key was never
explicitly set — NOT the engine's effective default — so the restore
value must come from `spark.conf.get(key)` (no default), which is
"true" on Spark 4. Restoring "false" here silently flipped the whole
suite into legacy mode, where e.g. BIGINT DIV DOUBLE fails analysis.
"""

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Keys chosen for maximal integer-arithmetic surface: BIGINT cubic
# scoring, 1e6/1e9 grid products, rational BM25 terms, weighted-median
# crossing sums, closed-form ntile DIVs, cross-product distribution
# distances.
KEYS = [
    "docs_quality_model_score",
    "docs_quality_calibration",
    "search_bm25_topk",
    "emb_gram_matrix_prod",
    "agg_weighted_median",
    "customer_rfm_segments_prod",
    "corpus_distribution_drift",
    "text_ppjoin_suffix_stats",
]


@pytest.mark.parametrize("key", KEYS)
def test_key_identical_in_both_sql_modes(spark, key):
    from target_s3_parquet_spark.registry import QUERIES, load_all

    load_all()
    fn = QUERIES[key]
    prev = spark.conf.get("spark.sql.ansi.enabled")  # effective value
    results = {}
    try:
        for mode in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            results[mode] = sorted(map(tuple, fn(spark, SF).collect()))
            spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
        spark.catalog.clearCache()
    assert results["true"] == results["false"]
    assert results["true"], f"{key} returned no rows"
