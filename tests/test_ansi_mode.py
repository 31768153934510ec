"""ANSI-mode smoke: the integer-exact scoring/aggregation keys must
produce IDENTICAL results with `spark.sql.ansi.enabled=true` — i.e.
none of them relies on silent non-ANSI overflow wrapping or
divide-by-zero-to-NULL. (The quality model's LEAST clamps exist
precisely so the cubic term cannot overflow; this test is what keeps
that guarantee live as keys evolve.) ANSI is the default posture of
managed Spark platforms, so a key that only works with wrapping would
be broken exactly where 100 TB jobs run."""

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
def test_key_is_ansi_clean(spark, key):
    from target_s3_parquet_spark.registry import QUERIES, load_all

    load_all()
    fn = QUERIES[key]
    baseline = sorted(map(tuple, fn(spark, SF).collect()))
    spark.catalog.clearCache()
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = sorted(map(tuple, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
        spark.catalog.clearCache()
    assert ansi == baseline
