"""Compaction: many small files in, few right-sized files out, content
identical."""

import os

from pyspark.sql import functions as F


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from target_s3_parquet_spark.sources.sink import compact_parquet

    path = str(tmp_path / "frag")
    # fragment: 64 tiny files
    spark.range(0, 10000).withColumn("v", F.col("id") * 2).repartition(
        64
    ).write.parquet(path)
    before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert before >= 32
    total_before = spark.read.parquet(path).agg(F.sum("v")).collect()[0][0]

    after = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)

    assert after < before
    assert after <= 4
    df = spark.read.parquet(path)
    assert df.count() == 10000
    assert df.agg(F.sum("v")).collect()[0][0] == total_before
