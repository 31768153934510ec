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


def test_interleaved_stream_log_compaction(spark, tmp_path):
    """R8's file-explosion case (reference __init__.py:292-301 flushes
    one file per CONTIGUOUS stream run, so an interleaved log explodes
    into per-run shards): our sink hash-partitions by stream — already
    run-order-independent — and the compaction pass then heals the
    remaining small files while preserving the Hive layout and rows."""
    import json

    from target_s3_parquet_spark.sources.sink import (
        SinkConfig,
        compact_parquet,
        run_singer_to_parquet,
    )

    schema = {"properties": {"id": {"type": ["null", "integer"]}},
              "required": ["id"], "type": ["null", "object"]}
    lines = [
        json.dumps({"type": "SCHEMA", "stream": s, "schema": schema,
                    "key_properties": ["id"]})
        for s in ("alpha", "beta")
    ]
    # 120 records alternating stream every line — the worst case for a
    # contiguous-run flusher (reference would cut 120 files from runs
    # alone)
    lines += [
        json.dumps({"type": "RECORD", "stream": ("alpha", "beta")[i % 2],
                    "record": {"id": i}})
        for i in range(120)
    ]
    log = tmp_path / "interleaved.jsonl"
    log.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "out")
    # maxRecordsPerFile=1 fragments deliberately (R9 knob) to give the
    # compactor something to heal
    run_singer_to_parquet(
        spark, str(log), SinkConfig(path=out, max_records_per_file=1)
    )

    def count_files(root):
        return sum(
            1 for _, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
        )

    before = count_files(out)
    assert before >= 120  # one file per record: fragmented

    n_after = compact_parquet(
        spark, out, target_file_bytes=64 * 1024 * 1024,
        partition_cols=["stream"],
    )
    after = count_files(out)
    assert after < before
    assert after <= 8
    assert n_after == after

    back = spark.read.parquet(out)
    # Hive layout preserved, rows intact, streams balanced
    assert sorted(
        r["stream"] for r in back.select("stream").distinct().collect()
    ) == ["alpha", "beta"]
    assert back.count() == 120
    assert back.filter("stream = 'alpha'").count() == 60
