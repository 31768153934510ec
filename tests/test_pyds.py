"""Python DataSource (sources/pyds.py) unit coverage beyond the two
oracle-checked keys: partition fan-out, corrupt-line quarantine, and
stream-offset bookkeeping."""

import json
import os

import pytest

from target_s3_parquet_spark.sources.pyds import (
    SingerJsonlStreamReader,
    register,
)


def _write_log(d, name, lines):
    with open(os.path.join(d, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _mk_logs(tmp_path):
    d = str(tmp_path / "log")
    os.makedirs(d)
    rec = {"type": "RECORD", "stream": "s", "record": {"id": 1}}
    _write_log(d, "000.jsonl", [json.dumps(rec), "not json at all"])
    _write_log(d, "001.jsonl", [json.dumps({**rec, "record": {"id": 2}}), "42"])
    _write_log(d, "_SUCCESS", [""])  # must be ignored
    return d


def test_batch_reader_partitions_and_quarantine(spark, tmp_path):
    d = _mk_logs(tmp_path)
    register(spark)
    df = spark.read.format("singer_jsonl").load(d)
    # one task per log file (the scale contract), _-prefixed skipped
    assert df.rdd.getNumPartitions() == 2
    rows = {(r.msg_type, r.src_file) for r in df.collect()}
    assert ("RECORD", "000.jsonl") in rows
    assert ("CORRUPT", "000.jsonl") in rows  # non-JSON line
    assert ("CORRUPT", "001.jsonl") in rows  # JSON but not an envelope
    recs = df.filter("msg_type = 'RECORD'").collect()
    assert sorted(json.loads(r.record)["id"] for r in recs) == [1, 2]


def test_stream_reader_offsets(tmp_path):
    d = _mk_logs(tmp_path)
    r = SingerJsonlStreamReader({"path": d})
    assert r.initialOffset() == {"n_files": 0}
    rows, end = r.read({"n_files": 0})
    assert end == {"n_files": 2}
    assert len(list(rows)) == 4
    # replay between offsets is exact (exactly-once restart contract)
    replay = list(r.readBetweenOffsets({"n_files": 1}, {"n_files": 2}))
    assert len(replay) == 2
    # a file landing later is picked up from the committed offset
    _write_log(d, "002.jsonl", [json.dumps({"type": "STATE", "value": {}})])
    rows2, end2 = r.read(end)
    assert end2 == {"n_files": 3}
    got = list(rows2)
    assert len(got) == 1 and got[0][1] == "STATE"


def test_writer_publishes_by_rename_and_tmp_stays_invisible(spark, tmp_path):
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.sources.pyds import register

    register(spark)
    out = str(tmp_path / "log")
    df = spark.range(0, 25).select(
        F.lit("s1").alias("stream"),
        F.col("id"),
        (F.col("id") * 1.5).alias("x"),
    )
    df.write.format("singer_jsonl").mode("append").save(out)

    names = sorted(os.listdir(out))
    # publish-by-rename: no temp residue, only visible part files
    assert names and all(n.startswith("part-") and n.endswith(".jsonl") for n in names)

    # an in-flight (crashed writer's) temp file must be invisible to reads
    with open(os.path.join(out, ".part-dead.jsonl.tmp"), "w") as f:
        f.write('{"type":"RECORD","stream":"s1","record":{"id":999}}\n')
    back = spark.read.format("singer_jsonl").load(out)
    rows = back.filter(back.msg_type == "RECORD").collect()
    assert len(rows) == 25
    ids = sorted(json.loads(r["record"])["id"] for r in rows)
    assert ids == list(range(25))


def test_writer_overwrite_retires_stale_part_files(spark, tmp_path):
    """mode('overwrite') must replace the directory's logical contents:
    part files from earlier saves may not stay visible (they would make
    reads return duplicates), while append keeps accumulating."""
    from pyspark.sql import functions as F

    register(spark)
    out = str(tmp_path / "log")

    def _save(lo, hi, mode):
        df = spark.range(lo, hi).select(
            F.lit("s1").alias("stream"), F.col("id")
        )
        df.write.format("singer_jsonl").mode(mode).save(out)

    _save(0, 10, "append")
    _save(10, 20, "append")
    back = spark.read.format("singer_jsonl").load(out)
    assert back.filter("msg_type = 'RECORD'").count() == 20

    _save(100, 105, "overwrite")
    back = spark.read.format("singer_jsonl").load(out)
    rows = back.filter("msg_type = 'RECORD'").collect()
    ids = sorted(json.loads(r["record"])["id"] for r in rows)
    assert ids == list(range(100, 105))  # stale files gone, no dupes


def test_writer_requires_stream_column(spark, tmp_path):
    from target_s3_parquet_spark.sources.pyds import register

    register(spark)
    with pytest.raises(Exception, match="stream"):
        spark.range(3).write.format("singer_jsonl").mode("append").save(
            str(tmp_path / "bad")
        )
