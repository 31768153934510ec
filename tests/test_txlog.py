"""Transaction-log table format: atomic versions, snapshot isolation,
time travel, overwrite semantics, and the version-collision retry."""

import json
import os

import pytest
from pyspark.sql import functions as F

from target_s3_parquet_spark.sources import txlog


def test_append_versions_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    a = spark.range(0, 100).withColumn("src", F.lit("a"))
    b = spark.range(100, 150).withColumn("src", F.lit("b"))

    v0 = txlog.commit(a, root)
    v1 = txlog.commit(b, root)
    assert (v0, v1) == (0, 1)

    assert txlog.read_table(spark, root, version=0).count() == 100
    assert txlog.read_table(spark, root, version=1).count() == 150
    assert txlog.read_table(spark, root).count() == 150  # latest


def test_overwrite_replaces_but_keeps_history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 10), root)
    txlog.commit(spark.range(0, 7), root, mode="overwrite")

    assert txlog.read_table(spark, root).count() == 7
    assert txlog.read_table(spark, root, version=0).count() == 10
    ops = [m["op"] for m in txlog.history(root)]
    assert ops == ["append", "overwrite"]


def test_version_collision_retries_not_corrupts(spark, tmp_path):
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 5), root)
    # simulate a racing writer that claimed version 1 out from under us
    rival_dir = str(tmp_path / "rival")
    spark.range(100, 103).write.parquet(rival_dir)
    os.makedirs(txlog._log_dir(root), exist_ok=True)
    rival_dirs = txlog.history(root)[0]["dirs"] + [rival_dir]
    with open(txlog._manifest_path(root, 1), "x") as f:
        json.dump({"version": 1, "op": "append", "dirs": rival_dirs}, f)

    v = txlog.commit(spark.range(5, 9), root)  # must land at 2, on top of rival
    assert v == 2
    assert txlog.read_table(spark, root).count() == 5 + 3 + 4


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        txlog.read_table(spark, str(tmp_path / "nope"))


def test_merge_into_upsert_delete_and_history(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    base = spark.range(0, 10).withColumn("v", F.col("id") * 10)
    txlog.commit(base, root)

    changes = spark.createDataFrame(
        [(3, 999, False), (20, 2000, False), (5, 0, True)], "id long, v long, d boolean"
    )
    ver = txlog.merge_into(spark, root, changes, key="id", delete_col="d")
    assert ver == 1

    now = {r.id: r.v for r in txlog.read_table(spark, root).collect()}
    assert now[3] == 999          # updated
    assert now[20] == 2000        # inserted
    assert 5 not in now           # deleted
    assert len(now) == 10         # 10 - 1 deleted + 1 inserted
    # pre-merge snapshot intact
    assert txlog.read_table(spark, root, version=0).count() == 10


def test_vacuum_retains_window(spark, tmp_path):
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 5), root)
    txlog.commit(spark.range(5, 8), root)
    txlog.commit(spark.range(0, 2), root, mode="overwrite")

    # default retention refuses young dirs (concurrent-writer guard):
    # a freshly written data dir may belong to an in-flight commit that
    # hasn't claimed its manifest yet, so nothing this young is deleted
    import os

    n_dirs = len(os.listdir(os.path.join(root, "data")))
    assert txlog.vacuum(root, retain_versions=1) == []
    assert len(os.listdir(os.path.join(root, "data"))) == n_dirs

    removed = txlog.vacuum(root, retain_versions=1, retention_seconds=0)
    assert removed  # v0/v1 dirs are unreachable from v2
    assert txlog.read_table(spark, root).count() == 2
    assert txlog.latest_version(root) == 2
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        txlog._read_manifest(root, 0)
