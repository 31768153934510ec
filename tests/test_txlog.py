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


def test_merge_prunes_disjoint_dirs(spark, tmp_path):
    root = str(tmp_path / "tbl")
    low = spark.range(0, 50).withColumn("v", F.col("id"))
    high = spark.range(100, 150).withColumn("v", F.col("id"))
    txlog.commit(low, root, stats_cols=["id"])
    txlog.commit(high, root, stats_cols=["id"])
    low_dir = txlog._read_manifest(root, 0)["dirs"][0]

    changes = spark.createDataFrame(
        [(120, 999, False), (130, 0, True), (200, 1, False)],
        "id long, v long, d boolean",
    )
    txlog.merge_into(spark, root, changes, key="id", delete_col="d")

    final = txlog._read_manifest(root, txlog.latest_version(root))
    # the low-range dir's [0,49] interval is disjoint from keys 120..200
    assert low_dir in final["dirs"]
    # and its stats are carried forward so the NEXT merge can prune too
    assert final["stats"][low_dir]["id"] == [0, 49]

    now = {r.id: r.v for r in txlog.read_table(spark, root).collect()}
    assert now[120] == 999 and now[200] == 1 and 130 not in now
    assert len(now) == 50 + 50 - 1 + 1


def test_merge_without_stats_rewrites_everything_correctly(spark, tmp_path):
    # dirs committed without stats_cols are conservatively rewritten
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 10).withColumn("v", F.lit(0)), root)
    changes = spark.createDataFrame([(3, 7, False)], "id long, v long, d boolean")
    txlog.merge_into(spark, root, changes, key="id", delete_col="d")
    now = {r.id: r.v for r in txlog.read_table(spark, root).collect()}
    assert now[3] == 7 and len(now) == 10


def test_commit_expected_prev_detects_conflict(spark, tmp_path):
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 5), root)
    read_v = txlog.latest_version(root)
    txlog.commit(spark.range(5, 10), root)  # rival lands first
    with pytest.raises(txlog.ConflictError):
        txlog.commit(spark.range(10, 15), root, expected_prev=read_v)
    # without expected_prev the blind-retry semantics are unchanged
    assert txlog.commit(spark.range(10, 15), root) == 2


def test_merge_retries_on_conflict_and_serializes(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 10).withColumn("v", F.lit(0)), root)

    # rival append sneaks in after the merge reads its snapshot: fire it
    # from inside the first _claim_manifest call, then let the real
    # claim see the moved version and raise ConflictError -> retry
    real_claim = txlog._claim_manifest
    fired = {"done": False}

    def racing_claim(rt, op, dirs_fn, stats_fn, expected_prev):
        if not fired["done"] and op == "merge":
            fired["done"] = True
            txlog.commit(spark.range(50, 55).withColumn("v", F.lit(9)), root)
        return real_claim(rt, op, dirs_fn, stats_fn, expected_prev)

    monkeypatch.setattr(txlog, "_claim_manifest", racing_claim)
    changes = spark.createDataFrame([(3, 7, False)], "id long, v long, d boolean")
    txlog.merge_into(spark, root, changes, key="id", delete_col="d")

    now = {r.id: r.v for r in txlog.read_table(spark, root).collect()}
    # merge retried against the post-rival snapshot: both effects present
    assert now[3] == 7 and now[50] == 9 and len(now) == 15


def test_merge_conflict_exhausts_retries(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "tbl")
    txlog.commit(spark.range(0, 5).withColumn("v", F.lit(0)), root)

    def always_conflict(rt, op, dirs_fn, stats_fn, expected_prev):
        raise txlog.ConflictError("rival")

    monkeypatch.setattr(txlog, "_claim_manifest", always_conflict)
    changes = spark.createDataFrame([(1, 2, False)], "id long, v long, d boolean")
    with pytest.raises(txlog.ConflictError):
        txlog.merge_into(spark, root, changes, key="id", delete_col="d", max_retries=1)


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


def test_optimize_compact_protocol(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for lo, hi in [(0, 5), (5, 9), (9, 12)]:
        txlog.commit(spark.range(lo, hi), root)
    import os

    assert len(txlog._read_manifest(root, 2)["dirs"]) == 3

    v = txlog.optimize_compact(spark, root, target_partitions=1, stats_cols=["id"])
    assert v == 3
    m = txlog._read_manifest(root, v)
    assert m["op"] == "optimize"
    assert len(m["dirs"]) == 1
    # logically a no-op at the new version…
    assert sorted(r.id for r in txlog.read_table(spark, root).collect()) == list(
        range(12)
    )
    # …and one compacted file inside the single dir
    files = [
        f for f in os.listdir(m["dirs"][0]) if f.endswith(".parquet")
    ]
    assert len(files) == 1
    # stats carried for merge pruning
    assert m["stats"][m["dirs"][0]]["id"] == [0, 11]
    # time travel to the fragmented version still works
    assert txlog.read_table(spark, root, version=1).count() == 9
    # serializable: a rival commit landing between optimize's snapshot
    # read and its manifest claim must conflict, not be clobbered
    import pytest as _pytest

    real_claim = txlog._claim_manifest

    def rival_then_claim(r, op, dirs_fn, stats_fn, expected_prev):
        txlog._claim_manifest = real_claim  # rival commits normally
        txlog.commit(spark.range(100, 101), r)
        return real_claim(r, op, dirs_fn, stats_fn, expected_prev)

    txlog._claim_manifest = rival_then_claim
    try:
        with _pytest.raises(txlog.ConflictError):
            txlog.optimize_compact(spark, root)
    finally:
        txlog._claim_manifest = real_claim


def test_deepen_clone_survives_source_vacuum(spark, tmp_path):
    src = str(tmp_path / "src")
    shallow = str(tmp_path / "shallow")
    deep = str(tmp_path / "deep")
    txlog.commit(spark.range(0, 40), src)
    txlog.commit(spark.range(40, 60), src)
    txlog.clone_table(src, shallow)
    txlog.clone_table(src, deep)
    v = txlog.deepen_clone(deep)
    assert v == 1  # promotion commits a new version
    assert [m["op"] for m in txlog.history(deep)][-1] == "deepen"
    # all deep-clone dirs now live under its own data root
    last = txlog._read_manifest(deep, v)
    assert all(d.startswith(os.path.join(deep, "data")) for d in last["dirs"])

    # destroy the source's pre-overwrite dirs
    txlog.commit(spark.range(0, 5), src, mode="overwrite")
    txlog.vacuum(src, retain_versions=1, retention_seconds=0)

    # un-promoted shallow clone now dangles (the documented caveat)...
    with pytest.raises(Exception):
        txlog.read_table(spark, shallow).count()
    # ...while the deepened clone still reads the full snapshot
    assert txlog.read_table(spark, deep).count() == 60
    # and deepen is idempotent once everything is local
    assert txlog.deepen_clone(deep) == v


def test_deepen_clone_remaps_stats_for_pruning(spark, tmp_path):
    src = str(tmp_path / "src")
    deep = str(tmp_path / "deep")
    txlog.commit(spark.range(0, 30).withColumnRenamed("id", "k"), src,
                 stats_cols=["k"])
    txlog.clone_table(src, deep)
    v = txlog.deepen_clone(deep)
    stats = txlog._read_manifest(deep, v).get("stats") or {}
    assert stats, "per-dir stats must survive promotion"
    assert all(
        d.startswith(os.path.join(deep, "data")) for d in stats
    ), "stats keys must be remapped to the copied dirs"
