"""Transaction-log table format over plain parquet — the lakehouse
commit protocol (Delta/Iceberg-shaped) implemented against the public
filesystem API, since no lakehouse jars ship in this container.

Layout:

    table_root/
      _txlog/00000000.json     one manifest per committed version:
      _txlog/00000001.json       {"version": n, "op": ..., "dirs": [...]}
      data/v0-<op>/...parquet   each commit's files live in their own dir

Protocol properties:
- **Atomic commits.** A version exists iff its manifest file exists;
  manifests are created with O_EXCL (`open(..., "x")`), so two writers
  racing for version n — one wins, the loser retries at n+1 after
  re-reading state (optimistic concurrency, same contract as Delta's
  log store). Data files written before the manifest are invisible
  until it lands — readers never see partial commits.
- **Snapshot isolation / time travel.** A manifest lists every live
  data dir for its version; `read_table(version=k)` plans only those
  dirs, so concurrent appends never tear a running query.
- **Append vs overwrite.** Append manifests extend the previous
  version's dir list; overwrite manifests replace it (old dirs stay on
  disk for time travel until a vacuum).

At 100 TB the same protocol holds: manifests are O(files) JSON on the
same object store, and the only serialization point is the manifest
PUT-if-absent (S3 conditional put / a DynamoDB-style log store).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_LOG = "_txlog"


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def latest_version(root: str) -> int | None:
    """Highest committed version, or None for an empty table."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return None
    versions = [
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(versions) if versions else None


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def commit(df: DataFrame, root: str, mode: str = "append") -> int:
    """Write ``df`` as a new table version; returns the version number.

    Data lands first (invisible — no manifest yet), then the manifest
    is claimed with an exclusive create. On a version collision the
    claim retries against the refreshed latest version; the data files
    are version-agnostic so no rewrite is needed.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_dir(root), exist_ok=True)

    attempt = (latest_version(root) + 1) if latest_version(root) is not None else 0
    data_dir = os.path.join(root, "data", f"v{attempt}-{mode}-{os.getpid()}")
    df.write.mode("error").parquet(data_dir)

    while True:
        prev = latest_version(root)
        version = (prev + 1) if prev is not None else 0
        if mode == "append" and prev is not None:
            dirs = _read_manifest(root, prev)["dirs"] + [data_dir]
        else:
            dirs = [data_dir]
        manifest = {"version": version, "op": mode, "dirs": dirs}
        try:
            with open(_manifest_path(root, version), "x") as f:
                json.dump(manifest, f)
            return version
        except FileExistsError:
            # lost the race — another writer claimed this version;
            # recompute against the new latest and try the next slot
            continue


def read_table(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read of the table at ``version`` (default: latest)."""
    v = latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {root}")
    manifest = _read_manifest(root, v)
    return spark.read.parquet(*manifest["dirs"])


def history(root: str) -> list[dict]:
    """All manifests, oldest first (the audit log)."""
    last = latest_version(root)
    if last is None:
        return []
    return [_read_manifest(root, v) for v in range(last + 1)]


def merge_into(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> int:
    """MERGE: apply a change batch to the latest snapshot and commit
    the result as a new overwrite version (rewrite-on-merge — the
    simplest correct strategy; file-level pruning of untouched
    partitions is the optimization on top). Matched keys take the
    change row (upsert); unmatched change rows insert; change rows
    with ``delete_col`` true delete. Old versions remain time-travelable.
    """
    from pyspark.sql import functions as F

    snapshot = read_table(spark, root)
    c = changes
    if delete_col is None:
        c = c.withColumn("__del", F.lit(False))
        delete_col = "__del"
    survivors = snapshot.join(c.select(key), key, "left_anti")
    upserts = c.filter(~F.col(delete_col)).drop(delete_col)
    merged = survivors.unionByName(upserts)
    return commit(merged, root, mode="overwrite")


def vacuum(
    root: str, retain_versions: int = 1, retention_seconds: float = 3600.0
) -> list[str]:
    """Delete data dirs unreachable from the newest ``retain_versions``
    manifests (and drop the older manifests). Returns removed dirs.
    After a vacuum, time travel only reaches the retained window —
    the Delta-style retention contract.

    ``retention_seconds`` guards concurrent writers: ``commit()`` writes
    its data dir BEFORE claiming a manifest, so an unreferenced dir may
    belong to an in-flight commit. Dirs younger than the threshold are
    skipped (mirroring Delta's vacuum retention check); pass 0 only when
    the caller is provably the single writer."""
    import shutil
    import time

    last = latest_version(root)
    if last is None:
        return []
    keep_from = max(0, last - retain_versions + 1)
    live: set[str] = set()
    for v in range(keep_from, last + 1):
        live.update(_read_manifest(root, v)["dirs"])
    removed = []
    now = time.time()
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, d)
            if full in live:
                continue
            if now - os.path.getmtime(full) < retention_seconds:
                continue  # possibly an in-flight commit's dir
            shutil.rmtree(full)
            removed.append(full)
    for v in range(0, keep_from):
        mp = _manifest_path(root, v)
        if os.path.exists(mp):
            os.remove(mp)
    return removed


# -- registered query key -----------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from target_s3_parquet_spark.operators._util import t  # noqa: E402
from target_s3_parquet_spark.registry import query  # noqa: E402


@query(
    "txlog_time_travel",
    """
    SELECT 0 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey < 5000
    UNION ALL
    SELECT 1, COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 2, COUNT(*),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
    FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def txlog_time_travel(spark, sf_dir):
    """Time travel through the transaction log: three commits (append,
    append, overwrite) then a snapshot read of EVERY version — each
    version's stats must equal the batch recomputation of what the
    table contained at that commit, which is exactly the snapshot-
    isolation guarantee. Demonstrates the commit protocol end-to-end:
    invisible-until-manifest data files, version pinning, overwrite
    preserving history."""
    import shutil
    import tempfile

    o = t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="txlog_")
    try:
        root = f"{tmp}/orders_tbl"
        commit(o.filter(F.col("o_orderkey") < 5000), root)
        commit(o.filter(F.col("o_orderkey") >= 5000), root)
        commit(o.filter(F.col("o_orderkey") % 3 == 0), root, mode="overwrite")

        parts = []
        for v in range(3):
            snap = read_table(spark, root, version=v)
            parts.append(
                snap.agg(
                    F.lit(v).alias("version"),
                    F.count("*").alias("n_rows"),
                    F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
                    .cast("double")
                    .alias("total"),
                )
            )
        out = parts[0].unionAll(parts[1]).unionAll(parts[2])
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
