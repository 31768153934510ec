"""Spark 4 Python DataSource exposing Singer JSONL logs as a native
``spark.read.format("singer_jsonl")`` source.

The reference consumes Singer messages only through stdin piping
(reference ``__init__.py:352,212-215``); this source makes the same
log format a first-class Spark table: file-per-partition parallel
scan, envelope parsing executor-side, and the normal DataFrame surface
(schema projection, filters, joins) on top. It demonstrates the
pyspark.sql.datasource API (Spark 4) — the sanctioned way to add a
custom format without a JVM connector.

Scale shape: `partitions()` returns one InputPartition per log file,
so a 100 TB log directory fans out across executors exactly like the
built-in text source; each partition streams lines (no whole-file
buffering) and Arrow-batches rows back to the JVM.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class SingerJsonlDataSource(DataSource):
    """``spark.read.format("singer_jsonl").load(dir_or_glob)``.

    Emits one row per Singer message line:
      stream STRING, msg_type STRING, record STRING (canonical JSON),
      src_file STRING.
    Non-JSON lines surface as msg_type='CORRUPT' with the raw line in
    `record` — the quarantine contract of the batch ingest pipeline
    (`sources/singer.py`), not silent drops.
    """

    @classmethod
    def name(cls) -> str:
        return "singer_jsonl"

    def schema(self) -> str:
        return (
            "stream string, msg_type string, record string, src_file string"
        )

    def reader(self, schema):  # noqa: ARG002 - fixed schema source
        return SingerJsonlReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ARG002 - fixed schema
        return SingerJsonlStreamReader(self.options)


class SingerJsonlReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("singer_jsonl requires a path")

    def _files(self) -> list[str]:
        p = self.path
        if os.path.isdir(p):
            cands = sorted(glob.glob(os.path.join(p, "*")))
        else:
            cands = sorted(glob.glob(p))
        return [
            f
            for f in cands
            if os.path.isfile(f) and not os.path.basename(f).startswith("_")
            and not os.path.basename(f).startswith(".")
        ]

    def partitions(self):
        # file-per-partition: the planner sees one task per log file
        return [InputPartition(f) for f in self._files()]

    def read(self, partition):
        yield from _parse_lines(partition.value)


def _parse_lines(path: str):
    """Shared line→row logic for the batch and stream readers."""
    base = os.path.basename(path)
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except (ValueError, TypeError):
                yield (None, "CORRUPT", line, base)
                continue
            if not isinstance(msg, dict) or msg.get("type") is None:
                yield (None, "CORRUPT", line, base)
                continue
            yield (
                msg.get("stream"),
                str(msg["type"]),
                json.dumps(msg.get("record"), sort_keys=True)
                if msg.get("record") is not None
                else None,
                base,
            )


class SingerJsonlStreamReader(SimpleDataSourceStreamReader):
    """Tail-the-log-directory streaming twin: the offset is the count
    of (sorted) files already ingested, so each micro-batch picks up
    exactly the files that appeared since the last one — the Python
    analog of the file-stream source the streaming Singer job uses,
    with replayable `readBetweenOffsets` for exactly-once recovery
    after a restart."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("singer_jsonl requires a path")

    def _files(self) -> list[str]:
        p = self.path
        cands = (
            sorted(glob.glob(os.path.join(p, "*")))
            if os.path.isdir(p)
            else sorted(glob.glob(p))
        )
        return [
            f
            for f in cands
            if os.path.isfile(f)
            and not os.path.basename(f).startswith(("_", "."))
        ]

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def read(self, start: dict):
        files = self._files()
        i = int(start.get("n_files", 0))
        rows = [r for f in files[i:] for r in _parse_lines(f)]
        return iter(rows), {"n_files": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        i, j = int(start.get("n_files", 0)), int(end.get("n_files", 0))
        return iter([r for f in files[i:j] for r in _parse_lines(f)])


def register(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(SingerJsonlDataSource)
