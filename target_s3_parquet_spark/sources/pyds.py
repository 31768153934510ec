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
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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

    def writer(self, schema, overwrite):
        return SingerJsonlWriter(self.options, schema, overwrite)


class SingerJsonlWriter(DataSourceWriter):
    """``df.write.format("singer_jsonl").save(dir)`` — the WRITE half
    of the connector: every task serializes its partition as Singer
    RECORD lines into a hidden temp file; the driver-side commit()
    renames the reported temp files into place and abort() removes
    them, so a failed/speculated task never leaves a half-written
    visible file (the same publish-by-rename contract the txlog sink
    uses). Input contract: a `stream` string column plus any other
    columns, which become the RECORD body.

    Scale shape: one output file per task, no driver data motion —
    commit handles FILE NAMES only."""

    def __init__(self, options, schema, overwrite):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("singer_jsonl writer requires a path")
        self.fields = [f.name for f in schema.fields]
        if "stream" not in self.fields:
            raise ValueError("singer_jsonl writer requires a 'stream' column")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, "." + name + ".tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                d = dict(zip(self.fields, row))
                stream = d.pop("stream")
                f.write(json.dumps(
                    {"type": "RECORD", "stream": stream, "record": d},
                    sort_keys=True, default=str,
                ) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)  # empty partition: nothing to publish
            return WriterCommitMessage()
        return _SingerCommit(tmp, name)

    def commit(self, messages):
        # Publish first, THEN retire: new part names are fresh UUIDs, so
        # publishing before deleting stale files can't collide, and a
        # concurrent reader never observes an empty directory (it sees
        # old, old+new, or new — "old+new" is the unavoidable window of
        # a non-transactional directory sink; a manifest/txlog sink is
        # the isolation upgrade, see sources/txlog.py).
        new = {m.name for m in messages if isinstance(m, _SingerCommit)}
        for m in messages:
            if isinstance(m, _SingerCommit):
                os.replace(m.tmp, os.path.join(self.path, m.name))
        if self.overwrite:
            # mode('overwrite'): retire every previously-published file
            # that is not part of this commit — otherwise stale part
            # files stay visible and reads double.
            for f in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if os.path.basename(f) not in new:
                    os.remove(f)

    def abort(self, messages):
        for m in messages:
            if isinstance(m, _SingerCommit) and os.path.exists(m.tmp):
                os.remove(m.tmp)


class _SingerCommit(WriterCommitMessage):
    def __init__(self, tmp: str, name: str):
        self.tmp = tmp
        self.name = name


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
