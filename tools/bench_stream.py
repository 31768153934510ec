"""Streaming-ingest throughput: drive the checkpointed Singer streaming
job over a generated N-record log and report per-epoch and end-to-end
rates from the engine's own progress events.

Progress is read PULL-based from `q.recentProgress` after
`processAllAvailable()` — deliberately NOT via a Python
`StreamingQueryListener`: the JVM's async listener bus delivers
callbacks into the py4j callback server on its own thread, and a
callback racing interpreter shutdown emits a `Py4JNetworkException`
traceback that can clobber the caller's JSON-line-is-last-stdout-line
contract (this lost the round-5 bench artifact). `recentProgress`
carries the same engine-side numbers with no Python callback channel.

    python tools/bench_stream.py [n_records] [n_files]   # 200_000, 8

`run_stream(spark, n, n_files)` is the embeddable form `bench.py` folds
into the per-round bench JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCHEMA = {
    "type": ["null", "object"],
    "properties": {
        "id": {"type": ["null", "integer"]},
        "status": {"type": ["null", "string"]},
        "amounts": {
            "type": ["null", "object"],
            "properties": {"price": {"type": ["null", "number"]}},
        },
    },
}


def run_stream(spark, n: int = 200_000, n_files: int = 8) -> dict:
    """Generate an n-record Singer log split over n_files, ingest it
    through the checkpointed streaming job (1 file per trigger), and
    return end-to-end + per-epoch throughput pulled from the engine's
    `recentProgress` ring (no Python listener — see module docstring)."""
    from pyspark.sql import functions as F

    from target_s3_parquet_spark.sources.singer import StreamPlan
    from target_s3_parquet_spark.streaming.singer_stream import SingerStreamJob

    tmp = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        log_dir = os.path.join(tmp, "log")
        os.makedirs(log_dir)
        with open(os.path.join(log_dir, "000_schema.jsonl"), "w") as f:
            f.write(
                json.dumps(
                    {
                        "type": "SCHEMA",
                        "stream": "orders",
                        "schema": SCHEMA,
                        "key_properties": ["id"],
                    }
                )
                + "\n"
            )
        record = F.struct(
            F.col("id").alias("id"),
            (F.col("id") % 3).cast("string").alias("status"),
            F.struct((F.col("id") * 1.5).alias("price")).alias("amounts"),
        )
        lines = spark.range(n).select(
            F.to_json(
                F.struct(
                    F.lit("RECORD").alias("type"),
                    F.lit("orders").alias("stream"),
                    record.alias("record"),
                )
            ).alias("value"),
            (F.col("id") % n_files).alias("f"),
        )
        for i in range(n_files):
            lines.filter(F.col("f") == i).select("value").coalesce(1).write.mode(
                "append"
            ).text(os.path.join(log_dir, f"records_{i}"))

        job = SingerStreamJob(
            plans={"orders": StreamPlan("orders", SCHEMA)},
            output_path=os.path.join(tmp, "out"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
        )
        t0 = time.time()
        q = job.start(spark, os.path.join(log_dir, "*"), max_files_per_trigger=1)
        try:
            q.processAllAvailable()
            # Pull progress BEFORE stop: recentProgress is the engine's
            # own per-epoch record (same numbers the listener carried),
            # read synchronously on this thread — no callback server.
            raw = q.recentProgress
        finally:
            q.stop()
        wall = time.time() - t0
        out_rows = spark.read.parquet(os.path.join(tmp, "out")).count()
        assert out_rows == n, f"{out_rows} != {n}"
        epochs = []
        for p in raw:
            if isinstance(p, dict):  # PySpark returns parsed JSON dicts
                rows = p.get("numInputRows")
                dur = (p.get("durationMs") or {}).get("triggerExecution")
            else:  # StreamingQueryProgress object (newer API surface)
                rows = p.numInputRows
                dur = p.durationMs.get("triggerExecution")
            if rows:
                epochs.append({"rows": rows, "duration_ms": dur})
        return {
            "metric": "singer_stream_throughput",
            "value": round(n / wall, 1),
            "unit": "records/sec",
            "records": n,
            "wall_sec": round(wall, 2),
            "epochs": len(epochs),
            "epoch_rows": [e["rows"] for e in epochs],
            "epoch_ms": [e["duration_ms"] for e in epochs],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("bench_stream")
    print(json.dumps(run_stream(spark, n, n_files)))


if __name__ == "__main__":
    main()
