"""EP1 CLI conformance: config validation gate + end-to-end run with
state on stdout (reference __init__.py:334-358 semantics)."""

import json
import subprocess
import sys

from tests import singer_fixtures as fx


def test_missing_bucket_exits_1(tmp_path):
    cfg = tmp_path / "config.json"
    cfg.write_text("{}")
    r = subprocess.run(
        [sys.executable, "-m", "target_s3_parquet_spark.cli", "-c", str(cfg)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 1
    assert "s3_bucket" in r.stderr


def test_end_to_end_emits_state_last(tmp_path):
    log = fx.write_log(str(tmp_path), fx.three_stream_log())
    out = tmp_path / "out"
    cfg = tmp_path / "config.json"
    cfg.write_text(
        json.dumps(
            {
                "output_path": str(out),
                "input_path": log,
                "compression_method": "zstd",
                "file_size": 100,
            }
        )
    )
    r = subprocess.run(
        [sys.executable, "-m", "target_s3_parquet_spark.cli", "-c", str(cfg)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # R13: final state (and only the final state) on stdout, emitted
    # after writes complete
    state = json.loads(r.stdout.strip().splitlines()[-1])
    assert state["bookmarks"]["app-users"]["id"] == 3
    assert (out / "stream=app-users").exists()
