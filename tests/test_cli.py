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


def test_s3a_conf_mapping():
    """Reference s3.py:28-53 auth surface + README:87-88 encryption →
    S3A conf keys."""
    from target_s3_parquet_spark.session import s3a_conf_from_config

    p = "spark.hadoop.fs.s3a."

    conf = s3a_conf_from_config(
        {
            "aws_access_key_id": "AK",
            "aws_secret_access_key": "SK",
            "aws_session_token": "TOK",
            "aws_endpoint_url": "http://localhost:9000",
            "encryption_type": "KMS",
            "encryption_key": "1234abcd",
        }
    )
    assert conf[p + "access.key"] == "AK"
    assert conf[p + "secret.key"] == "SK"
    assert conf[p + "session.token"] == "TOK"
    assert conf[p + "aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )
    assert conf[p + "endpoint"] == "http://localhost:9000"
    assert conf[p + "path.style.access"] == "true"
    assert conf[p + "server-side-encryption-algorithm"] == "SSE-KMS"
    assert conf[p + "server-side-encryption.key"] == "1234abcd"

    # profile auth (no static keys)
    conf = s3a_conf_from_config({"aws_profile": "dev"})
    assert conf[p + "aws.credentials.provider"].endswith(
        "ProfileCredentialsProvider"
    )

    # default KMS key: algorithm set, no key id
    conf = s3a_conf_from_config({"encryption_type": "KMS"})
    assert conf[p + "server-side-encryption-algorithm"] == "SSE-KMS"
    assert p + "server-side-encryption.key" not in conf

    # unsupported type: same NotImplementedError contract as the
    # reference's upload_file
    import pytest

    with pytest.raises(NotImplementedError):
        s3a_conf_from_config({"encryption_type": "sse-c"})


def test_temp_dir_conf_mapping(tmp_path):
    """Reference README.md:91 `temp_dir` (L7) → spark.local.dir, created
    up front like the reference's makedirs(temp_dir, exist_ok=True)."""
    from target_s3_parquet_spark.session import runtime_conf_from_config

    target = tmp_path / "spool" / "deep"
    conf = runtime_conf_from_config({"temp_dir": str(target)})
    assert conf["spark.local.dir"] == str(target)
    assert target.is_dir()  # created eagerly, reference contract

    # absent key → no conf (Spark default scratch space)
    assert runtime_conf_from_config({}) == {}


def test_naming_convention_template():
    import datetime

    from target_s3_parquet_spark.sources.sink import resolve_naming_convention

    when = datetime.datetime(2026, 8, 13, 9, 30, 5, tzinfo=datetime.timezone.utc)
    assert (
        resolve_naming_convention(
            "exports/{stream}/export_date={date}/{timestamp}", "users", when
        )
        == "exports/users/export_date=2026-08-13/20260813T093005"
    )
    import pytest

    with pytest.raises(ValueError):
        resolve_naming_convention("{strem}/x", "users", when)


def test_sink_config_from_reference_keys():
    from target_s3_parquet_spark.cli import sink_config_from

    cfg = sink_config_from(
        {
            "s3_bucket": "bkt",
            "s3_key_prefix": "pre/fix",
            "compression": "gzip",  # reference alias
            "file_size": 1000,
            "naming_convention": "{stream}/{date}/{timestamp}",
            "activate_version": True,
        }
    )
    assert cfg.path == "s3a://bkt/pre/fix"
    assert cfg.compression == "gzip"
    assert cfg.max_records_per_file == 1000
    assert cfg.naming_convention == "{stream}/{date}/{timestamp}"
    assert cfg.activate_version is True


def test_naming_convention_write(spark, tmp_path):
    """The template actually routes the write (tokens -> directories)."""
    from target_s3_parquet_spark.sources.sink import (
        SinkConfig,
        run_singer_to_parquet,
    )

    log = fx.write_log(str(tmp_path), fx.three_stream_log())
    out = tmp_path / "out"
    cfg = SinkConfig(
        path=str(out), naming_convention="exports/{stream}/export_date={date}"
    )
    written, _ = run_singer_to_parquet(spark, log, cfg)
    import datetime

    today = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    assert (out / "exports" / "app-users" / f"export_date={today}").exists()
    back = spark.read.parquet(str(out / "exports" / "app-users" / f"export_date={today}"))
    assert back.count() == 3
