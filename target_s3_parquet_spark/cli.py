"""CLI entry point — EP1 parity with the reference console script
(``target-s3-parquet -c config.json``, reference ``__init__.py:334-358``
and ``setup.py:39-42``), Spark-native.

Config keys (superset of the reference's, README.md:73-91):
- ``s3_bucket``    (required, or ``output_path`` for any URI/local dir)
- ``s3_key_prefix``, ``compression_method`` (alias ``compression``),
  ``file_size``, ``streams_in_separate_folder``,
  ``add_metadata_columns``, ``compat``, ``activate_version``
- ``naming_convention``  ``{stream}/{date}/{timestamp}`` key template
  (L2; tokens become directory levels under the output root)
- AWS auth / endpoint / encryption (reference s3.py:28-53, README:87-88):
  ``aws_access_key_id``, ``aws_secret_access_key``,
  ``aws_session_token``, ``aws_profile``, ``aws_endpoint_url``,
  ``encryption_type`` ('none'|'KMS'), ``encryption_key`` — mapped to
  S3A conf by ``session.s3a_conf_from_config``
- ``input_path``   message log (default "-" = stdin, spooled to a temp
  file so Spark can parallelize the scan)

Unlike the reference, the declared compression is actually applied
(R12 bug), and state is emitted only after every stream's write
commits (R13 ordering).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def validate_config(config: dict) -> list[str]:
    """R16 (reference ``utils.py:15-27``): required-key check."""
    errors = []
    if not config.get("s3_bucket") and not config.get("output_path"):
        errors.append("Required key is missing from config: [s3_bucket]")
    return errors


def output_uri(config: dict) -> str:
    if config.get("output_path"):
        return config["output_path"]
    prefix = config.get("s3_key_prefix", "").strip("/")
    bucket = config["s3_bucket"]
    return f"s3a://{bucket}/{prefix}" if prefix else f"s3a://{bucket}"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="target-s3-parquet-spark")
    parser.add_argument("-c", "--config", required=True, help="Config file")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)

    errors = validate_config(config)
    if errors:
        print(f"Invalid configuration:\n{chr(10).join(errors)}", file=sys.stderr)
        return 1

    input_path = config.get("input_path", "-")
    if input_path == "-":
        # Spool stdin so the executors can read it (the reference's
        # stdin wrap at __init__.py:352 is inherently single-process).
        spool = tempfile.NamedTemporaryFile(
            "w", suffix=".jsonl", delete=False, encoding="utf-8"
        )
        with spool as f:
            for line in sys.stdin:
                f.write(line)
        input_path = spool.name

    from target_s3_parquet_spark.session import (
        get_spark,
        runtime_conf_from_config,
        s3a_conf_from_config,
    )
    from target_s3_parquet_spark.sources.sink import (
        emit_state,
        run_singer_to_parquet,
    )

    spark = get_spark(
        "target-s3-parquet-spark",
        extra_conf={
            **s3a_conf_from_config(config),
            **runtime_conf_from_config(config),
        },
    )
    cfg = sink_config_from(config)
    _, state = run_singer_to_parquet(
        spark,
        input_path,
        cfg,
        validate=config.get("validate", "strict"),
        add_metadata=bool(config.get("add_metadata_columns", False)),
        compat=bool(config.get("compat", False)),
    )
    emit_state(state)
    return 0


def sink_config_from(config: dict):
    """Reference config keys → SinkConfig (kept separate from main()
    so tests can assert the mapping without running a pipeline)."""
    from target_s3_parquet_spark.sources.sink import SinkConfig

    return SinkConfig(
        path=output_uri(config),
        compression=config.get(
            "compression_method", config.get("compression", "snappy")
        ),
        max_records_per_file=int(config.get("file_size", 0)) or None,
        partition_by_stream=bool(config.get("streams_in_separate_folder", True)),
        date_partition=bool(config.get("naming_convention_date_partition", False)),
        activate_version=bool(config.get("activate_version", False)),
        naming_convention=config.get("naming_convention"),
    )


if __name__ == "__main__":
    raise SystemExit(main())
