"""NOTE: parquet-mr skips blooms on fully dictionary-encoded columns,
so the bloom column must be high-cardinality (event_id). The bloom-filter write option must actually add bloom structures to
the parquet files — otherwise `scan_parquet_bloom_point_lookup` is an
ordinary scan wearing a costume.

Neither this pyarrow nor this DuckDB exposes bloom offsets from the
footer, so the assertion is behavioral: identical sorted data written
with and without the option must differ in size by at least the bloom's
footprint (bloom bytes are the ONLY delta between the two files)."""

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _write(spark, df, path, bloom: bool):
    w = df.coalesce(1).sortWithinPartitions("event_id").write.mode(
        "overwrite"
    )
    if bloom:
        w = w.option("parquet.bloom.filter.enabled#event_id", "true").option(
            "parquet.bloom.filter.expected.ndv#event_id", "10000"
        )
    w.parquet(path)
    (f,) = glob.glob(os.path.join(path, "*.parquet"))
    return os.path.getsize(f)


def test_bloom_option_adds_bloom_bytes(spark, tmp_path):
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "user_id", F.col("value")
    )
    plain = _write(spark, e, str(tmp_path / "plain"), bloom=False)
    bloomed = _write(spark, e, str(tmp_path / "bloomed"), bloom=True)
    # A 10k-NDV bloom at default FPP is tens of KB; identical data and
    # layout otherwise, so any significant growth is the bloom.
    assert bloomed > plain + 1000, (plain, bloomed)
