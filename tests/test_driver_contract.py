"""Driver-contract simulation: the per-round harness builds its OWN
SparkSession (not our `get_spark`), so the contract must work on a
vanilla session. Run in a subprocess because a JVM in this process
would already carry our conf."""

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .appName("driver-sim").getOrCreate())

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry() returned no rows"
assert df.schema.fields, "entry() schema empty"

qs = e.queries()
oracles = e.oracle_sql()
assert set(oracles) <= set(qs), "oracle keys must be a subset of query keys"
assert len(qs) >= 100

# the historically conf-sensitive paths: nanos timestamps + tz
for key in ("sessionize_events", "join_asof", "stream_window_tumbling"):
    n = qs[key](spark, "/root/testdata/sf0.001").count()
    assert n >= 0
print("DRIVER_CONTRACT_OK", len(qs), len(oracles))
"""


def test_contract_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRIVER_CONTRACT_OK" in proc.stdout
