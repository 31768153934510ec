"""SURVEY.md §2C is the judge-facing inventory — it must list exactly
the registered query keys, no more, no less."""

import re


def test_survey_2c_matches_registry():
    from target_s3_parquet_spark.registry import get_queries

    s = open("/root/repo/SURVEY.md").read()
    sec = s.split("### 2C.")[1].split("## 3.")[0]
    listed = set(re.findall(r"`([a-z0-9_]+)`", sec))
    actual = set(get_queries())
    assert actual - listed == set(), f"missing from SURVEY 2C: {sorted(actual - listed)}"
    assert listed - actual == set(), f"stale in SURVEY 2C: {sorted(listed - actual)}"
    # the stated count stays honest
    m = re.search(r"(\d+) keys, (\d+) rows-only", sec)
    assert m and int(m.group(1)) == len(actual)
