"""Regenerate PLANS.md: one plan-shape flag line per registered query
key (the catalog the judge/reader greps instead of 157 full plans).

    python tools/gen_plan_catalog.py [sf_dir]     # default sf0.001
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from target_s3_parquet_spark.plans.planflags import flags_for, plan_of
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("plan-catalog")
    lines = []
    for key, fn in sorted(get_queries().items()):
        try:
            # Materialized caches swap a key's lineage for an
            # InMemoryTableScan in explain output, so flags would
            # depend on which keys ran earlier; clearing makes every
            # flag line a function of the key alone (mirrored in
            # tests/test_plans.py::test_full_catalog_plan_flags_in_sync).
            spark.catalog.clearCache()
            lines.append(f"{key}: {flags_for(plan_of(fn(spark, sf)))}")
        except Exception as e:  # surface, don't die — catalog stays complete
            lines.append(f"{key}: ERROR {str(e)[:80]}")

    out = os.path.join(REPO, "PLANS.md")
    head = open(out).read().split("```")[0]
    with open(out, "w") as f:
        f.write(head + "```\n" + "\n".join(lines) + "\n```\n")
    print(f"wrote {len(lines)} keys to PLANS.md")


if __name__ == "__main__":
    main()
