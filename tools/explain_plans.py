"""Dump `explain("formatted")` for registered query keys — the plan
review loop: after a query is correct, inspect its physical plan for
broadcasts, pushed filters, pruned read schemas, and codegen spans.

    python tools/explain_plans.py [sf_dir] [key ...]   # default: headline set
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    keys = args[1:] if args and os.path.isdir(args[0]) else args

    from bench import HEADLINE
    from target_s3_parquet_spark.registry import get_queries
    from target_s3_parquet_spark.session import get_spark

    spark = get_spark("explain")
    queries = get_queries()
    for key in keys or HEADLINE:
        df = queries[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"\n{'=' * 72}\n{key}\n{'=' * 72}\n{plan}")
        from target_s3_parquet_spark.plans.planflags import flags_for

        print(f"--> {key}: {flags_for(plan)}")


if __name__ == "__main__":
    main()
