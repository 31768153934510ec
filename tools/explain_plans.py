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
        # One-line plan health summary per key.
        flags = []
        if "BroadcastHashJoin" in plan:
            flags.append("broadcast-join")
        if "SortMergeJoin" in plan:
            flags.append("sort-merge-join")
        if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
            flags.append("pushed-filters")
        if "WholeStageCodegen" in plan:
            flags.append("codegen")
        import re

        # formatted mode prints the operator name bare ("(4) Exchange")
        # with the partitioning down in its Arguments block
        shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
        bcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
        if shuffles:
            flags.append(f"shuffles={shuffles}")
        if bcasts:
            flags.append(f"bcasts={bcasts}")
        print(f"--> {key}: {', '.join(flags) or 'plain'}")


if __name__ == "__main__":
    main()
