"""Plan-shape flag extraction shared by the catalog generator
(`tools/gen_plan_catalog.py`), the plan explainer
(`tools/explain_plans.py`), and the full-catalog regression test
(`tests/test_plans.py`) — one definition so the test asserts exactly
what the committed catalog records.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    """`explain("formatted")` captured as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def flags_for(plan: str) -> str:
    """One-line plan-shape summary: shuffle/broadcast counts, join
    strategies, pushdown, and Python-boundary markers."""
    flags = []
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    bcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
    if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
        flags.append("pushed-filters")
    if "BroadcastHashJoin" in plan:
        flags.append("bhj")
    if "SortMergeJoin" in plan:
        flags.append("smj")
    if "ShuffledHashJoin" in plan:
        flags.append("shj")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("bnlj")
    if shuffles:
        flags.append(f"shuffles={shuffles}")
    if bcasts:
        flags.append(f"bcasts={bcasts}")
    if "WholeStageCodegen" in plan:
        flags.append("codegen")
    if (
        "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "FlatMapGroupsInPandas" in plan
    ):
        flags.append("arrow-python")
    if "BatchEvalPython" in plan:
        flags.append("row-python")
    return ", ".join(flags) or "projection-only"
