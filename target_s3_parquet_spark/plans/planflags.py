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
    if _has_global_window(plan):
        flags.append("global-window")
    return ", ".join(flags) or "projection-only"


def _top_level_groups(s: str) -> list:
    """Top-level [...] group contents in a formatted-plan Arguments line."""
    depth = 0
    groups = []
    start = 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def _has_global_window(plan: str) -> bool:
    """True if any Window node in the formatted plan has an EMPTY
    partition spec but a non-empty ORDER spec — the shape that sorts
    its whole input into ONE task. Detail formats:
    ``[exprs], [part cols], [order]`` (both), ``[exprs], [part cols]``
    (partition-only — fine, hash-parallel), ``[exprs], [col ASC ...]``
    (global order — flags). The 2-group forms are disambiguated by the
    ASC/DESC sort tokens only an order spec carries.
    Bounded-by-construction global windows (e.g. the num-partitions-row
    offsets table in `two_phase_rank`) still flag — the catalog lint
    whitelists those keys with the reason, so any NEW unpartitioned
    window is an explicit decision, not an accident."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        # exactly "Window" — WindowGroupLimit has a different Arguments
        # layout (partition spec first) and always accompanies the
        # Window node it limits, so checking it would double-count
        if re.match(r"^\(\d+\) Window$", line.strip()):
            for j in range(i + 1, min(i + 6, len(lines))):
                if lines[j].startswith("Arguments: "):
                    groups = _top_level_groups(lines[j])
                    if len(groups) == 2 and re.search(
                        r"\b(ASC|DESC)\b", groups[1]
                    ):
                        return True
                    break
    return False
