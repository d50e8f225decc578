"""Physical-plan inspection helpers — the engine's "is this the plan
I'd want at 100 TB?" checks, usable in tests and ad-hoc tuning.

These assert the properties that matter at scale:
- scans prune columns (ReadSchema) and push filters (PushedFilters);
- small sides broadcast (BroadcastHashJoin, never SortMergeJoin for
  the dictionary/query sides);
- expressions stay inside WholeStageCodegen spans.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame, expect: bool = True) -> str:
    plan = formatted_plan(df)
    has = "BroadcastHashJoin" in plan
    assert has == expect, f"BroadcastHashJoin {'missing' if expect else 'present'}:\n{plan}"
    return plan


def assert_no_sort_merge_join(df: DataFrame) -> str:
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin:\n{plan}"
    return plan


def assert_pushed_filter(df: DataFrame, fragment: str) -> str:
    """Assert a filter reached the parquet scan (PushedFilters line)."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter '{fragment}' not pushed; PushedFilters lines: {pushed}\n{plan}"
    )
    return plan


def assert_read_schema_only(df: DataFrame, allowed_cols: set[str]) -> str:
    """Assert column pruning: every ReadSchema field ⊆ allowed_cols."""
    import re

    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            cols = set(re.findall(r"(\w+):", ln.split("ReadSchema")[1]))
            extra = cols - allowed_cols
            assert not extra, f"scan reads unneeded columns {extra}:\n{ln}"
    return plan


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen regions (formatted mode
    tags operators with ``[codegen id : N]``)."""
    import re

    plan = formatted_plan(df)
    return len(set(re.findall(r"codegen id : (\d+)", plan)))
