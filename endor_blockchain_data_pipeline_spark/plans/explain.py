"""Plan assertions — the ".explain() and iterate" discipline as code.

The engine's scale claims are plan-shape claims: filters reach the scan,
small dims broadcast, hot paths stay in whole-stage codegen, aggregations
hash rather than sort. These helpers turn each claim into an assertable
predicate so tests fail when a refactor silently degrades the plan
(exactly how the sort-aggregate regression in the wide LWW reduce was
caught — see operators/merge.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet/JDBC scan carries ``fragment`` in its pushed or
    data filters (predicate reached the source, not a post-scan Filter)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if ("PushedFilters" in line or "DataFilters" in line) and fragment in line:
            return True
        if "FileScan" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema of the first file scan — column-pruning check."""
    for line in physical_plan(df).splitlines():
        if "ReadSchema" in line:
            return line.split("ReadSchema:", 1)[1].strip()
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def uses_hash_aggregate(df: DataFrame) -> bool:
    """True when ALL aggregates in the plan are hash-based (no sort-agg
    fallback — the string-buffer degradation this engine designs around)."""
    plan = physical_plan(df)
    return "HashAggregate" in plan and "SortAggregate" not in plan


def uses_take_ordered(df: DataFrame) -> bool:
    """True if top-k runs as TakeOrderedAndProject (per-partition heap +
    driver merge) — the scale-safe alternative to a global-window sort."""
    return "TakeOrderedAndProject" in physical_plan(df)


def global_window_over_full_input(df: DataFrame) -> bool:
    """True if an unpartitioned Window sits BELOW the top-k truncation —
    i.e. every input row shuffles into one task for a full sort. A tiny
    window above a TakeOrdered/Limit (≤ k rows) does not count."""
    plan = physical_plan(df)
    win_at = plan.find("Window")
    if win_at < 0:
        return False
    below = plan[win_at:]  # physical plans print children below the parent
    has_scan = "Scan" in below
    has_limit = any(
        op in below for op in ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")
    )
    return has_scan and not has_limit


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages ("*(n)" markers in simple mode)."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))
