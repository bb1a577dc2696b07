"""Plan inspection: assert the physical plans we designed for.

The engine's scale claims are plan properties — filters reach the
parquet scan, dimensions broadcast, aggregates have a map-side partial
phase, codegen spans the hot path. These helpers read
``explain('formatted')`` output so tests can pin those properties and
regressions surface as test failures, not slow clusters.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """Parquet scan reports non-empty PushedFilters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema (pruning check)."""
    import re

    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [part.split(":")[0].strip() for part in m.group(1).split(",") if part.strip()]


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    """Exchange operators in the plan (AQE may collapse some at run
    time; this is the static upper bound)."""
    plan = formatted_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "reuse" not in line.lower())


def has_partial_aggregate(df: DataFrame) -> bool:
    """HashAggregate appears in partial+final pairs (map-side combine)."""
    plan = formatted_plan(df)
    return "partial_" in plan or plan.count("HashAggregate") >= 2


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (formatted explain annotates
    participating operators with ``[codegen id : N]``)."""
    import re

    plan = formatted_plan(df)
    return len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))


def has_partition_filters(df: DataFrame) -> bool:
    """Scan reports non-empty PartitionFilters (partition pruning)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PartitionFilters:" in line and "PartitionFilters: []" not in line:
            return True
    return False
