"""Targeted per-query timing for the optimization loop: same
methodology as bench.py's measured loop (count best-of-N + value-
forced best-of-N, cold cache between runs) plus the CPU calibration
probe, so a pair of runs taken minutes apart can be compared with the
host state on the record. Usage:

    python tools/time_queries.py [sf_dir] query [query ...]

Env: SPARK_GRAFT_TQ_REPEATS (default 5), SPARK_GRAFT_TQ_FORCED (2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from pyspark.sql import functions as F

    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def calibrate() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            (
                spark.range(0, 500_000_000, 1, 32)
                .select(
                    F.sum(
                        F.xxhash64(F.col("id"), F.col("id") * 31, F.col("id") + 7).cast(
                            "double"
                        )
                    ).alias("h")
                )
                .collect()
            )
            best = min(best, time.time() - t0)
        return round(best, 3)

    repeats = max(int(os.environ.get("SPARK_GRAFT_TQ_REPEATS", "5")), 1)
    forced_repeats = max(int(os.environ.get("SPARK_GRAFT_TQ_FORCED", "2")), 0)

    # warm the plan shapes at the smallest SF first (C2 JIT), same as bench
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        for name in names:
            rq = registry.get(name)
            if rq is not None:
                try:
                    rq.fn(spark, warm_dir).count()
                except Exception:
                    pass
        spark.catalog.clearCache()

    out = {"sf_dir": sf_dir, "calibration_sec": calibrate(), "queries": {}}
    for name in names:
        rq = registry.get(name)
        if rq is None:
            out["queries"][name] = None
            continue
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            df = rq.fn(spark, sf_dir)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        fruns = []
        for _ in range(forced_repeats):
            t0 = time.time()
            df = rq.fn(spark, sf_dir)
            df.agg(
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns]).cast("double"))
            ).collect()
            fruns.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out["queries"][name] = {
            "best": min(runs),
            "runs": runs,
            "forced_best": min(fruns) if fruns else None,
            "forced_runs": fruns,
            "rows": n,
        }
        print(f"# {name}: best {min(runs):.2f}s runs={runs} forced={fruns}", file=sys.stderr)
    out["calibration_sec_end"] = calibrate()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
