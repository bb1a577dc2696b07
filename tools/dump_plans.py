"""Dump `.explain("formatted")` for every bench headline query into
plans/r12/<query>_<tag>.txt — the optimization round's before/after
plan evidence. Usage:

    python tools/dump_plans.py <tag> [sf_dir] [query ...]

``tag`` is typically "before" or "after"; with no query list, all of
bench.HEADLINE is dumped. Store-serving queries build their fixture
stores on first call (same as the bench setup), so a full dump costs
roughly the bench's setup phase once per process.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]

    from bench import HEADLINE
    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)

    names = only or HEADLINE
    for name in names:
        rq = registry.get(name)
        if rq is None:
            print(f"# SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = rq.fn(spark, sf_dir)
            text = explain_formatted(df)
        except Exception as e:  # noqa: BLE001 - record the failure in place
            text = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({tag})\n")
            fh.write(text)
        print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
