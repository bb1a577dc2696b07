"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``etl_database_spark.queries`` (a registry mapping
name → (callable, oracle SQL)); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (snapshot change detection — the reference's
    f_get_event_changes re-expressed) on /root/testdata/sf0.001."""
    from etl_database_spark.queries import load_all

    registry = load_all()
    return registry["event_changes"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_database_spark.queries import load_all

    return {name: rq.fn for name, rq in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    hash-family ops that SQL cannot reproduce — driver records a
    rows-only check for those; they are property-tested in tests/)."""
    from etl_database_spark.queries import load_all

    return {name: rq.oracle for name, rq in load_all().items() if rq.oracle is not None}
