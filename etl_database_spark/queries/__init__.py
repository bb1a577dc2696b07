"""Named-query registry.

Every operator from SURVEY.md section 2 (and the scale extensions) is
exposed as a named query: a callable ``(spark, sf_dir) -> DataFrame``
plus, when SQL-expressible, an ANSI-SQL oracle string DuckDB can run on
the same parquet tables. The driver harness compares the two at sf0.01
(row count + schema + order-insensitive value hash), so the Spark code
and the oracle alias every computed column to the same name.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RegisteredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn):
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Column pruning / predicate pushdown is
    handled by Catalyst on top of this parquet scan.

    The ``events`` table carries TIMESTAMP(NANOS) which Spark's parquet
    reader rejects by default; we read nanos as long (a JVM-side scan
    option, still vectorized) and rebuild a microsecond timestamp —
    no driver-side materialization, works at any scale.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        # Left enabled for the session: execution re-reads the conf, and
        # it only affects NANOS columns (none elsewhere in the schema).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # Integer division — ns values exceed double's 2^53 mantissa,
            # so a float path would corrupt timestamps.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all() -> dict[str, RegisteredQuery]:
    """Import all query modules (populating REGISTRY) and return it."""
    from etl_database_spark.queries import (  # noqa: F401
        event_changes,
        llmdata,
        relational,
    )

    return REGISTRY
