"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the same settings are what we would
ship on a multi-executor cluster: AQE on (runtime join-strategy changes,
skew-join splitting, partition coalescing), shuffle partitions sized to
the parallelism at hand rather than the 200 default, Arrow enabled for
the few pandas-interop boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "etl_database_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster the ``master`` and memory settings come from the
    submitter; everything set here is cluster-safe: AQE and its skew/
    coalesce sub-features are exactly what a 1000-executor job wants.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_NO_PROGRESS"):
        # bench.py sets this: progress bars flood captured output and
        # can truncate the one JSON line the round is judged on
        builder = builder.config("spark.ui.showConsoleProgress", "false")
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", "48g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict:
    """Load the synthetic star-schema tables and register temp views.

    Returns {name: DataFrame}. Reads are lazy; Catalyst prunes columns
    and pushes filters into the Parquet scans of downstream queries.
    Every table goes through ``queries.table()`` so type quirks are
    normalized centrally (events.parquet carries TIMESTAMP(NANOS),
    which a plain ``spark.read.parquet`` cannot read on a fresh
    session — ``table()`` rebuilds it as micros).
    """
    from etl_database_spark.queries import table

    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs
