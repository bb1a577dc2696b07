"""Event-sequence analytics: funnel, cohort retention, RFM segments,
SCD2 historization, and incremental-rollup serving.

The reference system's event reporting stops at flat aggregates
(value_counts / grouped min-max over `tblsequenceorder`-style event
streams — xnlou/etl-database `storedprocs.sql` report procs); a user
replacing it with this engine also expects the standard behavioral
analytics a warehouse bolts on top of an event table. These queries
add them over the synthetic `events` table, each with a DuckDB oracle:

- **Ordered funnel** (signup → click → purchase, strictly increasing
  event time per user): three chained window MINs over ONE user_id
  partitioning — one events scan, one shuffle. At 100 TB the state
  per user is one timestamp per stage (bounded), never the user's
  full event list.
- **Cohort retention**: day-grain first-touch cohort × activity-day
  offset (D-N retention). Two aggregates on `user_id` / (user, day)
  then one join back on `user_id`; offsets are DATE subtraction so
  both engines bucket identically.
- **RFM segmentation**: per-user recency/frequency/monetary quartiles
  via ntile(4). Monetary sums go through the DECIMAL(18,6) pattern
  (see queries/relational.py module doc) so quartile boundaries are
  bit-identical across engines; every ntile ORDER BY carries user_id
  as the unique tie-break.
- **SCD2 intervals**: historize a status stream into validity
  intervals (LAG collapse + LEAD close over the same partitioning).
- **Rollup serving**: the incremental RollupStore
  (operators/rollup.py) served against a full-recompute oracle.

Scale notes: all keys here shuffle on `user_id` (high-cardinality,
well-distributed in real event data — the skew levers in
operators/skew.py apply if one user dominates). The ntile windows are
global single-partition by construction (ntile needs a total order);
at 100 TB the *input* to ntile is the per-user aggregate (one row per
user), not raw events, and a quantile-bucket rewrite over
approx_percentile boundaries is the documented escape hatch if even
that is too large for one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_database_spark.queries import register, table

# Deterministic double-sum pattern — see queries/relational.py module doc.
DEC = "decimal(18,6)"


# ---------------------------------------------------------------------------
# Ordered funnel: users who signed up, then clicked AFTER signing up,
# then purchased AFTER that first qualifying click. Each stage is a
# per-user MIN over a filtered event slice joined to the previous
# stage's timestamp — the classic "chained conditional min" funnel.
@register(
    "event_funnel_counts",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, users FROM (
      SELECT '1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM s
      UNION ALL
      SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ) ORDER BY stage
    """,
)
def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel: per-stage user counts with strict
    event-time ordering between stages.

    Single-pass shape: the three per-user stage timestamps are chained
    window MINs over ONE partitioning (user_id), so the whole funnel
    costs one events scan + one shuffle — a naive chained-aggregate
    union would re-scan events and recompute the signup aggregate in
    every union branch (it audited at 22 exchanges; this is 3)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    staged = (
        ev.withColumn("s_ts", F.min(F.when(is_type("signup"), F.col("ts"))).over(w))
        .withColumn(
            "c_ts",
            F.min(
                F.when(is_type("click") & (F.col("ts") > F.col("s_ts")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(is_type("purchase") & (F.col("ts") > F.col("c_ts")), F.col("ts"))
            ).over(w),
        )
    )
    counts = staged.agg(
        *[
            F.count_distinct(F.when(F.col(c).isNotNull(), F.col("user_id")))
            .cast("long")
            .alias(a)
            for c, a in (("s_ts", "n1"), ("c_ts", "n2"), ("p_ts", "n3"))
        ]
    )
    return counts.select(
        F.expr(
            "stack(3, '1_signup', n1, '2_click', n2, '3_purchase', n3)"
            " AS (stage, users)"
        )
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# Cohort retention: first-touch day cohort x integer day offset (the
# classic "D-N retention" triangle; the fixture's events span ~1 month
# so day grain is the one that produces a non-degenerate triangle).
# Offsets are DATE subtraction — integral in both engines.
@register(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
    )
    SELECT f.cohort_day,
           CAST(a.act_day - f.cohort_day AS INT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users
    FROM first f JOIN act a ON f.user_id = a.user_id
    GROUP BY 1, 2
    ORDER BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: distinct active users per
    (first-touch day, day offset).

    One scan: distinct (user, day) pairs, then the cohort day as a
    window MIN per user — no self-join of two aggregated branches
    (which would re-scan events per branch)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("act_day")
    )
    act = ev.distinct().withColumn(
        "cohort_day", F.min("act_day").over(W.partitionBy("user_id"))
    )
    return (
        act.groupBy(
            "cohort_day",
            F.datediff("act_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# RFM segmentation: quartile-code users on Recency (days from last
# purchase to corpus max day), Frequency (purchase count) and Monetary
# (decimal-exact purchase value sum), then count users per RFM cell.
# Every ntile ORDER BY ends in user_id so quartile assignment is a
# total order in both engines.
@register(
    "rfm_segment_counts",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events),
    per_user AS (
      SELECT user_id,
             CAST(mx.max_d - MAX(CAST(ts AS DATE)) AS INT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
      FROM events, mx
      WHERE event_type = 'purchase'
      GROUP BY user_id, mx.max_d
    ),
    scored AS (
      SELECT user_id,
             NTILE(4) OVER (ORDER BY recency_days, user_id) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f,
             NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m
      FROM per_user
    )
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM scored GROUP BY r, f, m
    ORDER BY r, f, m
    """,
)
def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile RFM cells over purchase events with user counts."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    max_d = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    per_user = (
        ev.crossJoin(F.broadcast(max_d))  # 1-row scalar frame: safe hint
        .groupBy("user_id", "max_d")
        .agg(
            F.max(F.to_date("ts")).alias("last_d"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("monetary"),
        )
        .select(
            "user_id",
            F.datediff("max_d", "last_d").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # Three exact distributed ntiles (partition-offset rank over the
    # per-user aggregate — functions/rank.py): identical results to
    # the global NTILE windows, but each quartile pass range-shuffles
    # the entity frame instead of sorting it on one partition.
    from etl_database_spark.functions.rank import exact_ntile

    scored = exact_ntile(per_user, 4, [F.asc("recency_days"), F.asc("user_id")], "r")
    scored = exact_ntile(scored, 4, [F.desc("frequency"), F.asc("user_id")], "f")
    scored = exact_ntile(scored, 4, [F.desc("monetary"), F.asc("user_id")], "m")
    scored = scored.select("user_id", "r", "f", "m")
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count("*").cast("long").alias("users"))
        .orderBy("r", "f", "m")
    )


# ---------------------------------------------------------------------------
# Incremental rollup serving (operators/rollup.RollupStore): the
# registered query builds the store from the events table in two
# batches (split mid-month, the realistic daily-ingest shape),
# compacts the first, then serves — and the oracle recomputes the same
# aggregate DIRECTLY from raw events. Green here proves
# incremental-partial-merge == full recompute, cross-engine.
_ROLLUP_CACHE: dict = {}


def _rollup_store(spark: SparkSession, sf_dir: str):
    import os

    src = os.path.join(sf_dir, "events.parquet")
    key = (sf_dir, os.path.getmtime(src) if os.path.exists(src) else None)
    if key not in _ROLLUP_CACHE:
        import shutil
        import tempfile

        from etl_database_spark.operators.rollup import RollupStore

        for old_key in [k for k in _ROLLUP_CACHE if k[0] == sf_dir and k != key]:
            old = _ROLLUP_CACHE.pop(old_key)
            shutil.rmtree(old.path, ignore_errors=True)
        ev = table(spark, sf_dir, "events")
        store = RollupStore(
            spark,
            tempfile.mkdtemp(prefix="spark_graft_rollup_"),
            distinct_col="user_id",
            quantile_spec=("value", 0.0, 500.0, 256),
        )
        early = ev.where(F.dayofmonth("ts") <= 15)
        late = ev.where(F.dayofmonth("ts") > 15)
        store.ingest(early, batch="first_half")
        store.compact()
        store.ingest(late, batch="second_half")
        # replay of a compacted batch must stay a no-op (exercised in
        # the serving path on purpose: correctness depends on it).
        # Explicit raise, not assert — asserts vanish under python -O.
        if store.ingest(early, batch="first_half") is not False:
            raise RuntimeError(
                "rollup store re-ingested an already-compacted batch; "
                "served aggregates would double-count first_half"
            )
        import atexit

        atexit.register(shutil.rmtree, store.path, ignore_errors=True)
        _ROLLUP_CACHE[key] = store
    return _ROLLUP_CACHE[key]


@register(
    "rollup_daily_event_stats",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def rollup_daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the incrementally-maintained day/type rollup; must equal a
    full recompute over raw events (the oracle)."""
    return _rollup_store(spark, sf_dir).serve()


# ---------------------------------------------------------------------------
# SCD2 interval building: turn a per-user status-change event stream
# into validity-interval rows (valid_from / valid_to / is_current) —
# the type-2 slowly-changing-dimension shape. The reference's
# single-active snapshot trigger (registry.py, SURVEY W2) is the SCD1
# "latest wins" form; this is its historizing counterpart. One shuffle
# on user_id serves both window passes (consecutive-duplicate collapse
# via LAG, interval end via LEAD). valid_to is null-free by contract
# (engines render null dates differently): open intervals close at the
# corpus max timestamp, carried on a broadcast 1-row frame.
@register(
    "event_scd2_intervals",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
    changes AS (
      SELECT user_id, event_type AS status, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_status
      FROM events
    ),
    transitions AS (
      SELECT user_id, status, ts, event_id
      FROM changes
      WHERE prev_status IS NULL OR status <> prev_status
    )
    SELECT t.user_id, t.status,
           t.ts AS valid_from,
           COALESCE(LEAD(t.ts) OVER (PARTITION BY t.user_id
                                     ORDER BY t.ts, t.event_id),
                    mx.max_ts) AS valid_to,
           CAST(CASE WHEN LEAD(t.ts) OVER (PARTITION BY t.user_id
                                           ORDER BY t.ts, t.event_id)
                     IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
    FROM transitions t, mx
    ORDER BY user_id, valid_from, status
    """,
)
def event_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historize a status stream into SCD2 validity intervals:
    collapse consecutive repeats (LAG), close each interval at the
    next transition (LEAD), open intervals end at the corpus max."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("status"), "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        ev.withColumn("prev_status", F.lag("status").over(w))
        .where(F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status")))
        .drop("prev_status")
    )
    mx = ev.agg(F.max("ts").alias("max_ts"))
    nxt = F.lead("ts").over(w)
    return (
        transitions.withColumn("next_ts", nxt)
        .crossJoin(F.broadcast(mx))  # 1-row scalar frame: safe hint
        .select(
            "user_id",
            "status",
            F.col("ts").alias("valid_from"),
            F.coalesce("next_ts", "max_ts").alias("valid_to"),
            F.col("next_ts").isNull().cast("int").alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "status")
    )


# ---------------------------------------------------------------------------
# Approximate distinct users per day from mergeable HLL sketch rows
# (functions/hll.py). Rows-only: the sketch hash (xxhash64) has no
# DuckDB twin; accuracy vs exact COUNT(DISTINCT) is property-tested in
# tests/test_hll.py. The sketch form is the point: registers merge by
# MAX, so this exact query can be served incrementally from a
# batch-partitioned partial store (the rollup pattern) at 100 TB.
@register("daily_unique_users_hll")
def daily_unique_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day approximate distinct user counts (HLL p=12, σ≈1.6%)."""
    from etl_database_spark.functions.hll import hll_estimate, hll_partials

    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return hll_estimate(hll_partials(ev, "user_id", ["day"]), ["day"])


# ---------------------------------------------------------------------------
# Streaming rollup, end to end: the events table is delivered in two
# micro-batches (event_id parity split), drained through the
# checkpoint-bound store (streaming/rollup.py), and SERVED — and
# because serving is deterministic, this registry entry carries the
# same full-recompute oracle as the batch rollup: DuckDB hash-verifies
# the STREAMED result, not just a batch twin. The streaming machinery
# itself (foreachBatch, checkpoint binding, replay no-ops) is covered
# in tests/test_rollup.py.
@register(
    "streaming_rollup_daily_stats",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def streaming_rollup_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the rollup maintained by a two-micro-batch stream; must
    equal the raw-events full recompute (the oracle)."""
    import os
    import shutil
    import tempfile

    from etl_database_spark.streaming.rollup import run_rollup_once

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="spark_graft_stream_ru_")
    src = os.path.join(work, "src")
    store_path = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    try:
        ev.where(F.col("event_id") % 2 == 0).write.parquet(src)
        run_rollup_once(
            spark, spark.readStream.schema(ev.schema).parquet(src), store_path, ckpt
        )
        ev.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
        store = run_rollup_once(
            spark, spark.readStream.schema(ev.schema).parquet(src), store_path, ckpt
        )
        # materialize before the temp store directory disappears
        out = store.serve().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles (functions/histogram.py): estimate
# event-value quantiles from fixed-bound [0, 500) equi-width counters
# instead of a holistic sort. Every step — bucket floor, cumulative
# window, linear interpolation — is deterministic double/int
# arithmetic, so unlike the engine-native percentile sketches this
# approximate operator IS oracle-checked bit-for-bit: DuckDB runs the
# same counter math.
@register(
    "event_value_quantile_histogram",
    oracle="""
    WITH hist AS (
      SELECT CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 1.953125), 0), 255) AS INT)
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket) AS cum,
             SUM(cnt) OVER () AS n
      FROM hist
    ),
    qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
    hit AS (
      SELECT q, bucket, cnt, cum, n,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY bucket) AS rn
      FROM qs JOIN cum ON cum >= q * n
    )
    SELECT q,
           CAST(ROUND(0.0 + (bucket + (q * n - (cum - cnt)) / cnt) * 1.953125, 6)
                AS DOUBLE) AS est
    FROM hit WHERE rn = 1
    ORDER BY q
    """,
)
def event_value_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value from 256 mergeable counters over
    [0, 500) — bucket width 500/256 = 1.953125."""
    from etl_database_spark.functions.histogram import (
        histogram_partials,
        histogram_quantiles,
    )

    ev = table(spark, sf_dir, "events")
    sketch = histogram_partials(ev, "value", 0.0, 500.0, buckets=256)
    return histogram_quantiles(sketch, [0.5, 0.9, 0.99], 0.0, 500.0, buckets=256)


# ---------------------------------------------------------------------------
# Distinct users served FROM the incremental store's HLL sketch (the
# composition the sketch family exists for: one batch-partitioned
# store answers counts, sums, AND distincts). Rows-only — xxhash64
# has no DuckDB twin; register-level merge exactness and estimate
# accuracy are pinned in tests/test_rollup.py.
@register("rollup_daily_unique_users")
def rollup_daily_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate unique users per (day, event_type) from the rollup
    store's max-merged HLL registers — sketch-sized serving, no event
    re-scan."""
    return _rollup_store(spark, sf_dir).serve_distinct()


# ---------------------------------------------------------------------------
# Relative-error quantiles over an unbounded domain (functions/
# ddsketch.py): the log-bucket counterpart of the fixed-bound
# histogram above. Rows-only — the bucket boundary is a float log
# whose last-ulp liberty across engines could flip a boundary value's
# bucket (fine for the alpha-bounded estimate, not for a value hash);
# the alpha guarantee, exact merge, and zero/negative handling are
# property-tested in tests/test_ddsketch.py.
@register("event_value_quantile_dds")
def event_value_quantile_dds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value from DDSketch log buckets
    (alpha = 1% relative error, no domain bounds needed)."""
    from etl_database_spark.functions.ddsketch import dds_partials, dds_quantiles

    ev = table(spark, sf_dir, "events")
    sketch = dds_partials(ev, "value", alpha=0.01)
    return dds_quantiles(sketch, [0.5, 0.9, 0.99], alpha=0.01)


# ---------------------------------------------------------------------------
# Quantiles served FROM the incremental store's histogram counters —
# approximate, incremental, retractable, AND oracle-checked: the
# counter arithmetic is deterministic, so DuckDB recomputing the same
# bucket math from raw events must hash-match the store-served result
# (bucket width 500/256 = 1.953125, same constants as
# event_value_quantile_histogram but per (day, event_type)).
@register(
    "rollup_daily_value_quantiles",
    oracle="""
    WITH hist AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 1.953125), 0), 255) AS INT)
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT day, event_type, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY day, event_type ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY day, event_type) AS n
      FROM hist
    ),
    qs AS (SELECT UNNEST([0.5, 0.9]) AS q),
    hit AS (
      SELECT day, event_type, q, bucket, cnt, cum, n,
             ROW_NUMBER() OVER (PARTITION BY day, event_type, q
                                ORDER BY bucket) AS rn
      FROM qs JOIN cum ON cum >= q * n
    )
    SELECT day, event_type, q,
           CAST(ROUND(0.0 + (bucket + (q * n - (cum - cnt)) / cnt) * 1.953125, 6)
                AS DOUBLE) AS est
    FROM hit WHERE rn = 1
    ORDER BY day, event_type, q
    """,
)
def rollup_daily_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90 of events.value per (day, event_type), served from the
    incremental store's histogram counters."""
    return _rollup_store(spark, sf_dir).serve_quantiles([0.5, 0.9])


# ---------------------------------------------------------------------------
# Partition-pruned layout serving: the 100 TB story depends on the
# ingested layout, not the single-file fixture — a day-partitioned
# events table lets a date-ranged query touch only the matching
# partition directories (static PartitionFilters at the scan; the
# engine's replacement for the reference's tdataset(datasetdate)
# index). The layout is built once per corpus (reported as setup in
# bench.py, like the signature/rollup stores) and the registered query
# serves a one-week slice from it — the plan is asserted pruned in
# tests/test_plans.py, and the oracle recomputes the same slice from
# the raw table so the pruned scan is hash-verified, not just fast.
_PART_EVENTS_CACHE: dict = {}


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    key = (sf_dir, os.path.getmtime(src) if os.path.exists(src) else None)
    if key not in _PART_EVENTS_CACHE:
        for old_key in [k for k in _PART_EVENTS_CACHE if k[0] == sf_dir and k != key]:
            shutil.rmtree(_PART_EVENTS_CACHE.pop(old_key), ignore_errors=True)
        path = tempfile.mkdtemp(prefix="spark_graft_part_events_")
        ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
        # one shuffle keyed by day → one file per day directory; at
        # scale this is the ingest-time write (operators/layout.py
        # handles multi-column clustering within partitions)
        ev.repartition("day").write.mode("overwrite").partitionBy("day").parquet(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        _PART_EVENTS_CACHE[key] = path
    return _PART_EVENTS_CACHE[key]


@register(
    "partitioned_day_slice_stats",
    oracle="""
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events, b
    WHERE CAST(ts AS DATE) BETWEEN b.d0 + 7 AND b.d0 + 13
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def partitioned_day_slice_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over one week, served from the day-partitioned
    layout: the date literals are inlined (a 1-row bounded collect of
    MIN(day), the audited-scalar pattern), so the scan carries static
    PartitionFilters and reads 7 of 30 day directories."""
    import datetime as dt

    path = _partitioned_events(spark, sf_dir)
    d0 = (
        table(spark, sf_dir, "events")
        .agg(F.min(F.to_date("ts")).alias("d0"))
        .collect()[0][0]
    )
    lo, hi = d0 + dt.timedelta(days=7), d0 + dt.timedelta(days=13)
    return (
        spark.read.parquet(path)
        .where(F.col("day").between(F.lit(lo), F.lit(hi)))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Gap filling / forward fill (the hypertable "locf" operator): project
# a sparse daily aggregate (high-value events, >250) onto the dense
# day x type grid and carry the last observation forward. The grid is
# a crossJoin of two SCHEMA-BOUNDED-or-tiny frames (distinct days x
# distinct types — thousands x handful even at 100 TB), the fill is
# one window pass per type, and the carried value is an exact
# decimal-avg double so the oracle (DuckDB last_value IGNORE NULLS)
# hash-matches bit-for-bit. Leading gaps coalesce to 0 with is_gap
# marking fills, keeping the output null-free.
_FF_THRESHOLD = 250

_FF_ORACLE = f"""
    WITH agg AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             COUNT(*) AS n_hv,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
      FROM events WHERE value > {_FF_THRESHOLD} GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    j AS (
      SELECT g.day, g.event_type, a.n_hv, a.avg_value
      FROM (SELECT day, event_type FROM days CROSS JOIN types) g
      LEFT JOIN agg a USING (day, event_type)
    )
    SELECT day, event_type,
           CAST(COALESCE(n_hv, 0) AS BIGINT) AS n_hv,
           CAST(COALESCE(last_value(avg_value IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                AS DOUBLE) AS filled_avg,
           CAST(CASE WHEN n_hv IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
    FROM j
    ORDER BY event_type, day
    """


@register("daily_highvalue_forward_fill", oracle=_FF_ORACLE)
def daily_highvalue_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense day x type grid of the sparse high-value daily average,
    gaps filled by last-observation-carried-forward."""
    e = table(spark, sf_dir, "events")
    agg = (
        e.where(F.col("value") > _FF_THRESHOLD)
        .withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n_hv"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avg_value"),
        )
    )
    days = e.select(F.to_date("ts").alias("day")).distinct()
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    j = grid.join(agg, ["day", "event_type"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "day",
        "event_type",
        F.coalesce("n_hv", F.lit(0)).cast("long").alias("n_hv"),
        F.coalesce(F.last("avg_value", ignorenulls=True).over(w), F.lit(0.0))
        .cast("double")
        .alias("filled_avg"),
        F.when(F.col("n_hv").isNull(), 1).otherwise(0).cast("long").alias("is_gap"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# t-digest quantiles (functions/tdigest.py): the unbounded-domain,
# tail-accurate member of the quantile family — no [lo, hi) bounds
# (histogram) and no positive-domain restriction (ddsketch). Built and
# merged entirely in DataFrame algebra (scale-function band
# construction — no Python UDAF); rows-only like the DDSketch entry
# (libm asin has no cross-engine bit contract), accuracy
# property-tested in tests/test_tdigest.py.
@register("event_value_quantile_tdigest")
def event_value_quantile_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value per event_type from merged
    per-type t-digest centroids (delta=200)."""
    from etl_database_spark.functions.tdigest import (
        tdigest_partials,
        tdigest_quantiles,
    )

    ev = table(spark, sf_dir, "events")
    cents = tdigest_partials(ev, "value", ["event_type"])
    return tdigest_quantiles(cents, [0.5, 0.9, 0.99], ["event_type"])


# ---------------------------------------------------------------------------
# Statistical outlier detection: per-type z-scores from exact decimal
# moment sums. Variance = (sumsq - sum^2/n)/n computed from
# decimal-exact SUM(v) and SUM(v*v) — the double products and the
# final sqrt are single IEEE ops, bit-identical cross-engine, so the
# 3-sigma cut admits the same rows in both engines. One aggregate +
# one broadcast join back; no second scan of the fact table shape.
_ZSCORE_ORACLE = """
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.s1 / s.n)
                 / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 6) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE (e.value - s.s1 / s.n)
          / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) > 3
    ORDER BY e.event_type, e.event_id
    """


@register("event_value_outliers", oracle=_ZSCORE_ORACLE)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits more than 3 population-sigma above its
    type's mean — z-scores from exact decimal moment sums."""
    e = table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,8)"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(z > 3)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# Bivariate statistics: Pearson correlation from exact decimal moment
# sums — same determinism argument as event_value_outliers (double
# products and one sqrt are single IEEE ops), so corr() needs no
# engine-specific aggregate to hash-match. One scan, one 5-row output.
_CORR_ORACLE = """
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(EXTRACT(hour FROM ts) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(EXTRACT(hour FROM ts) * value AS DECIMAL(28,8))) AS DOUBLE) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS hour_value_corr
    FROM m
    ORDER BY event_type
    """


@register("hour_value_correlation", oracle=_CORR_ORACLE)
def hour_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hour-of-day and event value per
    type, from decimal-exact moment sums (engine-portable corr)."""
    e = table(spark, sf_dir, "events")
    hour = F.hour("ts").cast("double")
    v = F.col("value")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(hour.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(v.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((hour * hour).cast("decimal(28,8)")).cast("double").alias("sxx"),
        F.sum((v * v).cast("decimal(28,8)")).cast("double").alias("syy"),
        F.sum((hour * v).cast("decimal(28,8)")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(r, 6).alias("hour_value_corr"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Multi-grain serving from ONE set of partials: the week grain is a
# re-aggregation of the same (batch, day) partials the daily query
# serves — proof that the store's algebraic measures compose across
# grains (the hypertable continuous-aggregate property). The oracle
# recomputes weekly stats from raw events, so green means
# day-partials -> week == raw -> week, cross-engine. Monday-start
# date_trunc('week') agrees between Spark and DuckDB (verified).
_WEEKLY_ORACLE = """
    SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY week, event_type
    ORDER BY week, event_type
    """


@register("rollup_weekly_event_stats", oracle=_WEEKLY_ORACLE)
def rollup_weekly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stats served by re-aggregating the SAME day-grain
    partials the daily rollup serves — no second store, no raw scan."""
    store = _rollup_store(spark, sf_dir)
    return (
        store.partials()
        .withColumn("week", F.date_trunc("week", F.col("day")).cast("date"))
        .groupBy("week", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .orderBy("week", "event_type")
    )


# ---------------------------------------------------------------------------
# Snapshot CDC: the generalized form of the flagship event_changes —
# given two versions of a keyed table, emit the change set
# (insert / update / delete + the changed row's content hash) via one
# full-outer join on the key. The reference computes added/removed
# per entity with MIN/MAX appearance dates (SURVEY A1/W3); this is
# the same question asked of whole rows, the way a warehouse diffs
# snapshot loads. Update detection hashes the non-key payload with
# md5(concat_ws) so the oracle replays it exactly.
_CDC_CUT = "1997-06-01"

_CDC_ORACLE = f"""
    WITH old AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS h
      FROM orders WHERE o_orderdate < DATE '{_CDC_CUT}'
    ),
    new AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|',
                 CASE WHEN o_orderstatus = 'O' THEN 'F' ELSE o_orderstatus END,
                 o_orderpriority)) AS h
      FROM orders WHERE o_orderdate < DATE '{_CDC_CUT}' AND o_orderkey % 3 != 0
      UNION ALL
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS h
      FROM orders WHERE o_orderdate >= DATE '{_CDC_CUT}' AND o_orderkey % 7 = 0
    )
    SELECT COALESCE(o.k, n.k) AS order_key,
           CASE WHEN o.k IS NULL THEN 'I'
                WHEN n.k IS NULL THEN 'D'
                ELSE 'U' END AS op
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    WHERE o.k IS NULL OR n.k IS NULL OR o.h <> n.h
    ORDER BY order_key
    """


@register("orders_snapshot_cdc", oracle=_CDC_ORACLE)
def orders_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two synthesized order
    snapshots (the new one drops every third key, flips open statuses
    to filled, and adds a slice of later orders): one full-outer join
    on the key, payload-hash comparison for updates."""
    o = table(spark, sf_dir, "orders")
    payload = F.md5(F.concat_ws("|", "o_orderstatus", "o_orderpriority"))
    old = o.where(F.col("o_orderdate") < _CDC_CUT).select(
        F.col("o_orderkey").alias("k"), payload.alias("h")
    )
    changed = F.md5(
        F.concat_ws(
            "|",
            F.when(F.col("o_orderstatus") == "O", "F").otherwise(
                F.col("o_orderstatus")
            ),
            F.col("o_orderpriority"),
        )
    )
    new = (
        o.where((F.col("o_orderdate") < _CDC_CUT) & (F.col("o_orderkey") % 3 != 0))
        .select(F.col("o_orderkey").alias("k"), changed.alias("h"))
        .unionByName(
            o.where(
                (F.col("o_orderdate") >= _CDC_CUT) & (F.col("o_orderkey") % 7 == 0)
            ).select(F.col("o_orderkey").alias("k"), payload.alias("h"))
        )
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    op = (
        F.when(F.col("o.k").isNull(), "I")
        .when(F.col("n.k").isNull(), "D")
        .otherwise("U")
    )
    return (
        j.where(
            F.col("o.k").isNull()
            | F.col("n.k").isNull()
            | (F.col("o.h") != F.col("n.h"))
        )
        .select(F.coalesce("o.k", "n.k").alias("order_key"), op.alias("op"))
        .orderBy("order_key")
    )


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (IVM): the classic delta rule for
# a view over fact ⋈ dims with static dimensions is
# Δ(view) = Δ(fact) ⋈ dims — so the EXISTING RollupStore maintains a
# three-table join view unchanged, as long as each ingest batch is the
# pre-joined order delta (shaped as an event frame: ts=o_orderdate,
# event_type=n_name, value=o_totalprice). The store's idempotent
# batch lifecycle, compaction, and merge-on-read serving then apply
# verbatim; the oracle recomputes the view from the raw three-way
# join, so green proves delta-join maintenance == full recompute
# cross-engine.
_IVM_CACHE: dict = {}


def _ivm_store(spark: SparkSession, sf_dir: str):
    import os

    src = os.path.join(sf_dir, "orders.parquet")
    key = (sf_dir, os.path.getmtime(src) if os.path.exists(src) else None)
    if key not in _IVM_CACHE:
        import atexit
        import shutil
        import tempfile

        from etl_database_spark.operators.rollup import RollupStore

        for old_key in [k for k in _IVM_CACHE if k[0] == sf_dir and k != key]:
            old = _IVM_CACHE.pop(old_key)
            shutil.rmtree(old.path, ignore_errors=True)
        o = table(spark, sf_dir, "orders").where(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        c = table(spark, sf_dir, "customer")
        n = table(spark, sf_dir, "nation")

        def delta_join(orders_delta):
            return (
                orders_delta.join(c, orders_delta["o_custkey"] == c["c_custkey"])
                .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
                .select(
                    F.col("o_orderdate").alias("ts"),
                    F.col("n_name").alias("event_type"),
                    F.col("o_totalprice").alias("value"),
                )
            )

        store = RollupStore(spark, tempfile.mkdtemp(prefix="spark_graft_ivm_"))
        store.ingest(delta_join(o.where(F.col("o_orderkey") % 2 == 0)), batch="d1")
        store.compact()
        store.ingest(delta_join(o.where(F.col("o_orderkey") % 2 == 1)), batch="d2")
        if store.ingest(delta_join(o.limit(1)), batch="d1") is not False:
            raise RuntimeError("IVM store replayed an absorbed delta batch")
        atexit.register(shutil.rmtree, store.path, ignore_errors=True)
        _IVM_CACHE[key] = store
    return _IVM_CACHE[key]


@register(
    "rollup_nation_revenue_ivm",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS day,
           n_name AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
           MIN(o_totalprice) AS min_value,
           MAX(o_totalprice) AS max_value
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def rollup_nation_revenue_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day x nation revenue served from an incrementally-maintained
    JOIN view: two order-delta batches joined to static dims at ingest
    (with compaction and a forced replay in between) must equal the
    full three-way-join recompute."""
    return _ivm_store(spark, sf_dir).serve()


# ---------------------------------------------------------------------------
# CDC-driven rollup maintenance: the snapshot-diff layer
# (orders_snapshot_cdc) feeding the incremental store. Inserts and the
# new side of updates are one ingest batch; deletes and the old side
# of updates are one negation-retraction batch — counts and decimal
# sums are group-algebraic, so after applying a day of CDC the served
# additive state equals a FULL recompute over the new snapshot. The
# oracle does exactly that recompute, so green certifies the whole
# CDC -> delta -> store -> serve path cross-engine. (Extrema are
# excluded by the store's own retraction gate; RollupStore(keep_raw)
# + retract_batch is the exact path when they must survive CDC.)
_CDC_ROLLUP_CACHE: dict = {}


def _cdc_snapshots(spark: SparkSession, sf_dir: str):
    """(old, new) snapshot frames shaped as store events: deletes =
    key%3==0 (dropped from new), updates = key%5==0 of the survivors
    (+100.0 on the total — a single IEEE add, engine-portable),
    inserts = post-cut keys %7==0.

    Aggregation grain is MONTH (ts truncated): a 7-year order history
    at day grain would mean ~2400 tiny day partitions in the store —
    metadata-bound serving. Partial grain must match the partition
    cardinality budget; month keeps the store at ~84 partitions."""
    o = table(spark, sf_dir, "orders")
    ev = lambda df, val: df.select(  # noqa: E731
        F.date_trunc("month", F.col("o_orderdate")).alias("ts"),
        F.col("o_orderpriority").alias("event_type"),
        val.alias("value"),
        F.col("o_orderkey").alias("k"),
    )
    pre = o.where(F.col("o_orderdate") < _CDC_CUT)
    old = ev(pre, F.col("o_totalprice"))
    surv = pre.where(F.col("o_orderkey") % 3 != 0)
    new = ev(
        surv,
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + F.lit(100.0)
        ).otherwise(F.col("o_totalprice")),
    ).unionByName(
        ev(
            o.where(
                (F.col("o_orderdate") >= _CDC_CUT) & (F.col("o_orderkey") % 7 == 0)
            ),
            F.col("o_totalprice"),
        )
    )
    return old, new


def _cdc_rollup_store(spark: SparkSession, sf_dir: str):
    import os

    src = os.path.join(sf_dir, "orders.parquet")
    key = (sf_dir, os.path.getmtime(src) if os.path.exists(src) else None)
    if key not in _CDC_ROLLUP_CACHE:
        import atexit
        import shutil
        import tempfile

        from etl_database_spark.operators.rollup import RollupStore

        for old_key in [k for k in _CDC_ROLLUP_CACHE if k[0] == sf_dir and k != key]:
            old_store = _CDC_ROLLUP_CACHE.pop(old_key)
            shutil.rmtree(old_store.path, ignore_errors=True)
        old, new = _cdc_snapshots(spark, sf_dir)
        store = RollupStore(spark, tempfile.mkdtemp(prefix="spark_graft_cdcroll_"))
        # day 0: the base snapshot, then compact (the steady state a
        # long-lived store is in when CDC arrives)
        store.ingest(old.drop("k"), batch="snap0")
        store.compact()
        # CDC application: retract (deletes + update-old), ingest
        # (inserts + update-new). Keys classify ops exactly as the
        # snapshot diff emits them.
        is_del = F.col("k") % 3 == 0
        is_upd = (F.col("k") % 3 != 0) & (F.col("k") % 5 == 0)
        # inserts are the only rows in `new` at/after the cut month
        # (the cut is a month boundary, so truncation cannot move a
        # pre-cut order across it)
        upd_or_ins = new.where((F.col("ts") >= _CDC_CUT) | is_upd)
        store.retract(old.where(is_del | is_upd).drop("k"), batch="cdc_del")
        store.ingest(upd_or_ins.drop("k"), batch="cdc_ins")
        if store.ingest(new.limit(1).drop("k"), batch="cdc_ins") is not False:
            raise RuntimeError("CDC rollup store replayed an applied batch")
        # fold the applied CDC into batch=base: serving then lists one
        # batch directory per day instead of four (retraction
        # negatives cancel away inside the fold)
        store.compact()
        atexit.register(shutil.rmtree, store.path, ignore_errors=True)
        _CDC_ROLLUP_CACHE[key] = store
    return _CDC_ROLLUP_CACHE[key]


@register(
    "cdc_rollup_order_totals",
    oracle=f"""
    WITH new_snap AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS d, o_orderpriority AS et,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS v
      FROM orders
      WHERE o_orderdate < DATE '{_CDC_CUT}' AND o_orderkey % 3 <> 0
      UNION ALL
      SELECT DATE_TRUNC('month', o_orderdate), o_orderpriority, o_totalprice
      FROM orders
      WHERE o_orderdate >= DATE '{_CDC_CUT}' AND o_orderkey % 7 = 0
    )
    SELECT CAST(d AS DATE) AS day, et AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM new_snap
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def cdc_rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month x priority order totals served from a rollup store
    maintained by CDC deltas (base snapshot ingest + compaction, then
    delete/update retraction and insert/update ingest): the served
    additive state must equal a full recompute over the new
    snapshot — the oracle performs that recompute."""
    return _cdc_rollup_store(spark, sf_dir).serve()


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (functions/kmv.py) — the checkable twin of
# approx_distinct_parts: HLL++ registers are engine-internal (rows-only
# forever), but KMV is DISTINCT + ROW_NUMBER + one divide over an
# md5-derived 60-bit hash, so the whole distinct-count estimate replays
# bit-for-bit in DuckDB. Same single (group, hash) distinct exchange
# COUNT(DISTINCT) would need; per-group state is k hashes.
_KMV_K = 256


@register(
    "approx_distinct_parts_kmv",
    oracle=f"""
    WITH dh AS (
      SELECT DISTINCT l_returnflag,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM lineitem),
    r AS (
      SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
      FROM dh),
    s AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rk = {_KMV_K} THEN h END) AS hk,
             COUNT(*) AS nd
      FROM r GROUP BY l_returnflag),
    c AS (SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag)
    SELECT s.l_returnflag,
           CASE WHEN s.nd >= {_KMV_K}
                THEN ROUND({float(_KMV_K - 1)} / (CAST(s.hk AS DOUBLE) / 1152921504606846976.0), 4)
                ELSE CAST(s.nd AS DOUBLE) END AS kmv_distinct,
           c.n_rows
    FROM s JOIN c USING (l_returnflag)
    ORDER BY l_returnflag
    """,
)
def approx_distinct_parts_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV NDV-per-returnflag: the oracle-checkable twin of the HLL++
    approx_distinct_parts query — n̂ = (k−1)/u_k over 60-bit md5
    hashes (k=256, ≈6% rel. error), exact distinct count below k.
    Every step is engine-portable, so DuckDB verifies the estimate
    itself, not just its row count."""
    from etl_database_spark.functions.kmv import kmv_distinct

    li = table(spark, sf_dir, "lineitem")
    est = kmv_distinct(li, "l_partkey", ["l_returnflag"], k=_KMV_K)
    counts = li.groupBy("l_returnflag").agg(F.count("*").alias("n_rows"))
    return est.join(counts, "l_returnflag").orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# First-order event-transition matrix (the Markov-chain view of the
# event stream): per-user consecutive event-type pairs under the
# total order (ts, event_id), counted and row-normalized. The last
# sequence-analytics staple missing next to funnel / cohort /
# sessionization. The probability is ONE integer/integer double
# division of two exact BIGINT aggregates, so it is bit-identical
# across engines — no float summation anywhere.
@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    t AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)
    SELECT prev_type, next_type, transitions,
           CAST(transitions AS DOUBLE)
             / CAST(SUM(transitions) OVER (PARTITION BY prev_type) AS DOUBLE)
             AS transition_prob
    FROM t
    ORDER BY prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts + probabilities between
    consecutive event types per user.

    One shuffle on user_id for the LAG, then a map-side-combinable
    count on (prev, next) — the row normalizer is a window SUM over
    the TINY transition matrix (|event_types|^2 rows), not a second
    aggregate + self-join (which would duplicate the events-sized
    upstream DAG in the plan), so at 100 TB the only data-sized
    exchange is the user_id window. Ties in ts are broken by the
    unique event_id so both engines see the same sequence. Reference
    scope: xnlou/etl-database reports stop at flat event aggregates
    (storedprocs.sql); this is the standard warehouse add-on."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("transitions"))
    )
    return (
        t.withColumn(
            "transition_prob",
            F.col("transitions").cast("double")
            / F.sum("transitions").over(W.partitionBy("prev_type")).cast("double"),
        )
        .select("prev_type", "next_type", "transitions", "transition_prob")
        .orderBy("prev_type", "next_type")
    )
