"""Incremental rollup store: partial-merge correctness, replay
idempotence, compaction, and partition-pruned serving."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_database_spark.operators.rollup import RollupStore


@pytest.fixture()
def events(spark):
    rows = []
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    for i in range(300):
        rows.append(
            (
                i,
                base + dt.timedelta(days=i % 10, minutes=i),
                i % 7,
                ["click", "purchase", "error"][i % 3],
                round(0.5 + (i % 50) * 1.25, 2),
            )
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _full_recompute(events):
    return (
        events.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("sum_dec").cast("double").alias("sum_value"),
            (F.col("sum_dec").cast("double") / F.col("n_events")).alias("avg_value"),
            "min_value",
            "max_value",
        )
        .orderBy("day", "event_type")
    )


def test_incremental_equals_full_recompute(spark, events, tmp_path):
    """Three overlapping-day batches merged via partials must equal a
    single full aggregate over everything."""
    store = RollupStore(spark, str(tmp_path / "rollup"))
    b1 = events.where(F.col("event_id") < 100)
    b2 = events.where((F.col("event_id") >= 100) & (F.col("event_id") < 200))
    b3 = events.where(F.col("event_id") >= 200)
    assert store.ingest(b1, "b1") is True
    assert store.ingest(b2, "b2") is True
    assert store.ingest(b3, "b3") is True

    got = [tuple(r) for r in store.serve().collect()]
    want = [tuple(r) for r in _full_recompute(events).collect()]
    assert got == want


def test_replay_is_noop_and_compaction_preserves(spark, events, tmp_path):
    store = RollupStore(spark, str(tmp_path / "rollup"))
    b1 = events.where(F.col("event_id") < 150)
    b2 = events.where(F.col("event_id") >= 150)
    store.ingest(b1, "b1")
    store.ingest(b2, "b2")

    # replay before compaction: no-op, serving unchanged
    before = [tuple(r) for r in store.serve().collect()]
    assert store.ingest(b1, "b1") is False
    assert [tuple(r) for r in store.serve().collect()] == before

    # compaction folds to one partial row per (day, type), same answers
    store.compact()
    after = [tuple(r) for r in store.serve().collect()]
    assert after == before
    per_key = (
        store.partials().groupBy("day", "event_type").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_key == 1
    assert store.batches() == ["b1", "b2", "base"]

    # replay of an absorbed batch after compaction: still a no-op
    assert store.ingest(b1, "b1") is False
    assert [tuple(r) for r in store.serve().collect()] == before


def test_serve_day_filter_prunes_partitions(spark, events, tmp_path):
    """serve(days=...) must push a `day` partition filter into the
    store scan (the dashboard access path reads only those days)."""
    store = RollupStore(spark, str(tmp_path / "rollup"))
    store.ingest(events, "all")

    days = [dt.date(2024, 3, 1), dt.date(2024, 3, 2)]
    served = store.serve(days=days)
    rows = served.collect()
    assert {r.day for r in rows} == set(days)

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]


def test_partial_sum_type_is_stable_across_batches(spark, events, tmp_path):
    """Every batch file must carry the same pinned decimal type —
    otherwise the unified read breaks after compaction mixes files."""
    store = RollupStore(spark, str(tmp_path / "rollup"))
    store.ingest(events.where(F.col("event_id") < 50), "a")
    store.compact()
    store.ingest(events.where(F.col("event_id") >= 50), "b")
    # read must succeed with a single schema and serve correctly
    assert dict(store.partials().dtypes)["sum_value"] == "decimal(38,6)"
    got = [tuple(r) for r in store.serve().collect()]
    want = [tuple(r) for r in _full_recompute(events).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# Streaming maintenance (streaming/rollup.py)


def test_streaming_rollup_equals_batch(spark, events, tmp_path):
    """Draining the event stream through foreachBatch must serve
    exactly the batch full-recompute; a re-run over the same
    checkpoint must change nothing; and a fresh checkpoint must be
    refused rather than collide with stored batch ids."""
    import pytest

    from etl_database_spark.streaming.rollup import run_rollup_once

    src = str(tmp_path / "src")
    events.write.parquet(src)
    store_path = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(events.schema).parquet(src)
    store = run_rollup_once(spark, stream, store_path, ckpt)

    want = [tuple(r) for r in _full_recompute(events).collect()]
    assert [tuple(r) for r in store.serve().collect()] == want

    # drained checkpoint: nothing new to process, serving unchanged
    stream2 = spark.readStream.schema(events.schema).parquet(src)
    run_rollup_once(spark, stream2, store_path, ckpt)
    assert [tuple(r) for r in store.serve().collect()] == want

    # compaction keeps serving identical AND keeps the stream binding
    store.compact()
    assert [tuple(r) for r in store.serve().collect()] == want

    # a fresh checkpoint (new stream id, batch ids restart at 0) is
    # refused instead of overwriting stored partitions
    stream3 = spark.readStream.schema(events.schema).parquet(src)
    with pytest.raises(Exception, match="rollup store"):
        run_rollup_once(spark, stream3, store_path, str(tmp_path / "ckpt2"))
    assert [tuple(r) for r in store.serve().collect()] == want


def test_crashed_partial_write_is_retried_not_skipped(spark, events, tmp_path):
    """A batch DIRECTORY without a manifest commit (crash mid-write)
    must not count as ingested: the retry rewrites and heals the
    partial instead of making it permanent."""
    import json
    import os

    store = RollupStore(spark, str(tmp_path / "rollup"))
    b1 = events.where(F.col("event_id") < 150)
    b2 = events.where(F.col("event_id") >= 150)
    store.ingest(b1, "b1")

    # simulate a crashed b2 attempt: data (partially) written, commit
    # never recorded — here we fake it by writing b2 then erasing the
    # manifest entry AND deleting one day partition (the "partial")
    store.ingest(b2, "b2")
    manifest = os.path.join(store.path, RollupStore.COMMITTED_FILE)
    with open(manifest) as fh:
        committed = json.load(fh)
    committed.remove("b2")
    with open(manifest, "w") as fh:
        json.dump(committed, fh)
    b2_days = [
        d for d in os.listdir(os.path.join(store.path, "batch=b2")) if d.startswith("day=")
    ]
    import shutil

    shutil.rmtree(os.path.join(store.path, "batch=b2", b2_days[0]))

    # the retry must NOT be skipped, and must fully restore b2
    assert store.ingest(b2, "b2") is True
    got = [tuple(r) for r in store.serve().collect()]
    want = [tuple(r) for r in _full_recompute(events).collect()]
    assert got == want


def test_distinct_sketch_serves_alongside_measures(spark, events, tmp_path):
    """A store configured with distinct_col serves approximate unique
    users per (day, type) from the same ingest batches; merged-across-
    batches registers must equal a whole-corpus sketch, estimates must
    track exact distincts, and compaction must fold the sketch too."""
    from etl_database_spark.functions.hll import hll_std_error

    store = RollupStore(spark, str(tmp_path / "rollup"), distinct_col="user_id")
    store.ingest(events.where(F.col("event_id") < 150), "b1")
    store.ingest(events.where(F.col("event_id") >= 150), "b2")

    exact = {
        (r.day, r.event_type): r.n
        for r in events.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    got = {
        (r.day, r.event_type): r.approx_distinct
        for r in store.serve_distinct().collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(5 * hll_std_error() * n, 10), (k, got[k], n)

    # the additive measures still serve correctly from the same store
    assert [tuple(r) for r in store.serve().collect()] == [
        tuple(r) for r in _full_recompute(events).collect()
    ]

    # compaction folds the sketch and preserves estimates exactly
    store.compact()
    assert {
        (r.day, r.event_type): r.approx_distinct
        for r in store.serve_distinct().collect()
    } == got

    # a store without the sketch refuses serve_distinct loudly
    import pytest

    plain = RollupStore(spark, str(tmp_path / "plain"))
    plain.ingest(events, "all")
    with pytest.raises(ValueError, match="no HLL sketch"):
        plain.serve_distinct()


def test_retraction_removes_duplicate_delivery(spark, events, tmp_path):
    """A duplicated delivery retracted with negated partials must make
    additive serving equal the correct-data recompute; extrema are
    excluded (or refused) once any retraction exists; compaction and
    replays preserve all of it."""
    store = RollupStore(spark, str(tmp_path / "rollup"))
    dup = events.where(F.col("event_id") < 60)  # delivered twice by mistake
    store.ingest(events, "all")
    store.ingest(dup, "dup_redelivery")

    # extrema fine before any retraction
    assert "min_value" in store.serve().columns

    assert store.retract(dup, "dup_retraction") is True
    assert store.retractions() == ["dup_retraction"]

    served = store.serve()
    assert "min_value" not in served.columns  # auto-excluded
    got = [tuple(r) for r in served.collect()]
    want = [
        tuple(r)
        for r in _full_recompute(events)
        .select("day", "event_type", "n_events", "sum_value", "avg_value")
        .collect()
    ]
    assert got == want

    with pytest.raises(ValueError, match="retractions"):
        store.serve(include_extrema=True)

    # replaying the retraction is a no-op
    n_before = store.partials().count()
    assert store.retract(dup, "dup_retraction") is False
    assert store.partials().count() == n_before

    # compaction folds the negatives away and keeps the retraction
    # record (extrema stay excluded)
    store.compact()
    assert store.retractions() == ["dup_retraction"]
    assert [tuple(r) for r in store.serve().collect()] == want
    assert "min_value" not in store.serve().columns


def test_quantile_counters_serve_and_survive_retraction(spark, events, tmp_path):
    """Histogram counters in the store: incremental ingest serves the
    same quantiles as a one-shot sketch over all events; a retraction
    corrects them exactly (additive, unlike MIN/MAX); compaction folds
    the negatives away."""
    from etl_database_spark.functions.histogram import (
        histogram_partials,
        histogram_quantiles,
    )

    spec = ("value", 0.0, 80.0, 64)
    store = RollupStore(spark, str(tmp_path / "rollup"), quantile_spec=spec)
    dup = events.where(F.col("event_id") < 60)
    store.ingest(events.where(F.col("event_id") < 150), "b1")
    store.ingest(events.where(F.col("event_id") >= 150), "b2")
    store.ingest(dup, "dup_redelivery")
    store.retract(dup, "dup_retraction")

    got = [tuple(r) for r in store.serve_quantiles([0.5, 0.9]).collect()]
    direct = histogram_quantiles(
        histogram_partials(
            events.withColumn("day", F.to_date("ts")),
            "value",
            0.0,
            80.0,
            group_cols=["day", "event_type"],
            buckets=64,
        ),
        [0.5, 0.9],
        0.0,
        80.0,
        group_cols=["day", "event_type"],
        buckets=64,
    )
    want = [tuple(r) for r in direct.collect()]
    assert got == want

    store.compact()
    assert [tuple(r) for r in store.serve_quantiles([0.5, 0.9]).collect()] == want
    # compacted counters are all-positive (negatives cancelled)
    import os

    qh = spark.read.parquet(os.path.join(store.path, RollupStore.QHIST_SUBDIR))
    assert qh.where(F.col("cnt") <= 0).count() == 0

    plain = RollupStore(spark, str(tmp_path / "plain"))
    plain.ingest(events, "all")
    with pytest.raises(ValueError, match="no histogram counters"):
        plain.serve_quantiles([0.5])


def test_quantile_counters_ignore_null_values(spark, events, tmp_path):
    """A null-valued event must not corrupt the served quantiles for
    its (day, type): histogram_partials skips NULLs (the ddsketch /
    SQL-aggregate contract), so a store fed a null-bearing batch serves
    the same quantiles as one fed only the non-null rows."""
    nulls = spark.createDataFrame(
        [
            (9001, dt.datetime(2024, 3, 1, 13, 0, 0), 1, "click", None),
            (9002, dt.datetime(2024, 3, 2, 13, 0, 0), 2, "purchase", None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    spec = ("value", 0.0, 80.0, 64)
    store = RollupStore(spark, str(tmp_path / "with_nulls"), quantile_spec=spec)
    store.ingest(events.unionByName(nulls), "all")
    clean = RollupStore(spark, str(tmp_path / "clean"), quantile_spec=spec)
    clean.ingest(events, "all")

    got = [tuple(r) for r in store.serve_quantiles([0.1, 0.5, 0.9]).collect()]
    want = [tuple(r) for r in clean.serve_quantiles([0.1, 0.5, 0.9]).collect()]
    assert got == want
    # and no quantile estimate is null (the pre-fix failure mode: a
    # bucket=null counter row sorted first and could serve a null est)
    assert all(row[-1] is not None for row in got)
    # the additive measures keep SQL semantics: COUNT(*) includes the
    # null-valued rows, SUM ignores them
    n = {
        (r.day, r.event_type): r.n_events for r in store.serve().collect()
    }
    n_clean = {
        (r.day, r.event_type): r.n_events for r in clean.serve().collect()
    }
    assert n[(dt.date(2024, 3, 1), "click")] == n_clean[(dt.date(2024, 3, 1), "click")] + 1


def test_tdigest_sketch_serves_alongside_measures(spark, events, tmp_path):
    """A store with tdigest_col maintains centroids per (day, type)
    through incremental ingest AND compaction; served medians must
    track the exact per-group medians (no domain bounds needed)."""
    store = RollupStore(spark, str(tmp_path / "store"), tdigest_col="value")
    early = events.where(F.dayofmonth("ts") <= 5)
    late = events.where(F.dayofmonth("ts") > 5)
    store.ingest(early, batch="b1")
    store.ingest(late, batch="b2")

    exact = {
        (r["day"], r["event_type"]): r["med"]
        for r in events.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("med"))
        .collect()
    }

    def check():
        served = store.serve_quantiles_tdigest([0.5])
        rows = served.collect()
        assert len(rows) == len(exact)
        for r in rows:
            want = exact[(r["day"], r["event_type"])]
            # groups are ~30 values: the digest keeps tails exact and
            # mid-quantiles within a couple of neighbors
            assert abs(r["est"] - want) <= 5.0, (r, want)

    check()
    store.compact()
    check()
    # digest folded into batch=base and bounded
    import os

    td = spark.read.parquet(os.path.join(store.path, store.TDIGEST_SUBDIR))
    assert td.select("batch").distinct().collect()[0][0] == "base"
    # additive measures still serve after compaction
    assert store.serve().count() == len(exact)


def test_tdigest_requires_configuration(spark, events, tmp_path):
    store = RollupStore(spark, str(tmp_path / "store"))
    store.ingest(events, batch="b1")
    with pytest.raises(ValueError, match="t-digest"):
        store.serve_quantiles_tdigest([0.5])


def _rows_key(df):
    return {
        tuple(r[k] for k in ("day", "event_type")): r.asDict() for r in df.collect()
    }


def test_retract_batch_recomputes_nonadditive_exactly(spark, events, tmp_path):
    """retract_batch on a keep_raw store: min/max, t-digest quantiles
    and HLL distincts all come back EXACT after a bad batch is
    removed — the day-recompute path negation retraction cannot
    provide. Reference truth = a fresh store ingesting only the
    surviving batches' union in one shot."""
    store = RollupStore(
        spark,
        str(tmp_path / "store"),
        distinct_col="user_id",
        tdigest_col="value",
        keep_raw=True,
    )
    b1 = events.where(F.col("event_id") < 100)
    b2 = events.where((F.col("event_id") >= 100) & (F.col("event_id") < 200))
    # plant a rogue extremum in the bad batch: it must vanish
    b2 = b2.withColumn(
        "value", F.when(F.col("event_id") == 150, F.lit(9999.0)).otherwise(F.col("value"))
    )
    b3 = events.where(F.col("event_id") >= 200)
    store.ingest(b1, batch="b1")
    store.ingest(b2, batch="b2")
    store.ingest(b3, batch="b3")
    assert any(r.max_value == 9999.0 for r in store.serve().collect())

    days = store.retract_batch("b2")
    assert days  # b2 touched at least one day

    truth = RollupStore(
        spark,
        str(tmp_path / "truth"),
        distinct_col="user_id",
        tdigest_col="value",
        keep_raw=False,
    )
    truth.ingest(b1.unionByName(b3), batch="all")

    got, want = _rows_key(store.serve()), _rows_key(truth.serve())
    assert set(got) == set(want)
    for k in want:
        for col in ("n_events", "sum_value", "min_value", "max_value", "avg_value"):
            assert got[k][col] == want[k][col], (k, col, got[k], want[k])
    assert not any(r["max_value"] == 9999.0 for r in got.values())

    # HLL registers are content-determined → estimates match exactly
    got_d, want_d = _rows_key(store.serve_distinct()), _rows_key(truth.serve_distinct())
    assert got_d.keys() == want_d.keys()
    for k in want_d:
        assert got_d[k]["approx_distinct"] == want_d[k]["approx_distinct"], k

    # t-digest: same union content, possibly different partial
    # grouping → compare served medians within digest accuracy
    got_q = _rows_key(store.serve_quantiles_tdigest([0.5]))
    want_q = _rows_key(truth.serve_quantiles_tdigest([0.5]))
    assert got_q.keys() == want_q.keys()
    for k in want_q:
        assert abs(got_q[k]["est"] - want_q[k]["est"]) <= 5.0, k

    # replaying the retracted batch stays a no-op
    assert store.ingest(b2, batch="b2") is False
    assert store.recomputations() == ["b2"]


def test_retract_batch_guards(spark, events, tmp_path):
    """No raw slice → clear error; unknown batch → clear error; mixed
    with negation retraction → refuses (raw recompute would resurrect
    the negated contribution)."""
    bare = RollupStore(spark, str(tmp_path / "bare"))
    bare.ingest(events, batch="b1")
    with pytest.raises(ValueError, match="keep_raw"):
        bare.retract_batch("b1")

    store = RollupStore(spark, str(tmp_path / "store"), keep_raw=True)
    store.ingest(events, batch="b1")
    with pytest.raises(ValueError, match="not an ingested batch"):
        store.retract_batch("nope")
    store.retract(events.limit(10), batch="neg1")
    with pytest.raises(ValueError, match="negation retractions"):
        store.retract_batch("b1")


def test_retract_batch_after_compaction(spark, events, tmp_path):
    """The per-batch raw slice survives compaction verbatim, so an
    absorbed batch can still be exactly retracted afterwards."""
    store = RollupStore(spark, str(tmp_path / "store"), keep_raw=True)
    b1 = events.where(F.col("event_id") < 150)
    b2 = events.where(F.col("event_id") >= 150)
    store.ingest(b1, batch="b1")
    store.ingest(b2, batch="b2")
    store.compact()
    store.retract_batch("b2")
    got, want = _rows_key(store.serve()), _rows_key(_full_recompute(b1))
    assert set(got) == set(want)
    for k in want:
        for col in ("n_events", "sum_value", "min_value", "max_value"):
            assert got[k][col] == want[k][col], (k, col)


def test_retract_sole_batch_empties_its_days(spark, events, tmp_path):
    """Retracting the only batch covering a day leaves that day absent
    (not zero-row ghosts)."""
    store = RollupStore(spark, str(tmp_path / "store"), keep_raw=True)
    d1 = events.where(F.dayofmonth("ts") == 1)
    rest = events.where(F.dayofmonth("ts") != 1)
    store.ingest(d1, batch="day1")
    store.ingest(rest, batch="rest")
    days = store.retract_batch("day1")
    assert days == ["2024-03-01"]
    served_days = {str(r.day) for r in store.serve().select("day").distinct().collect()}
    assert "2024-03-01" not in served_days


def test_fully_retracted_group_not_served(spark, events, tmp_path):
    """A (day, type) group whose every contribution was retracted
    cancels to count 0 — serve must drop it (not emit a zero row or
    divide by zero computing the avg)."""
    store = RollupStore(spark, str(tmp_path / "store"))
    d1 = events.where(F.dayofmonth("ts") == 1)
    rest = events.where(F.dayofmonth("ts") != 1)
    store.ingest(d1, batch="b1")
    store.ingest(rest, batch="b2")
    store.retract(d1, batch="b1_retraction")
    served = store.serve().collect()
    assert all(r.n_events > 0 for r in served)
    assert not any(str(r.day) == "2024-03-01" for r in served)
