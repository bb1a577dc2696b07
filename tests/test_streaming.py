import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_database_spark.ingest import ImportConfig
from etl_database_spark.metadata import MetadataSpec
from etl_database_spark.registry import DatasetRegistry
from etl_database_spark.streaming.file_ingest import run_once


def test_streaming_ingest_exactly_once(spark, tmp_path):
    watch = tmp_path / "watch"
    watch.mkdir()
    cfg = ImportConfig(
        config_name="StreamImport",
        source_directory=str(watch),
        archive_directory=str(tmp_path / "arch"),
        file_pattern=r".*\.csv",
        target_table="tstream",
        metadata=MetadataSpec(label_location="2", date_location="0"),
    )
    schema = T.StructType(
        [T.StructField("company", T.StringType()), T.StructField("ticker", T.StringType())]
    )
    reg = DatasetRegistry(spark, str(tmp_path / "registry"))
    (watch / "20250301T120000_MeetMax_5.csv").write_text("company,ticker\nAcme,AC\n")

    n1 = run_once(spark, cfg, schema, reg, str(tmp_path / "data"), str(tmp_path / "ckpt"))
    assert n1 == 1
    # second run with no new files: checkpoint prevents reprocessing
    n2 = run_once(spark, cfg, schema, reg, str(tmp_path / "data"), str(tmp_path / "ckpt"))
    assert n2 == 0
    # new file arrives → only it is processed
    (watch / "20250302T120000_MeetMax_5.csv").write_text("company,ticker\nBeta,BE\n")
    n3 = run_once(spark, cfg, schema, reg, str(tmp_path / "data"), str(tmp_path / "ckpt"))
    assert n3 == 1

    out = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "data" / "tstream"))
    assert out.count() == 2
    assert set(out.columns) >= {"company", "ticker", "datasetid", "datasetdate"}
    # each file registered its own dataset snapshot with the filename date
    ds = reg.datasets().orderBy("datasetid").collect()
    assert [d.datasetdate for d in ds] == [dt.date(2025, 3, 1), dt.date(2025, 3, 2)]


def test_windowed_stream_matches_batch(spark, tmp_path):
    """Stream (watermarked, append mode) emits exactly the batch
    windowed aggregate for windows the final watermark closed."""
    import datetime as dt

    from etl_database_spark.streaming.windowed import (
        run_windowed_once,
        windowed_event_counts,
    )

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (i, base + dt.timedelta(minutes=4 * i), i % 7, "click" if i % 2 else "view", float(i))
        )
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "events_src")
    events.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = str(tmp_path / "windowed_out")
    run_windowed_once(stream, out, str(tmp_path / "ckpt"), "1 hour", "2 hours")

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    max_ts = max(r[1] for r in rows)
    closed = max_ts - dt.timedelta(hours=2)
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(events, "1 hour").collect()
        if r.window_end <= closed
    }
    assert got == expected
    assert len(got) > 0


def test_stateful_sessionization_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessions == batch window-function sessions
    for sessions the final watermark closed."""
    import datetime as dt

    from etl_database_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in range(5):
        t = base + dt.timedelta(minutes=user * 3)
        for burst in range(4):
            for i in range(3):  # 3 events 5 min apart → one session
                rows.append((eid, t, user, "click", float(eid)))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=90)  # gap > 30min → session break
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "sess_src")
    events.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
    out = str(tmp_path / "sess_out")
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    max_ts = max(r[1] for r in rows)
    batch = sessionize_batch(events, 30).collect()
    # stream emits sessions whose timeout (< last+gap) precedes the
    # final watermark (max_ts - 1h)
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in batch
        if r.session_end + dt.timedelta(minutes=30) < max_ts - dt.timedelta(hours=1)
    }
    assert len(got) > 0
    assert got == expected


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per content digest;
    the surviving digest set equals the batch dropDuplicates result
    over the same rows."""
    import datetime as dt

    from etl_database_spark.streaming.dedup import dedup_stream, run_dedup_once

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    for i in range(120):
        # 40 distinct texts, each arriving 3× within minutes of each
        # other (well inside the watermark)
        rows.append((i, base + dt.timedelta(minutes=i), f"document body {i % 40}"))
    docs = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    src = str(tmp_path / "docs_src")
    docs.coalesce(3).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = str(tmp_path / "dedup_out")
    run_dedup_once(stream, out, str(tmp_path / "dedup_ckpt"), watermark="2 hours")

    got = spark.read.parquet(out)
    batch = dedup_stream(docs)
    assert got.count() == 40
    assert got.select("digest").distinct().count() == 40
    assert {r.digest for r in got.select("digest").collect()} == {
        r.digest for r in batch.select("digest").collect()
    }


def test_streaming_dedup_resumes_from_checkpoint(spark, tmp_path):
    """A second drain with the same checkpoint must not re-emit
    already-seen digests from the first drain (state persists)."""
    import datetime as dt

    from etl_database_spark.streaming.dedup import run_dedup_once

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    docs1 = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i), f"body {i % 5}") for i in range(10)],
        "doc_id long, ts timestamp, text string",
    )
    src = str(tmp_path / "src")
    docs1.write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = docs1.schema
    stream = spark.readStream.schema(schema).parquet(src)
    run_dedup_once(stream, out, ckpt, watermark="2 hours")
    assert spark.read.parquet(out).count() == 5

    # second wave: same five texts again (later but inside watermark),
    # plus one genuinely new text
    docs2 = spark.createDataFrame(
        [(100 + i, base + dt.timedelta(minutes=20 + i), f"body {i % 5}") for i in range(5)]
        + [(200, base + dt.timedelta(minutes=30), "brand new body")],
        "doc_id long, ts timestamp, text string",
    )
    docs2.write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    run_dedup_once(stream2, out, ckpt, watermark="2 hours")
    final = spark.read.parquet(out)
    assert final.count() == 6
    assert final.select("digest").distinct().count() == 6


def test_streaming_dedup_state_evicts_after_watermark(spark, tmp_path):
    """Bounded-state semantics: a digest is dropped from state once the
    watermark passes it, so the same content arriving much later is
    re-emitted (one more row), while a re-arrival before eviction is
    suppressed. This is the property that makes state size ∝ watermark
    horizon instead of corpus history."""
    import datetime as dt

    from etl_database_spark.streaming.dedup import run_dedup_once

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "doc_id long, ts timestamp, text string"

    d1 = spark.createDataFrame([(1, base, "the body")], schema)
    d1.write.parquet(src)
    run_dedup_once(
        spark.readStream.schema(d1.schema).parquet(src), out, ckpt, watermark="1 hour"
    )
    assert spark.read.parquet(out).count() == 1

    # +10h re-arrival: state still holds the digest at batch start
    # (watermark from drain 1 is base-1h), so this one is suppressed —
    # but processing it advances the watermark far past the original
    # sighting, evicting it.
    d2 = spark.createDataFrame([(2, base + dt.timedelta(hours=10), "the body")], schema)
    d2.write.mode("append").parquet(src)
    run_dedup_once(
        spark.readStream.schema(d1.schema).parquet(src), out, ckpt, watermark="1 hour"
    )
    assert spark.read.parquet(out).count() == 1

    # +20h: the digest was evicted, so the content is re-emitted.
    d3 = spark.createDataFrame([(3, base + dt.timedelta(hours=20), "the body")], schema)
    d3.write.mode("append").parquet(src)
    run_dedup_once(
        spark.readStream.schema(d1.schema).parquet(src), out, ckpt, watermark="1 hour"
    )
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2
    assert {r.doc_id for r in rows} == {1, 3}


def test_streaming_near_dup_within_and_across_batches(spark, tmp_path):
    """Streaming minhash near-dup: a near-identical pair inside one
    batch AND one split across two drains both surface in the matches
    table; unrelated docs never pair."""
    from etl_database_spark.streaming.near_dup import run_near_dup_once

    base_text = "the quick brown fox jumps over the lazy dog " * 12
    variant = base_text.replace("lazy dog", "lazy cat", 1)
    other = "completely unrelated content about spark partitions " * 12

    src = str(tmp_path / "src")
    store, matches = str(tmp_path / "store"), str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    # drain 1: docs 1+2 are near-dups of each other (within-batch), 3 unrelated
    d1 = spark.createDataFrame([(1, base_text), (2, variant), (3, other)], schema)
    d1.write.parquet(src)
    run_near_dup_once(
        spark,
        spark.readStream.schema(d1.schema).parquet(src),
        store,
        matches,
        ckpt,
        threshold=0.5,
    )
    m1 = {(r.id_a, r.id_b) for r in spark.read.parquet(matches).collect()}
    assert (1, 2) in m1 or (2, 1) in m1
    assert not any(3 in p for p in m1)

    # drain 2: doc 4 is a near-dup of doc 1 from the PREVIOUS drain
    d2 = spark.createDataFrame(
        [(4, base_text.replace("quick", "swift", 1)), (5, "novel text " * 20)], schema
    )
    d2.write.mode("append").parquet(src)
    run_near_dup_once(
        spark,
        spark.readStream.schema(d1.schema).parquet(src),
        store,
        matches,
        ckpt,
        threshold=0.5,
    )
    m2 = {(r.id_a, r.id_b) for r in spark.read.parquet(matches).collect()}
    cross = {p for p in m2 if 4 in p}
    assert any(1 in p or 2 in p for p in cross), f"no cross-batch match: {m2}"
    assert not any(5 in p and 3 in p for p in m2)
    # store now holds every signed doc exactly once
    assert spark.read.parquet(store).select("_id").distinct().count() == 5
    assert spark.read.parquet(store).count() == 5


def test_near_dup_store_refuses_foreign_checkpoint(spark, tmp_path):
    """A stream with a FRESH checkpoint restarts batch ids at 0; its
    writes would overwrite an existing store's batch partitions. The
    store is bound to the first checkpoint's query id and must refuse
    any other stream rather than destroy data."""
    from etl_database_spark.streaming.near_dup import run_near_dup_once

    src = str(tmp_path / "src")
    store, matches = str(tmp_path / "store"), str(tmp_path / "matches")
    schema = "doc_id long, text string"
    d1 = spark.createDataFrame([(1, "alpha " * 40), (2, "beta " * 40)], schema)
    d1.write.parquet(src)
    run_near_dup_once(
        spark,
        spark.readStream.schema(d1.schema).parquet(src),
        store,
        matches,
        str(tmp_path / "ckpt1"),
    )
    stored_before = spark.read.parquet(store).count()
    assert stored_before == 2

    with pytest.raises(Exception, match="signature store"):
        run_near_dup_once(
            spark,
            spark.readStream.schema(d1.schema).parquet(src),
            store,
            str(tmp_path / "matches2"),
            str(tmp_path / "ckpt2"),  # fresh checkpoint → new stream id
        )
    # nothing was overwritten
    assert spark.read.parquet(store).count() == stored_before

    # the ORIGINAL checkpoint still works (same stream id rebinds)
    d2 = spark.createDataFrame([(3, "gamma " * 40)], schema)
    d2.write.mode("append").parquet(src)
    run_near_dup_once(
        spark,
        spark.readStream.schema(d1.schema).parquet(src),
        store,
        matches,
        str(tmp_path / "ckpt1"),
    )
    assert spark.read.parquet(store).count() == 3


def test_streaming_near_dups_registry_query_equals_batch(spark):
    """The registry-level streaming near-dup query: every streamed
    pair is confirmed by the batch twin (in_batch all true), and no
    batch pair is missing from the streamed set — full two-sided
    equivalence of the store+merge path with one-shot batch LSH."""
    import os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        _pytest.skip("testdata not present")
    from etl_database_spark.queries import load_all
    from etl_database_spark.queries.llmdata import _MINHASH_PARAMS
    from etl_database_spark.queries import table as load_table
    from etl_database_spark.streaming.near_dup import batch_estimate_pairs

    rows = load_all()["streaming_near_dups"].fn(spark, sf_dir).collect()
    assert rows, "no near-dup pairs found at sf0.001 — fixture changed?"
    assert all(r.in_batch and r.in_stream for r in rows)
    streamed = {(r.id_a, r.id_b) for r in rows}
    d = load_table(spark, sf_dir, "documents")
    batch = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in batch_estimate_pairs(
            d, "text", "doc_id",
            n=_MINHASH_PARAMS["n"], num_perm=_MINHASH_PARAMS["num_perm"],
            bands=_MINHASH_PARAMS["bands"], threshold=_MINHASH_PARAMS["threshold"],
        ).collect()
    }
    assert streamed == batch


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join emits exactly the batch
    interval join when the watermark outlives the data span."""
    import datetime as dt

    from etl_database_spark.streaming.joins import (
        attributed_purchases,
        run_attribution_once,
    )

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    clicks, purchases = [], []
    for i in range(300):
        clicks.append((1000 + i, base + dt.timedelta(minutes=3 * i), i % 9, "click", 0.0))
    for j in range(80):
        # Purchases land 0-40 min after some click times; only those
        # within 30 min of a same-user click should attribute.
        purchases.append(
            (5000 + j, base + dt.timedelta(minutes=11 * j + j % 40), j % 9, "purchase", float(j))
        )
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    cdf = spark.createDataFrame(clicks, schema)
    pdf = spark.createDataFrame(purchases, schema)
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
    cdf.coalesce(2).write.parquet(csrc)
    pdf.coalesce(2).write.parquet(psrc)

    out = str(tmp_path / "attr_out")
    run_attribution_once(
        spark.readStream.schema(cdf.schema).parquet(csrc),
        spark.readStream.schema(pdf.schema).parquet(psrc),
        out,
        str(tmp_path / "ckpt_attr"),
        "30 minutes",
        "24 hours",
    )

    key = lambda r: (r.user_id, r.click_id, r.purchase_id)
    got = sorted(key(r) for r in spark.read.parquet(out).collect())
    expected = sorted(key(r) for r in attributed_purchases(cdf, pdf).collect())
    assert got == expected
    assert len(got) > 0


def test_near_dup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replays a batch id after a crash-before-checkpoint;
    re-running process_batch with the same id must not duplicate
    matches or store rows."""
    from etl_database_spark.streaming.near_dup import SignatureStore, process_batch

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    store = SignatureStore(spark, str(tmp_path / "store"))
    matches = str(tmp_path / "matches")
    process_batch(docs, store, matches, batch_id=7)
    first = sorted((r.id_a, r.id_b) for r in spark.read.parquet(matches).collect())
    n_store_first = store.read().count()
    process_batch(docs, store, matches, batch_id=7)  # replay
    again = sorted((r.id_a, r.id_b) for r in spark.read.parquet(matches).collect())
    assert again == first and len(first) >= 1
    assert store.read().count() == n_store_first == 2


def test_hopping_stream_matches_batch(spark, tmp_path):
    """Hopping (overlapping) windows: the streamed append-mode output
    must equal the batch hopping aggregate for watermark-closed
    windows, with each event counted in exactly size/slide windows."""
    import datetime as dt

    from etl_database_spark.streaming.windowed import windowed_event_counts

    base = dt.datetime(2025, 4, 1, 0, 0, 0)
    rows = []
    for i in range(240):
        rows.append(
            (i, base + dt.timedelta(minutes=3 * i), i % 5, "click" if i % 2 else "view", float(i))
        )
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "events_src")
    events.coalesce(2).write.parquet(src)

    batch = windowed_event_counts(events, "1 hour", slide="30 minutes")
    # every event lands in exactly 2 windows
    total = batch.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * len(rows)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, "1 hour", "2 hours", slide="30 minutes")
    out = str(tmp_path / "hop_out")
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    max_ts = max(r[1] for r in rows)
    closed = max_ts - dt.timedelta(hours=2)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
        if r.window_end <= closed
    }
    for k, v in want.items():
        assert got.get(k) == v, k
