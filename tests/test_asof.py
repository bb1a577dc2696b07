import datetime as dt

from pyspark.sql import functions as F

from etl_database_spark.operators.asof import asof_join_backward, range_join


def _ts(minute):
    return dt.datetime(2025, 3, 1, 12, minute, 0)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts(10)), (2, "A", _ts(30)), (3, "B", _ts(5)), (4, "A", _ts(2))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts(5), 100.0), ("A", _ts(20), 200.0), ("B", _ts(50), 300.0)],
        "k string, ts timestamp, v double",
    )
    out = {r.id: (r.ts_right, r.v_right) for r in
           asof_join_backward(left, right, "k", right_cols=["v"]).collect()}
    assert out[1] == (_ts(5), 100.0)     # latest right <= 12:10 is 12:05
    assert out[2] == (_ts(20), 200.0)    # latest right <= 12:30 is 12:20
    assert 3 not in out                  # B's only right row is later → dropped
    assert 4 not in out                  # A@12:02 precedes all right rows


def test_asof_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([(1, "A", _ts(5))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts(5), 9.0)], "k string, ts timestamp, v double")
    out = asof_join_backward(left, right, "k", right_cols=["v"]).collect()
    assert len(out) == 1 and out[0].v_right == 9.0  # ts >= matches equality


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, "A", _ts(30))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("A", _ts(5), 1.0)], "k string, ts timestamp, v double")
    loose = asof_join_backward(left, right, "k", right_cols=["v"], tolerance_us=30 * 60_000_000)
    tight = asof_join_backward(left, right, "k", right_cols=["v"], tolerance_us=10 * 60_000_000)
    assert loose.count() == 1
    assert tight.count() == 0  # 25 min staleness > 10 min tolerance


def test_range_join_bands(spark):
    """Pairs straddling a band boundary must still be found (the
    2-bucket replication), and pairs beyond the window must not."""
    left = spark.createDataFrame(
        [(10, "A", _ts(10)), (11, "A", _ts(21))], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(20, "A", _ts(9)), (21, "A", _ts(1)), (22, "B", _ts(9))],
        "event_id long, k string, ts timestamp",
    )
    out = {(r.left_id, r.right_id): r.gap_us
           for r in range_join(left, right, "k", window_us=600_000_000).collect()}
    # 12:10 vs 12:09 → 60s (same/adjacent band); 12:10 vs 12:01 → 540s
    assert (10, 20) in out and out[(10, 20)] == 60_000_000
    assert (10, 21) in out and out[(10, 21)] == 540_000_000
    # 12:21 vs 12:09: 720s > 600s window → excluded; key B never pairs
    assert (11, 20) not in out
    assert all(lid != 22 and rid != 22 for lid, rid in out)


def test_range_join_matches_naive(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, f"k{rng.randint(0, 3)}", dt.datetime(2025, 3, 1) + dt.timedelta(seconds=rng.randint(0, 7200)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp")
    got = {
        (r.left_id, r.right_id)
        for r in range_join(df, df, "k", window_us=300_000_000).collect()
    }
    naive = set()
    for a_id, a_k, a_ts in rows:
        for b_id, b_k, b_ts in rows:
            d = (a_ts - b_ts).total_seconds() * 1_000_000
            if a_k == b_k and 0 < d <= 300_000_000:
                naive.add((a_id, b_id))
    assert got == naive


def test_asof_null_payload_does_not_splice_rows(spark):
    """A NULL payload value in the latest right row must NOT be
    backfilled from an older right row — the carried payload is one
    atomic row, never a composite of several."""
    import datetime as dt

    from etl_database_spark.operators.asof import asof_join_backward

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    right = spark.createDataFrame(
        [(1, t(1), 5.0, "r1"), (1, t(2), None, "r2")],
        "user_id long, ts timestamp, a double, b string",
    )
    left = spark.createDataFrame([(1, t(3), 100)], "user_id long, ts timestamp, x long")
    (row,) = asof_join_backward(left, right, key="user_id").collect()
    # latest right row is r2: a must be NULL (not r1's 5.0), b = 'r2'
    assert row.b_right == "r2" and row.ts_right == t(2)
    assert row.a_right is None


def test_asof_equal_ts_ties_are_deterministic(spark):
    import datetime as dt

    from etl_database_spark.operators.asof import asof_join_backward

    ts = dt.datetime(2024, 1, 1)
    right = spark.createDataFrame(
        [(1, ts, "p1"), (1, ts, "p2")], "user_id long, ts timestamp, payload string"
    )
    left = spark.createDataFrame([(1, ts, 1)], "user_id long, ts timestamp, x long")
    results = {
        asof_join_backward(left.repartition(n), right.repartition(5 - n), "user_id")
        .collect()[0]
        .payload_right
        for n in (1, 2, 3)
    }
    assert results == {"p2"}  # greatest payload-struct wins, every time
