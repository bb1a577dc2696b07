"""Mergeable histograms: quantile accuracy within one bucket width,
exact merge, clamping, grouped estimation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_database_spark.functions.histogram import (
    histogram_merge,
    histogram_partials,
    histogram_quantiles,
)

LO, HI, BUCKETS = 0.0, 1000.0, 256
WIDTH = (HI - LO) / BUCKETS


def _values(n=20_000, seed=5):
    rng = random.Random(seed)
    # mixture: uniform + a lump, so quantiles aren't trivial
    return [
        rng.uniform(0, 1000) if rng.random() < 0.7 else rng.gauss(300, 20)
        for _ in range(n)
    ]


def _exact_quantile(vals, q):
    s = sorted(vals)
    return s[min(int(q * len(s)), len(s) - 1)]


def test_quantiles_within_bucket_width(spark):
    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sketch = histogram_partials(df, "v", LO, HI, buckets=BUCKETS)
    got = {
        r.q: r.est
        for r in histogram_quantiles(sketch, [0.25, 0.5, 0.9, 0.99], LO, HI, buckets=BUCKETS).collect()
    }
    for q, est in got.items():
        assert abs(est - _exact_quantile(vals, q)) <= 2 * WIDTH, (q, est)


def test_merge_equals_whole(spark):
    vals = _values()
    whole = spark.createDataFrame([(v,) for v in vals], "v double")
    h1 = spark.createDataFrame([(v,) for v in vals[:10_000]], "v double")
    h2 = spark.createDataFrame([(v,) for v in vals[10_000:]], "v double")
    merged = histogram_merge(
        histogram_partials(h1, "v", LO, HI), histogram_partials(h2, "v", LO, HI)
    )
    direct = histogram_partials(whole, "v", LO, HI)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_out_of_range_clamps_into_edge_buckets(spark):
    df = spark.createDataFrame([(-50.0,), (2_000.0,), (500.0,)], "v double")
    sketch = histogram_partials(df, "v", LO, HI, buckets=BUCKETS)
    rows = {r.bucket: r.cnt for r in sketch.collect()}
    assert rows.get(0) == 1  # below lo
    assert rows.get(BUCKETS - 1) == 1  # above hi
    assert sum(rows.values()) == 3  # nothing dropped


def test_nulls_are_skipped_like_sql_aggregates(spark):
    """A NULL value must not land in any bucket (the ddsketch /
    SQL-aggregate contract): without the explicit filter,
    greatest(NULL, 0)=0 silently counts NULLs into bucket 0 and skews
    every served quantile low."""
    vals = [float(i) for i in range(1, 101)]  # 1..100
    rows = [(v,) for v in vals] + [(None,)] * 50
    df = spark.createDataFrame(rows, "v double")
    sketch = histogram_partials(df, "v", LO, HI, buckets=BUCKETS)
    counted = sum(r.cnt for r in sketch.collect())
    assert counted == len(vals)  # the 50 NULLs are excluded from n
    assert all(r.bucket is not None for r in sketch.collect())
    got = {
        r.q: r.est
        for r in histogram_quantiles(sketch, [0.5], LO, HI, buckets=BUCKETS).collect()
    }
    # median of 1..100, not of (50 zeros + 1..100)
    assert abs(got[0.5] - _exact_quantile(vals, 0.5)) <= 2 * WIDTH


def test_grouped_quantiles(spark):
    rows = [("a", float(i)) for i in range(1000)] + [
        ("b", float(i * 2)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    sketch = histogram_partials(df, "v", LO, HI, group_cols=["g"])
    got = {
        (r.g, r.q): r.est
        for r in histogram_quantiles(sketch, [0.5], LO, HI, group_cols=["g"]).collect()
    }
    assert abs(got[("a", 0.5)] - 500) <= 2 * WIDTH
    assert abs(got[("b", 0.5)] - 500) <= 2 * WIDTH
