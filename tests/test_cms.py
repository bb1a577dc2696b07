"""Count-min sketch: one-sided error, exact merge, grouped queries."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_database_spark.functions.cms import (
    cms_merge,
    cms_partials,
    cms_point_estimate,
)


def _zipf_rows(n=20_000, n_keys=500, seed=3):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        # zipf-ish: low ids much more frequent
        k = min(int(rng.paretovariate(1.2)), n_keys)
        rows.append((f"key_{k}",))
    return rows


def test_never_undercounts_and_bounds_overcount(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "k string")
    sketch = cms_partials(df, "k")
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    keys = df.select("k").distinct()
    est = {r.k: r.approx_count for r in cms_point_estimate(sketch, keys, "k").collect()}
    n_total = len(rows)
    eps = 2.0 * 2.718 / 2048  # generous 2x the e/w bound for the test
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)  # one-sided: never under
        assert est[k] - n <= max(eps * n_total, 5), (k, est[k], n)


def test_absent_key_estimates_small(spark):
    df = spark.createDataFrame(_zipf_rows(), "k string")
    sketch = cms_partials(df, "k")
    ghosts = spark.createDataFrame([("nope_1",), ("nope_2",)], "k string")
    est = {r.k: r.approx_count for r in cms_point_estimate(sketch, ghosts, "k").collect()}
    for k, v in est.items():
        assert v <= 2.0 * 2.718 / 2048 * 20_000 + 5, (k, v)


def test_merge_equals_whole(spark):
    rows = _zipf_rows()
    whole = spark.createDataFrame(rows, "k string")
    h1 = spark.createDataFrame(rows[:10_000], "k string")
    h2 = spark.createDataFrame(rows[10_000:], "k string")
    merged = cms_merge(cms_partials(h1, "k"), cms_partials(h2, "k"))
    direct = cms_partials(whole, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_grouped_and_weighted(spark):
    df = spark.createDataFrame(
        [("d1", "a", 3), ("d1", "a", 2), ("d1", "b", 1), ("d2", "a", 10)],
        "day string, k string, w int",
    )
    sketch = cms_partials(df, "k", group_cols=["day"], weight_col="w")
    keys = df.select("k", "day").distinct()
    est = {
        (r.k, r.day): r.approx_count
        for r in cms_point_estimate(sketch, keys, "k", group_cols=["day"]).collect()
    }
    # tiny key set: no collisions, estimates are exact weighted sums
    assert est[("a", "d1")] == 5
    assert est[("b", "d1")] == 1
    assert est[("a", "d2")] == 10
