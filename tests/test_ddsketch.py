"""DDSketch log-bucket quantiles: relative-error guarantee, exact
merge, zero/null/negative handling, grouped estimation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions.ddsketch import (
    dds_merge,
    dds_partials,
    dds_quantiles,
)

ALPHA = 0.01


def _values(n=20_000, seed=9):
    rng = random.Random(seed)
    # lognormal: spans several orders of magnitude — the case the
    # fixed-bound histogram cannot cover without knowing the range
    return [rng.lognormvariate(2.0, 1.5) for _ in range(n)]


def _exact_quantile(vals, q):
    s = sorted(vals)
    return s[min(int(q * len(s)), len(s) - 1)]


def test_relative_error_bound(spark):
    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sketch = dds_partials(df, "v", alpha=ALPHA)
    got = {
        r.q: r.est
        for r in dds_quantiles(sketch, [0.01, 0.25, 0.5, 0.9, 0.99], alpha=ALPHA).collect()
    }
    for q, est in got.items():
        true = _exact_quantile(vals, q)
        # bucket midpoint guarantees alpha; rank granularity adds a hair
        assert abs(est - true) <= 1.5 * ALPHA * true, (q, est, true)


def test_merge_equals_whole(spark):
    vals = _values()
    whole = spark.createDataFrame([(v,) for v in vals], "v double")
    h1 = spark.createDataFrame([(v,) for v in vals[:10_000]], "v double")
    h2 = spark.createDataFrame([(v,) for v in vals[10_000:]], "v double")
    merged = dds_merge(dds_partials(h1, "v"), dds_partials(h2, "v"))
    direct = dds_partials(whole, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_zero_and_null_handling(spark):
    df = spark.createDataFrame(
        [(0.0,), (0.0,), (None,), (5.0,)], "v double"
    )
    sketch = dds_partials(df, "v")
    # nulls skipped: total count is 3; median of {0, 0, 5} is 0
    assert sketch.agg(F.sum("cnt")).collect()[0][0] == 3
    est = dds_quantiles(sketch, [0.5]).collect()[0].est
    assert est == 0.0


def test_negative_values_rejected(spark):
    df = spark.createDataFrame([(1.0,), (-2.0,)], "v double")
    with pytest.raises(Exception, match="negative value"):
        dds_partials(df, "v").collect()


def test_grouped_quantiles(spark):
    rows = [("a", float(i + 1)) for i in range(1000)] + [
        ("b", float((i + 1) * 100)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    sketch = dds_partials(df, "v", group_cols=["g"])
    got = {
        (r.g, r.q): r.est
        for r in dds_quantiles(sketch, [0.5], group_cols=["g"]).collect()
    }
    assert abs(got[("a", 0.5)] - 500) <= 2 * ALPHA * 500 + 1
    assert abs(got[("b", 0.5)] - 50_000) <= 2 * ALPHA * 50_000 + 100
