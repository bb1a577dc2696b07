"""HyperLogLog sketch rows: accuracy vs exact distinct, exact
mergeability, and grouped estimation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions.hll import (
    hll_estimate,
    hll_merge,
    hll_partials,
    hll_std_error,
)


@pytest.mark.parametrize("n_distinct", [100, 1_000, 20_000])
def test_estimate_within_error_bound(spark, n_distinct):
    """Estimate within 5 sigma of the theoretical HLL error (plus a
    small-cardinality floor) — deterministic, since xxhash64 is."""
    df = spark.range(n_distinct).select(F.concat(F.lit("user_"), "id").alias("k"))
    est = hll_estimate(hll_partials(df, "k")).collect()[0].approx_distinct
    tol = max(5 * hll_std_error() * n_distinct, 10)
    assert abs(est - n_distinct) <= tol, (est, n_distinct)


def test_duplicates_do_not_inflate(spark):
    base = spark.range(500).select(F.concat(F.lit("u"), "id").alias("k"))
    dup = base.unionByName(base).unionByName(base)
    est_once = hll_estimate(hll_partials(base, "k")).collect()[0].approx_distinct
    est_dup = hll_estimate(hll_partials(dup, "k")).collect()[0].approx_distinct
    assert est_once == est_dup


def test_merge_equals_whole(spark):
    """max-merged partials of two halves must be row-identical to the
    partials of the union — the mergeability the store design needs."""
    whole = spark.range(5_000).select(F.concat(F.lit("u"), "id").alias("k"))
    h1 = whole.where(F.col("k") < "u25")  # lexicographic split, uneven is fine
    h2 = whole.subtract(h1)
    merged = hll_merge(hll_partials(h1, "k"), hll_partials(h2, "k"))
    direct = hll_partials(whole, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    e_m = hll_estimate(merged).collect()[0].approx_distinct
    e_d = hll_estimate(direct).collect()[0].approx_distinct
    assert e_m == e_d


def test_grouped_estimates(spark):
    """Per-group sketches: each day's estimate tracks that day's
    distinct keys, not the global count."""
    df = (
        spark.range(3_000)
        .select(
            (F.col("id") % 3).cast("string").alias("day"),
            # day 0: 1000 distinct; day 1 and 2 share keys with day 0
            F.concat(F.lit("u"), (F.col("id") % 1000)).alias("k"),
        )
    )
    parts = hll_partials(df, "k", group_cols=["day"])
    out = {r.day: r.approx_distinct for r in hll_estimate(parts, ["day"]).collect()}
    assert set(out) == {"0", "1", "2"}
    for day, est in out.items():
        # each day saw ~1000 distinct keys (ids congruent to that day)
        assert abs(est - 1000) <= max(5 * hll_std_error() * 1000, 10), (day, est)


def test_partials_are_engine_small(spark):
    """The sketch is bounded by m=4096 rows per group regardless of
    input size."""
    df = spark.range(50_000).select(F.concat(F.lit("u"), "id").alias("k"))
    n_rows = hll_partials(df, "k").count()
    assert n_rows <= 4096


def test_registered_daily_query_tracks_exact(spark):
    """The registry entry must track exact per-day distincts within
    the sketch tolerance on the real fixture."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("fixture missing")
    from etl_database_spark.queries import load_all

    q = load_all()["daily_unique_users_hll"]
    got = {r.day: r.approx_distinct for r in q.fn(spark, sf).collect()}
    from etl_database_spark.queries import table

    exact = {
        r.day: r.n
        for r in table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for day, n in exact.items():
        assert abs(got[day] - n) <= max(5 * hll_std_error() * n, 10), (day, got[day], n)


def test_intersection_estimate(spark):
    """Inclusion-exclusion over sketches: a 50% overlap of two 4k-key
    sets estimates within the compounded tolerance."""
    a = spark.range(0, 4_000).select(F.concat(F.lit("u"), "id").alias("k"))
    b = spark.range(2_000, 6_000).select(F.concat(F.lit("u"), "id").alias("k"))
    from etl_database_spark.functions.hll import hll_intersection_estimate

    row = hll_intersection_estimate(hll_partials(a, "k"), hll_partials(b, "k")).collect()[0]
    # three estimates compound: allow 3x the single-sketch 5-sigma band
    tol = 3 * 5 * hll_std_error() * 4_000
    assert abs(row.approx_intersection - 2_000) <= tol, row
    assert abs(row.n_union - 6_000) <= tol, row
