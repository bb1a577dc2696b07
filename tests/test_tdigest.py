"""t-digest (functions/tdigest.py): rank-error accuracy on uniform /
negative-normal / heavy-tail data, merge algebra, centroid bounds,
partition-order determinism, and null handling."""

import random

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import tdigest as TD

DELTA = 200
QS = [0.01, 0.1, 0.5, 0.9, 0.99]


def _rank_error(values, q, est):
    """|empirical rank of est - q|."""
    below = sum(1 for v in values if v <= est)
    return abs(below / len(values) - q)


def _digest_quantiles(spark, values, delta=DELTA):
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    cents = TD.tdigest_partials(df, "v", delta=delta)
    out = TD.tdigest_quantiles(cents, QS)
    return cents, {r["q"]: r["est"] for r in out.collect()}


@pytest.fixture(scope="module")
def corpora():
    rng = random.Random(5)
    return {
        "uniform": [rng.random() for _ in range(20000)],
        "normal": [rng.gauss(-3.0, 2.0) for _ in range(20000)],  # negatives
        "heavy": [rng.lognormvariate(0, 2) for _ in range(20000)],
    }


@pytest.mark.parametrize("dist", ["uniform", "normal", "heavy"])
def test_rank_error_bounded(spark, corpora, dist):
    values = corpora[dist]
    cents, ests = _digest_quantiles(spark, values)
    for q in QS:
        err = _rank_error(values, q, ests[q])
        # k1 band width ~ 2*pi/delta in k-space -> rank error well under
        # 1% at delta=200; tails are tighter by construction
        assert err < 0.01, (dist, q, ests[q], err)
    assert cents.count() <= DELTA // 2 + 2


def test_tail_bands_are_fine_grained(spark, corpora):
    """The scale function concentrates resolution at the tails: p99
    rank error must be tighter than the mid-quantile bound."""
    values = corpora["heavy"]
    _, ests = _digest_quantiles(spark, values)
    assert _rank_error(values, 0.99, ests[0.99]) < 0.004
    assert _rank_error(values, 0.01, ests[0.01]) < 0.004


def test_merge_of_batches_matches_one_shot(spark, corpora):
    values = corpora["normal"]
    chunks = [values[i::4] for i in range(4)]
    parts = [
        TD.tdigest_partials(
            spark.createDataFrame([(float(v),) for v in c], ["v"]), "v", delta=DELTA
        )
        for c in chunks
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = TD.tdigest_merge(u, delta=DELTA)
    assert merged.count() <= DELTA // 2 + 2
    ests = {r["q"]: r["est"] for r in TD.tdigest_quantiles(merged, QS).collect()}
    for q in QS:
        assert _rank_error(values, q, ests[q]) < 0.015, (q, ests[q])
    # total weight is conserved exactly through the merge
    assert merged.agg(F.sum("weight")).collect()[0][0] == len(values)


def test_grouped_digests_are_independent(spark, corpora):
    rows = [("u", float(v)) for v in corpora["uniform"][:5000]] + [
        ("n", float(v)) for v in corpora["normal"][:5000]
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    cents = TD.tdigest_partials(df, "v", ["g"], delta=DELTA)
    out = TD.tdigest_quantiles(cents, [0.5], ["g"]).collect()
    got = {r["g"]: r["est"] for r in out}
    assert 0.45 < got["u"] < 0.55
    assert -3.3 < got["n"] < -2.7


def test_fixed_partitioning_is_deterministic(spark, corpora):
    """For a FIXED partitioning the digest is bit-reproducible; across
    different partitionings the centroid sets may differ (two-level
    parallel construction) but served quantiles stay within bounds."""
    values = corpora["heavy"][:8000]
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    a = TD.tdigest_partials(df.repartition(8), "v", delta=DELTA)
    b = TD.tdigest_partials(df.repartition(8), "v", delta=DELTA)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    narrow = TD.tdigest_partials(df.repartition(1), "v", delta=DELTA)
    for cents in (a, narrow):
        ests = {r["q"]: r["est"] for r in TD.tdigest_quantiles(cents, QS).collect()}
        for q in QS:
            assert _rank_error(values, q, ests[q]) < 0.015, (q, ests[q])


def test_nulls_are_skipped(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,), (None,)], "v double"
    )
    cents = TD.tdigest_partials(df, "v", delta=DELTA)
    assert cents.agg(F.sum("weight")).collect()[0][0] == 3
    est = TD.tdigest_quantiles(cents, [0.5]).collect()[0]["est"]
    assert est == pytest.approx(2.0, abs=0.5)


def test_single_value_group(spark):
    df = spark.createDataFrame([(42.0,)], "v double")
    cents = TD.tdigest_partials(df, "v", delta=DELTA)
    out = {r["q"]: r["est"] for r in TD.tdigest_quantiles(cents, QS).collect()}
    assert all(v == 42.0 for v in out.values())


def test_empty_input(spark):
    df = spark.createDataFrame([], "v double")
    cents = TD.tdigest_partials(df, "v", delta=DELTA)
    assert cents.count() == 0
    assert TD.tdigest_quantiles(cents, [0.5]).count() == 0


def test_all_null_group_is_absent(spark):
    df = spark.createDataFrame([("a", None), ("a", None), ("b", 1.0)], "g string, v double")
    cents = TD.tdigest_partials(df, "v", ["g"], delta=DELTA)
    groups = {r["g"] for r in cents.select("g").distinct().collect()}
    assert groups == {"b"}
