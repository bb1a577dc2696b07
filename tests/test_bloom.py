"""Bloom-filter sketch (functions/bloom.py): no false negatives,
bounded false-positive rate, OR-merge algebra (associative, idempotent,
equal to a fresh build over the union), and packing invariants."""

import math
import random

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import bloom as B

M = 1 << 14  # 16384 bits for the tests


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], ["k"])


def _probe(spark, filt, keys):
    probes = _keys_df(spark, keys)
    out = B.bloom_might_contain(filt, probes, "k", ["k"], M)
    return {r["k"]: r["bloom_hit"] for r in out.collect()}


@pytest.fixture(scope="module")
def keysets():
    rng = random.Random(11)
    inserted = [f"key-{rng.randrange(10**9)}-{i}" for i in range(600)]
    absent = [f"abs-{rng.randrange(10**9)}-{i}" for i in range(2000)]
    return inserted, absent


def test_no_false_negatives(spark, keysets):
    inserted, _ = keysets
    filt = B.bloom_partials(_keys_df(spark, inserted), "k", M)
    hits = _probe(spark, filt, inserted)
    assert all(hits[k] == 1 for k in inserted)


def test_false_positive_rate_bounded(spark, keysets):
    inserted, absent = keysets
    filt = B.bloom_partials(_keys_df(spark, inserted), "k", M)
    hits = _probe(spark, filt, absent)
    fpr = sum(hits.values()) / len(absent)
    theory = (1 - math.exp(-B.BLOOM_K * len(inserted) / M)) ** B.BLOOM_K
    assert fpr <= max(4 * theory, 0.01), (fpr, theory)


def test_merge_equals_fresh_build(spark, keysets):
    inserted, _ = keysets
    half = len(inserted) // 2
    a = B.bloom_partials(_keys_df(spark, inserted[:half]), "k", M)
    b = B.bloom_partials(_keys_df(spark, inserted[half:]), "k", M)
    merged = B.bloom_merge(a.unionAll(b))
    fresh = B.bloom_partials(_keys_df(spark, inserted), "k", M)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, fresh.collect()))


def test_merge_idempotent(spark, keysets):
    inserted, _ = keysets
    filt = B.bloom_partials(_keys_df(spark, inserted), "k", M)
    twice = B.bloom_merge(filt.unionAll(filt))
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, filt.collect()))


def test_packing_invariants(spark, keysets):
    inserted, _ = keysets
    rows = B.bloom_partials(_keys_df(spark, inserted), "k", M).collect()
    assert len(rows) <= M // 32
    for r in rows:
        assert 0 <= r["word"] < M // 32
        assert 0 < r["bits"] < (1 << 32)  # 32-bit packing, no sign games


def test_empty_filter_rejects_everything(spark, keysets):
    _, absent = keysets
    empty = B.bloom_partials(_keys_df(spark, ["seed"]), "k", M).where(F.lit(False))
    hits = _probe(spark, empty, absent[:50])
    assert all(v == 0 for v in hits.values())
