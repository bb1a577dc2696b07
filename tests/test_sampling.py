"""Deterministic hash sampling/splitting: portability is the product —
the bucket function must match plain hashlib.md5, assignments must be
stable, and split ranges must partition the corpus."""

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import sampling as SMP


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(500)], "doc_id long")


def _py_bucket(key, buckets=1000):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % buckets


def test_hash_bucket_matches_hashlib(spark, ids):
    got = {
        r.doc_id: r.b
        for r in ids.select("doc_id", SMP.hash_bucket("doc_id").alias("b")).collect()
    }
    assert got == {i: _py_bucket(i) for i in range(500)}


def test_split_assign_partitions_and_is_stable(spark, ids):
    out1 = {r.doc_id: r.split for r in SMP.split_assign(ids, "doc_id").collect()}
    out2 = {r.doc_id: r.split for r in SMP.split_assign(ids, "doc_id").collect()}
    assert out1 == out2
    assert set(out1.values()) <= {"train", "val", "test"}
    # ranges follow the bucket exactly
    for i, s in out1.items():
        b = _py_bucket(i)
        assert s == ("train" if b < 900 else "val" if b < 950 else "test")


def test_split_weights_must_sum_to_one(spark, ids):
    with pytest.raises(ValueError):
        SMP.split_assign(ids, "doc_id", {"a": 0.5, "b": 0.2})


def test_hash_sample_fraction_and_subset(spark, ids):
    s10 = {r.doc_id for r in SMP.hash_sample(ids, "doc_id", 0.1).collect()}
    s20 = {r.doc_id for r in SMP.hash_sample(ids, "doc_id", 0.2).collect()}
    # nested: a bigger fraction strictly extends the smaller one
    assert s10 <= s20
    # within sampling noise of the target on 500 keys
    assert 0.05 <= len(s10) / 500 <= 0.16
    assert s10 == {i for i in range(500) if _py_bucket(i) < 100}


def test_split_boundaries_cover_bucket_space():
    bounds = SMP.split_boundaries({"train": 0.9, "val": 0.05, "test": 0.05})
    assert bounds == [("train", 0, 900), ("val", 900, 950), ("test", 950, 1000)]


def test_weighted_mixture_rates_and_nesting(spark):
    rows = [(i, f"src{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = SMP.weighted_mixture(
        df, "source", {"src0": 1.0, "src1": 0.5}, "doc_id", default=0.0
    )
    got = {r.source: r.n for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got.get("src0") == 500          # kept whole
    assert 180 <= got.get("src1", 0) <= 320  # ~50%
    assert "src2" not in got and "src3" not in got  # default 0 drops

    # nested property: raising a fraction only adds rows
    small = {r.doc_id for r in SMP.weighted_mixture(df, "source", {"src1": 0.2}, "doc_id").collect()}
    large = {r.doc_id for r in SMP.weighted_mixture(df, "source", {"src1": 0.6}, "doc_id").collect()}
    assert small <= large


def test_leakage_safe_splits_cluster_atomicity(spark):
    """Docs joined by a near-dup edge must land in one split; singleton
    docs must keep their plain per-doc split assignment."""
    from etl_database_spark.functions.dedup import connected_components

    # synthetic near-dup graph: {1,2,3} and {10,11} clustered, 20/21 loose
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long"
    )
    comps = connected_components(pairs).withColumnRenamed("_id", "doc_id")
    rep = docs.join(comps, "doc_id", "left").withColumn(
        "rep", F.coalesce("component", F.col("doc_id"))
    )
    out = {r.doc_id: (r.rep, r.split) for r in SMP.split_assign(rep, "rep").collect()}
    # cluster atomicity: one split per component
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11]
    # cluster splits keyed on the representative's bucket
    assert out[1][1] == _py_split(out[1][0])
    # singletons: same assignment a plain doc_id split would give
    for i in (20, 21):
        assert out[i] == (i, _py_split(i))


def _py_split(key):
    b = _py_bucket(key)
    return "train" if b < 900 else ("val" if b < 950 else "test")


def test_split_assign_null_keys_go_to_first_split(spark):
    """NULL keys must not silently land in the eval/test split (the
    otherwise() fallback) — they are routed to the first split and
    never dropped."""
    df = spark.createDataFrame([(1,), (None,), (2,)], "doc_id long")
    out = {r.doc_id: r.split for r in SMP.split_assign(df, "doc_id").collect()}
    assert len(out) == 3
    assert out[None] == "train"


def _py_es_key(key, w):
    """Pure-Python Efraimidis–Spirakis key mirroring the Spark plan:
    md5 48-bit uniform, HALF_UP rounds at both libm guards."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r9(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP))

    h48 = int(hashlib.md5(str(key).encode()).hexdigest()[:12], 16)
    return r9(r9(math.log((h48 + 1) / float(1 << 48))) / float(w))


def test_weighted_sample_topk_matches_pyref(spark):
    rows = [(i, "g%d" % (i % 3), (i * 37) % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    got = SMP.weighted_sample_topk(df, "doc_id", "w", "grp", k=4)
    got_rows = {(r.grp, r.doc_id): r.es_key for r in got.collect()}
    # pure-Python reference: rank every row per group by (key desc, id)
    import collections

    by_grp = collections.defaultdict(list)
    for i, g, w in rows:
        by_grp[g].append((-_py_es_key(i, w), i))
    want = {}
    for g, lst in by_grp.items():
        for negk, i in sorted(lst)[:4]:
            want[(g, i)] = -negk
    assert got_rows == pytest.approx(want)
    # without replacement: k distinct rows per group
    assert len(got_rows) == 12


def test_weighted_sample_zero_weight_excluded_and_weight_bias(spark):
    """Zero-weight rows never appear; a row with overwhelming weight
    is (deterministically) always selected — P(selection) -> 1 as its
    weight dominates, and ES realizes that with ln(u)/w -> 0."""
    rows = [(i, "g", 1) for i in range(100)] + [(1000, "g", 0), (2000, "g", 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    picked = {r.doc_id for r in SMP.weighted_sample_topk(df, "doc_id", "w", "grp", k=5).collect()}
    assert 1000 not in picked
    assert 2000 in picked
    assert len(picked) == 5
