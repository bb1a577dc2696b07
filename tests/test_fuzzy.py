"""Deletion-neighborhood fuzzy join (functions/fuzzy.py): blocking
must be loss-free vs brute force for distance <= 1, and must exclude
distance-2 lookalikes (transpositions)."""

import itertools

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import fuzzy as FZ


def _levenshtein(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


KEYS = [
    (1, "market"),
    (2, "warket"),   # substitution of 1
    (3, "marke"),    # deletion of 1
    (4, "markets"),  # insertion of 1
    (5, "makret"),   # transposition: distance 2 -> excluded
    (6, "totally-different"),
    (7, "a"),
    (8, ""),         # empty key: distance 1 from "a"
    (9, "market"),   # exact duplicate of 1: distance 0
]


def test_blocking_is_lossfree_vs_brute_force(spark):
    df = spark.createDataFrame(KEYS, ["id", "name"])
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in FZ.fuzzy_pairs_dist1(df, "name", "id").collect()
    }
    want = {
        (i1, i2, _levenshtein(n1, n2))
        for (i1, n1), (i2, n2) in itertools.combinations(KEYS, 2)
        if _levenshtein(n1, n2) <= 1
    }
    assert got == want
    # the transposition lookalike must NOT be present
    assert not any({a, b} == {1, 5} for a, b, _ in got)
    # and the known-true pairs must
    for pair in [(1, 2), (1, 3), (1, 4), (1, 9), (7, 8)]:
        assert any((a, b) == pair for a, b, _ in got), pair


def test_variant_count_is_len_plus_one(spark):
    df = spark.createDataFrame([(1, "abcd")], ["id", "name"])
    variants = df.select(
        F.explode(FZ.deletion_variants(F.col("name"))).alias("v")
    ).collect()
    assert sorted(r["v"] for r in variants) == ["abc", "abcd", "abd", "acd", "bcd"]
