"""KMV distinct-count sketch: exactness below k, estimation accuracy
above k, group independence."""

from pyspark.sql import functions as F

from etl_database_spark.functions.kmv import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    out = kmv_distinct(df, "k", k=256).collect()
    assert len(out) == 1
    assert out[0].kmv_distinct == 100.0


def test_kmv_estimates_within_bound(spark):
    """n=20_000 distinct keys at k=256: relative error ≈ 1/√(k−2) ≈
    6.3%; assert within 4σ (deterministic — the hash is fixed, this
    just pins the fixture's actual error inside the theory bound)."""
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("k"))
    # duplicates must not move the estimate: distinct hashes only
    df = df.union(spark.range(500).select(F.col("id").alias("k")))
    est = kmv_distinct(df, "k", k=256).collect()[0].kmv_distinct
    assert abs(est - n) / n < 4 / (254**0.5), est


def test_kmv_grouped_independent(spark):
    """Each group estimates from its own hashes: a small group stays
    exact while a big one estimates."""
    big = spark.range(10_000).select(
        F.lit("big").alias("g"), F.col("id").alias("k")
    )
    small = spark.range(50).select(
        F.lit("small").alias("g"), (F.col("id") + 1_000_000).alias("k")
    )
    out = {
        r.g: r.kmv_distinct
        for r in kmv_distinct(big.union(small), "k", ["g"], k=256).collect()
    }
    assert out["small"] == 50.0
    assert abs(out["big"] - 10_000) / 10_000 < 4 / (254**0.5)
