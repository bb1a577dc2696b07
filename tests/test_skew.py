from pyspark.sql import functions as F

from etl_database_spark.operators.skew import salted_broadcast_join, salted_sum_count


def test_salted_aggregation_equals_plain(spark):
    # heavily skewed: 90% of rows share one key
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
        F.col("id"),
    )
    salted = {
        r.k: (r.total, r.n_rows)
        for r in salted_sum_count(df, ["k"], "v", num_salts=16, unique_col="id").collect()
    }
    plain = {
        r.k: (r.total, r.n)
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_broadcast_join_equals_plain(spark):
    fact = spark.range(2000).select(
        (F.col("id") % 3).alias("key"), F.col("id").alias("fact_id")
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "unused")], "key long, name string")
    salted = salted_broadcast_join(fact, dim, "key", num_salts=4, unique_col="fact_id")
    plain = fact.join(dim, "key")
    assert salted.count() == plain.count() == 2000
    s = {(r.fact_id, r.name) for r in salted.collect()}
    p = {(r.fact_id, r.name) for r in plain.collect()}
    assert s == p


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Same-bucketed tables join without exchanging either side —
    the repeated-join co-location strategy (operators/bucketing.py)."""
    from pyspark.sql import functions as F

    from etl_database_spark.operators.bucketing import bucketed_join, write_bucketed

    left = spark.range(10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(10000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, "bk_left", "k", num_buckets=4)
    write_bucketed(right, "bk_right", "k", num_buckets=4)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "bk_left", "bk_right", "k")
            assert joined.count() == 10000
            executed = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in executed, executed[:2000]

            # control: the same join on unbucketed frames shuffles
            plain = left.join(right, "k")
            plain.count()
            control = plain._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in control
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
