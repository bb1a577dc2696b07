"""functions/rank.py: exact distributed rank/ntile must equal the
single-partition global window bit-for-bit, on sizes that exercise
uneven range partitions, ties in the primary key, and the degenerate
total < n case."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_database_spark.functions.rank import (
    exact_ntile,
    global_row_number,
    ranked_topk_small,
)


def _frame(spark, n, mod):
    # ties in v (mod buckets), unique id tie-break → total order
    return spark.range(n).select("id", (F.xxhash64("id") % mod).alias("v"))


def test_global_row_number_matches_window(spark):
    df = _frame(spark, 4001, 37)
    order = [F.desc("v"), F.asc("id")]
    got, total = global_row_number(df, order, out_col="rk", num_partitions=7)
    exp = df.withColumn("rk", F.row_number().over(W.orderBy(F.desc("v"), F.asc("id"))))
    assert total == 4001
    assert got.select("id", "rk").exceptAll(exp.select("id", "rk")).count() == 0
    assert exp.select("id", "rk").exceptAll(got.select("id", "rk")).count() == 0


def test_exact_ntile_all_tile_counts(spark):
    df = _frame(spark, 1003, 11)
    order = [F.asc("v"), F.asc("id")]
    for n in (1, 3, 4, 100, 1003, 2000):
        got = exact_ntile(df, n, order, "t", num_partitions=5)
        exp = df.withColumn(
            "t", F.ntile(n).over(W.orderBy(F.asc("v"), F.asc("id"))).cast("int")
        )
        assert got.select("id", "t").exceptAll(exp.select("id", "t")).count() == 0, n
        assert exp.select("id", "t").exceptAll(got.select("id", "t")).count() == 0, n


def test_exact_ntile_fewer_rows_than_tiles(spark):
    df = _frame(spark, 3, 11)
    got = exact_ntile(df, 5, ["v", "id"], "t")
    exp = df.withColumn("t", F.ntile(5).over(W.orderBy("v", "id")).cast("int"))
    assert sorted(r.t for r in got.collect()) == sorted(r.t for r in exp.collect()) == [1, 2, 3]


def test_empty_frame(spark):
    df = _frame(spark, 10, 3).where("id < 0")
    got, total = global_row_number(df, ["v", "id"], "rk")
    assert total == 0 and got.count() == 0
    assert exact_ntile(df, 4, ["v", "id"], "t").count() == 0


def test_ranked_topk_small(spark):
    df = _frame(spark, 500, 13)
    order = [F.desc("v"), F.asc("id")]
    topk = df.orderBy(*order).limit(25)
    got = ranked_topk_small(topk, order, "rk")
    exp = topk.withColumn("rk", F.row_number().over(W.orderBy(F.desc("v"), F.asc("id"))))
    assert got.select("id", "rk").exceptAll(exp.select("id", "rk")).count() == 0
    assert got.count() == 25


def test_no_unpartitioned_window_in_plans(spark):
    """The whole point: neither helper's physical plan contains a
    Window operator at all (rank comes from partition offsets /
    monotonic ids), so the single-partition WindowExec shape can't
    appear."""
    df = _frame(spark, 100, 7)
    ranked, _ = global_row_number(df, ["v", "id"], "rk")
    assert "Window" not in ranked._jdf.queryExecution().executedPlan().toString()
    small = ranked_topk_small(df.orderBy("v", "id").limit(5), ["v", "id"], "rk")
    assert "Window" not in small._jdf.queryExecution().executedPlan().toString()
