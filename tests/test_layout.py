"""Z-order layout: interleave correctness and measurable file skipping."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_database_spark.operators.layout import (
    file_range_overlap,
    morton_interleave,
    with_zorder,
    write_zordered,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_morton_interleave_matches_reference(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = df.withColumn(
        "z", morton_interleave([F.col("x"), F.col("y")], bits=8)
    ).collect()
    for r in out:
        assert r.z == _morton_ref(r.x, r.y, 8), (r.x, r.y)


def test_with_zorder_respects_bit_budget(spark):
    df = spark.createDataFrame([(1, 2, 3, 4, 5, 6)], "a int, b int, c int, d int, e int, f int")
    with pytest.raises(ValueError):
        with_zorder(df, ["a", "b", "c", "d", "e", "f"], bits=12)  # 72 > 62


@pytest.fixture(scope="module")
def points(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(0, 10_000), rng.randrange(0, 10_000)) for i in range(50_000)
    ]
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_zorder_prunes_on_both_dimensions(spark, points, tmp_path):
    """Against an x-sorted layout, a narrow y-range predicate overlaps
    every file; the z-ordered layout must skip most files on BOTH a
    y-range and an x-range — the whole point of multi-dim clustering."""
    n_files = 16
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    (
        points.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(plain)
    )
    write_zordered(points, zord, ["x", "y"], n_files=n_files, bits=12)

    # same rows either way (layout is a rewrite, not a transform)
    assert (
        spark.read.parquet(zord).orderBy("id").drop("_z").collect()
        == points.orderBy("id").collect()
    )

    # narrow y slice (~6% of the domain)
    y_plain, total_plain = file_range_overlap(plain, "y", 4000, 4600)
    y_z, total_z = file_range_overlap(zord, "y", 4000, 4600)
    assert total_plain == total_z == n_files
    assert y_plain == n_files  # x-sorted layout cannot skip on y
    assert y_z <= n_files // 2  # z-order must skip at least half

    # and x-range pruning must survive the interleave
    x_z, _ = file_range_overlap(zord, "x", 1000, 1600)
    assert x_z <= n_files // 2

    # the skip decision matches actual content: rows outside the stats
    # ranges really are absent from skipped files (spot check by count)
    n_match_z = spark.read.parquet(zord).where(F.col("y").between(4000, 4600)).count()
    n_match_plain = (
        spark.read.parquet(plain).where(F.col("y").between(4000, 4600)).count()
    )
    assert n_match_z == n_match_plain


def test_with_zorder_nulls_code_as_zero(spark):
    """A NULL in a z-order column must not cluster with max-valued
    rows: floor(NULL) is NULL and F.least ignores NULLs, so without
    explicit handling a NULL row silently took the TOP bucket. NULLs
    code as 0 (cluster with the minimum) and the code stays non-null."""
    from etl_database_spark.operators.layout import with_zorder

    df = spark.createDataFrame(
        [(0.0, 0.0), (100.0, 100.0), (None, 0.0), (0.0, None)],
        "x double, y double",
    )
    z = {(r.x, r.y): r._z for r in with_zorder(df, ["x", "y"], bits=4).collect()}
    assert z[(0.0, 0.0)] == 0
    assert z[(None, 0.0)] == z[(0.0, 0.0)]  # NULL x → bucket 0, same as min
    assert z[(0.0, None)] == z[(0.0, 0.0)]
    assert z[(100.0, 100.0)] == max(z.values())  # max row alone at top
    assert all(v is not None for v in z.values())
