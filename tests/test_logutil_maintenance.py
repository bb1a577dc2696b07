import datetime as dt

from pyspark.sql import functions as F

from etl_database_spark.logutil import RunLogger, purge_old_logs, read_logs
from etl_database_spark.maintenance import compact_table, table_stats_snapshot


def test_run_logger(spark, tmp_path):
    path = str(tmp_path / "logs")
    with RunLogger(spark, path, "import") as log:
        log.log("step one")
        log.log("step two")
    df = read_logs(spark, path).orderBy("stepcounter")
    rows = df.collect()
    assert len(rows) == 4  # started + 2 steps + finished
    assert len({r.run_uuid for r in rows}) == 1
    assert [r.stepcounter for r in rows] == [1, 2, 3, 4]
    assert all(r.totalruntime >= r.stepruntime - 1e-9 for r in rows)
    # cumulative runtime is non-decreasing
    totals = [r.totalruntime for r in rows]
    assert totals == sorted(totals)


def test_purge_old_logs(spark, tmp_path):
    path = str(tmp_path / "logs")
    with RunLogger(spark, path, "x") as log:
        log.log("recent")
    removed = purge_old_logs(spark, path, keep_days=14)
    assert removed == 0
    assert read_logs(spark, path).count() == 3
    removed = purge_old_logs(spark, path, keep_days=0)
    assert removed == 3


def test_compact_and_stats(spark, tmp_path):
    data_root = tmp_path / "data"
    tbl = data_root / "t1"
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(16).write.parquet(str(tbl))
    before = compact_table(spark, str(tbl), target_files=2)
    assert before >= 16
    out = spark.read.parquet(str(tbl))
    assert out.count() == 1000
    files = [f for f in __import__("os").listdir(tbl) if f.endswith(".parquet")]
    assert len(files) <= 2

    stats = table_stats_snapshot(spark, str(data_root), str(tmp_path / "stats"))
    row = stats.where(F.col("tablename") == "t1").first()
    assert row.n_rows == 1000 and row.n_files == len(files)
    assert spark.read.parquet(str(tmp_path / "stats")).count() >= 1


def test_backup_and_rotation(spark, tmp_path):
    import os
    import tarfile
    import time

    from etl_database_spark.backup import backup_data_root, purge_old_files

    data = tmp_path / "data"
    (data / "t1").mkdir(parents=True)
    (data / "t1" / "part-0.parquet").write_bytes(b"x" * 100)

    bdir = str(tmp_path / "backups")
    path = backup_data_root(str(data), bdir, keep_days=3)
    assert os.path.exists(path)
    with tarfile.open(path) as t:
        assert any(m.name.endswith("part-0.parquet") for m in t.getmembers())

    # rotation: an old backup beyond keep_days is removed on next run
    old = os.path.join(bdir, "backup_20200101T000000.tar.gz")
    open(old, "wb").write(b"old")
    os.utime(old, (time.time() - 10 * 86400,) * 2)
    path2 = backup_data_root(str(data), bdir, keep_days=3)
    assert not os.path.exists(old)
    assert os.path.exists(path) and os.path.exists(path2)

    # file retention (find -mtime analog), glob-scoped
    logs = tmp_path / "logs"
    logs.mkdir()
    stale = logs / "run_old.log"
    fresh = logs / "run_new.log"
    stale.write_text("a")
    fresh.write_text("b")
    os.utime(stale, (time.time() - 20 * 86400,) * 2)
    removed = purge_old_files(str(logs), keep_days=14, pattern="*.log")
    assert [os.path.basename(p) for p in removed] == ["run_old.log"]
    assert fresh.exists()
