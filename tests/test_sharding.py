"""Training-shard writer: deterministic assignment, stable intra-shard
order, shard-count contract."""

import hashlib

import pytest

from etl_database_spark.operators.sharding import with_shard, write_training_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(400)], "doc_id long, text string"
    )


def _py_shard(key, n_shards):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % (1000 * n_shards) % n_shards


def test_with_shard_deterministic_and_portable(spark, docs):
    got = {r.doc_id: r.shard for r in with_shard(docs, "doc_id", 8).collect()}
    assert got == {i: _py_shard(i, 8) for i in range(400)}
    assert set(got.values()) == set(range(8))


def test_write_training_shards_layout(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", n_shards=8)

    # shard directories are the contract
    dirs = sorted(p.name for p in (tmp_path / "shards").iterdir() if p.name.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(8)]

    back = spark.read.parquet(out)
    assert back.count() == 400
    # every row is in the shard its key dictates
    assert all(r.shard == _py_shard(r.doc_id, 8) for r in back.collect())

    # intra-shard order is sorted by key (stable layout)
    for i in range(8):
        part = spark.read.parquet(f"{out}/shard={i}").collect()
        ids = [r.doc_id for r in part]
        assert ids == sorted(ids)


def test_rewrite_is_identical(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, "doc_id", n_shards=4)
    write_training_shards(docs, b, "doc_id", n_shards=4)
    fa = spark.read.parquet(a).orderBy("doc_id").collect()
    fb = spark.read.parquet(b).orderBy("doc_id").collect()
    assert fa == fb
