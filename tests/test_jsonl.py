"""JSONL corpus source: schema enforcement, corrupt-line counting via
observe (single pass), quarantine, gzip transparency."""

from __future__ import annotations

import gzip
import json
import os

from etl_database_spark.sources.jsonl import read_jsonl_corpus


def _write_corpus(dirpath, compress=False):
    os.makedirs(dirpath, exist_ok=True)
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}),
        "{this is not json",
        json.dumps({"doc_id": 3, "text": "ok", "lang": "en", "source": "books"}),
        '"just a string, not an object"',
    ]
    payload = "\n".join(lines) + "\n"
    if compress:
        with gzip.open(os.path.join(dirpath, "part-000.jsonl.gz"), "wt") as f:
            f.write(payload)
    else:
        with open(os.path.join(dirpath, "part-000.jsonl"), "w") as f:
            f.write(payload)


def test_jsonl_schema_enforced_and_corrupts_counted(spark, tmp_path):
    src = str(tmp_path / "corpus")
    _write_corpus(src)
    clean, obs = read_jsonl_corpus(spark, src)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].text == "hello world" and rows[2].lang == "fr"
    got = obs.get
    assert got["rows_total"] == 5 and got["rows_corrupt"] == 2


def test_jsonl_quarantine_preserves_raw_lines(spark, tmp_path):
    src = str(tmp_path / "corpus")
    q = str(tmp_path / "quarantine")
    _write_corpus(src)
    clean, obs = read_jsonl_corpus(spark, src, quarantine_path=q)
    assert clean.count() == 3
    bad = {r.value for r in spark.read.text(q).collect()}
    assert "{this is not json" in bad
    assert len(bad) == 2
    # re-running the same corpus (retry / re-executed stage) overwrites
    # its keyed quarantine dir instead of duplicating every line
    clean2, _ = read_jsonl_corpus(spark, src, quarantine_path=q)
    assert clean2.count() == 3
    assert spark.read.text(q).count() == 2


def test_jsonl_gzip_native(spark, tmp_path):
    src = str(tmp_path / "corpus_gz")
    _write_corpus(src, compress=True)
    clean, obs = read_jsonl_corpus(spark, src)
    assert clean.count() == 3
    assert obs.get["rows_corrupt"] == 2


def test_jsonl_streaming_matches_batch(spark, tmp_path):
    """AvailableNow streaming pass over the same corpus produces the
    same clean rows and quarantines the same corrupt lines (batch ≡
    stream equivalence, one file-source scan feeding both sinks)."""
    from etl_database_spark.sources.jsonl import stream_jsonl_corpus

    src = str(tmp_path / "corpus")
    _write_corpus(src)
    clean, corrupt = stream_jsonl_corpus(spark, src)
    out_clean = str(tmp_path / "out_clean")
    out_bad = str(tmp_path / "out_bad")
    q1 = (
        clean.writeStream.format("parquet")
        .option("path", out_clean)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        corrupt.writeStream.format("text")
        .option("path", out_bad)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    q2.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out_clean).collect()}
    assert got == {1, 2, 3}
    bad = {r.value for r in spark.read.text(out_bad).collect()}
    batch_clean, _ = read_jsonl_corpus(spark, src)
    assert {r.doc_id for r in batch_clean.collect()} == got
    assert "{this is not json" in bad and len(bad) == 2


def test_blank_lines_are_not_records(spark, tmp_path):
    """Blank/whitespace lines are skipped entirely — not phantom
    all-null clean rows, not corrupt records."""
    src = str(tmp_path / "corpus_blank")
    os.makedirs(src)
    with open(os.path.join(src, "p.jsonl"), "w") as f:
        f.write(
            json.dumps({"doc_id": 1, "text": "a", "lang": "en", "source": "w"})
            + "\n\n   \n"
            + json.dumps({"doc_id": 2, "text": "b", "lang": "en", "source": "w"})
            + "\n"
        )
    clean, obs = read_jsonl_corpus(spark, src)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert obs.get["rows_total"] == 2 and obs.get["rows_corrupt"] == 0
