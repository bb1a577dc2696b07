"""TokenIndexStore algebra: index-served BM25 == the one-shot scan
pipeline (exact decimals), term discovery equivalence, retraction
exactness, and the pushed posting-list filter. Lifecycle properties
are pinned in tests/test_batchstore.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_database_spark.functions import bm25 as B
from etl_database_spark.operators.tokenindex import TokenIndexStore
from etl_database_spark.queries import table

SF = "/root/testdata/sf0.001"


def _one_shot(d, terms):
    toks = B.tokenize_docs(d)
    return sorted(map(tuple, B.bm25_scores(None, terms, toks=toks).collect()))


def _top_terms_scan(d, n):
    toks = B.tokenize_docs(d)
    return [
        r.tok
        for r in toks.select(F.explode("_toks").alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok").limit(n).collect()
    ]


def test_index_served_bm25_equals_one_shot(spark, tmp_path):
    d = table(spark, SF, "documents")
    store = TokenIndexStore(spark, str(tmp_path / "idx"))
    for i in range(3):
        assert store.ingest(d.where(F.col("doc_id") % 3 == i), f"b{i}")
    assert store.top_terms(5) == _top_terms_scan(d, 5)
    terms = store.top_terms(5)
    assert sorted(map(tuple, store.bm25_serve(terms).collect())) == _one_shot(d, terms)
    store.compact()
    assert sorted(map(tuple, store.bm25_serve(terms).collect())) == _one_shot(d, terms)


def test_retraction_is_exact(spark, tmp_path):
    d = table(spark, SF, "documents")
    b0 = d.where(F.col("doc_id") % 2 == 0)
    b1 = d.where(F.col("doc_id") % 2 == 1)
    store = TokenIndexStore(spark, str(tmp_path / "idx"))
    assert store.ingest(b0, "b0") and store.ingest(b1, "b1")
    assert store.retract(b1, "b1_retraction")
    terms = store.top_terms(3)
    assert sorted(map(tuple, store.bm25_serve(terms).collect())) == _one_shot(b0, terms)


def test_posting_filter_pushdown_reaches_scan(spark, tmp_path):
    """The toks= filter must appear as a PushedFilters In(...) on the
    parquet scan — the property that keeps a query posting-list-sized
    at 100 TB."""
    d = table(spark, SF, "documents")
    store = TokenIndexStore(spark, str(tmp_path / "idx"))
    assert store.ingest(d, "all")
    plan = store.postings(toks=["the", "data"])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(tok" in plan
