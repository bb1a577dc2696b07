"""Duplicated-substring spans (functions/spans.py) on handcrafted
corpora with known duplicated runs — covers window hashing, the
gaps-and-islands merge (overlap, adjacency, multi-span docs), and the
first-occurrence-survives cut."""

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import spans as SP

W = 4  # small window so fixtures stay readable


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _stats(spark, rows):
    out = SP.duplicate_span_stats(_docs(spark, rows), "text", "doc_id", W)
    return {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"]) for r in out.collect()}


def test_clean_corpus_all_zero(spark):
    rows = [(1, "a b c d e f"), (2, "g h i j k l")]
    st = _stats(spark, rows)
    assert st == {1: (6, 0, 0), 2: (6, 0, 0)}


def test_exact_dup_doc_fully_covered(spark):
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")]
    st = _stats(spark, rows)
    assert st[1] == (8, 8, 1)
    assert st[2] == (8, 8, 1)
    assert st[3] == (8, 0, 0)


def test_shared_run_is_a_single_maximal_span(spark):
    # docs share a 6-token run "p q r s t u" in different contexts;
    # windows of 4 at offsets → merged island covers exactly 6 tokens.
    rows = [
        (1, "a1 b1 p q r s t u c1 d1"),
        (2, "x2 y2 z2 p q r s t u w2"),
    ]
    st = _stats(spark, rows)
    assert st[1] == (10, 6, 1)
    assert st[2] == (10, 6, 1)


def test_two_disjoint_spans_counted_separately(spark):
    rows = [
        (1, "p q r s m1 m2 m3 w x y z"),
        (2, "p q r s k1 k2 k3 w x y z"),
    ]
    st = _stats(spark, rows)
    # each doc: spans [0,4) and [7,11) — 8 covered tokens, 2 islands
    assert st[1] == (11, 8, 2)
    assert st[2] == (11, 8, 2)


def test_intra_doc_repeat_detected(spark):
    rows = [(1, "p q r s xx p q r s"), (2, "a b c d e f g h i")]
    st = _stats(spark, rows)
    assert st[1] == (9, 8, 2)


def test_short_doc_produces_no_windows(spark):
    rows = [(1, "a b c"), (2, "a b c")]  # 3 tokens < W=4
    st = _stats(spark, rows)
    assert st[1] == (3, 0, 0) and st[2] == (3, 0, 0)


def test_cut_keeps_first_occurrence_only(spark):
    rows = [
        (1, "p q r s t u a1 b1"),
        (2, "x2 y2 p q r s t u"),
        (3, "c d e f g h i j"),
    ]
    out = SP.cut_duplicate_spans(_docs(spark, rows), "text", "doc_id", W)
    got = {r["doc_id"]: (r["cut_tokens"], r["new_text"]) for r in out.collect()}
    assert got[1] == (0, "p q r s t u a1 b1")  # first occurrence survives
    assert got[2] == (6, "x2 y2")  # later occurrence loses the run
    assert got[3] == (0, "c d e f g h i j")


def test_cut_intra_doc_repeat(spark):
    rows = [(1, "p q r s gap p q r s")]
    out = SP.cut_duplicate_spans(_docs(spark, rows), "text", "doc_id", W).collect()[0]
    assert out["n_tokens"] == 9
    assert out["cut_tokens"] == 4
    assert out["new_text"] == "p q r s gap"


def test_cut_whole_doc_leaves_empty_text(spark):
    rows = [(1, "p q r s t"), (2, "p q r s t")]
    out = {r["doc_id"]: r for r in SP.cut_duplicate_spans(_docs(spark, rows), "text", "doc_id", W).collect()}
    assert out[1]["new_text"] == "p q r s t"
    assert out[2]["new_text"] == ""
    assert out[2]["cut_tokens"] == 5


def test_normalization_feeds_the_windows(spark):
    # case/whitespace differences normalize away → still duplicates
    rows = [(1, "P  Q   R S t"), (2, "p q r s T")]
    st = _stats(spark, rows)
    assert st[1] == (5, 5, 1) and st[2] == (5, 5, 1)


def test_spans_are_maximal_not_fragmented(spark):
    # a 7-token shared run → exactly one island even though 4 windows overlap
    rows = [(1, "m n o p q r s u1 v1"), (2, "m n o p q r s u2 v2")]
    spans = SP.duplicate_spans(_docs(spark, rows), "text", "doc_id", W).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append((r["s"], r["e"]))
    assert per_doc == {1: [(0, 7)], 2: [(0, 7)]}


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert SP.duplicate_span_stats(docs, "text", "doc_id", W).count() == 0
    assert SP.cut_duplicate_spans(docs, "text", "doc_id", W).count() == 0


def test_null_text_treated_as_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    st = _stats(spark, docs.collect())
    # null normalizes to empty -> 1 empty token, no windows, no dups
    assert st[1] == (1, 0, 0)
    assert st[2][1] == 5 and st[3][1] == 5
