"""BM25 scoring: pure-Python reference equivalence and ranking
sanity (tf monotonicity, length normalization)."""

import math

from pyspark.sql import functions as F

from etl_database_spark.functions.bm25 import bm25_scores

K1, B = 1.2, 0.75


def _py_bm25(docs: dict[int, str], terms: list[str]) -> dict[int, float]:
    toks = {i: t.lower().split() for i, t in docs.items()}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    total = sum(dl.values())
    out = {}
    for term in terms:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = round(math.log((float(n) - df + 0.5) / (df + 0.5) + 1.0), 9)
        for i, ts in toks.items():
            tf = ts.count(term)
            if tf == 0:
                continue
            s = idf * ((tf * (K1 + 1.0)) / (tf + K1 * ((1.0 - B) + B * dl[i] * float(n) / float(total))))
            out[i] = out.get(i, 0.0) + s
    return out


def test_bm25_matches_python_reference(spark):
    docs = {
        1: "data quality data pipeline",
        2: "pipeline pipeline pipeline noise words here",
        3: "completely unrelated text body",
        4: "data",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r._id: float(r.bm25_dec)
        for r in bm25_scores(df, ["data", "pipeline"], id_col="doc_id").collect()
    }
    want = _py_bm25(docs, ["data", "pipeline"])
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])


def test_bm25_tf_monotone_and_length_normalized(spark):
    """More occurrences of the query term score higher at equal
    length; at equal tf, the shorter document scores higher."""
    docs = [
        (1, "term filler filler filler"),
        (2, "term term filler filler"),
        (3, "term filler filler filler filler filler filler filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r._id: float(r.bm25_dec) for r in bm25_scores(df, ["term"], id_col="doc_id").collect()}
    assert got[2] > got[1]  # tf monotone
    assert got[1] > got[3]  # length-normalized


def test_bm25_registered_query_shape(spark):
    from etl_database_spark.queries import load_all

    out = load_all()["doc_bm25_scores"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == ["doc_id", "bm25", "bm25_rank"]
    assert len(rows) == 100
    ranks = [r.bm25_rank for r in rows]
    assert ranks == sorted(ranks) and ranks[0] == 1
    scores = [r.bm25 for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(r.bm25 > 0 for r in rows)
