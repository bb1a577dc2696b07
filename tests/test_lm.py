"""Bigram-LM scoring: hand-computed fixture + invariants."""

from __future__ import annotations

from etl_database_spark.functions.lm import bigram_lm_scores


def _scores(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r._id: r for r in bigram_lm_scores(df, "text", "doc_id").collect()}


def test_bigram_lm_hand_computed(spark):
    out = _scores(
        spark,
        [(1, "a b a b"), (2, "a b"), (3, "c")],
    )
    # corpus: bigrams (a,b)x3, (b,a)x1; contexts a:3 b:1; vocab {a,b,c}=3
    # p(a,b) = (3+1)*10000 // (3+3) = 6666 ; p(b,a) = (1+1)*10000 // (1+3) = 5000
    assert set(out) == {1, 2}  # doc 3 has no bigrams
    d1, d2 = out[1], out[2]
    assert (d1.n_bigrams, d1.lm_score_bp, d1.oov_bigrams) == (3, (6666 * 2 + 5000) // 3, 1)
    assert (d2.n_bigrams, d2.lm_score_bp, d2.oov_bigrams) == (1, 6666, 0)


def test_bigram_lm_repetitive_beats_novel(spark):
    # Repetitive/templated text must score higher than one-off token soup.
    boiler = "the same line " * 10
    out = _scores(
        spark,
        [(1, boiler), (2, boiler), (3, "zq xv wk jn pq rs tu")],
    )
    assert out[1].lm_score_bp == out[2].lm_score_bp > out[3].lm_score_bp
    assert out[3].oov_bigrams == out[3].n_bigrams  # every bigram unique


def test_bigram_lm_case_and_whitespace_insensitive(spark):
    out = _scores(spark, [(1, "The  Cat\tsat"), (2, "the cat sat")])
    a, b = out[1], out[2]
    assert (a.n_bigrams, a.lm_score_bp, a.oov_bigrams) == (
        b.n_bigrams,
        b.lm_score_bp,
        b.oov_bigrams,
    )
