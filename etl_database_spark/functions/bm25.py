"""BM25 document scoring (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond") — rank documents
against a term set. The retrieval primitive a training-data pipeline
uses to pull target-domain-like documents out of a 100 TB pool when
all it has is a handful of query terms (the keyword-seeded cousin of
DSIR's distribution matching).

    score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1)
                           / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)

Scale shape: ONE tokenize pass — :func:`tokenize_docs` materializes
per-doc token ARRAYS (localCheckpoint), and every consumer (doc
lengths via ``size()``, query-term tf via an in-array filter before
the explode, the registered query's top-term discovery) reads those
arrays instead of re-splitting the text. The term filter lands
BEFORE the tf aggregation, so only query-term rows shuffle (|Q| is
tiny); df/idf is a |Q|-row broadcast; per-doc scores
partial-aggregate map-side. No corpus-wide state beyond two scalars
(N, total tokens).

Engine portability (the DSIR-twin recipe): idf's ln of exact
rationals is rounded to 9 digits; every other factor is a fixed
left-to-right chain of single IEEE ops over exact integers; per-doc
sums go through DECIMAL(28,10) so term order can't matter; top-k
orders on the exact decimal. The whole score therefore replays
bit-for-bit in DuckDB (see the registered oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def tokenize_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(_id, _toks) — the single whitespace-tokenize pass over the
    corpus, materialized with localCheckpoint so every downstream
    consumer (doc lengths, query-term tf, top-term discovery) reuses
    the arrays instead of re-splitting the text (the tokenize-once
    lesson from DSIR: lineage replay re-tokenizes silently)."""
    from etl_database_spark.functions.partitioning import spread_scan

    arr = spread_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("_toks"),
    )
    return arr.localCheckpoint(eager=True)


def bm25_scores(
    df: DataFrame | None,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id, bm25_dec) — exact-decimal BM25 of every document matching
    ≥1 query term. Callers rank/limit on ``bm25_dec`` (exact) and
    render a rounded double for output. Pass ``toks`` (a
    :func:`tokenize_docs` frame) to share the tokenize pass with
    other consumers; otherwise one is built from ``df``."""
    if toks is None:
        toks = tokenize_docs(df, text_col=text_col, id_col=id_col)
    # dl (and avgdl) count ALL tokens — size() over the persisted
    # arrays, no explode and no shuffle
    dl = toks.select("_id", F.size("_toks").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("t")
    ).first()
    n_docs, total_toks = int(stats["n"]), int(stats["t"] or 0)
    # query-term filter INSIDE the array, before the explode: only
    # |Q|-matching tokens ever become rows
    qs = list(query_terms)
    qt = toks.select(
        "_id",
        F.explode(F.filter("_toks", lambda t: t.isin(qs))).alias("tok"),
    )
    tf = qt.groupBy("_id", "tok").agg(F.count("*").alias("tf"))
    return bm25_from_stats(tf, dl, n_docs, total_toks, k1=k1, b=b)


def bm25_from_stats(
    tf: DataFrame,
    dl: DataFrame,
    n_docs: int,
    total_toks: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """The scoring tail shared by the one-shot pipeline and the
    persisted token index (operators/tokenindex.py): given query-term
    frequencies ``tf`` (_id, tok, tf), doc lengths ``dl`` (_id, dl)
    and the two corpus scalars, produce (_id, bm25_dec). ONE
    definition of the score arithmetic, so an index-served score can
    never drift from the scan-computed one."""
    dfr = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = dfr.select(
        "tok",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            9,
        ).alias("idf"),
    )
    # fixed left-to-right chain, mirrored verbatim in the SQL oracle:
    # idf * ((tf * (k1+1)) / (tf + k1 * (1 - b + b * dl * N / T)))
    sterm = F.col("idf") * (
        (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") * F.lit(float(n_docs)) / F.lit(float(total_toks))
            )
        )
    )
    return (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "_id")
        .select("_id", sterm.cast("decimal(28,10)").alias("_s"))
        .groupBy("_id")
        .agg(F.sum("_s").alias("bm25_dec"))
    )
