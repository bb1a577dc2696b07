"""Corpus-trained bigram language-model scoring — the perplexity-style
quality filter of large-scale training-data pipelines (as popularized
by the CCNet / Gopher / RefinedWeb cleaning recipes: score each
document under a cheap LM trained on the corpus itself, then gate or
bucket on the score).

Everything is pure DataFrame ops (token explode → two count
aggregates → gated-broadcast joins → per-doc aggregate), so it runs
at scan speed over 100 TB:

- one tokenize pass per document (split, lowercased),
- bigram/context counts with map-side partial aggregation (two
  shuffles, keyed by bigram and by context token),
- the count tables join back to the per-doc bigram stream — broadcast
  under a measured size gate, shuffle-hash fallback above it,
- one final aggregate keyed by doc id.

Scores use exact integer basis-point arithmetic (add-one-smoothed
probability scaled by 1e4, floor-divided) rather than floating-point
log-likelihoods: a monotone transform of the same signal, but
bit-identical across engines, so the DuckDB oracle can verify it with
a hard value-hash (float log/exp differ in last-ulp across libm
implementations — see functions.text.quality_score's design note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Broadcast gate for the count tables (rows — each row is two short
# tokens + a long). A 100 TB corpus has ~billions of distinct bigrams;
# above the gate the score join falls back to a shuffle hash join.
BROADCAST_MAX_COUNT_ROWS = 2_000_000


from etl_database_spark.functions.text import exact_idiv as _idiv  # noqa: E402


def _doc_token_arrays(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _toks) — lowercase whitespace-token array per document
    (the single tokenize pass everything else derives from)."""
    from etl_database_spark.functions.partitioning import spread_scan

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return spread_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("_id"), toks.alias("_toks")
    )


def _doc_bigrams(arrays: DataFrame) -> DataFrame:
    """(id, w1, w2) — consecutive token pairs from the token-array
    frame. Docs with fewer than two tokens produce no rows."""
    return (
        arrays.where(F.size("_toks") >= 2)
        .select(
            "_id",
            F.explode(
                F.arrays_zip(
                    F.slice("_toks", 1, F.size("_toks") - 1).alias("w1"),
                    F.slice("_toks", 2, F.size("_toks") - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str, id_col: str, materialize: bool = True
) -> DataFrame:
    """Score every document under an add-one-smoothed bigram LM trained
    on the corpus itself → (id, n_bigrams, lm_score_bp, oov_bigrams).

    Per bigram (w1, w2): p_bp = ((c(w1,w2) + 1) * 10000) //
    (c(w1·) + V), where c(w1·) is the count of bigram contexts starting
    with w1 and V the corpus vocabulary size. ``lm_score_bp`` is the
    integer mean of p_bp over the document's bigrams (floor), i.e. a
    monotone stand-in for exp(−perplexity): repetitive/templated text
    scores high, token soup scores near zero. ``oov_bigrams`` counts
    bigrams seen only once in the corpus (the document itself) — a
    direct novelty signal.

    Only documents with ≥2 tokens appear in the output (no bigrams →
    no LM evidence).
    """
    # ONE tokenize pass: the token-array frame is cached and both the
    # bigram stream and the vocabulary aggregate derive from it (a
    # separate vocab scan would re-tokenize the whole corpus). The
    # bigram stream is cached too — it fans into the two count tables
    # plus the score join — and everything is released after the
    # (small) result is materialized, following the dedup-pipeline
    # discipline (functions/dedup._finish_eager).
    arrays = _doc_token_arrays(df, text_col, id_col).cache()
    bg = _doc_bigrams(arrays).cache()
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_bg")).cache()
    context_counts = bg.groupBy("w1").agg(F.count("*").alias("c_ctx")).cache()
    # V: corpus vocabulary (distinct tokens anywhere, including final
    # tokens that never start a bigram and single-token docs).
    vocab = (
        arrays.select(F.explode("_toks").alias("w"))
        .where(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
        .first()["v"]
    )

    # Broadcast-gate cardinalities in ONE action over the cached
    # bigram stream (distinct (w1,w2) == bigram_counts.count(),
    # distinct w1 == context_counts.count()) — the two separate
    # count() materialization passes this replaces only existed for
    # these gate numbers; the count tables themselves materialize
    # into their caches during the scoring join (r11: 4 actions → 3).
    n_bigrams, n_contexts = bg.agg(
        F.countDistinct("w1", "w2"), F.countDistinct("w1")
    ).first()
    joined = (
        bg.join(
            F.broadcast(bigram_counts)
            if n_bigrams <= BROADCAST_MAX_COUNT_ROWS
            else bigram_counts,
            ["w1", "w2"],
        )
        .join(
            F.broadcast(context_counts)
            if n_contexts <= BROADCAST_MAX_COUNT_ROWS
            else context_counts,
            ["w1"],
        )
        .withColumn(
            "p_bp",
            _idiv((F.col("c_bg") + 1) * 10_000, F.col("c_ctx") + F.lit(vocab)),
        )
    )
    scored = joined.groupBy(F.col("_id")).agg(
        F.count("*").alias("n_bigrams"),
        _idiv(F.sum("p_bp"), F.count("*")).alias("lm_score_bp"),
        F.sum((F.col("c_bg") == 1).cast("long")).alias("oov_bigrams"),
    )
    if not materialize:
        # caller wants the lazy plan (tests assert its shape); caches
        # stay pinned until the caller evaluates and releases
        return scored
    out = scored.localCheckpoint(eager=True)
    for c in (arrays, bg, bigram_counts, context_counts):
        c.unpersist()
    return out
