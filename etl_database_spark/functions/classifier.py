"""Distributed trained quality/language classifier (logistic regression).

The one model everybody actually trains over a 100 TB corpus is a
cheap linear classifier on hand-crafted text features (the
fastText-style quality filter of CCNet/RefinedWeb/DCLM pipelines).
This module trains one INSIDE the engine, as pure DataFrame algebra:

- features are exact integer counts and their double ratios (stopword
  density, punctuation/digit ratios, capped length) — one projection,
  scan-speed, zero Python;
- full-batch gradient descent, one aggregate job per iteration: the
  per-document gradient contributions are rounded to 12 digits and
  summed as DECIMAL(38,12) — an ORDER-INDEPENDENT exact sum, so the
  gradient (and therefore the whole training trajectory) is
  deterministic under any partitioning, and replays bit-for-bit in a
  SQL engine (the BM25/DSIR twin recipe applied to training);
- the only transcendental (the sigmoid's exp) is rounded to 9 digits
  at every use, the same portability guard the engine's ln-based
  twins use;
- weight updates are computed by Spark expressions in the SAME
  aggregate job and collected as a 5-float row per iteration — the
  driver never sees data, only the model.

At 100 TB each iteration is one map-side-combinable aggregate over
the feature frame (cached once); k iterations = k scans of a
5-double-column frame, no shuffle growth, no driver-side data. The
trained weights then score any corpus as one projection.

Reference: none (training-data extension; cf. Joulin et al. 2016
fastText, Wenzek et al. 2020 CCNet quality filtering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_database_spark.functions import text as T

N_FEATS = 5
LR = 5.0
ITERS = 10


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label: Column | None = None,
) -> DataFrame:
    """(_id, y, x0..x4): bias, en-stopword density, punctuation ratio,
    digit ratio, capped token-length — all exact-integer-count ratios
    (deterministic doubles, replayable in SQL).

    ``label`` is the training target. The default is a deterministic
    long-form pseudo-label (token_count >= 55): the synthetic fixture
    carries NO real quality/language signal (its lang/source labels
    are independent of its text — measured, see tests), so the
    registered row trains against a target that is actually learnable
    and the certified product is the TRAINING machinery; production
    callers pass their real label column here."""
    c = F.col(text_col)
    if label is None:
        label = (T.token_count(c) >= 55).cast("double")
    n_toks = T.token_count(c)
    n_chars = F.length(c).cast("long")
    digits = (n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast("long")
    punct = (
        n_chars - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    ).cast("long")

    def ratio(num, den):
        return F.when(den == 0, F.lit(0.0)).otherwise(
            num.cast("double") / den.cast("double")
        )

    return df.select(
        F.col(id_col).alias("_id"),
        label.alias("y"),
        F.lit(1.0).alias("x0"),
        ratio(T.stopword_score(c, "en"), n_toks).alias("x1"),
        ratio(punct, n_chars).alias("x2"),
        ratio(digits, n_chars).alias("x3"),
        (F.least(n_toks, F.lit(100)).cast("double") / F.lit(100.0)).alias("x4"),
    )


def _z(weights: list[float]) -> Column:
    """w·x in fixed left-to-right order (portable IEEE chain)."""
    z = F.lit(float(weights[0])) * F.col("x0")
    for j in range(1, N_FEATS):
        z = z + F.lit(float(weights[j])) * F.col(f"x{j}")
    return z


def _p(weights: list[float]) -> Column:
    """Sigmoid rounded to 9 digits — the one libm call, guarded the
    same way the engine's ln-based twins guard transcendentals."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights))), 9)


def logreg_train(
    feats: DataFrame, lr: float = LR, iters: int = ITERS
) -> list[list[float]]:
    """Full-batch GD from w=0. Returns the weight vector after every
    iteration (``iters`` rows of ``N_FEATS`` floats). One aggregate
    job per iteration; the collected row is the MODEL (5 floats), not
    data. New weights are computed by Spark's own ROUND inside the
    aggregate, so a SQL replay rounds the identical doubles."""
    feats = feats.cache()
    n = feats.count()
    weights = [0.0] * N_FEATS
    history: list[list[float]] = []
    for _ in range(iters):
        p = _p(weights)
        aggs = []
        for j in range(N_FEATS):
            contrib = F.round((p - F.col("y")) * F.col(f"x{j}"), 12).cast(
                "decimal(38,12)"
            )
            g = F.sum(contrib)
            aggs.append(
                F.round(
                    F.lit(float(weights[j]))
                    - F.lit(float(lr)) * g.cast("double") / F.lit(float(n)),
                    9,
                ).alias(f"w{j}")
            )
        row = feats.agg(*aggs).first()
        weights = [float(row[f"w{j}"]) for j in range(N_FEATS)]
        history.append(weights)
    feats.unpersist()
    return history


def logreg_scores(feats: DataFrame, weights: list[float]) -> DataFrame:
    """(_id, score, pred): rounded sigmoid of the trained model —
    one projection over the feature frame."""
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights))), 6)
    return feats.select(
        "_id",
        score.alias("score"),
        (score >= 0.5).cast("long").alias("pred"),
    )
