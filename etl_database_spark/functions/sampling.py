"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need reproducible membership decisions —
"which documents are in the 90/5/5 train/val/test split" and "give me
a stable 10% sample" must return the SAME rows on every run, every
engine, every cluster size. Random sampling (``df.sample``,
``sampleBy``) cannot promise that across retries or engines, so every
membership decision here is a pure function of the row key: bucket =
first 8 hex digits of md5(key) mod N. md5 of the UTF-8 string bytes is
engine-portable (Spark ``md5`` ≡ DuckDB ``md5`` ≡ Python
``hashlib.md5``), which is what makes these operators oracle-checkable
and the splits portable to any downstream stack.

Scale shape: the bucket is one codegen'd projection — no shuffle, no
state, trivially parallel at 100 TB. Filters on the bucket push into
the scan like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1000


def hash_bucket(col, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Stable bucket in [0, buckets): md5 the key's string form, take
    the first 8 hex digits (32 bits — plenty of entropy, fits a long
    exactly), mod ``buckets``. Equivalent SQL:
    ``CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) % buckets``.
    """
    h = F.conv(F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 8), 16, 10)
    return (h.cast("long") % F.lit(buckets)).alias("bucket")


def hash_sample(df: DataFrame, key_col: str, fraction: float, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose bucket falls
    below ``fraction × buckets``. Same rows every run and engine."""
    return df.where(hash_bucket(key_col, buckets) < int(round(fraction * buckets)))


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    buckets: int = DEFAULT_BUCKETS,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by consecutive bucket ranges
    (e.g. train=[0,900), val=[900,950), test=[950,1000)). Weights must
    sum to 1; insertion order defines the ranges."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = hash_bucket(key_col, buckets)
    # NULL keys hash to NULL, and a NULL bucket would fall through
    # every `<` condition into the otherwise() branch — silently
    # depositing null-keyed rows in the LAST split (typically the
    # eval/test set). Route them explicitly to the FIRST split so
    # evaluation sets stay clean; they remain in the output (dropping
    # rows from a split assignment would silently shrink the corpus).
    first = next(iter(weights))
    expr = F.when(bucket.isNull(), first)
    hi = 0
    for name, w in weights.items():
        hi += int(round(w * buckets))
        expr = expr.when(bucket < F.lit(hi), name)
    # rounding can leave the last bucket unassigned; fold it into the
    # final split
    last = list(weights)[-1]
    return df.withColumn(out_col, expr.otherwise(last))


def weighted_mixture(
    df: DataFrame,
    source_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Deterministic dataset mixing: downsample each source to its
    target fraction (e.g. web 10%, books 100%, code 50%) in one pass.

    Membership is ``bucket(key) < fraction[source] × buckets``, so the
    mixture is reproducible, nested (raising a fraction only ADDS
    rows), and needs no shuffle — it is a single scan with a sargable
    predicate per source. ``default`` applies to sources not listed.
    """
    thr = None
    for src, frac in fractions.items():
        t = F.lit(int(round(frac * buckets)))
        thr = F.when(F.col(source_col) == src, t) if thr is None else thr.when(
            F.col(source_col) == src, t
        )
    thr = F.lit(int(round(default * buckets))) if thr is None else thr.otherwise(
        F.lit(int(round(default * buckets)))
    )
    return df.where(hash_bucket(key_col, buckets) < thr)


def split_boundaries(weights: dict[str, float], buckets: int = DEFAULT_BUCKETS) -> list[tuple[str, int, int]]:
    """(name, lo, hi) bucket ranges for documentation / SQL parity."""
    out = []
    lo = 0
    for name, w in weights.items():
        hi = lo + int(round(w * buckets))
        out.append((name, lo, hi))
        lo = hi
    return out


def temperature_keep_threshold(
    count_col, min_count_col, alpha: float, buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Per-group hash-bucket keep threshold realizing temperature
    sampling (the multilingual corpus-balancing scheme: sampling
    probability q_i ∝ p_i^alpha, XLM-R / mC4 style). A group kept at
    fraction f_i yields kept_i = f_i·n_i ∝ n_i^alpha when
    f_i = (n_i / n_min)^(alpha-1) — the smallest group keeps
    everything, larger groups are downsampled toward balance as
    alpha → 0 (alpha = 1 keeps natural proportions).

    The fraction is rounded to 6 decimals BEFORE the floor so the
    one-ulp liberty both engines' ``pow`` implementations have cannot
    flip the integer threshold (same guard as the cosine operators'
    round-to-4)."""
    frac = F.round(
        F.pow(count_col.cast("double") / min_count_col.cast("double"), F.lit(alpha - 1.0)),
        6,
    )
    return F.floor(frac * F.lit(buckets)).cast("long")


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    group_col: str,
    k: int,
    out_key: str = "es_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per group, with
    inclusion probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis A-Res scheme (Inf. Proc. Letters 2006): each
    row draws a deterministic uniform u from md5(key) (48 bits →
    u ∈ (0,1]) and is ranked by ln(u)/w descending; the top k per
    group are exactly a w-proportional sample without replacement.
    The training-data use: "give me a token-budget-proportional
    sample of documents per language/source" that is reproducible
    across runs, engines and cluster sizes — df.sample can promise
    none of those.

    Portability: ln is the one libm call, so it is rounded to 9
    digits BEFORE the weight division and the quotient rounded again
    (the DSIR-twin guard) — once both engines agree on the rounded
    ln, the remaining arithmetic is single IEEE ops. Ties (only
    possible through rounding) break on the key column. Zero/negative
    weights are excluded (their inclusion probability is 0).

    Usable weight-magnitude range: the 9-digit rounding of the
    quotient means weights above ~1e8 collapse ln(u)/w onto a grid of
    a handful of values (|ln u| ≤ ~33, so the quotient drops below
    the 1e-9 grid), degrading the ordering among such rows to the
    key-column tie-break instead of a weight-proportional draw; very
    small weights (≲1e-9) are safe (the quotient grows, resolution is
    relative). Keep weights within roughly [1e-6, 1e6] — normalize
    per group first (divide by the group max; scale-invariant for
    this scheme since only ratios matter) when the natural weights
    (e.g. byte counts of large files) exceed that range.

    Scale shape: one codegen projection + one window shuffle on the
    group key — no state, no driver round-trips, same cost class as
    hash_top_k_per_group."""
    from pyspark.sql import Window as W

    h48 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 12), 16, 10
    ).cast("long")
    ln_u = F.round(
        F.log((h48 + F.lit(1)).cast("double") / F.lit(float(1 << 48))), 9
    )
    es_key = F.round(ln_u / F.col(weight_col).cast("double"), 9)
    w = W.partitionBy(group_col).orderBy(F.desc(out_key), F.asc(key_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn(out_key, es_key)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def hash_top_k_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Deterministic k-row sample per group: rank by the md5 of the
    key (a uniform, engine-portable shuffle order) and keep the first
    k. The reproducible replacement for per-group reservoir sampling —
    same rows every run, every engine, and adding data only displaces
    rows whose hash sorts later (nested like the bucket samplers
    above). One window shuffle on the group key."""
    from pyspark.sql import Window as W

    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = W.partitionBy(group_col).orderBy(h, key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
