"""Approximate string join via deletion-neighborhood blocking
(FastSS; Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries").

The naive edit-distance join is an all-pairs cross join — dead at any
scale. FastSS blocks it: two strings within edit distance 1 must
share an element of {s} ∪ {s with one character deleted} (substitution
→ delete the differing position from both; indel → the shorter string
IS a deletion variant of the longer; equality → the string itself).
So the join becomes:

1. explode each key into its ≤ len+1 variants (pure column exprs);
2. one equi-join on the variant (shuffle keyed by variant hash —
   block sizes are bounded by how many keys share a deletion, not by
   corpus size);
3. distinct candidate pairs, then an exact ``levenshtein`` verify —
   the verification-grade filter that makes blocking loss-free.

Generalizes to distance k with k-deletion neighborhoods (variant
count ~ len^k — practical for k ≤ 2 on short keys like names, codes,
identifiers). This module ships k=1, the common
fuzzy-key-reconciliation case; the DuckDB oracle replays blocking and
verification exactly (substr algebra + levenshtein are portable).

No counterpart in the reference repo (training-data extension);
nearest concept is its exact key joins in report SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(key) -> "F.Column":
    """Array of {key} ∪ one-character deletions (len+1 entries)."""
    c = key if not isinstance(key, str) else F.col(key)
    dels = F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(0), F.length(c) - 1),
            lambda i: F.concat(c.substr(F.lit(1), i), c.substr(i + 2, F.length(c))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_union(F.array(c), dels)


def fuzzy_pairs_dist1(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """All pairs (id1, id2, n1, n2, dist) with edit distance <= 1,
    id1 < id2 — deletion blocking + exact levenshtein verify, never
    an all-pairs comparison."""
    # bind the variant expression to the INPUT attribute (df[key]) and
    # explode in a second select: aliasing key_col to "name" in the
    # same projection would make the lambda capture the lateral alias
    # (Spark resolves it to LateralColumnAliasReference and dies)
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("name"),
        deletion_variants(df[key_col]).alias("vars"),
    ).select("id", "name", F.explode("vars").alias("var"))
    a = v.alias("a")
    b = v.alias("b")
    cand = (
        a.join(b, (F.col("a.var") == F.col("b.var")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.name").alias("n1"),
            F.col("b.name").alias("n2"),
        )
        .distinct()
    )
    dist = F.levenshtein("n1", "n2")
    return cand.where(dist <= 1).withColumn("dist", dist.cast("long"))
