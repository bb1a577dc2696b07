"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) as the textbook map-reduce iteration.

The text layer already *counts* BPE-ish pre-tokens
(functions/text.py:bpe_token_count); this module *learns* the merge
table from the corpus — the tokenizer-training step of an LLM data
pipeline — entirely in DataFrame algebra:

1. One corpus pass builds the word-frequency table (the classic BPE
   reduction: all further work is over DISTINCT words weighted by
   frequency, usually millions of rows for a 100 TB corpus — corpus
   size stops mattering after this shuffle).
2. Each merge round is: explode adjacent symbol pairs (weighted by
   word frequency) → one partial-aggregated shuffle on the pair →
   argmax (1-row collect, deterministic tie-break: count desc, then
   lexicographic pair) → apply the merge to every word's symbol array
   with a JVM-side ``aggregate`` fold (greedy left-to-right
   non-overlapping, exactly the reference algorithm's scan order).
   No Python UDFs anywhere.

Scale notes: per-round cost is one shuffle over the distinct-word
table, independent of raw corpus size. Lineage grows one HOF
projection per round, so the word table is localCheckpoint'ed every
``checkpoint_every`` rounds (the PageRank pattern). A production 30k-
merge run would batch non-conflicting merges per round; the per-round
algebra here is the same.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# End-of-word sentinel (the original BPE formulation): lets the model
# distinguish word-final from word-internal symbols. Chosen outside
# the tokenizer's [a-z0-9] alphabet.
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased letter/digit runs — same
    pre-tokenization family as text.bpe_token_count, reduced to the
    distinct-word table all BPE rounds run against."""
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").cast("long").alias("freq"))


def _merge_pair_fold(a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b in
    the ``symbols`` array — a pure JVM higher-order fold; after a merge
    the new token becomes the accumulator tail, so overlapping
    occurrences (e.g. (a,a) on 'aaa') merge non-overlapping, exactly
    like the reference implementation's scan."""
    merged = a + b

    def step(acc: Column, x: Column) -> Column:
        tail_matches = (
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b))
        )
        return F.when(
            tail_matches,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("symbols"), F.array().cast("array<string>"), step
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[dict]:
    """Learn ``n_merges`` BPE merge rules from a document column.

    Returns [{rank, left, right, merged, pair_count}], rank 1 = first
    merge learned. Stops early when no pair reaches ``min_freq``.
    """
    words = word_frequencies(df, text_col).withColumn(
        "symbols",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))),
    )
    words = words.localCheckpoint()

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        pairs = words.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("a"),
                    F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("b"),
                )
            ).alias("p"),
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_count < min_freq:
            break
        a, b, cnt = best[0].a, best[0].b, best[0].pair_count
        merges.append(
            {
                "rank": rank,
                "left": a,
                "right": b,
                "merged": a + b,
                "pair_count": int(cnt),
            }
        )
        words = words.withColumn("symbols", _merge_pair_fold(a, b))
        if rank % checkpoint_every == 0:
            # bound lineage: each round adds one HOF projection
            words = words.localCheckpoint()
    return merges


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[dict], out_col: str = "bpe_tokens"
) -> DataFrame:
    """Segment a text column with a learned merge table: per word,
    start from characters + EOW and apply the merges in rank order
    (the standard apply-time algorithm). Fine for the moderate merge
    counts used here; a 30k-merge production table would precompile to
    a longest-match trie instead of chaining 30k folds."""
    out = df.withColumn(
        "_words",
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda t: F.length(t) > 0,
        ),
    ).withColumn(
        "_syms",
        F.transform(
            F.col("_words"),
            lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
        ),
    )
    # Closure factories, NOT default-arg lambdas: PySpark derives a
    # higher-order function's arity from the Python signature, so a
    # bound default would be (mis)read as a second lambda parameter.
    def _step_fn(a: str, b: str, merged: str):
        def step(acc: Column, x: Column) -> Column:
            tail = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b))
            )
            return F.when(
                tail,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    def _apply_merge(col: Column, step) -> Column:
        return F.transform(
            col,
            lambda syms: F.aggregate(syms, F.array().cast("array<string>"), step),
        )

    col = F.col("_syms")
    for m in sorted(merges, key=lambda m: m["rank"]):
        col = _apply_merge(col, _step_fn(m["left"], m["right"], m["merged"]))
    return out.withColumn(out_col, F.flatten(col)).drop("_words", "_syms")
