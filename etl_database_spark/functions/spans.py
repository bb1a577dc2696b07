"""Exact duplicated-substring detection at token granularity — the
distributed form of suffix-array substring dedup (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499).

The suffix-array construction the paper uses is inherently sequential;
the distributed equivalence this module exploits instead is:

    a maximal duplicated token run of length >= W appears as a run of
    consecutive duplicated W-token rolling windows, and merging
    overlapping/adjacent duplicated windows (gaps-and-islands) recovers
    exactly the maximal duplicated spans of length >= W.

That turns substring dedup into three scale-safe linear passes:

1. explode each document into its rolling W-token window hashes
   (output size = token count, same shape as the 13-gram
   contamination scan in :mod:`.dedup`);
2. one shuffle keyed by the window hash to find hashes occurring more
   than once (or, for the *cut* variant, to rank occurrences so the
   first occurrence survives);
3. one shuffle keyed by doc id to merge duplicated window positions
   into maximal spans with a running-max window function.

No pairwise document comparison ever happens, so there is no term
quadratic in corpus size; skew is bounded because a window hash's
bucket is capped by the number of true occurrences of that substring.

Hashes are md5 of the space-joined window so the DuckDB oracles can
replay the exact computation; at 100 TB the 32-char digest in the
shuffle would be the first thing to shrink (``xxhash64`` drops it to 8
bytes — pass ``hasher=F.xxhash64``-style callable; the algebra is hash
agnostic).

No counterpart in the reference repo (this is part of the
training-data extension); the reference's nearest concept is the exact
row-level dedup in its loader scripts.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_database_spark.functions.text import normalize_text

# Default window: spans shorter than this many tokens are not
# considered duplication (Lee et al. use 50 BPE tokens on real corpora;
# the fixture documents are ~50 whitespace tokens long, so the suite
# exercises the operator at 15).
WINDOW = 15


def _md5_join(win) -> "F.Column":
    return F.md5(F.concat_ws(" ", win))


def tokenized(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, toks): whitespace tokens of the normalized text.
    NULL text is treated as empty (one empty token, no windows) so a
    null-bearing corpus degrades to zero spans instead of null stats."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(
            normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
        ).alias("toks"),
    )


def window_hashes(
    toks: DataFrame,
    w: int = WINDOW,
    hasher: Callable = _md5_join,
) -> DataFrame:
    """(doc_id, pos, h): hash of the W-token window starting at each
    token position.  Documents shorter than W produce no rows.

    The per-row cost is O(tokens · W) string assembly; the explode
    factor is the token count — identical shape (and scale argument)
    to ``dedup.contamination_stats``'s 13-gram scan.
    """
    n = F.size("toks")
    starts = F.when(n >= w, F.sequence(F.lit(0), n - w)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(starts, lambda i: hasher(F.slice("toks", i + 1, w)))
    return toks.select("doc_id", F.posexplode(hashes).alias("pos", "h"))


def _merge_islands(positions: DataFrame, w: int) -> DataFrame:
    """Gaps-and-islands merge of window start positions into maximal
    spans: (doc_id, s, e) with e exclusive.  A window starting at
    ``pos`` covers [pos, pos+w); a new island begins when a start lies
    strictly past the running max end of everything before it.
    One shuffle keyed by doc_id."""
    ws = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + w).over(
        ws.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = positions.withColumn(
        "ni",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    )
    with_island = flagged.withColumn("island", F.sum("ni").over(ws))
    return with_island.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("s"),
        (F.max("pos") + w).cast("long").alias("e"),
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = WINDOW,
    toks: DataFrame | None = None,
) -> DataFrame:
    """Maximal duplicated spans (doc_id, s, e) — token runs of length
    >= w whose every w-window occurs more than once corpus-wide
    (across documents or repeated within one).

    ``toks``: optional pre-built ``tokenized()`` frame — a caller that
    also needs the token arrays (duplicate_span_stats) passes its own
    so the corpus is tokenized once, not once per consumer."""
    if toks is None:
        toks = tokenized(docs, text_col, id_col)
    wins = window_hashes(toks, w)
    dup_h = (
        wins.groupBy("h")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .select("h")
    )
    dup_wins = wins.join(dup_h, "h", "left_semi").select("doc_id", "pos")
    return _merge_islands(dup_wins, w)


def duplicate_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = WINDOW,
) -> DataFrame:
    """Per-document duplication profile: (doc_id, n_tokens, dup_tokens,
    n_spans) — all exact BIGINTs, zero rows for clean documents kept
    (dup_tokens = 0) so the output is a full-corpus scorecard.

    Deliberately LAZY (r11 measured tradeoff): the tokenize appears as
    two plan subtrees (window-hash pipeline + n_tokens projection),
    but a cache+eager-materialize rewrite that shared it regressed the
    common partial-consumption path 0.35→1.94s in the bench — eager
    materialization forces every column of every row, while the lazy
    form lets Catalyst elide work a given consumer never reads. A
    caller that DOES consume everything can pass its own cached frame
    through ``duplicate_spans(toks=...)``."""
    toks = tokenized(docs, text_col, id_col)
    spans = duplicate_spans(docs, text_col, id_col, w, toks=toks)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_tokens"),
        F.count("*").cast("long").alias("n_spans"),
    )
    return (
        toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .fillna(0, subset=["dup_tokens", "n_spans"])
    )


def cut_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = WINDOW,
    toks: DataFrame | None = None,
) -> DataFrame:
    """Lee-et-al-style cut: remove every duplicated span EXCEPT its
    first occurrence (global order = (doc_id, pos) of the window), and
    rebuild each document's text from the surviving tokens.

    Returns (doc_id, n_tokens, cut_tokens, new_text).  The first
    occurrence of a duplicated substring keeps its text; later
    occurrences lose exactly the covered run.  Single pass (no
    fixpoint), matching the paper's behavior.

    A window is *redundant* iff it is not its hash's canonical (first)
    occurrence under the global (doc_id, pos) order — which implies
    the hash occurs more than once, so no separate duplicate filter is
    needed.  The canonical occurrence is found with a min-STRUCT
    aggregation, not a per-hash row_number window: the aggregation
    partial-combines map-side, so a boilerplate substring occurring
    millions of times costs one struct per map task instead of a
    single-task sort of all its occurrences (the skew that kills
    per-hash windows at 100 TB).  The span merge then runs over
    redundant windows only, and the token-level cut is a per-row array
    expression (no further shuffle beyond the collect_list keyed by
    doc_id).
    ``toks``: optional pre-built (and ideally caller-cached)
    ``tokenized()`` frame, the ``duplicate_spans`` pass-through. By
    default the tokenize appears as two plan subtrees (window-hash
    pipeline + the rebuild projection) — deliberately, the same
    measured tradeoff as duplicate_span_stats: caching the token
    arrays materializes a corpus-sized intermediate to save one
    normalize+split pass, which lost on the fixtures and is the wrong
    default at 100 TB.
    """
    if toks is None:
        toks = tokenized(docs, text_col, id_col)
    wins = window_hashes(toks, w)
    canon = wins.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_occ"),
        F.count("*").alias("occ"),
    )
    redundant = (
        wins.join(canon.where(F.col("occ") > 1), "h")
        .where(
            (F.col("doc_id") != F.col("first_occ.doc_id"))
            | (F.col("pos") != F.col("first_occ.pos"))
        )
        .select("doc_id", "pos")
    )
    spans = _merge_islands(redundant, w)
    sp_per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("sp")
    )
    empty_sp = F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)")
    joined = toks.join(sp_per_doc, "doc_id", "left").withColumn(
        "sp", F.coalesce(F.col("sp"), empty_sp)
    )
    covered = lambda i: F.exists(  # noqa: E731
        "sp", lambda x: (i >= x["s"]) & (i < x["e"])
    )
    kept = F.filter("toks", lambda t, i: ~covered(i))
    return joined.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("cut_tokens"),
        F.concat_ws(" ", kept).alias("new_text"),
    )
