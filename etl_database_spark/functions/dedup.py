"""Deduplication operators for training-data pipelines, 100 TB-scale.

Four tiers, all pure DataFrame ops (no Python in the hot path):

- **Exact**: md5-of-normalized-text hash groupBy. One shuffle on the
  digest; survivor = min doc id per group.
- **MinHash + LSH**: char-shingle → k permuted min-hashes → banded
  bucket join → candidate pairs → exact Jaccard verify. Shuffles are on
  (band_id, band_signature) buckets, so the candidate join never
  compares documents across buckets — the all-pairs O(n²) is avoided;
  skewed buckets (boilerplate shingles) are bounded by MAX_BUCKET.
- **SimHash**: 64-bit fingerprint from token-hash bit votes; near-dups
  are fingerprints at small Hamming distance, found by band-of-bits
  blocking (4×16-bit bands → candidates → popcount verify).
- **n-gram Jaccard**: direct shingle-overlap join for moderate corpora
  or post-LSH verification.

Permutation hashing follows the standard (a*h + b) mod p universal
family (Broder 1997, resemblance/minwise hashing) with fixed seeds so
results are deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: universal-hash modulus, exact in Long range.
MERSENNE61 = (1 << 61) - 1

# Broadcast size gates. On boilerplate-heavy corpora the LSH candidate
# set approaches corpus size, so broadcasting candidate-restricted
# frames unconditionally is a driver/executor OOM at scale — every
# broadcast below is gated on a measured size and falls back to a
# plain shuffle hash join when the payload would be too large.
BROADCAST_MAX_SET_ENTRIES = 8_000_000  # total shingle longs across all sets (~64 MB)
BROADCAST_MAX_ID_ROWS = 50_000_000  # bare-id frames (8 bytes/row)


def _maybe_broadcast(df: DataFrame, size: int, limit: int) -> DataFrame:
    """Broadcast hint only when the measured size is under the gate;
    otherwise return the frame unhinted so Catalyst/AQE picks a
    shuffle join (the scale-safe default)."""
    return F.broadcast(df) if size <= limit else df


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family,
    derived from a small LCG so no RNG dependency."""
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % ((1 << 30) - 1) + 1  # a < 2^30: a*h32 stays < 2^62 (no overflow)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE61
        params.append((a, b))
    return params


def shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, portable: bool = False
) -> DataFrame:
    """Distinct hashed character n-gram shingles per doc → (id, shingle).

    ``shingle`` is the xxhash64 of the n-gram, not the string: set
    semantics are preserved (64-bit collisions are negligible) while
    every downstream shuffle/join moves 8-byte longs instead of
    strings. Shingling via sequence+explode stays in codegen; the
    distinct dedups repeats with map-side partial aggregation.

    ``portable=True`` swaps the shingle hash to the first 32 md5 bits
    (``conv(substr(md5(g),1,8),16,10)``) — identical in any engine
    with md5 (DuckDB: ``('0x'||substr(md5(g),1,8))::BIGINT``), so the
    whole minhash/LSH pipeline becomes cross-engine hash-checkable.
    Same 32-bit input domain the permutations already use; slower
    (md5 vs xxhash64) but still a codegen expression."""
    from etl_database_spark.functions.text import normalize_text

    if portable:
        def hash_fn(g):
            return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    else:
        hash_fn = F.xxhash64

    from etl_database_spark.functions.partitioning import spread_scan

    norm = normalize_text(F.col(text_col))
    return (
        # Spread docs across the cluster before the ~Nx explode with
        # the size-proportional scan guard — a NO-OP whenever the scan
        # already carries enough splits (the normal case at scale).
        # r12 (guide §2.3 "shuffle keys, not payloads"): this was an
        # unconditional repartition(col(_id)) — a full shuffle of the
        # normalized TEXT on every signature build, bought only to
        # save the minhash aggregate's exchange, which map-side
        # partial-combines to ~num_perm longs per doc per task anyway.
        # Every consumer is partitioning-insensitive (MIN aggregates,
        # distincts keyed on (_id, shingle) that exchanged regardless).
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("_id"), norm.alias("_norm"))
        .where(F.length("_norm") >= n)
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("_norm") - F.lit(n - 1)),
                    lambda i: hash_fn(F.col("_norm").substr(i, F.lit(n))),
                )
            ).alias("shingle"),
        )
    )  # NOTE: repeats are kept — MIN-aggregation and collect_set are
    # duplicate-insensitive, so we skip a corpus-wide distinct shuffle.


def _shingle_hash_array(n: int, portable: bool, norm_col: str = "_norm"):
    """Column expression: the array of hashed n-gram shingles of a
    normalized-text column (one entry per position, repeats kept).
    Shared by the array-set and exploded-row shingle producers so the
    hash family can never drift between them."""
    if portable:
        def hash_fn(g):
            return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    else:
        hash_fn = F.xxhash64

    return F.transform(
        F.sequence(F.lit(1), F.length(norm_col) - F.lit(n - 1)),
        lambda i: hash_fn(F.col(norm_col).substr(i, F.lit(n))),
    )


def _normalized_base(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    from etl_database_spark.functions.partitioning import spread_scan
    from etl_database_spark.functions.text import normalize_text

    return (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("_id"),
            normalize_text(F.col(text_col)).alias("_norm"),
        )
        .where(F.length("_norm") >= n)
    )


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, portable: bool = False
) -> DataFrame:
    """(_id, _sh array<long>) — the DISTINCT hashed n-gram shingles of
    each document as a row-local array: transform + array_distinct,
    the :func:`winnow_fingerprint_sets` shape. No explode and no
    shuffle — per-doc distinctness never needs a corpus-wide exchange,
    it is a property of the row. Hash values are identical to
    :func:`shingles` (xxhash64, or md5-32 when ``portable``).

    To get row grain, use :func:`distinct_shingles` — do NOT
    ``select(explode("_sh"))`` over this frame in a hot path: a
    Generate over a previously-projected array column re-copies the
    full array per OUTPUT row (~20× slower, measured at sf0.1:
    16.2s vs 0.73s with the explode inline over the expression)."""
    base = _normalized_base(df, text_col, id_col, n)
    return base.select(
        "_id", F.array_distinct(_shingle_hash_array(n, portable)).alias("_sh")
    )


def distinct_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, portable: bool = False
) -> DataFrame:
    """(_id, shingle) — one row per DISTINCT shingle per document,
    produced by a single inline ``explode(array_distinct(...))``
    Generate: bit-identical rows to ``shingles(...).distinct()`` with
    ZERO corpus-wide exchange on the producing side (the distinct is
    row-local). The explode stays inline over the expression — see
    the :func:`shingle_sets` performance note."""
    base = _normalized_base(df, text_col, id_col, n)
    return base.select(
        "_id",
        F.explode(F.array_distinct(_shingle_hash_array(n, portable))).alias(
            "shingle"
        ),
    )


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate groups: (content_hash, n_dups, canonical_id).

    Returns only groups with >1 member. Single shuffle on the digest.
    """
    from etl_database_spark.functions.text import fingerprint_md5

    return (
        df.select(F.col(id_col).alias("doc"), fingerprint_md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc").alias("canonical_id"))
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(
    sh: DataFrame, num_perm: int = 32, seed: int = 42
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min permuted hash per document, wide.

    All k permutations are evaluated as k MIN-aggregates over one
    shingle scan — a single shuffle of the (id, hash) rows with
    map-side partial combine, not a k-fold row explode. The shingle
    hash is xxhash64 (JVM, vectorized); a (<2^30) * h32 (<2^32) +
    b (<2^61) < 2^63 keeps (a*h+b) mod p inside signed-long range.
    """
    params = _perm_params(num_perm, seed)
    h = F.col("shingle").bitwiseAND(F.lit((1 << 32) - 1))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE61))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.select("_id", h.alias("h")).groupBy("_id").agg(*aggs)


def band_table(
    sigs: DataFrame,
    num_perm: int,
    bands: int,
    portable: bool = False,
    keep_sigs: bool = False,
) -> DataFrame:
    """(_id, band_id, band_hash) — the banded LSH bucket keys of a
    signature frame. THE one construction of band hashes: batch
    (lsh_candidate_pairs) and streaming (streaming/near_dup.py) both
    build keys here, so their band_hash values can never drift apart
    (drift would make cross-batch matching silently return nothing).

    ``portable=True`` uses the comma-joined signature values as the
    band key instead of xxhash64 — no hash at all, so bucket identity
    replays exactly in SQL (``concat_ws``). Wider shuffle keys
    (strings vs 8-byte longs); the xxhash64 default is the scale
    path.

    ``keep_sigs=True`` carries the sig_* columns on every banded row
    (for the in-join agreement filter in ``lsh_candidate_pairs`` —
    wider shuffle, no extra join)."""
    rows_per_band = num_perm // bands

    def band_key(j: int):
        cols = [F.col(f"sig_{i}") for i in range(j * rows_per_band, (j + 1) * rows_per_band)]
        if portable:
            return F.concat_ws(",", *cols)
        return F.xxhash64(*cols)

    band_structs = [
        F.struct(F.lit(j).alias("band_id"), band_key(j).alias("band_hash"))
        for j in range(bands)
    ]
    extra = [f"sig_{i}" for i in range(num_perm)] if keep_sigs else []
    return sigs.select(
        "_id", F.explode(F.array(*band_structs)).alias("b"), *extra
    ).select(
        "_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_hash").alias("band_hash"),
        *extra,
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    max_bucket: int = 200,
    portable: bool = False,
    min_agree: int = 1,
) -> DataFrame:
    """Banded LSH: hash each band of signature columns, explode to
    (id, band_id, band_hash), self-join on (band_id, band_hash) →
    candidate (id_a, id_b) pairs.

    ``max_bucket`` caps pathological buckets (all-same boilerplate) so a
    skewed key cannot quadratically explode the join — the standard
    guard for LSH at scale; dropped buckets are exact-dup groups that
    the exact pass already catches.

    ``min_agree``: keep only pairs whose signatures agree on at least
    this many components (estimated Jaccard ≥ min_agree/num_perm),
    computed IN the bucket join by carrying the sig columns on the
    banded rows — a map-side filter on the joined rows, no signature
    re-join over the (large) candidate set, and immune to the bucket
    cap (a pair found through any one uncapped band is scored on its
    FULL signature; counting surviving band collisions instead
    undercounts exactly the pairs that live near boilerplate buckets
    — measured on the sf0.001 fixture, where true J=0.30 pairs agree
    on 12+ perms but sit in 270+-member capped buckets). This is the
    low-threshold candidate filter: r=1/b=32 admits any pair agreeing
    on ONE permutation (15M pairs at sf1); min_agree=3 drops the
    accidental single-collision bulk while a true J=0.30 pair fails
    with p ≈ 1.2e-3 (Binomial(32, 0.3) ≤ 2).
    """
    keep_sigs = min_agree > 1
    banded = band_table(sigs, num_perm, bands, portable=portable, keep_sigs=keep_sigs)
    bucket_sizes = banded.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_n"))
    banded = banded.join(
        bucket_sizes.where(F.col("bucket_n") <= max_bucket), ["band_id", "band_hash"]
    )
    a = banded.alias("a")
    b = banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a._id") < F.col("b._id")),
    )
    if keep_sigs:
        agree = sum(
            (F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}")).cast("int")
            for i in range(num_perm)
        )
        joined = joined.where(agree >= min_agree)
    return (
        joined.select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs_incremental(
    sigs_new: DataFrame,
    sigs_all: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    max_bucket: int = 200,
    portable: bool = False,
    min_agree: int = 1,
) -> DataFrame:
    """Banded LSH candidates between a NEW signature batch and the
    full signature table (``sigs_all`` must already CONTAIN the new
    batch) → canonical (id_a < id_b) pairs with at least one new
    endpoint — the REFERENCE SPEC for the incremental discovery step
    of :class:`~etl_database_spark.operators.edgestore.EdgeStore`.
    The store's production path (``EdgeStore._candidate_pairs``)
    computes the same pair set from its persisted band rows and
    signed bucket counts without re-banding the corpus; the
    equivalence is pinned in tests/test_graph.py.

    Identical band construction to :func:`lsh_candidate_pairs` (the
    shared :func:`band_table`), bucket sizes and the ``max_bucket``
    skew cap evaluated against the FULL table, and the ``min_agree``
    signature-agreement cut applied in-join on full signatures — so a
    pair discovered here passes exactly the one-shot path's candidate
    tests. Cost: |new banded rows| joined against capped full buckets,
    never a corpus self-join.

    Cap semantics under batching: bucket sizes only grow, so a pair
    whose bucket is under the cap at one-shot time was under it at
    every earlier batch — incremental discovery finds a SUPERSET of
    the one-shot candidates (extra pairs discovered while a bucket
    that later crossed the cap was still small), and every extra pair
    still passes the same exact-Jaccard verify downstream. Recall
    moves monotonically toward the uncapped ideal."""
    keep_sigs = min_agree > 1
    banded_all = band_table(sigs_all, num_perm, bands, portable=portable, keep_sigs=keep_sigs)
    bucket_sizes = banded_all.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_n")
    )
    banded_all = banded_all.join(
        bucket_sizes.where(F.col("bucket_n") <= max_bucket), ["band_id", "band_hash"]
    )
    banded_new = band_table(sigs_new, num_perm, bands, portable=portable, keep_sigs=keep_sigs)
    a = banded_new.alias("a")
    b = banded_all.alias("b")
    joined = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a._id") != F.col("b._id")),
    )
    if keep_sigs:
        agree = sum(
            (F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}")).cast("int")
            for i in range(num_perm)
        )
        joined = joined.where(agree >= min_agree)
    return (
        joined.select(
            F.least("a._id", "b._id").alias("id_a"),
            F.greatest("a._id", "b._id").alias("id_b"),
        )
        .distinct()
    )


def capped_bucket_ids(
    sigs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    max_bucket: int = 200,
    portable: bool = False,
) -> DataFrame:
    """(_id) — documents that occur in at least one over-cap LSH
    bucket. These are exactly the documents whose pairs
    :func:`lsh_candidate_pairs` can silently lose to the skew cap (a
    pair colliding ONLY inside capped buckets is never joined), so
    recall-critical callers route them through the exact tier
    (``minhash_near_duplicates(capped_route_exact=True)``)."""
    banded = band_table(sigs, num_perm, bands, portable=portable)
    bucket_sizes = banded.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_n")
    )
    return (
        banded.join(
            bucket_sizes.where(F.col("bucket_n") > max_bucket),
            ["band_id", "band_hash"],
        )
        .select("_id")
        .distinct()
    )


def _finish_eager(result: DataFrame, caches: list[DataFrame]) -> DataFrame:
    """Materialize a (small, post-threshold) result and release every
    intermediate cache. Without this, each call of a dedup pipeline
    leaves shingle/signature/candidate frames pinned in executor
    storage — repeated invocations (bench loops, long-lived sessions)
    accrete cached blocks until eviction/GC churn dominates run time.
    ``localCheckpoint`` cuts the lineage so unpersisting the parents
    cannot trigger recompute of the returned frame."""
    out = result.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


def jaccard_verify(
    pairs: DataFrame,
    sh: DataFrame | None,
    threshold: float = 0.5,
    n_pairs: int | None = None,
    release: list[DataFrame] | None = None,
    sets_df: DataFrame | None = None,
    sets_df_pruned: bool = False,
    finish: bool = True,
):
    """Exact Jaccard on candidate pairs via per-document shingle sets:
    join each pair to its two shingle-set arrays, |A∩B| =
    size(array_intersect), |A∪B| = |A|+|B|−|A∩B|.

    The set table is first semi-joined down to documents that occur in
    a candidate pair, so only the relevant slice is aggregated; the
    intersection itself is a JVM array op per pair, no per-shingle
    shuffle. Candidates do NOT always satisfy candidates ≪ corpus
    (boilerplate corpora approach corpus size), so both the id frame
    and the set frames are broadcast only under a measured size gate —
    above it the joins fall back to shuffle hash joins on ``_id``.

    ``n_pairs``: pass the already-materialized candidate count to skip
    a recount (callers that cache+count the pair frame have it).

    ``sets_df``: optional precomputed (_id, shset array<long>) set
    frame (e.g. :func:`shingle_sets` — row-local array_distinct).
    When given, ``sh`` is ignored and the explode + collect_set
    shuffle disappears entirely: per-doc sets are a ROW property, so
    building them never needs a corpus exchange (r11 optimization —
    the collect_set path shuffled every candidate-doc shingle once
    just to regroup rows the scan already had together).

    ``sets_df_pruned``: the caller asserts ``sets_df`` already
    contains ONLY documents that occur in a pair (it built the frame
    from a pair-id semi-join itself), so the internal pair-id
    union+distinct+semi-join re-prune is skipped — it was a no-op
    re-filter costing one distinct exchange and one broadcast join
    per call (r11).

    ``finish``: by default the verified pair list is materialized
    eagerly and every cache released (returns a DataFrame). A caller
    whose NEXT step is itself a materializing action (EdgeStore's
    edge write) passes ``finish=False`` and gets
    ``(lazy_verified, caches)`` back — it runs its one action and
    unpersists the caches itself, skipping a full extra
    materialize+re-read round-trip of the result (r12, guide §5)."""
    if n_pairs is None and not (sets_df is not None and sets_df_pruned):
        n_pairs = pairs.count()
    pair_ids = None
    if sets_df is None or not sets_df_pruned:
        pair_ids = (
            pairs.select(F.col("id_a").alias("_id"))
            .union(pairs.select(F.col("id_b").alias("_id")))
            .distinct()
        )
    if sets_df is not None:
        if sets_df_pruned:
            sets = sets_df.cache()
        else:
            sets = sets_df.join(
                _maybe_broadcast(pair_ids, 2 * n_pairs, BROADCAST_MAX_ID_ROWS),
                "_id",
                "left_semi",
            ).cache()
    else:
        sets = (
            sh.join(_maybe_broadcast(pair_ids, 2 * n_pairs, BROADCAST_MAX_ID_ROWS), "_id", "left_semi")
            .groupBy("_id")
            .agg(F.collect_set("shingle").alias("shset"))
            .cache()
        )
    # Materialize once (both join branches below reuse this subtree)
    # and measure the total array payload for the broadcast gate.
    n_sets, n_entries = sets.agg(
        F.count("*"), F.coalesce(F.sum(F.size("shset")), F.lit(0))
    ).first()
    a = sets.select(F.col("_id").alias("id_a"), F.col("shset").alias("set_a"))
    b = sets.select(F.col("_id").alias("id_b"), F.col("shset").alias("set_b"))
    verified = (
        pairs.join(_maybe_broadcast(a, n_entries, BROADCAST_MAX_SET_ENTRIES), "id_a")
        .join(_maybe_broadcast(b, n_entries, BROADCAST_MAX_SET_ENTRIES), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("set_a") + F.size("set_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not finish:
        return verified, [sets, *(release or [])]
    return _finish_eager(verified, [sets, *(release or [])])


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    sigs: DataFrame | None = None,
    portable: bool = False,
    est_margin: float | None = 0.2,
    min_agree: int = 1,
    max_bucket: int = 200,
    capped_route_exact: bool = False,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection → (id_a, id_b, jaccard).

    Pipeline: shingle → minhash → banded LSH candidates → exact-Jaccard
    verify. With num_perm=32/bands=8 (r=4), the LSH S-curve crosses 50%
    capture around J≈0.56 — pairs well above threshold are found with
    high probability; the verify step removes false positives entirely.

    ``est_margin``: the estimated-Jaccard prefilter keeps candidates
    with est ≥ threshold − est_margin before the exact verify. At
    k=32 the estimator's σ ≈ 0.09, so margin 0.2 (the default) loses
    ~nothing above threshold while pruning the candidate bulk.
    ``None`` disables the prefilter entirely — the recall-critical
    setting (e.g. the r=1-banded pagerank edge source, where a true
    J≈threshold pair can estimate 2σ low and must still reach the
    verify).

    ``sigs``: optional precomputed signature table (``_id``, ``sig_*``
    columns as produced by :func:`minhash_signatures`). At 100 TB the
    signature store is built incrementally as documents arrive and
    persisted (parquet/Delta); passing it here skips the full-corpus
    shingle pass entirely — each dedup run then costs only the LSH
    bucket join plus an exact-verify re-shingle of the candidate
    documents (a scan-and-filter of the doc table, not an explode of
    the whole corpus).

    ``capped_route_exact``: close the skew-cap miss mode. The
    ``max_bucket`` guard drops over-cap buckets from the candidate
    join, so a pair that collides ONLY inside capped buckets is
    silently lost. A cap-lost pair's agreeing bucket contains BOTH
    endpoints, so with this flag every document that touches an
    over-cap bucket is routed through :func:`ngram_jaccard_pairs`
    (the exact prefix-filtered tier) and the union is returned —
    TOTAL recall for the miss mode, at the cost of an exact pass
    over just that slice. When the routed slice itself exceeds the
    exact tier's candidate-mass gate (possible only past the tested
    fixture scales, on template-saturated corpora where the capped
    slice approaches the corpus), the routing degrades to LSH-only
    with a loud log warning instead of refusing: the residual miss
    is then the all-agreeing-buckets-capped mode only, whose
    probability falls geometrically in the number of r=1 bands
    (each agreeing band's bucket keys a uniformly-random SHARED
    shingle; all ~J·bands of them must be boilerplate-hot at once).
    Requires ``df`` (the raw document frame) even when ``sigs`` is
    passed.
    """
    release = []
    if sigs is None:
        sigs = minhash_signatures(
            shingles(df, text_col, id_col, n, portable=portable), num_perm
        )
    sigs = sigs.cache()
    release.append(sigs)
    # Candidate pairs fan into several plan branches below. Materialize
    # once (cache is lazy — branches inside a single action would
    # otherwise each recompute the whole LSH pipeline).
    capped = None
    n_capped = 0
    if capped_route_exact:
        # Materialize before jaccard_verify releases the sig cache —
        # the capped-id frame must not replay the signature build.
        capped = capped_bucket_ids(
            sigs, num_perm, bands, max_bucket, portable=portable
        ).localCheckpoint(eager=True)
        n_capped = capped.count()
    # The estimated-Jaccard prefilter (est = agreeing-component
    # fraction ≥ threshold − est_margin) is applied IN the bucket join
    # as its exact integer form: the smallest a with a/num_perm ≥ the
    # float cut — identical pair set to the old post-join float
    # comparison, but evaluated map-side on the joined banded rows
    # (lsh_candidate_pairs keep_sigs), BEFORE the candidate distinct
    # shuffle. This removes the two sig-table joins + cache + count
    # over the candidate set that the separate est stage paid (2.1s of
    # the cold 16s profile at sf0.1; warm flagship 4.04→3.85s — the
    # structural point is that at 100 TB the candidate set approaches
    # corpus size on boilerplate-heavy data, and joining the signature
    # table onto it twice was a full extra shuffle). Margin 0.2 keeps
    # estimator variance from dropping true positives
    # (σ ≈ sqrt(J(1−J)/k) ≈ 0.09 at k=32).
    if est_margin is not None:
        cut = threshold - est_margin  # same float the old comparison used
        est_agree = next(a for a in range(num_perm + 1) if a / num_perm >= cut)
        min_agree = max(min_agree, est_agree)
    est = lsh_candidate_pairs(
        sigs, num_perm, bands, max_bucket=max_bucket, portable=portable,
        min_agree=min_agree,
    ).cache()
    release.append(est)
    n_est = est.count()  # materialize: verify fans this into 3 plan branches
    # Exact verify re-shingles ONLY the candidate documents: semi-join
    # the doc table down to ids that appear in a surviving pair, then
    # build their shingle SETS row-locally (array_distinct — no
    # explode, no collect_set shuffle; per-doc sets are a row
    # property). The full-corpus explode happens at most once (inside
    # the signature build above).
    pair_ids = (
        est.select(F.col("id_a").alias(id_col))
        .union(est.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = df.join(
        _maybe_broadcast(pair_ids, 2 * n_est, BROADCAST_MAX_ID_ROWS), id_col, "left_semi"
    )
    sets_cand = shingle_sets(cand_docs, text_col, id_col, n, portable=portable).select(
        "_id", F.col("_sh").alias("shset")
    )
    verified = jaccard_verify(
        est,
        None,
        threshold,
        n_pairs=n_est,
        release=release,
        sets_df=sets_cand,
        # the semi-join above already restricted the sets to pair ids —
        # skip the verify's internal re-prune (one distinct exchange +
        # one broadcast join per call)
        sets_df_pruned=True,
    )
    if not n_capped:
        return verified
    # Exact tier over just the capped-bucket slice: both endpoints of
    # any cap-lost pair are, by definition, members of an over-cap
    # bucket, so this union restores total recall for the miss mode.
    capped_docs = df.join(
        _maybe_broadcast(
            capped.withColumnRenamed("_id", id_col), n_capped, BROADCAST_MAX_ID_ROWS
        ),
        id_col,
        "left_semi",
    )
    try:
        extra = ngram_jaccard_pairs(capped_docs, text_col, id_col, n, threshold)
    except ValueError as e:
        # Past tested scales only: the capped slice itself is
        # quadratic-infeasible. Degrade to LSH-only, loudly — the
        # residual miss mode (pair colliding only in capped buckets)
        # is documented above and on the recall-critical callers.
        logging.getLogger(__name__).warning(
            "capped_route_exact: exact tier refused on the %d-doc capped "
            "slice (%s); continuing with LSH-only recall for it", n_capped, e
        )
        return verified
    return verified.union(extra).dropDuplicates(["id_a", "id_b"])


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
    prefix_filter: bool = True,
    max_candidate_mass: int | None = 500_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard pairs: prefix-filtered inverted-index join
    for candidates, then the array-based exact verify.

    Prefix filtering (Bayardo et al., WWW'07 "Scaling Up All Pairs
    Similarity Search"; Chaudhuri et al., SSJoin): order the shingle
    universe globally by (document frequency asc, shingle asc); a pair
    with Jaccard ≥ t must have |A∩B| ≥ t·max(|A|,|B|), so by
    pigeonhole the globally-smallest shared shingle sits inside BOTH
    documents' prefixes of length |s| − ⌈t·|s|⌉ + 1. Joining only on
    prefix shingles is therefore EXACT (zero recall loss) while the
    candidate join touches only each document's rarest shingles —
    the posting lists that are short by construction. A size filter
    (t·|A| ≤ |B| ≤ |A|/t, also implied by the threshold) prunes the
    remainder. Verification is unchanged.

    Still the verification-grade operator — minhash_near_duplicates
    is the sub-linear scale path — but with the prefix+size filters
    the candidate stage no longer degenerates to all-pairs on
    boilerplate-heavy corpora. ``max_df`` additionally drops shingles
    above the given document frequency from candidate generation
    (lossy for pairs sharing only ultra-common shingles; off by
    default).

    ``max_candidate_mass``: scale guardrail. Before the candidate
    join, the exact candidate-pair mass Σ df·(df−1)/2 over the
    join-side posting lists is measured (one counter-sized
    aggregation); past the bound the quadratic tier refuses with an
    error naming :func:`minhash_near_duplicates` as the scale path,
    so a 100× corpus cannot reach an all-pairs join by accident. The
    default clears the sf0.1 fixture's prefix-filtered mass (~89M)
    with ~5× headroom; pass ``None`` for a deliberate unbounded run."""
    sh = shingles(df, text_col, id_col, n).cache()
    inv = sh.distinct()
    # True set sizes are fixed BEFORE any max_df drop: the prefix
    # length and the t·|A| ≤ |B| size filter must agree with the full
    # sets that jaccard_verify scores, else max_df would add extra
    # lossiness beyond its documented shingle drop (a pair pruned on
    # filtered sizes can pass the threshold on true sizes).
    sizes = inv.groupBy("_id").agg(F.count("*").alias("_sz"))
    if max_df is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        inv = inv.join(rare, "shingle", "left_semi")
    if prefix_filter:
        # df-asc ordering is a performance heuristic; any consistent
        # global order keeps the pigeonhole argument, so computing it
        # on the (possibly max_df-filtered) index is fine.
        dfreq = inv.groupBy("shingle").agg(F.count("*").alias("_df"))
        ranked = inv.join(dfreq, "shingle").join(sizes, "_id")
        w = W.partitionBy("_id").orderBy("_df", "shingle")
        # prefix length |s| - ceil(t*|s|) + 1 (window is doc-sized)
        plen = F.col("_sz") - F.ceil(F.lit(float(threshold)) * F.col("_sz")) + 1
        inv = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= plen)
            .select("_id", "shingle", "_sz")
        )
        sa = inv.select(F.col("_id").alias("id_a"), "shingle", F.col("_sz").alias("_sza"))
        sb = inv.select(F.col("_id").alias("id_b"), "shingle", F.col("_sz").alias("_szb"))
        size_ok = (F.col("_szb") * F.lit(float(threshold)) <= F.col("_sza")) & (
            F.col("_sza") * F.lit(float(threshold)) <= F.col("_szb")
        )
        joined = sa.join(sb, "shingle").where(
            (F.col("id_a") < F.col("id_b")) & size_ok
        )
    else:
        sa = inv.select(F.col("_id").alias("id_a"), "shingle")
        sb = inv.select(F.col("_id").alias("id_b"), "shingle")
        joined = sa.join(sb, "shingle").where(F.col("id_a") < F.col("id_b"))
    if max_candidate_mass is not None:
        # Exact pre-join mass of the self-join: Σ df·(df−1)/2 over the
        # index actually joined (post prefix/max_df). Counter-sized
        # work — far cheaper than discovering the blow-up mid-join.
        mass = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .agg(F.coalesce(F.sum(F.col("df") * (F.col("df") - 1) / 2), F.lit(0.0)))
            .first()[0]
        )
        if mass > max_candidate_mass:
            sh.unpersist()
            raise ValueError(
                f"ngram_jaccard_pairs candidate mass {int(mass):,} exceeds "
                f"max_candidate_mass={max_candidate_mass:,}: this exact tier "
                "is quadratic in posting-list sizes and would degenerate at "
                "this scale. Use minhash_near_duplicates (the sub-linear "
                "LSH tier) for corpora this large, tighten max_df, or pass "
                "max_candidate_mass=None for a deliberate unbounded run."
            )
    # Materialize candidates once: the verify fans them into several
    # plan branches, and the inverted-index join is the expensive part.
    cand = joined.select("id_a", "id_b").distinct().cache()
    n_cand = cand.count()
    return jaccard_verify(cand, sh, threshold, n_pairs=n_cand, release=[sh, cand])


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, portable: bool = False
) -> DataFrame:
    """64-bit SimHash per document (Charikar 2002): xxhash64 each token,
    vote per bit, fingerprint = sign vector. → (id, simhash).

    Bit votes avoid a 64× row explode: per token build a 64-element
    ±1 array (codegen'd transform), then aggregate element-wise sums
    with a single groupBy using explode over (bit, vote) — one shuffle
    keyed by (doc, bit) with map-side combine.

    ``portable=True`` swaps the token hash for the first 60 md5 bits
    (15 hex chars — fits a signed long; same trick as the minhash
    checkable twin) so the fingerprint, the bit votes, and the banded
    near-dup blocking all replay exactly in SQL.
    """
    from etl_database_spark.functions.text import normalize_text

    n_bits = 60 if portable else 64
    tok_hash = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        if portable
        else F.xxhash64("tok")
    )
    from etl_database_spark.functions.partitioning import spread_scan

    toks = (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("_id"), normalize_text(F.col(text_col)).alias("_norm"))
        .select("_id", F.explode(F.split("_norm", " ")).alias("tok"))
        .where(F.length("tok") > 0)
        .withColumn("h", tok_hash)
        .select(
            "_id", "h", F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit")
        )
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(h, bit) % 2 != 0"), F.lit(1)).otherwise(F.lit(-1)),
        )
    )
    bit_sums = toks.groupBy("_id", "bit").agg(F.sum("vote").alias("v"))
    return (
        bit_sums.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_near_duplicates(
    fps: DataFrame, max_hamming: int = 3, band_bits: int = 16
) -> DataFrame:
    """Near-dup pairs among SimHash fingerprints: block on 4
    ``band_bits``-wide bands (any pair within Hamming ≤3 shares ≥1
    exact band by pigeonhole when distance <4), then popcount-verify.
    ``band_bits=15`` covers the 60-bit portable fingerprints.

    → (id_a, id_b, hamming)."""
    mask = (1 << band_bits) - 1
    bands = fps.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("_id", "simhash", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# Below this many pairs the component graph is solved driver-side with
# union-find: the *verified near-dup pair list* is the already-reduced
# output of the dedup pipeline (orders of magnitude smaller than the
# corpus), and graph connectivity on ≤1M edges (~16 MB) is a
# driver-scale problem — each distributed label-propagation round costs
# several shuffles of scheduler overhead for no gain at that size.
SMALL_GRAPH_MAX_EDGES = 1_000_000


def connected_components(
    pairs: DataFrame, max_iter: int = 20, small_graph_max_edges: int | None = None
) -> DataFrame:
    """Cluster near-duplicate pairs into components → (_id, component)
    where ``component`` is the minimum member id (the canonical doc).

    Two tiers, gated on the measured edge count:

    - ≤ ``small_graph_max_edges``: collect the pair list and run exact
      union-find on the driver (one job; the pair list is the dedup
      pipeline's reduced output, not the corpus).
    - above: iterative min-label propagation over the undirected pair
      graph — the standard large-graph connected-components shape
      (one join + aggregate per round; converges in O(diameter) rounds,
      and dedup graphs are shallow, so 2-3 rounds typical). Each round
      materializes via cache so the lineage doesn't grow unboundedly;
      convergence is detected by the monotone label-sum fixpoint (min-
      propagation only ever decreases labels, so sum(label) is strictly
      decreasing until converged — no extra compare join needed).
    """
    if small_graph_max_edges is None:
        small_graph_max_edges = SMALL_GRAPH_MAX_EDGES
    # Cache the pair list: it either collects (small path) or fans
    # into two plan branches (symmetric union), and callers hand in
    # un-cached, often expensive pipelines. The tier gate and the
    # small-path collect are ONE bounded action — collect at most
    # gate+1 rows; ≤ gate means we already hold the complete edge
    # list, > gate falls to the distributed tier without ever
    # collecting more (r11: the previous count()-then-collect() ran
    # the pair pipeline and a full cache scan as two actions). The
    # probe crosses to the driver as TWO Arrow columns (toPandas),
    # not gate+1 pickled Row objects — at the 1M-edge gate that is
    # ~16 MB of flat arrays vs hundreds of MB of Row overhead (r11
    # advice). On the >gate path the probe's limit scan populates the
    # cache only partially, so the distributed tier re-materializes
    # the remaining partitions of the pair pipeline — bounded, and
    # the small path (the common one at dedup's reduced pair counts)
    # is where the probe saves the expensive full materialization.
    pairs = pairs.cache()
    probe = pairs.select("id_a", "id_b").limit(small_graph_max_edges + 1).toPandas()

    if len(probe) <= small_graph_max_edges:
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for ra0, rb0 in zip(probe["id_a"].tolist(), probe["id_b"].tolist()):
            ra, rb = find(ra0), find(rb0)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = [(x, find(x)) for x in parent]
        # Schema follows the caller's id type — hardcoding long would
        # make the driver path crash for string/int ids while the
        # distributed path (same inputs, more edges) worked.
        id_type = pairs.schema["id_a"].dataType.simpleString()
        result = pairs.sparkSession.createDataFrame(
            out, f"_id {id_type}, component {id_type}"
        )
        pairs.unpersist()
        return result

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("_id"))
        .distinct()
        .withColumn("component", F.col("_id"))
        .cache()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels._id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels._id == neighbor_min.src, "left")
            .select(
                "_id",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias(
                    "component"
                ),
            )
            .cache()
        )
        new_sum = new_labels.agg(F.sum("component")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    pairs.unpersist()
    return labels


def near_duplicate_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    **minhash_kwargs,
) -> DataFrame:
    """End-to-end dedup clustering: minhash near-dup pairs → connected
    components → (doc id, component, is_survivor). Survivor = the
    minimum id per component (deterministic canonical choice); docs in
    no pair are their own singleton survivors implicitly and are not
    listed."""
    pairs = minhash_near_duplicates(df, text_col, id_col, threshold=threshold, **minhash_kwargs)
    comps = connected_components(pairs)
    return comps.select(
        F.col("_id").alias(id_col),
        "component",
        (F.col("_id") == F.col("component")).alias("is_survivor"),
    )


def _bp(a, b):
    """Exact integer division (basis points) — routes through the one
    canonical helper so all engines/oracles share the arithmetic."""
    from etl_database_spark.functions.text import exact_idiv

    return exact_idiv(a, b)


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
) -> DataFrame:
    """Eval-set contamination: for each training document, how many of
    its distinct character n-grams also appear anywhere in the eval
    corpus (the GPT-3-style 13-gram decontamination test).

    → (doc_id, n_shingles, n_contaminated, contamination_bp). Shape at
    scale: the eval side reduces to a distinct shingle set (tiny next
    to the train corpus); the membership test is a broadcast join on
    the 8-byte shingle hash — no row of eval text ever joins train
    text, and the train side aggregates with map-side partials.

    The train side's per-doc distinctness is computed ROW-LOCALLY
    (:func:`shingle_sets`: array_distinct, no exchange) — the old
    ``shingles(train).distinct()`` shuffled every (id, shingle) row of
    the train corpus once just to dedup within documents. With the
    eval set under the broadcast gate the whole train side now runs
    scan → explode → broadcast-join → partial agg in ONE stage, and
    the only train-sized shuffle left is the doc-count-sized aggregate
    output.
    """
    tr = distinct_shingles(train, text_col, id_col, n)
    # Distinct eval shingles are unique join keys, so a LEFT join
    # cannot duplicate train rows — one pass computes both the shingle
    # count and the hit count. Materialize the (small) eval set once:
    # it both sizes the broadcast gate and keeps the join from
    # replaying the eval shingle pass.
    ev = (
        distinct_shingles(eval_df, text_col, id_col, n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
        .localCheckpoint(eager=True)
    )
    n_ev = ev.count()
    return (
        tr.join(_maybe_broadcast(ev, n_ev, BROADCAST_MAX_SET_ENTRIES), "shingle", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .select(
            F.col("_id").alias("doc_id"),
            "n_shingles",
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            _bp(F.col("n_contaminated") * 10_000, F.col("n_shingles")).alias(
                "contamination_bp"
            ),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram,
    slide a window of w consecutive hashes, keep each window's
    minimum; the distinct selected values are the fingerprint set.
    Guarantees every shared substring of length ≥ k+w−1 contributes a
    shared fingerprint, with expected density 2/(w+1) — position-
    robust dedup evidence at a fraction of full shingling's volume.

    → (id, n_fps, fp_sum): fingerprint-set size and exact BIGINT sum
    (the order-free set checksum the oracle compares). We keep the
    VALUE set, not (value, position) pairs, so the rightmost-min
    tie-break of the paper is irrelevant to the output.

    Shape: entirely per-row codegen array expressions (k-gram hash
    array → window-min array → distinct → fold) after a spread_scan —
    ONE pass, zero shuffles, no per-document state off the row. The
    md5-32 hash makes every step replay in SQL (checkable-twin
    family)."""
    from etl_database_spark.functions.partitioning import spread_scan
    from etl_database_spark.functions.text import normalize_text

    return winnow_fingerprint_sets(df, text_col, id_col, k, w).select(
        "_id",
        F.size("_fps").cast("long").alias("n_fps"),
        F.aggregate("_fps", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "fp_sum"
        ),
    )


def winnow_fingerprint_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """(_id, _fps array<long>) — the distinct winnowing fingerprint
    values per document (see :func:`winnow_fingerprints`). The set
    form feeds blocking joins (explode + self-join on fingerprint)
    and the coverage property tests."""
    from etl_database_spark.functions.partitioning import spread_scan
    from etl_database_spark.functions.text import normalize_text

    base = spread_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("_id"),
        normalize_text(F.col(text_col)).alias("_norm"),
    )
    hs = F.transform(
        F.sequence(F.lit(1), F.length("_norm") - F.lit(k - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.col("_norm").substr(i, F.lit(k))), 1, 8), 16, 10
        ).cast("long"),
    )
    with_h = base.where(F.length("_norm") >= k + w - 1).select("_id", hs.alias("_hs"))
    wins = F.transform(
        F.sequence(F.lit(1), F.size("_hs") - F.lit(w - 1)),
        lambda j: F.array_min(F.slice("_hs", j, F.lit(w))),
    )
    return with_h.select("_id", F.array_distinct(wins).alias("_fps"))


def winnow_similarity_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    min_containment_bp: int = 5000,
    max_bucket: int = 200,
) -> DataFrame:
    """MOSS-style similarity report from winnowing fingerprints →
    (id_a, id_b, n_shared, containment_bp): pairs sharing ≥
    ``min_shared`` fingerprints whose containment — shared
    fingerprints over the SMALLER document's fingerprint-set size, in
    exact basis points — clears ``min_containment_bp``.

    Shape: fingerprint sets (one pass, zero shuffles) → explode →
    fingerprint-bucket self-join, skew-capped at ``max_bucket`` like
    the LSH buckets (a fingerprint shared by half the corpus is
    boilerplate, and the exact-dedup tier already owns identical
    text) → shared-count aggregate with map-side combine →
    containment in integer basis points via the canonical exact_idiv
    (bit-identical in every engine). Everything replays in SQL."""
    sets = winnow_fingerprint_sets(df, text_col, id_col, k, w).cache()
    # Materialize the postings ONCE: the pair math reads them three
    # times (bucket sizes, both join sides), and each read would
    # otherwise re-explode from the cached sets — at 100× sf0.1 that's
    # two redundant passes over ~4·10^8 rows. (The cache on sets keeps
    # the explode itself from re-evaluating the md5 chain per output
    # row while fp materializes.)
    fp = sets.select("_id", F.explode("_fps").alias("fp")).localCheckpoint(eager=True)
    # Doc fingerprint-set size is a ROW property of the set frame —
    # size(_fps) off the (cached) sets instead of a full groupBy
    # re-count of the exploded postings (r11: one posting-table scan +
    # exchange removed; the store path keeps the groupBy because its
    # merged postings are the only thing it has).
    sizes = sets.select("_id", F.size("_fps").cast("long").alias("n_fps"))
    out = winnow_pairs_from_postings(
        fp,
        min_shared=min_shared,
        min_containment_bp=min_containment_bp,
        max_bucket=max_bucket,
        sizes=sizes,
    )
    out = out.localCheckpoint(eager=True)
    sets.unpersist()
    return out


def winnow_pairs_from_postings(
    fp: DataFrame,
    min_shared: int = 2,
    min_containment_bp: int = 5000,
    max_bucket: int = 200,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """The serve half of :func:`winnow_similarity_pairs`, factored
    over a postings frame ``(_id, fp)`` (one row per document per
    DISTINCT fingerprint value) so the one-shot path and the
    incremental WinnowStore share the identical pair math: per-doc
    sizes from the UNCAPPED postings, the skew cap applied to bucket
    sizes at serve time (a corpus-level property, so batch-split
    invariant), bucket self-join, shared counts, exact-basis-point
    containment.

    ``sizes``: optional precomputed (_id, n_fps) frame. A caller that
    holds the fingerprint SETS passes ``size(_fps)`` — a row-local
    projection — and the full posting scan + exchange this groupBy
    costs disappears (counting exploded rows to recover a length the
    array already knew). Must equal the groupBy exactly: one posting
    row per (_id, DISTINCT fp)."""
    from etl_database_spark.functions.text import exact_idiv

    if sizes is None:
        sizes = fp.groupBy("_id").agg(F.count("*").cast("long").alias("n_fps"))
    bucket_sizes = fp.groupBy("fp").agg(F.count("*").alias("bn"))
    capped = fp.join(bucket_sizes.where(F.col("bn") <= max_bucket), "fp").select(
        "_id", "fp"
    )
    a, b = capped.alias("a"), capped.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_fps", "na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_fps", "nb"), "id_b")
        .withColumn(
            "containment_bp",
            exact_idiv(F.col("n_shared") * 10_000, F.least("na", "nb")),
        )
        .where(F.col("containment_bp") >= min_containment_bp)
        .select("id_a", "id_b", "n_shared", "containment_bp")
    )
