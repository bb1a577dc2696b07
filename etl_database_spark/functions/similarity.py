"""Embedding similarity search over array<float> columns.

Two tiers:

- **Brute-force cosine top-k** — exact baseline: broadcast the query
  set, score every (query, candidate) pair with JVM-side array
  expressions (zip_with product + aggregate fold — no Python in the
  scoring loop), rank per query. Cost O(|Q|·N): right when |Q| is small
  or as the verifier for the ANN tier.
- **Random-hyperplane LSH ANN** (Charikar 2002 SimHash for cosine):
  each vector → sign-bit signature against k pseudo-random hyperplanes;
  bucket join on signature prefix → cosine only within buckets. At
  100 TB this turns the O(|Q|·N) scan into bucket-local work; recall is
  tunable via (k, tables) and validated in tests against brute force.

Determinism: dot products fold left-to-right after casting float →
double, so scores are reproducible bit-for-bit (and match the DuckDB
oracle, which does the same double-cast fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _to_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    → (query_id, neighbor_id, cos_sim), k rows per query, self excluded.
    Ranking uses the rounded score + id tie-break so results are
    deterministic across partitionings and engines.
    """
    from etl_database_spark.functions.partitioning import spread_scan

    # Norms are per-VECTOR properties: compute each side's once before
    # the pair fan-out instead of twice per (candidate, query) pair —
    # the naive cosine() runs three zip_with folds per pair, this
    # shape runs one (the dot) plus one fold per input row. The
    # product na*nb has the same operands in the same order as
    # norm(a)*norm(b), so cos_sim is bit-identical to the old formula
    # (and to the SQL oracle) at ~1/3 the per-pair arithmetic — the
    # semantic_assign treatment applied to the top-k scorer (r11).
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_qn", norm(F.col("q_vec")))
    # per (candidate, query) dot products are the CPU cost — spread the
    # candidate side so a one-row-group scan doesn't serialize them
    # (small bytes_per_task: each candidate row scores every query)
    c = spread_scan(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        bytes_per_task=16 * 1024,
    ).withColumn("_cn", norm(F.col("c_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


def rp_project(
    df: DataFrame,
    dim: int,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection → (_id, rp_vec).

    ``rp_vec[j] = v · h_j`` against ``out_dim`` deterministic ±1
    hyperplanes (Achlioptas 2003: the database-friendly JL matrix —
    ±1 entries preserve pairwise geometry like Gaussian entries while
    the projection stays a literal-array codegen expression, no RNG
    at runtime and no shuffle). Cosine is scale-invariant, so the
    1/√out_dim normalization is omitted.

    This is the embedding-compression tier below PQ: a 64→16
    projection cuts every downstream dot product, shuffle byte and
    cluster assignment 4× while keeping STRONG similarities intact —
    planted near-duplicates stay top-1 and cos>0.8 pairs distort by
    <0.05 at out_dim=16 (pinned in tests/test_similarity.py). What JL
    does NOT preserve is rank order among near-orthogonal vectors
    (isotropic-noise corpora have no margin to preserve), so the
    compressed space is a candidate filter / dedup space, not a
    substitute for exact re-ranking. The ±1 literals derive from the
    same LCG as the LSH hyperplanes (different seed), so a SQL oracle
    replays the projection bit-for-bit — double products of exact ±1
    are exact, and the left-to-right fold matches DuckDB's list_sum.

    The whole projection is built as ONE parsed SQL expression rather
    than out_dim × dim Column calls: constructing 16 × 64 literal
    columns plus 32 higher-order-function lambdas cost ~1.9 s of
    py4j round-trips PER QUERY PLAN BUILD at sf0.1 — driver-side
    planning time that dwarfed the 16-d dot products themselves (r12,
    guide §7.3 "very large plans"). The parsed expression analyzes to
    the same transform/zip_with/aggregate tree with the same double
    literals, so scores are bit-identical (pinned in
    tests/test_similarity.py::test_rp_project_expr_matches_column_form).
    """
    comps = ", ".join(
        _dot_plane_sql(vec_col, _hyperplane(dim, j, seed)) for j in range(out_dim)
    )
    return df.select(
        F.col(id_col).alias("_id"), F.expr(f"array({comps})").alias("rp_vec")
    )


def _dot_plane_sql(vec_col: str, plane: list[float]) -> str:
    """SQL text for ``dot(col, literal plane)`` — mirrors :func:`dot`
    exactly: cast-to-double transforms on both sides, product zip,
    left-to-right double fold. ``D`` suffixes keep the literals DOUBLE
    (a bare ``1.0`` parses as DECIMAL and would change result types)."""
    lits = "array(" + ", ".join(f"{x:.1f}D" for x in plane) + ")"
    return (
        f"aggregate(zip_with(transform(`{vec_col}`, x -> CAST(x AS DOUBLE)), "
        f"transform({lits}, x -> CAST(x AS DOUBLE)), (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _hyperplane(dim: int, plane_id: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from an LCG — no RNG
    library dependency, identical on every executor."""
    comps = []
    state = seed * 1_000_003 + plane_id
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        comps.append(1.0 if (state >> 40) & 1 else -1.0)
    return comps


def lsh_signatures(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Sign-bit signature per vector: bit j = sign(v · hyperplane_j).

    One projection, no shuffle; hyperplanes are literal arrays baked
    into the plan (codegen constants). Built as ONE parsed SQL
    expression for the same reason as :func:`rp_project` — the
    per-plane Column/lambda construction was driver-side planning
    cost, not compute.
    """
    sig = "CAST(0 AS BIGINT)"
    for j in range(num_planes):
        d = _dot_plane_sql(vec_col, _hyperplane(dim, j, seed))
        sig += (
            f" + shiftleft(CASE WHEN ({d}) > 0 THEN CAST(1 AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END, {j})"
        )
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.expr(sig).alias("lsh_sig"),
    )


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the low-half OR high-half
    of the LSH sign signature (two-probe banding — Hamming-1 misses in
    one half are caught by the other), then exact cosine + rank within
    candidates.

    → (query_id, neighbor_id, cos_sim) with ≤k rows per query."""
    sub_bits = num_planes // 2
    cand_sigs = lsh_signatures(embeddings, dim, num_planes, id_col, vec_col)
    q_sigs = lsh_signatures(queries, dim, num_planes, id_col, vec_col)

    def sub_keys(sig_df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        # Each probe's key is (probe_id, bits): lo and hi halves come
        # from different hyperplanes, so a shared scalar key space
        # would let a query's lo bits collide with a candidate's hi
        # bits — spurious candidates at rate ~2^-sub_bits per pair
        # that degrade the join toward all-pairs on large corpora.
        return sig_df.select(
            F.col("_id").alias(id_alias),
            F.col("_vec").alias(vec_alias),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("probe"),
                        F.col("lsh_sig")
                        .bitwiseAND(F.lit((1 << sub_bits) - 1).cast("long"))
                        .alias("bits"),
                    ),
                    F.struct(
                        F.lit(1).alias("probe"),
                        F.shiftright("lsh_sig", num_planes - sub_bits).alias("bits"),
                    ),
                )
            ).alias("bucket"),
        )

    cands = sub_keys(cand_sigs, "neighbor_id", "c_vec")
    qs = sub_keys(q_sigs, "query_id", "q_vec")
    scored = (
        cands.join(qs, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .distinct()
        .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection: the vector-space sibling of
# the MinHash/SimHash text dedup family (functions/dedup.py). Exact
# all-pairs as the oracle-checkable baseline; banded sign-LSH blocking
# as the scale path.


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    max_pairs: int | None = 100_000_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (a, b) with
    ``id_a < id_b`` and rounded cosine ≥ threshold.

    → (id_a, id_b, cos_sim). This is the documented O(n²) exact
    baseline — right as the verifier and on bounded corpora; at 100 TB
    use :func:`cosine_near_dup_lsh`, which blocks candidates through
    banded sign-LSH before scoring. Scores round before the threshold
    compare so the cut is reproducible across engines.

    ``max_pairs``: the guardrail making "bounded corpora" enforced
    rather than advisory (the r6 family convention — see the n-gram
    candidate-mass and semdedup pair-mass gates): n·(n−1)/2 past the
    bound refuses with an error naming the LSH scale path, so the
    nested-loop join cannot be reached by accident at 10×. ``None``
    opts out for a deliberate unbounded run.
    """
    if max_pairs is not None:
        n = df.count()
        if n * (n - 1) // 2 > max_pairs:
            raise ValueError(
                f"cosine_near_dup_pairs would score {n * (n - 1) // 2:,} "
                f"pairs ({n:,} vectors), exceeding max_pairs={max_pairs:,}: "
                "the exact tier is an all-pairs nested-loop join. Use "
                "cosine_near_dup_lsh (banded sign-LSH blocking) at this "
                "scale, or pass max_pairs=None for a deliberate unbounded "
                "run."
            )
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_digits)
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .orderBy("id_a", "id_b")
    )


def lsh_band_keys(
    df: DataFrame,
    dim: int,
    bands: int = 16,
    rows_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(_id, band, band_key) — one row per (vector, band).

    Band ``i`` keys on the sign bits of ``rows_per_band`` dedicated
    hyperplanes (planes are band-disjoint, baked in as codegen literal
    arrays — one projection, no shuffle). Two vectors collide in band
    ``i`` iff all that band's bits agree, so for cosine similarity s
    the candidate probability is 1-(1-p^r)^B with
    p = 1 - acos(s)/π — tune (bands, rows_per_band) to put the
    S-curve's knee at the dedup threshold.
    """
    keys = []
    for bi in range(bands):
        key = F.lit(0)
        for j in range(rows_per_band):
            plane = F.array(
                *[F.lit(x) for x in _hyperplane(dim, bi * rows_per_band + j, seed)]
            )
            bit = F.when(dot(F.col(vec_col), plane) > 0, F.lit(1)).otherwise(F.lit(0))
            key = key + bit * F.lit(1 << j)
        keys.append(key)
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.array(*keys)).alias("band", "band_key"),
    )


def cosine_near_dup_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.35,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Banded sign-LSH near-dup pairs: candidates share at least one
    band key; exact cosine verifies every candidate against the
    threshold.

    Same output schema as :func:`cosine_near_dup_pairs`; recall < 1 by
    design (property-tested against the exact baseline). Scale shape
    mirrors the MinHash path (dedup.py lsh_candidate_pairs): band
    buckets over ``max_bucket`` vectors are dropped before the
    self-join so one degenerate bucket cannot go quadratic, candidate
    ids are deduped BEFORE vectors are re-attached (the distinct
    shuffles 2 longs per pair, not 2·dim floats), and the verify join
    is a plain shuffle hash join — nothing here broadcasts the corpus.
    """
    keys = lsh_band_keys(df, dim, bands, rows_per_band, id_col, vec_col)
    bucket_sizes = keys.groupBy("band", "band_key").agg(F.count("*").alias("bucket_n"))
    keys = keys.join(
        bucket_sizes.where(F.col("bucket_n") <= max_bucket), ["band", "band_key"]
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_digits)
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# IVF tier: k-means coarse quantizer + inverted-list probing.


def kmeans_fit(
    df: DataFrame,
    dim: int,
    k: int = 16,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fixed-iteration Lloyd's k-means on an embedding column, pure
    DataFrame ops: assignment = broadcast-join argmin squared-L2
    (``_argmin_assign`` — constant plan size in k); update = groupBy
    mean per dimension via element-wise array aggregation
    (posexplode + avg).

    Deterministic: seeds are the k lowest-id vectors (no RNG), and
    ties in assignment break toward the lower centroid id. Each
    iteration is one scan + one shuffle of (n, dim) values — the
    classic scalable k-means shape; k and dim are driver-side small.
    """
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(_to_double(F.col(vec_col)).alias("c"))
        .collect()
    )
    centroids = [list(r.c) for r in seeds]
    vecs = df.select(F.col(id_col).alias("_id"), _to_double(F.col(vec_col)).alias("v"))
    for _ in range(max_iter):
        assigned = _argmin_assign(vecs, centroids)
        new_rows = (
            assigned.select("centroid", F.posexplode("v").alias("pos", "val"))
            .groupBy("centroid", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in new_rows:
            new_centroids[r.centroid][r.pos] = r.m
        if all(
            abs(a - b) < 1e-9
            for nc, oc in zip(new_centroids, centroids)
            for a, b in zip(nc, oc)
        ):
            break
        centroids = new_centroids
    return centroids


def _argmin_assign(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(_id, v) × centroid list → (_id, v, centroid) by squared-L2
    argmin, ties → lower centroid id. Broadcast join + min(struct)
    so partial aggregation collapses the k candidates per vector
    map-side (one exchange of n rows, not k·n) — and the plan size
    stays constant in k, unlike a per-centroid when-ladder whose
    generated code blows up by k ~ 64 (the distance arithmetic is the
    same left-to-right double fold either way, so assignments are
    bit-identical)."""
    spark = vecs.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "centroid int, cvec array<double>",
    )
    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(cdf)).withColumn("_dist", dist)
    return (
        scored.groupBy("_id")
        .agg(F.min(F.struct("_dist", "centroid", "v")).alias("_m"))
        .select("_id", F.col("_m.v").alias("v"), F.col("_m.centroid").alias("centroid"))
    )


def kmeans_fit_portable(
    df: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fixed-iteration Lloyd's k-means whose ENTIRE training
    trajectory is cross-engine replayable (the decimal-sum recipe of
    functions/classifier.py applied to clustering): seeds are the k
    lowest-id vectors (the PQ/IVF twin seed rule), assignment is the
    bit-deterministic ``_argmin_assign`` fold, and each centroid
    update sums ROUND(component, 12) as DECIMAL(38,12) (exact,
    order-independent) then rounds the mean to 9 digits. No
    transcendentals — squared-L2 Lloyd is pure arithmetic — so a SQL
    engine reproduces every iteration exactly (the
    ``kmeans_assign_checkable`` oracle). Empty clusters keep their
    previous centroid. The production ``kmeans_fit`` (float avg,
    convergence stop, fit-sample gate) stays the fast path."""
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(_to_double(F.col(vec_col)).alias("c"))
        .collect()
    )
    centroids = [list(r.c) for r in seeds]
    vecs = df.select(
        F.col(id_col).alias("_id"), _to_double(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = _argmin_assign(vecs, centroids)
        rows = (
            assigned.select("centroid", F.posexplode("v").alias("pos", "val"))
            .groupBy("centroid", "pos")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("val"), 12).cast("decimal(38,12)")
                    ).cast("double")
                    / F.count("*"),
                    9,
                ).alias("m")
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in rows:
            new_centroids[r.centroid][r.pos] = r.m
        centroids = new_centroids
    return centroids


def kmeans_assign_portable(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist_r6): the final assignment against a
    trained (or literal) centroid list, with the rounded squared-L2
    distance carried so the oracle certifies the geometry, not just
    the labels."""
    vecs = df.select(
        F.col(id_col).alias("vec_id"), _to_double(F.col(vec_col)).alias("v")
    )
    cdf = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, cvec array<double>",
    )
    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(cdf)).withColumn("_dist", dist)
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("_dist", "cluster")).alias("_m"))
        .select(
            "vec_id",
            F.col("_m.cluster").alias("cluster"),
            F.round(F.col("_m._dist"), 6).alias("dist_r6"),
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid → inverted lists.
    At scale this frame is written partitioned by ``centroid`` so a
    probe only scans the probed partitions."""
    vecs = df.select(F.col(id_col).alias("_id"), _to_double(F.col(vec_col)).alias("v"))
    return _argmin_assign(vecs, centroids)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: each query probes its ``n_probe`` nearest centroids
    and ranks by cosine only within those inverted lists — the scan
    shrinks by ~k/n_probe vs brute force, the standard IVF tradeoff.
    """
    lists = ivf_assign(df, centroids, id_col, vec_col)
    q = ivf_probe_targets(queries, centroids, n_probe, id_col, vec_col)
    scored = (
        lists.join(q, "centroid")
        .where(F.col("_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("v")), 4))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", F.col("_id").alias("neighbor_id"), "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


# Imported HERE, not at module top: operators/__init__ imports five
# names from this module that are all defined above this line, so the
# cycle similarity → operators.batchstore → operators/__init__ →
# similarity resolves in either import order.
from etl_database_spark.operators.batchstore import BatchStore  # noqa: E402


class IvfIndex(BatchStore):
    """Persisted IVF index: inverted lists written partitioned by
    ``(batch, centroid)``, centroids stored alongside as JSON.

    ``ivf_topk`` refits/reassigns per call — fine for one-shot queries,
    wrong for a served index at 100 TB. Build once; every probe then
    reads ONLY the ``n_probe`` probed partition directories (static
    partition pruning: the probed centroid ids are collected driver-side
    — ≤ k ints — and pushed as a partition filter, so the scan never
    touches the other inverted lists).

    Maintenance (the served-index lifecycle at scale):

    - :meth:`append` ingests a new vector batch against the FIXED
      centroids. The batch id is the first-level partition key and the
      write is dynamic-partition-overwrite, so replaying a batch
      (retry, restarted pipeline) replaces its own partitions instead
      of duplicating rows — the same idempotence contract as the
      streaming signature/embedding stores.
    - :meth:`merge_from` folds another index in by re-reading its
      lists as vectors and appending (reassignment to THIS index's
      centroids happens in the append path, so differing quantizers
      merge correctly).
    - :meth:`compact` rewrites accumulated small per-batch files into
      one consolidated layout (the LSM-style maintenance op); absorbed
      batch ids are remembered so a late replay of a compacted batch
      stays a no-op instead of re-introducing duplicates.
    """

    CENTROIDS_FILE = "_centroids.json"
    PARTITION_COLS = ("centroid",)

    def __init__(self, spark, path: str, centroids: list[list[float]]):
        super().__init__(spark, path)
        self.centroids = centroids

    @classmethod
    def build(
        cls,
        spark,
        df: DataFrame,
        centroids: list[list[float]],
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        """Assign every vector to its nearest centroid and write the
        inverted lists partitioned by (batch, centroid) — the centroid
        directory is the probe unit, the batch directory the
        idempotent-ingest unit."""
        import json
        import os

        lists = ivf_assign(df, centroids, id_col, vec_col).withColumn(
            "batch", F.lit(cls.BASE_BATCH)
        )
        lists.write.mode("overwrite").partitionBy("batch", "centroid").parquet(path)
        with open(os.path.join(path, cls.CENTROIDS_FILE), "w") as fh:
            json.dump(centroids, fh)
        with open(os.path.join(path, cls.COMMITTED_FILE), "w") as fh:
            json.dump([cls.BASE_BATCH], fh)
        return cls(spark, path, centroids)

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(path, cls.CENTROIDS_FILE)) as fh:
            centroids = json.load(fh)
        return cls(spark, path, centroids)

    def lists(self, probed: list[int] | None = None) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        if probed is not None:
            df = df.where(F.col("centroid").isin([int(c) for c in probed]))
        return df

    # -- maintenance ------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        batch: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> bool:
        """Idempotently ingest one vector batch against the fixed
        centroids. Returns False (no write) if the batch id was already
        ingested — live or absorbed by a compaction — so pipeline
        replays are safe. The write is dynamic-partition-overwrite
        scoped to ``batch=<id>/centroid=*``: a crash mid-write leaves a
        partial batch that the retry fully replaces."""
        # _begin_batch also seeds the manifest for pre-manifest stores
        # from the directory listing BEFORE writing — otherwise _commit
        # would union against an empty list, dropping legacy batch dirs
        # from the committed set, and a later compact() would omit them
        # from absorbed-ids (late replays would duplicate vectors).
        if not self._begin_batch(batch):
            return False
        self._write_batch(ivf_assign(df, self.centroids, id_col, vec_col), batch)
        return True

    def merge_from(self, other: "IvfIndex", batch: str) -> bool:
        """Fold another index's vectors into this one as one batch.
        The other index's centroids are irrelevant: its lists are read
        back as plain (id, vector) rows and reassigned to THIS index's
        quantizer by the append path."""
        vectors = other.lists().select(
            F.col("_id").alias("vec_id"), F.col("v").alias("embedding")
        )
        return self.append(vectors, batch)

    def compact(self, files_per_list: int = 1) -> None:
        """Rewrite all accumulated per-batch files into a consolidated
        ``batch=base`` layout with ``files_per_list`` files per
        inverted list (BatchStore.compact handles manifests, sidecar
        carry-over — including the centroids file — and the
        write-to-sibling-and-swap)."""
        self._files_per_list = files_per_list
        super().compact()

    def _compact_fold(self, tmp: str) -> None:
        files_per_list = getattr(self, "_files_per_list", 1)
        consolidated = (
            self.lists()
            .select("_id", "v", "centroid")
            .withColumn("batch", F.lit(self.BASE_BATCH))
            # one shuffle keyed by (list, salt): hashing on centroid
            # alone would land every inverted list in ONE partition —
            # one file per list no matter what files_per_list says. The
            # salt splits each list across up to files_per_list
            # partitions, so each centroid directory gets up to that
            # many files (the partitionBy write splits directories).
            # explicit partition count: without it AQE coalesces the
            # small shuffle back into one partition and the salt split
            # silently collapses to one file per list again
            .withColumn("_salt", F.pmod(F.xxhash64("_id"), F.lit(files_per_list)))
            .repartition(len(self.centroids) * files_per_list, "centroid", "_salt")
            .drop("_salt")
        )
        consolidated.write.mode("overwrite").partitionBy("batch", "centroid").parquet(tmp)

    def stats(self) -> DataFrame:
        """Per-list health: row count and file count per centroid —
        the imbalance signal that decides when to refresh centroids or
        compact (many small files after frequent appends)."""
        return (
            self.lists()
            # non-deterministic exprs can't appear inside agg functions;
            # project the file name first, then aggregate the column
            .withColumn("_file", F.input_file_name())
            .groupBy("centroid")
            .agg(
                F.count("*").cast("long").alias("n_vectors"),
                F.count_distinct("_file").cast("long").alias("n_files"),
            )
            .orderBy("centroid")
        )

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Probe-and-rank against the persisted lists. Identical output
        to ``ivf_topk`` over the same centroids — the difference is the
        scan: partition-pruned to the probed lists only."""
        q = ivf_probe_targets(queries, self.centroids, n_probe, id_col, vec_col)
        probed = sorted(r.centroid for r in q.select("centroid").distinct().collect())
        scored = (
            self.lists(probed)
            .join(F.broadcast(q), "centroid")
            .where(F.col("_id") != F.col("query_id"))
            .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("v")), 4))
        )
        w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("query_id", F.col("_id").alias("neighbor_id"), "cos_sim")
            .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
        )


def ivf_probe_targets(
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, q_vec, centroid) for each query's n_probe nearest
    centroids — built with an exploded distance array + rank."""
    vecs = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("q_vec")
    )
    dist_structs = []
    for i, c in enumerate(centroids):
        # single array literal, not len(c) py4j lit calls (r12 plan-build cost)
        lit = F.lit([float(x) for x in c])
        d = F.aggregate(
            F.zip_with(F.col("q_vec"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dist_structs.append(F.struct(d.alias("dist"), F.lit(i).alias("centroid")))
    exploded = vecs.withColumn(
        "ds", F.explode(F.array(*dist_structs))
    ).select("query_id", "q_vec", F.col("ds.dist").alias("dist"), F.col("ds.centroid").alias("centroid"))
    w = W.partitionBy("query_id").orderBy("dist", "centroid")
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "centroid")
    )


# ---------------------------------------------------------------------------
# Feature-hashing text embeddings (the "hashing trick", Weinberger et
# al. 2009 / fastText-style): token → stable hash → signed bucket
# accumulate → L2 normalize. Closes the text→vector→ANN loop entirely
# in-engine: documents embedded here feed cosine_topk / ann_topk /
# IvfIndex with no external model. Hashing uses md5 (not xxhash64) so
# Spark ≡ DuckDB ≡ hashlib — the operator is fully oracle-checkable.


def feature_hash_sparse(
    df: DataFrame, text_col: str, id_col: str, dim: int = 64
) -> DataFrame:
    """Sparse signed-bucket weights per document → (id, bucket,
    weight), L2-normalized per doc and rounded to 4 decimals (the
    engine-portable form; see cosine_topk's oracle for the rounding
    precedent).

    Scale shape: one tokenize+explode pass, one partial-aggregated
    shuffle on (id, bucket), one window per id for the norm — no
    corpus-wide state, no model object, deterministic across runs and
    cluster sizes.
    """
    from pyspark.sql import Window as W

    from etl_database_spark.functions.partitioning import spread_scan

    toks = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("tok")
    t = (
        spread_scan(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("_id"), toks)
        .where(F.col("tok") != "")
    )
    h = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10).cast("long")
    sign_digit = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 9, 1), 16, 10).cast("long")
    hashed = t.select(
        "_id",
        (h % F.lit(dim)).alias("bucket"),
        F.when(sign_digit % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("sign"),
    )
    sparse = hashed.groupBy("_id", "bucket").agg(
        F.sum("sign").cast("double").alias("val")
    ).where(F.col("val") != 0.0)
    w = W.partitionBy("_id")
    return (
        sparse.withColumn("_norm", F.sqrt(F.sum(F.col("val") * F.col("val")).over(w)))
        .select(
            "_id",
            "bucket",
            F.round(F.col("val") / F.col("_norm"), 4).alias("weight"),
        )
    )


def feature_hash_embeddings(
    df: DataFrame, text_col: str, id_col: str, dim: int = 64
) -> DataFrame:
    """Dense L2-normalized embedding column → (id, embedding
    array<float>) assembled from the sparse form — ready for
    cosine_topk / ann_topk / IvfIndex.build."""
    sparse = feature_hash_sparse(df, text_col, id_col, dim)
    dense = (
        sparse.groupBy("_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "weight"))
            ).alias("_m")
        )
        .select(
            F.col("_id").alias(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at("_m", i.cast("int")), F.lit(0.0)).cast(
                    "float"
                ),
            ).alias("embedding"),
        )
    )
    return dense


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup): cluster the embedding space, then prune
# near-semantic-duplicates WITHIN each cluster. The all-pairs cosine
# problem becomes cluster-local — with k sized so clusters stay
# bounded, total pair work is Σ|cluster|² ≪ n², which is what makes
# embedding dedup tractable at corpus scale (Abbas et al. 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication", arXiv:2303.09540). Extension operator — no
# counterpart in the reference repo (its dedup surface is the
# single-active-snapshot trigger, dataset_setup.sql:193-216).


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid by squared-L2
    (ties → lowest cluster_id) → (_id, _vec, cluster_id).

    ``centroids`` is (cluster_id, cvec) — k rows, broadcast. The k-way
    candidate expansion happens map-side; the argmin runs as
    ``min(struct(dist, cluster_id, vec))`` so partial aggregation
    collapses the k candidates per vector BEFORE the shuffle — one
    exchange of n rows, not k·n — and the plan stays constant-size in
    k (SemDeDup uses k ~ 10⁵): distances fold left-to-right in
    double, deterministic across engines. Same shape as
    ``_argmin_assign``, differing only in the centroid frame's column
    names.
    """
    from etl_database_spark.functions.partitioning import spread_scan

    # the k-way distance fold is pure CPU per vector — don't let a
    # single-row-group embeddings file serialize it (small
    # bytes_per_task: each row does k distance folds)
    v = spread_scan(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")),
        bytes_per_task=32 * 1024,
    )
    c = centroids.select("cluster_id", "cvec")
    dist = F.aggregate(
        F.zip_with(
            _to_double(F.col("_vec")),
            _to_double(F.col("cvec")),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = v.join(F.broadcast(c)).withColumn("_dist", dist)
    best = (
        scored.groupBy("_id")
        .agg(F.min(F.struct("_dist", "cluster_id", "_vec")).alias("_m"))
        .select(
            "_id",
            F.col("_m._vec").alias("_vec"),
            F.col("_m.cluster_id").alias("cluster_id"),
        )
    )
    return best


def semantic_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment plus the per-vector L2 norm →
    (_id, _vec, cluster_id, _norm): the shared input of the batch and
    streaming semantic-dedup pair stages. The norm is computed once
    per vector rather than twice per pair — the same sqrt(fold) in
    the same order, so downstream cos_sim stays bit-identical to the
    naive cosine() formula (and to the SQL oracle) at ~1/3 the
    per-pair arithmetic."""
    return assign_nearest(df, centroids, id_col, vec_col).withColumn(
        "_norm", norm(F.col("_vec"))
    )


def semantic_pairs(
    left_assigned: DataFrame,
    right_assigned: DataFrame,
    threshold: float,
    round_digits: int = 4,
    self_join: bool = True,
) -> DataFrame:
    """Qualifying intra-cluster cosine pairs between two
    ``semantic_assign`` frames → (cluster_id, id_a, id_b, cos_sim)
    with id_a < id_b.

    ``self_join=True`` is the batch shape (left IS right; the
    ``id_a < id_b`` filter dedups and drops self-pairs).
    ``self_join=False`` is the streaming cross-batch shape: every
    (stored, new) pair with distinct ids qualifies, and the output is
    oriented by id afterward — cosine is symmetric, so orientation
    after scoring changes nothing."""
    left = left_assigned.select(
        "cluster_id",
        F.col("_id").alias("id_a"),
        F.col("_vec").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    right = right_assigned.select(
        "cluster_id",
        F.col("_id").alias("id_b"),
        F.col("_vec").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    joined = left.join(right, "cluster_id")
    joined = joined.where(
        F.col("id_a") < F.col("id_b") if self_join else F.col("id_a") != F.col("id_b")
    )
    scored = joined.withColumn(
        "cos_sim",
        F.round(
            dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
            round_digits,
        ),
    ).where(F.col("cos_sim") >= threshold)
    if not self_join:
        scored = scored.select(
            "cluster_id",
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "cos_sim",
        )
    return scored.select("cluster_id", "id_a", "id_b", "cos_sim")


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    max_pair_mass: int | None = 500_000_000,
) -> DataFrame:
    """SemDeDup prune list → (cluster_id, pruned_id, kept_id, cos_sim).

    A vector is pruned when some LOWER-id vector in its own cluster is
    cosine-similar at ≥ ``threshold`` (the greedy keep-first rule under
    id order — deterministic, engine-portable). ``kept_id`` is the
    lowest such partner and ``cos_sim`` the rounded similarity to it;
    the surviving corpus is exactly the ids that never appear as
    ``pruned_id``.

    Physical shape: one broadcast of the k×dim centroids, one shuffle
    to argmin-assign, one shuffle on cluster_id for the intra-cluster
    self-join. Pair work is quadratic only within a cluster — at scale
    k is raised so clusters stay bounded (the paper's lever); a skewed
    giant cluster is an AQE skew-join case, same as the LSH buckets'
    MAX_BUCKET treatment in functions/dedup.py.

    ``max_pair_mass``: the guardrail enforcing that lever (the r6
    100× spot-bench showed fixed k=8 reading "linear" at 10× while a
    quadratic cluster-size term was building — ~5×10⁹ pairs at 100×).
    The exact intra-cluster pair mass Σ nc·(nc−1)/2 is measured from
    the materialized assignment (counter-sized work) and the prune
    refuses past the bound, telling the caller to raise k. ``None``
    opts out for a deliberate unbounded run.
    """
    # The assignment fans out into both sides of the self-join; without
    # materialization the broadcast-join + argmin subtree runs twice
    # (caches alone don't dedupe plan branches inside one action — see
    # functions/dedup._finish_eager). Cache + count forces one pass.
    assigned = semantic_assign(df, centroids, id_col, vec_col).cache()
    if max_pair_mass is None:
        assigned.count()
    else:
        # ONE job both materializes the assignment cache and computes
        # the intra-cluster pair mass Σ nc·(nc−1)/2 — the old shape
        # paid a count() pass and then a second mass pass (r11: 2
        # actions over the assignment → 1; the groupBy is
        # counter-sized, k rows).
        mass = (
            assigned.groupBy("cluster_id")
            .agg(F.count("*").alias("nc"))
            .agg(F.coalesce(F.sum(F.col("nc") * (F.col("nc") - 1) / 2), F.lit(0.0)))
            .first()[0]
        )
        if mass > max_pair_mass:
            assigned.unpersist()
            raise ValueError(
                f"semantic_dedup intra-cluster pair mass {int(mass):,} exceeds "
                f"max_pair_mass={max_pair_mass:,}: the prune join is quadratic "
                "in cluster size. Raise k so clusters stay bounded (the "
                "SemDeDup scale lever — see semantic_dedup_kmeans(k=...)), or "
                "pass max_pair_mass=None for a deliberate unbounded run."
            )
    pairs = semantic_pairs(assigned, assigned, threshold, round_digits)
    # "lowest-id partner" as a lexicographic struct-min AGGREGATE, not
    # a row_number window: the hash agg partial-combines map-side (the
    # shuffle carries one row per pruned id, not every qualifying
    # pair) and needs no sort. id_a is unique within a (cluster, id_b)
    # pair group, so min(struct(id_a, cos_sim)) is deterministic and
    # identical to the ORDER BY id_a window the oracle expresses.
    pruned = (
        pairs.groupBy("cluster_id", F.col("id_b").alias("pruned_id"))
        .agg(F.min(F.struct("id_a", "cos_sim")).alias("_keep"))
        .select(
            "cluster_id",
            "pruned_id",
            F.col("_keep.id_a").alias("kept_id"),
            F.col("_keep.cos_sim").alias("cos_sim"),
        )
        .orderBy("cluster_id", "pruned_id")
    )
    # Materialize the bounded prune list, then release the assignment
    # cache — lineage is cut, so unpersist cannot trigger recompute.
    out = pruned.localCheckpoint(eager=True)
    assigned.unpersist()
    return out


# Above this corpus size, semantic_dedup_kmeans trains its quantizer
# on a deterministic hash-mod sample of ~this many vectors instead of
# the full corpus (assignment/pruning always run over everything).
KMEANS_FIT_SAMPLE_MAX = 50_000


def auto_semdedup_k(n: int) -> int:
    """SemDeDup's scale lever with a scale-aware default: k ≈ ⌈√N⌉
    keeps the expected cluster size ≈ √N, so the total intra-cluster
    pair mass grows ~N^1.5 instead of N² — the posture the r6 100×
    spot-bench measured (scaled-k 136s vs ~45min fixed-k). The
    pair-mass gate stays as the backstop; this makes it a backstop
    rather than the default user experience."""
    import math

    return max(8, math.ceil(math.sqrt(max(n, 0))))


def semantic_dedup_kmeans(
    df: DataFrame,
    dim: int,
    k: int | None = None,
    max_iter: int = 4,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pair_mass: int | None = 500_000_000,
) -> DataFrame:
    """SemDeDup with a k-means coarse quantizer (the paper's setup):
    fit deterministic Lloyd's k-means (seeds = k lowest-id vectors,
    see ``kmeans_fit``), then prune within the fitted clusters.
    ``k=None`` (the default) auto-scales with the corpus:
    :func:`auto_semdedup_k` from one cheap count."""
    n = df.count()
    if k is None:
        k = auto_semdedup_k(n)
    # Fit on a deterministic hash-mod sample past the bound: Lloyd's
    # cost is k·n·d per iteration and with auto-k ~ √n that's n^1.5 —
    # at 100× the fit dominated end-to-end (410s of which ~3/4 was
    # fitting). Quantizer training needs cluster GEOMETRY, not every
    # point (the SemDeDup paper fits on a subsample too); assignment
    # and pruning still run over the full corpus. Hash-mod keeps the
    # sample deterministic, id-distribution-free, and engine-portable.
    fit_df = df
    if n > KMEANS_FIT_SAMPLE_MAX:
        m = -(-n // KMEANS_FIT_SAMPLE_MAX)  # ceil
        fit_df = df.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
    cents = kmeans_fit(
        fit_df, dim, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col
    )
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cluster_id long, cvec array<double>",
    )
    return semantic_dedup(
        df, cdf, threshold, id_col=id_col, vec_col=vec_col, max_pair_mass=max_pair_mass
    )
