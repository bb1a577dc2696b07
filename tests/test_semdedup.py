"""Semantic dedup (SemDeDup): assignment and pruning verified against
brute-force ground truth; the k-means variant's invariants checked the
same way on the fitted clusters."""

import math
import random

import pytest

from etl_database_spark.functions import similarity as S

DIM = 12
THRESHOLD = 0.6


def _mk_vectors(n=120, clusters=5, dup_every=4):
    """Clustered vectors where every ``dup_every``-th vector is a tiny
    perturbation of its predecessor — guaranteed semantic near-dups."""
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(clusters)]
    rows = []
    for i in range(n):
        if i % dup_every == 3:
            base = rows[-1][1]
            v = [x + rng.gauss(0, 0.01) for x in base]
        else:
            c = centers[i % clusters]
            v = [x + rng.gauss(0, 0.3) for x in c]
        rows.append((i, [float(x) for x in v]))
    return rows


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _sqdist(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(_mk_vectors(), "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def seed_centroids(spark):
    rows = _mk_vectors()[:4]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, (_, v) in enumerate(rows)],
        "cluster_id long, cvec array<double>",
    )


def test_assign_nearest_matches_brute_force(spark, vectors, seed_centroids):
    assigned = {
        r._id: r.cluster_id
        for r in S.assign_nearest(vectors, seed_centroids).collect()
    }
    cents = {r.cluster_id: list(r.cvec) for r in seed_centroids.collect()}
    rows = _mk_vectors()
    assert len(assigned) == len(rows)
    for vid, vec in rows:
        best = min(cents, key=lambda c: (_sqdist(vec, cents[c]), c))
        assert assigned[vid] == best, f"vec {vid}: {assigned[vid]} != {best}"


def test_semantic_dedup_prunes_exactly_the_brute_force_set(
    spark, vectors, seed_centroids
):
    out = S.semantic_dedup(vectors, seed_centroids, THRESHOLD).collect()

    # Brute-force expectation: same assignment, then any vector with a
    # lower-id cosine>=tau partner in its cluster is pruned, kept_id =
    # the lowest such partner.
    rows = _mk_vectors()
    cents = {r.cluster_id: list(r.cvec) for r in seed_centroids.collect()}
    assign = {
        vid: min(cents, key=lambda c: (_sqdist(vec, cents[c]), c))
        for vid, vec in rows
    }
    vecs = dict(rows)
    expected = {}
    for vid, vec in rows:
        partners = [
            o
            for o, ov in rows
            if o < vid
            and assign[o] == assign[vid]
            and round(_cos(ov, vec), 4) >= THRESHOLD
        ]
        if partners:
            kept = min(partners)
            expected[vid] = (assign[vid], kept, round(_cos(vecs[kept], vec), 4))

    got = {r.pruned_id: (r.cluster_id, r.kept_id, r.cos_sim) for r in out}
    assert got == expected
    assert expected, "fixture must actually produce near-dups"


def test_semantic_dedup_kmeans_invariants(spark, vectors):
    """The k-means tier can't be compared to a closed-form oracle, but
    every emitted row must satisfy the pruning contract against the
    fitted clusters, and the planted near-identical pairs must be
    caught whenever both ends land in the same cluster."""
    cents = S.kmeans_fit(vectors, DIM, k=4, max_iter=3)
    cdf = vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cluster_id long, cvec array<double>",
    )
    out = S.semantic_dedup(vectors, cdf, THRESHOLD).collect()

    rows = _mk_vectors()
    vecs = dict(rows)
    assign = {
        vid: min(range(len(cents)), key=lambda c: (_sqdist(vec, cents[c]), c))
        for vid, vec in rows
    }
    pruned = set()
    for r in out:
        assert r.kept_id < r.pruned_id
        assert assign[r.pruned_id] == r.cluster_id
        assert assign[r.kept_id] == r.cluster_id
        assert round(_cos(vecs[r.kept_id], vecs[r.pruned_id]), 4) == r.cos_sim
        assert r.cos_sim >= THRESHOLD
        pruned.add(r.pruned_id)
    # Planted duplicates: i%4==3 duplicates i-1; same-cluster ones must
    # be pruned (the perturbation is 0.01-scale, far above threshold).
    caught = 0
    for vid, vec in rows:
        if vid % 4 == 3 and assign[vid] == assign[vid - 1]:
            assert vid in pruned
            caught += 1
    assert caught > 0


def test_semantic_dedup_kmeans_query_runs(spark):
    """Registered-query smoke: the k-means variant over the real
    embeddings fixture returns the documented schema."""
    from etl_database_spark.queries import load_all

    q = load_all()["semdedup_kmeans_prune"]
    df = q.fn(spark, "/root/testdata/sf0.001")
    assert df.columns == ["cluster_id", "pruned_id", "kept_id", "cos_sim"]
    df.collect()


def test_streaming_semdedup_matches_batch_pairs(spark, tmp_path):
    """The streamed pair set (two micro-batches, cross-batch pairs via
    the embedding store) must equal the batch operator's pair stage
    exactly — same ids, same rounded cosines."""
    from pyspark.sql import functions as F

    from etl_database_spark.streaming.semdedup import run_semdedup_once

    rows = _mk_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, (_, v) in enumerate(rows[:4])],
        "cluster_id long, cvec array<double>",
    )
    src = str(tmp_path / "src")
    # interleave ids across batches so cross-batch pairs occur in both
    # orientations (stored id < new id and stored id > new id)
    df.where(F.col("vec_id") % 3 == 1).write.parquet(src)
    run1 = lambda: run_semdedup_once(  # noqa: E731
        spark,
        spark.readStream.schema(df.schema).parquet(src),
        str(tmp_path / "store"),
        str(tmp_path / "matches"),
        str(tmp_path / "ckpt"),
        cents,
        threshold=THRESHOLD,
    )
    run1()
    df.where(F.col("vec_id") % 3 != 1).write.mode("append").parquet(src)
    run1()

    streamed = {
        (r.cluster_id, r.id_a, r.id_b, r.cos_sim)
        for r in spark.read.parquet(str(tmp_path / "matches")).collect()
    }
    assigned = S.semantic_assign(df, cents).cache()
    assigned.count()
    expected = {
        (r.cluster_id, r.id_a, r.id_b, r.cos_sim)
        for r in S.semantic_pairs(assigned, assigned, THRESHOLD).collect()
    }
    assigned.unpersist()
    assert streamed == expected
    assert expected, "fixture must produce qualifying pairs"
    # and the keep-rule over the accumulated pairs equals semantic_dedup
    pruned_from_stream = {}
    for cluster, a, b, cos in streamed:
        cur = pruned_from_stream.get(b)
        if cur is None or a < cur[1]:
            pruned_from_stream[b] = (cluster, a, cos)
    batch_pruned = {
        r.pruned_id: (r.cluster_id, r.kept_id, r.cos_sim)
        for r in S.semantic_dedup(df, cents, THRESHOLD).collect()
    }
    assert pruned_from_stream == batch_pruned
    # the day-keyed incremental SERVE (prune_from_matches over the
    # persisted match store) must equal the batch prune list too —
    # this is the store's whole point: corpus prune state maintained
    # at per-batch cost
    from etl_database_spark.streaming.semdedup import prune_from_matches

    served = {
        r.pruned_id: (r.cluster_id, r.kept_id, r.cos_sim)
        for r in prune_from_matches(
            spark.read.parquet(str(tmp_path / "matches"))
        ).collect()
    }
    assert served == batch_pruned


def test_semdedup_pair_mass_gate(spark, vectors, seed_centroids):
    """The prune join is quadratic in cluster size; past max_pair_mass
    it must refuse with an error naming the k lever, and
    max_pair_mass=None must opt out."""
    with pytest.raises(ValueError, match="Raise k"):
        S.semantic_dedup(vectors, seed_centroids, 0.35, max_pair_mass=10)
    out = S.semantic_dedup(vectors, seed_centroids, 0.35, max_pair_mass=None)
    assert out.count() >= 0
