"""Product quantization: encode/ADC exactness vs a pure-Python
reference, reconstruction-error monotonicity in ksub, and recall of
planted nearest neighbors."""

import math
import random

import pytest

from etl_database_spark.functions import pq as PQ

DIM = 16
M = 4


def _mk_vectors(n=96, clusters=4, dup_every=4):
    rng = random.Random(3)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(clusters)]
    rows = []
    for i in range(n):
        if i % dup_every == 3:
            base = rows[-1][1]
            v = [x + rng.gauss(0, 0.005) for x in base]
        else:
            c = centers[i % clusters]
            v = [x + rng.gauss(0, 0.25) for x in c]
        rows.append((i, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(_mk_vectors(), "vec_id long, embedding array<float>")


def _py_encode(vec, books):
    dsub = len(books[0][0])
    codes = []
    for j, book in enumerate(books):
        sub = vec[j * dsub : (j + 1) * dsub]
        best, best_d = 0, None
        for ci, c in enumerate(book):
            acc = 0.0
            for a, b in zip(sub, c):
                d = float(a) - float(b)
                acc = acc + d * d
            if best_d is None or acc < best_d:
                best, best_d = ci, acc
        codes.append(best)
    return codes


def test_pq_encode_matches_python(spark, vectors):
    books = PQ.pq_train(vectors, DIM, m=M, ksub=8, max_iter=3)
    got = {r._id: list(r.codes) for r in PQ.pq_encode(vectors, books).collect()}
    # float32 storage: replicate with the same cast the JVM applies
    rows = {r.vec_id: list(r.embedding) for r in vectors.collect()}
    for vid, vec in rows.items():
        assert got[vid] == _py_encode(vec, books), vid


def test_pq_adc_matches_python(spark, vectors):
    books = PQ.pq_train(vectors, DIM, m=M, ksub=8, max_iter=3)
    codes = PQ.pq_encode(vectors, books)
    rows = {r.vec_id: list(r.embedding) for r in vectors.collect()}
    q = [(0, rows[0])]
    out = {
        r.neighbor_id: r.adc_dist
        for r in PQ.pq_adc_topk(codes, q, books, k=20).collect()
    }
    dsub = DIM // M
    for nid, got_d in out.items():
        cds = _py_encode(rows[nid], books)
        want = 0.0
        for j in range(M):
            qsub = rows[0][j * dsub : (j + 1) * dsub]
            c = books[j][cds[j]]
            acc = 0.0
            for a, b in zip(qsub, c):
                d = float(a) - float(b)
                acc = acc + d * d
            want = want + acc
        assert abs(got_d - round(want, 4)) < 1e-9, nid


def test_pq_reconstruction_improves_with_ksub(spark, vectors):
    e_small = PQ.pq_reconstruction_sse(vectors, PQ.pq_train(vectors, DIM, m=M, ksub=4, max_iter=3))
    e_big = PQ.pq_reconstruction_sse(vectors, PQ.pq_train(vectors, DIM, m=M, ksub=16, max_iter=3))
    assert e_big <= e_small
    assert e_small > 0


def test_pq_recall_of_planted_twins(spark, vectors):
    """Every i%4==3 vector is a tiny perturbation of i-1: ADC top-5
    must surface the twin for the vast majority of such queries."""
    books = PQ.pq_train(vectors, DIM, m=M, ksub=16, max_iter=3)
    codes = PQ.pq_encode(vectors, books)
    rows = {r.vec_id: list(r.embedding) for r in vectors.collect()}
    queries = [(i, rows[i]) for i in rows if i % 4 == 3]
    out = PQ.pq_adc_topk(codes, queries, books, k=5).collect()
    top = {}
    for r in out:
        top.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(1 for qid, ns in top.items() if qid - 1 in ns)
    assert hits / len(queries) >= 0.8, (hits, len(queries))


def test_pq_train_rejects_bad_m(spark, vectors):
    with pytest.raises(ValueError, match="not divisible"):
        PQ.pq_train(vectors, DIM, m=5)


def test_ivfpq_residual_adc_matches_python(spark, vectors):
    """IVFADC distances must equal the python replay: residual encode
    against the same codebooks, table lookups summed."""
    coarse, books, codes = PQ.ivfpq_build(vectors, DIM, coarse_k=3, m=M, ksub=8, max_iter=3)
    rows = {r.vec_id: list(r.embedding) for r in vectors.collect()}
    cents = {r._id: (list(r.codes), r.centroid) for r in codes.collect()}
    out = PQ.ivfpq_topk(codes, coarse, books, [(0, rows[0])], n_probe=3, k=30)
    got = {r.neighbor_id: r.adc_dist for r in out.collect()}
    assert got, "probing all lists must score candidates"
    dsub = DIM // M
    for nid, got_d in got.items():
        cds, cidx = cents[nid]
        qres = [float(a) - float(b) for a, b in zip(rows[0], coarse[cidx])]
        want = 0.0
        for j in range(M):
            qsub = qres[j * dsub : (j + 1) * dsub]
            c = books[j][cds[j]]
            acc = 0.0
            for a, b in zip(qsub, c):
                d = float(a) - float(b)
                acc = acc + d * d
            want = want + acc
        assert abs(got_d - round(want, 4)) < 1e-9, nid


def test_ivfpq_recall_of_planted_twins(spark, vectors):
    coarse, books, codes = PQ.ivfpq_build(vectors, DIM, coarse_k=4, m=M, ksub=16, max_iter=3)
    rows = {r.vec_id: list(r.embedding) for r in vectors.collect()}
    queries = [(i, rows[i]) for i in rows if i % 4 == 3]
    out = PQ.ivfpq_topk(codes, coarse, books, queries, n_probe=2, k=5).collect()
    top = {}
    for r in out:
        top.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(1 for qid, ns in top.items() if qid - 1 in ns)
    assert hits / len(queries) >= 0.8, (hits, len(queries))


def test_ivfpq_codes_carry_centroid(spark, vectors):
    coarse, books, codes = PQ.ivfpq_build(vectors, DIM, coarse_k=3, m=M, ksub=8, max_iter=2)
    assert set(codes.columns) == {"_id", "codes", "centroid"}
    cvals = {r.centroid for r in codes.select("centroid").distinct().collect()}
    assert cvals <= set(range(3)) and len(cvals) >= 2


def test_ivfpq_refine_equals_exact_l2(spark, vectors):
    """IVFADC+R with a shortlist covering every scanned candidate and
    all lists probed must return EXACTLY the brute-force L2 top-k
    (the refine stage re-ranks by true distance, so ADC quantization
    error cannot reorder the result)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    coarse, books, codes = PQ.ivfpq_build(vectors, DIM, coarse_k=3, m=M, ksub=8, max_iter=3)
    rows = {r.vec_id: list(r.embedding) for r in vectors.collect()}
    queries = [(i, rows[i]) for i in sorted(rows) if i % 7 == 0][:5]
    got = PQ.ivfpq_topk(
        codes, coarse, books, queries, n_probe=3, k=5,
        refine=vectors, shortlist=len(rows),
    )
    # brute-force L2 truth
    q = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in queries],
        "query_id long, qv array<double>",
    )
    l2 = F.aggregate(
        F.zip_with("qv", "embedding", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    want = (
        vectors.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), l2.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in want.collect()}
    assert g == e
