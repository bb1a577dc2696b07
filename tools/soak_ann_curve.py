"""Recall@10 vs n_probe curve for the served ANN tiers at 100x scale.

Round-8 verdict ask #7: the IVF/IVFADC recall story rested on
planted-twin fixtures at small scale — this soak records the measured
recall/latency trade-off curve on the 100x embedding corpus
(tools/soak_ann.py's norm-preserving cyclic-shift scaling of the
sf0.1 embeddings: 2 000 -> 200 000 vectors, dim 64), so the
"billion-scale architecture" claim carries a curve, not an anecdote.

Per tier and n_probe ∈ {1, 2, 4, 8} with coarse_k=64 lists:

- IVF (IvfIndex: persisted inverted lists, partition-pruned probes,
  exact cosine inside the probed lists) — recall truth is brute-force
  cosine top-10;
- IVFADC (ivfpq_build/ivfpq_topk: coarse quantizer + residual product
  quantizer, m=8 sub-spaces x 32 codes = 8 bytes/vector) — recall
  truth is brute-force L2 top-10 (ADC approximates L2);
- IVFADC+R (refine=corpus, shortlist=2000): exact-L2 re-rank of the
  ADC top-shortlist — the recall repair when ADC's m·log2(ksub) bits
  under-resolve the neighborhood (the first soak measured FLAT 0.192
  recall across n_probe on this corpus: the true neighbors were IN
  the probed lists but ADC misordered them inside its rounded-
  distance tie plateaus). Measured shortlist sweep at n_probe=4,
  m=8: 100 → 0.524, 500 → 0.836, 2000 → 0.992, 8000 → 1.000 recall,
  all ~2-3 s — the refine join touches shortlist rows per query,
  never the corpus, so the recall lever is nearly free here.

Expected shape: recall rises with n_probe (more lists scanned),
probe cost rises ~linearly in n_probe but stays a small fraction of
the brute-force scan (n_probe/coarse_k of the corpus per query).

Usage: python tools/soak_ann_curve.py [scale] (default 100)
Prints one table; results recorded in ROADMAP.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_database_spark.functions import pq as PQ  # noqa: E402
from etl_database_spark.functions import similarity as S  # noqa: E402
from etl_database_spark.functions.similarity import IvfIndex  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402
from tools.soak_ann import recall_at_k, scaled_embeddings  # noqa: E402

N_QUERIES, K = 25, 10
PROBES = (1, 2, 4, 8)
COARSE_K = 64


def _l2_bruteforce(emb, queries, k: int):
    """Exact L2 top-k of each query over the corpus (ADC's truth)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "embedding", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )


def _timed_p50(fn, reps: int = 2) -> tuple[float, object]:
    """Warm once (codegen/planning), then best of ``reps`` — the
    stable-throughput convention bench.py uses."""
    fn()  # warm
    times, out = [], None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    return min(times), out


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("soak-ann-curve")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="soak_ann_curve_")
    try:
        path = scaled_embeddings(spark, scale, workdir)
        emb = spark.read.parquet(path).select("vec_id", "embedding")
        n = emb.count()
        queries = emb.where(F.col("vec_id") < N_QUERIES).localCheckpoint(eager=True)
        qvecs = [(r.vec_id, [float(x) for x in r.embedding]) for r in queries.collect()]
        print(f"corpus: {n} vectors (scale {scale}x), {len(qvecs)} queries, "
              f"coarse_k={COARSE_K}, k={K}", flush=True)

        # ---- truths + brute-force latency ----
        t_bf_cos, bf_cos = _timed_p50(
            lambda: S.cosine_topk(emb, queries, k=K).localCheckpoint(eager=True)
        )
        t_bf_l2, bf_l2 = _timed_p50(
            lambda: _l2_bruteforce(emb, queries, K).localCheckpoint(eager=True)
        )
        print(f"brute force: cosine {t_bf_cos:.2f}s, L2 {t_bf_l2:.2f}s "
              "(best of 2, warmed)", flush=True)

        # ---- IVF ----
        t0 = time.time()
        cents = S.kmeans_fit(emb, dim=64, k=COARSE_K, max_iter=5)
        t_fit = time.time() - t0
        t0 = time.time()
        idx = IvfIndex.build(spark, emb, cents, os.path.join(workdir, "ivf"))
        t_build = time.time() - t0
        print(f"IVF: kmeans fit {t_fit:.1f}s, index build {t_build:.1f}s", flush=True)
        print(f"{'tier':<8}{'n_probe':>8}{'recall@10':>11}{'probe_s':>11}{'vs_bf':>8}")
        for np_ in PROBES:
            t_p, res = _timed_p50(
                lambda np_=np_: idx.topk(queries, k=K, n_probe=np_).localCheckpoint(
                    eager=True
                )
            )
            r = recall_at_k(res, bf_cos)
            print(f"{'IVF':<8}{np_:>8}{r:>11.3f}{t_p:>10.2f}s"
                  f"{t_p / t_bf_cos:>7.2f}x", flush=True)

        # ---- IVFADC ----
        t0 = time.time()
        coarse, books, codes = PQ.ivfpq_build(
            emb, dim=64, coarse_k=COARSE_K, m=8, ksub=32, max_iter=4
        )
        t_build_pq = time.time() - t0
        print(f"IVFADC: build (coarse kmeans + residual PQ + encode) "
              f"{t_build_pq:.1f}s", flush=True)
        for np_ in PROBES:
            t_p, res = _timed_p50(
                lambda np_=np_: PQ.ivfpq_topk(
                    codes, coarse, books, qvecs, n_probe=np_, k=K
                ).localCheckpoint(eager=True)
            )
            r = recall_at_k(res, bf_l2)
            print(f"{'IVFADC':<8}{np_:>8}{r:>11.3f}{t_p:>10.2f}s"
                  f"{t_p / t_bf_l2:>7.2f}x", flush=True)
        for np_ in PROBES:
            t_p, res = _timed_p50(
                lambda np_=np_: PQ.ivfpq_topk(
                    codes, coarse, books, qvecs, n_probe=np_, k=K,
                    refine=emb, shortlist=2000,
                ).localCheckpoint(eager=True)
            )
            r = recall_at_k(res, bf_l2)
            print(f"{'IVFADC+R':<8}{np_:>8}{r:>11.3f}{t_p:>10.2f}s"
                  f"{t_p / t_bf_l2:>7.2f}x", flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
