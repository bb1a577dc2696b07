"""Scale soak for the ANN serving path: IVF build / append / probe
latency AND recall@10 at 1x vs Nx embeddings.

Corpus construction mirrors tools/gen_scaled_sf.py: N copies of the
sf0.1 embeddings table, vec_id offset per copy, each copy's vectors
cyclically shifted by the copy index (norm-preserving, so cosine
geometry stays realistic while copies are distinct vectors). Queries
are a FIXED 50-vector subset of the 1x corpus, so recall@10 is
measured against the same information need as the corpus grows.

Two 16x configurations, because k is the IVF scale lever:

- fixed k=8 / n_probe=3 (the registered ann_topk_ivf params): list
  sizes grow linearly with the corpus -> probe cost grows ~linearly.
  This is the "didn't retune" curve.
- scaled k=32 / n_probe=12 (k ~ sqrt growth, probe fraction held at
  3/8): list sizes stay ~flat -> probe cost stays ~flat. This is how
  an operator actually scales IVF at 100 TB.

Usage: python tools/soak_ann.py [scale] (default 16)
Prints one table; results recorded in ROADMAP.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_database_spark.functions import similarity as S  # noqa: E402
from etl_database_spark.functions.similarity import IvfIndex  # noqa: E402
from etl_database_spark.queries import table  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES, K = 50, 10


def scaled_embeddings(spark, scale: int, workdir: str) -> str:
    emb = table(spark, SF_DIR, "embeddings")
    copies = []
    for c in range(scale):
        n = F.size("embedding")
        shift = F.lit(c) % n
        copies.append(
            emb.select(
                (F.col("vec_id") + c * 10_000_000).alias("vec_id"),
                F.concat(
                    F.slice("embedding", shift + 1, n - shift),
                    F.slice("embedding", F.lit(1), shift),
                ).alias("embedding"),
                "label",
            )
        )
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    out = os.path.join(workdir, f"emb_x{scale}")
    u.repartition(max(scale // 2, 2)).write.mode("overwrite").parquet(out)
    return out


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:<34} {dt:7.2f}s")
    return dt, out


def recall_at_k(ivf_df, bf_df) -> float:
    hits = ivf_df.select("query_id", "neighbor_id").intersect(
        bf_df.select("query_id", "neighbor_id")
    )
    return hits.count() / bf_df.count()


def run(spark, emb_path: str, tag: str, k_centroids: int, n_probe: int, workdir: str):
    emb = spark.read.parquet(emb_path)
    n_vecs = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    print(f"[{tag}] corpus={n_vecs} vectors, k={k_centroids}, n_probe={n_probe}")
    res = {"n": n_vecs}

    res["fit"], cents = timed(
        f"kmeans fit (k={k_centroids})",
        lambda: S.kmeans_fit(emb, dim=64, k=k_centroids, max_iter=5),
    )
    idx_path = os.path.join(workdir, f"ivf_{tag}")
    res["build"], idx = timed(
        "index build (assign+write)",
        lambda: IvfIndex.build(spark, emb, cents, idx_path),
    )
    # append one day's worth (5% of corpus) as a fresh batch
    delta = emb.limit(max(n_vecs // 20, 100)).select(
        (F.col("vec_id") + 900_000_000).alias("vec_id"), "embedding"
    )
    res["append"], _ = timed(
        "append 5% batch", lambda: idx.append(delta, batch="delta1")
    )

    def probe():
        return idx.topk(queries, k=K, n_probe=n_probe).localCheckpoint(eager=True)

    # warm + 3 measured probes, keep the last result for recall
    probe()
    times = []
    for _ in range(3):
        t0 = time.time()
        ivf_res = probe()
        times.append(time.time() - t0)
    res["probe_p50"] = sorted(times)[1]
    print(f"  {'probe topk (p50 of 3)':<34} {res['probe_p50']:7.2f}s")

    res["bf"], bf_res = timed(
        "brute force topk (recall truth)",
        lambda: S.cosine_topk(emb, queries, k=K).localCheckpoint(eager=True),
    )
    res["recall"] = recall_at_k(ivf_res, bf_res)
    print(f"  {'recall@10 vs brute force':<34} {res['recall']:7.3f}")
    return res


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("soak-ann")
    workdir = tempfile.mkdtemp(prefix="soak_ann_")
    try:
        p1 = scaled_embeddings(spark, 1, workdir)
        pn = scaled_embeddings(spark, scale, workdir)
        r1 = run(spark, p1, "1x", k_centroids=8, n_probe=3, workdir=workdir)
        rn_fix = run(spark, pn, f"{scale}x-fixed-k", k_centroids=8, n_probe=3, workdir=workdir)
        rn_scl = run(
            spark, pn, f"{scale}x-scaled-k", k_centroids=32, n_probe=12, workdir=workdir
        )
        print("\nsummary (1x -> %dx):" % scale)
        for key in ("fit", "build", "append", "probe_p50", "bf"):
            print(
                f"  {key:<10} {r1[key]:6.2f}s -> fixed-k {rn_fix[key]:6.2f}s "
                f"({rn_fix[key]/r1[key]:4.1f}x) | scaled-k {rn_scl[key]:6.2f}s "
                f"({rn_scl[key]/r1[key]:4.1f}x)"
            )
        print(
            f"  recall@10  {r1['recall']:.3f} -> fixed-k {rn_fix['recall']:.3f} "
            f"| scaled-k {rn_scl['recall']:.3f}"
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
