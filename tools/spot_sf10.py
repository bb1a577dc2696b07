"""100x spot-bench of the linear-tier headline queries — and the
semdedup k-lever finding it surfaced.

The sf1 full-headline bench (BENCH_SF1.json) showed three queries
scaling ~linearly. Extending their curves a decade further exposed a
REAL scale behavior this tool now documents head-on:

- simhash_fingerprints / lang_id_distribution are genuinely linear:
  per-document work, one shuffle, measured at 100x below.
- semdedup's cluster-local prune join is quadratic in CLUSTER SIZE:
  with the registered k=8 (tuned for the 2k-vector fixture), a 100x
  corpus puts ~25k vectors in each cluster and the prune join needs
  ~5x10^9 comparisons. The sf1 run read as "linear" only because at
  10x the pair term was still small against fixed overhead. The
  operator's scale posture is the same as IVF's (ROADMAP round-6 ANN
  soak): grow k with the corpus so cluster size stays bounded. This
  tool measures the fixed-k blow-up at a bounded 30x and the
  scaled-k (k=256) fix at 100x.

Fixture: documents+embeddings-only 100x of sf0.1 (distinct per copy:
letter-rotation + marker token for text; cyclic shift, negated past
64, for vectors).

Usage: python tools/spot_sf10.py
Results recorded in ROADMAP.md next to the sf1 table.
"""

from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_database_spark.functions import similarity as S  # noqa: E402
from etl_database_spark.queries import load_all, table  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def build(spark, scale: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    alpha, digits = string.ascii_lowercase, string.digits
    docs = table(spark, SF_DIR, "documents")
    copies = []
    for k in range(scale):
        rot = (alpha[k % 26 :] + alpha[: k % 26]) + (digits[k % 10 :] + digits[: k % 10])
        copies.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.concat(
                    F.translate("text", alpha + digits, rot), F.lit(f" copymark{k}")
                ).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + len(f" copymark{k}")).alias("n_chars"),
            )
        )
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))

    emb = table(spark, SF_DIR, "embeddings")
    copies = []
    for k in range(scale):
        n = F.size("embedding")
        shift = F.lit(k % 64) % n
        vec = F.concat(
            F.slice("embedding", shift + 1, n - shift),
            F.slice("embedding", F.lit(1), shift),
        )
        if k >= 64:
            vec = F.transform(vec, lambda x: -x)
        copies.append(
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(16).write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))


def timed_runs(label, fn, repeats=3):
    fn()  # warm
    runs = []
    for _ in range(repeats):
        t0 = time.time()
        n = fn()
        runs.append(time.time() - t0)
    p50 = sorted(runs)[len(runs) // 2]
    print(f"{label}: p50 {p50:.2f}s (runs {[round(r, 2) for r in runs]}, {n} rows)")
    return p50


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("spot-sf10")
    registry = load_all()

    d100 = os.path.join(repo, ".localdata", "sf10_docs")
    if not os.path.isdir(os.path.join(d100, "documents.parquet")):
        t0 = time.time()
        build(spark, 100, d100)
        print(f"built 100x fixture in {time.time()-t0:.1f}s")
    d30 = os.path.join(repo, ".localdata", "sf3_docs")
    if not os.path.isdir(os.path.join(d30, "embeddings.parquet")):
        t0 = time.time()
        build(spark, 30, d30)
        print(f"built 30x fixture in {time.time()-t0:.1f}s")

    # the genuinely linear pair, at 100x. simhash is value-forced:
    # count() on the cardinality-preserving fingerprint plan lets
    # Catalyst prune ~60% of the bit-vote work (bench.py keeps the
    # driver's count convention for cross-round comparability; spot
    # measurements force the value column honestly).
    fn = registry["simhash_fingerprints"].fn
    timed_runs(
        "simhash_fingerprints @100x (forced)",
        lambda: fn(spark, d100).agg(F.max(F.abs(F.col("simhash")))).collect() and 500_000,
    )
    fn = registry["lang_id_distribution"].fn
    timed_runs("lang_id_distribution @100x", lambda: fn(spark, d100).count())

    # round-7: the OUT-OF-THE-BOX path at 100x, FIRST (so a bounded
    # wall-clock run always records it) — k=None auto-scales
    # (k = max(8, ceil(sqrt(200k))) = 448) and the pair-mass gate
    # stays ON at its production default. This run passing without a
    # refusal is the r6 verdict's done-criterion: the gate is now a
    # backstop, not the default user experience.
    emb100 = spark.read.parquet(os.path.join(d100, "embeddings.parquet"))
    timed_runs(
        "semdedup auto-k DEFAULT @100x (gate on)",
        lambda: S.semantic_dedup_kmeans(
            emb100, dim=64, max_iter=2, threshold=0.35
        ).count(),
        repeats=1,
    )

    # semdedup fixed-k: quadratic in cluster size — measure the term
    # at a bounded 30x (8 clusters x ~7.5k vectors = ~230M pairs).
    # max_pair_mass=None: this run deliberately measures the blow-up
    # the production gate (semantic_dedup, r6) exists to refuse.
    emb30 = spark.read.parquet(os.path.join(d30, "embeddings.parquet"))
    seeds = emb30.orderBy("vec_id").limit(8).select("embedding").collect()
    cents = spark.createDataFrame(
        [(i, [float(x) for x in r.embedding]) for i, r in enumerate(seeds)],
        "cluster_id long, cvec array<double>",
    )
    timed_runs(
        "semdedup_prune k=8 @30x",
        lambda: S.semantic_dedup(emb30, cents, 0.35, max_pair_mass=None).count(),
        repeats=1,
    )

    # scaled-k fix at 100x: k=256 keeps clusters ~800-wide
    timed_runs(
        "semdedup scaled k=256 @100x",
        lambda: S.semantic_dedup_kmeans(
            emb100, dim=64, k=256, max_iter=2, threshold=0.35
        ).count(),
        repeats=1,
    )


if __name__ == "__main__":
    main()
