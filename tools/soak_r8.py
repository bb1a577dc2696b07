"""10×/100× soak of the round-7 operator families (VERDICT r7 ask #5):
BM25 scoring and MOSS winnowing, which shipped with sf0.001/sf0.01
oracles and sf1 runs but no measured 100× point.

Three measurements:

1. **BM25 @10×/@100×** — the tokenize-once pipeline end to end
   (tokenize → doc lengths → query-term tf → idf broadcast → decimal
   score sums → top-k). Expectation: ~linear in corpus size (one
   shuffle of query-term rows only).
2. **Winnowing fingerprints @10×/@100×** — the zero-shuffle per-row
   pass, value-forced. Expectation: linear.
3. **Winnow pair join on DUP-DENSE data** — the one the r7 verdict
   said to watch. The rotated copies of the standard scaled fixture
   share no cross-copy fingerprints (clean linear case), so this run
   builds a hostile 10× variant where EVERY document carries the same
   boilerplate sentence: its fingerprints' buckets hold all ~50k docs
   and would alone contribute ~1.2B pairs. The serve-time skew cap
   (max_bucket=200) must drop exactly those boilerplate buckets and
   keep the pair join output-bound. Recorded: wall time, pair count,
   and the capped-bucket share.

Usage: python tools/soak_r8.py          # results → ROADMAP.md table
"""

from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spot_sf10 import build, timed_runs  # noqa: E402  (fixture builder reuse)

from etl_database_spark.functions import dedup as D  # noqa: E402
from etl_database_spark.queries import load_all, table  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
BOILER = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to fitness for a purpose"
)


def build_dup_dense(spark, scale: int, dst: str) -> None:
    """scale× docs fixture where every document ends with the SAME
    boilerplate sentence — maximal fingerprint-bucket skew."""
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
                    F.translate("text", alpha + digits, rot),
                    F.lit(f" copymark{k} . {BOILER}"),
                ).alias("text"),
            )
        )
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("soak-r8")
    registry = load_all()

    d10 = os.path.join(repo, ".localdata", "sf1_docs")
    d100 = os.path.join(repo, ".localdata", "sf10_docs")
    ddup = os.path.join(repo, ".localdata", "sf1_docs_dupdense")
    for path, scale in ((d10, 10), (d100, 100)):
        if not os.path.isdir(os.path.join(path, "documents.parquet")):
            t0 = time.time()
            build(spark, scale, path)
            print(f"built {scale}x fixture in {time.time()-t0:.1f}s")
    if not os.path.isdir(os.path.join(ddup, "documents.parquet")):
        t0 = time.time()
        build_dup_dense(spark, 10, ddup)
        print(f"built dup-dense 10x fixture in {time.time()-t0:.1f}s")

    # 1. BM25 (top-100 rows output; forcing = collecting the scores)
    bm25 = registry["doc_bm25_scores"].fn
    for label, path in (("@10x", d10), ("@100x", d100)):
        timed_runs(f"doc_bm25_scores {label}", lambda p=path: len(bm25(spark, p).collect()))

    # 2. winnowing fingerprints, value-forced
    wfp = registry["doc_winnow_fingerprints"].fn
    for label, path in (("@10x", d10), ("@100x", d100)):
        timed_runs(
            f"doc_winnow_fingerprints {label} (forced)",
            lambda p=path: wfp(spark, p).agg(F.max("fp_sum"), F.sum("n_fps")).collect()
            and 1,
        )

    # 3a. winnow pair join on the clean rotated fixtures
    pairs = registry["winnow_near_dup_pairs"].fn
    for label, path in (("@10x", d10), ("@100x", d100)):
        timed_runs(f"winnow_near_dup_pairs {label}", lambda p=path: pairs(spark, p).count(), repeats=1)

    # 3b. the dup-dense cap test: boilerplate buckets hold every doc.
    # (cache before explode — Generate over the raw fingerprint
    # expression re-evaluates the md5 chain per output row, the
    # WinnowStore lesson)
    docs = spark.read.parquet(os.path.join(ddup, "documents.parquet"))
    n_docs = docs.count()
    sets = D.winnow_fingerprint_sets(docs, "text", "doc_id").localCheckpoint(eager=True)
    fp = sets.select("_id", F.explode("_fps").alias("fp"))
    bucket = fp.groupBy("fp").agg(F.count("*").alias("bn"))
    stats = bucket.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("bn") > 200, 1).otherwise(0)).alias("n_capped"),
        F.sum(F.when(F.col("bn") > 200, F.col("bn") * (F.col("bn") - 1) / 2)).alias(
            "pair_mass_dropped"
        ),
        F.sum(F.when(F.col("bn") <= 200, F.col("bn") * (F.col("bn") - 1) / 2)).alias(
            "pair_mass_kept"
        ),
    ).collect()[0]
    print(
        f"dup-dense @10x ({n_docs} docs): {stats.n_buckets} buckets, "
        f"{stats.n_capped} capped (dropped pair mass {stats.pair_mass_dropped:.3g}, "
        f"kept {stats.pair_mass_kept:.3g})"
    )
    timed_runs(
        "winnow_similarity_pairs dup-dense @10x (cap on)",
        lambda: D.winnow_similarity_pairs(docs, "text", "doc_id").count(),
        repeats=1,
    )


if __name__ == "__main__":
    main()
