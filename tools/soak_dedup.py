"""Scale soak for the dedup/similarity family: 1x vs Nx documents.

Builds an Nx corpus by unioning N alphabet-rotated copies of the sf0.1
documents table (doc ids offset per copy; F.translate rotates the
lowercase alphabet, so each copy is distinct content with the SAME
intra-copy duplicate structure — pair output scales exactly Nx, no
cross-copy matches, which is the right construction for a cost curve:
runtime should scale near-linearly in corpus size while output
composition stays fixed).

Measured (mirroring the registered queries' parameters):
- minhash signature store build (shingle n=7 -> 32-perm signatures,
  materialized to parquet: the incremental-ingest cost)
- minhash near-dup serve from the prebuilt store (LSH bucket join +
  candidate-only re-shingle verify: the per-run cost)
- train/eval contamination (13-gram, eval = fixed 500-doc subset of
  the 1x corpus)
- minhash near-dup clusters (pairs -> connected components): the
  SCALE tier for dedup clustering
- exact n-gram Jaccard pairs + clusters, measured only up to 4x: the
  verification-grade tier is quadratic in posting-list sizes BY
  DESIGN, and this fixture is its worst case (2,041 distinct 5-gram
  shingles across 5,000 docs, median document frequency 291 — nearly
  every shingle is corpus-common, so candidate generation approaches
  all-pairs and no max_df cap can bind without dropping true pairs).
  The measurement documents the curve that makes minhash the scale
  path; it is not an operator regression.

Usage: python tools/soak_dedup.py [scale] (default 16)
Prints one timing table; results are recorded in ROADMAP.md.
"""

from __future__ import annotations

import os
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_database_spark.functions import dedup as D  # noqa: E402
from etl_database_spark.queries import table  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MINHASH = {"n": 7, "num_perm": 32, "bands": 8, "threshold": 0.5}


def scaled_corpus(spark, scale: int, workdir: str) -> str:
    """Write the Nx union to parquet and return its path (reads are
    then from disk, same as the 1x fixture).

    VALIDITY BOUND: the letter rotation has 26 distinct classes and
    the fixture text is letters-only, so copies k and k+26 carry
    IDENTICAL text. Up to scale 26 the construction is clean (pair
    output scales exactly Nx); beyond 26 it deliberately degrades
    into a duplicate-density STRESS mode — cross-copy exact
    duplicates multiply the true pair/span output far beyond Nx,
    which exercises the operators on a dup-heavy corpus rather than
    measuring a clean cost curve. The 64x run in ROADMAP.md is
    recorded under that reading."""
    docs = table(spark, SF_DIR, "documents")
    alpha = string.ascii_lowercase
    digits = string.digits
    copies = []
    for k in range(scale):
        # rotate letters AND digits so copies share no content-bearing
        # shingles (only whitespace/punctuation runs stay common)
        rot = (alpha[k % 26 :] + alpha[: k % 26]) + (
            digits[k % 10 :] + digits[: k % 10]
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.translate("text", alpha + digits, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = os.path.join(workdir, f"docs_x{scale}")
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(max(scale, 4)).write.mode("overwrite").parquet(out)
    return out


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"  {label:<28} {dt:7.2f}s  rows={n}")
    return dt, n


def run(spark, docs, eval_docs, tag: str, exact_tier: bool = True) -> dict:
    print(f"[{tag}] corpus rows={docs.count()}")
    res = {}

    def build_store():
        sigs = D.minhash_signatures(
            D.shingles(docs, "text", "doc_id", n=MINHASH["n"]), MINHASH["num_perm"]
        )
        path = os.path.join(tempfile.mkdtemp(prefix="soak_sigs_"), "sigs")
        sigs.write.parquet(path)
        res["_sig_path"] = path
        return spark.read.parquet(path).count()

    res["store_build"] = timed("minhash store build", build_store)

    sigs = spark.read.parquet(res.pop("_sig_path"))
    res["serve"] = timed(
        "minhash near-dup serve",
        lambda: D.minhash_near_duplicates(
            docs,
            "text",
            "doc_id",
            n=MINHASH["n"],
            num_perm=MINHASH["num_perm"],
            bands=MINHASH["bands"],
            threshold=MINHASH["threshold"],
            sigs=sigs,
        ).count(),
    )
    res["contamination"] = timed(
        "contamination (13-gram)",
        lambda: D.contamination_check(docs, eval_docs, "text", "doc_id", n=13).count(),
    )

    from etl_database_spark.functions import spans as SP

    # aggregate a computed column, not count(): the stats frame's left
    # join is provably cardinality-preserving, so count() alone would
    # let Catalyst prune the whole window-hash pipeline
    res["dup_spans"] = timed(
        "duplicate span stats (w=15)",
        lambda: int(
            SP.duplicate_span_stats(docs, "text", "doc_id", 15)
            .where(F.col("dup_tokens") > 0)
            .count()
        ),
    )
    res["span_cut"] = timed(
        "substring dedup cut (w=15)",
        lambda: int(
            SP.cut_duplicate_spans(docs, "text", "doc_id", 15)
            .where(F.col("cut_tokens") > 0)
            .count()
        ),
    )

    # incremental substring dedup: the 100 TB claim is "a day costs a
    # day" — ingest the whole corpus as the store's base, then time
    # profiling a FIXED 500-doc batch against it; the profile cost
    # curve vs store size is the incremental story's evidence
    from etl_database_spark.operators.spanstore import SpanStore

    sstore = SpanStore(
        spark, os.path.join(tempfile.mkdtemp(prefix="soak_spanstore_"), "store"), w=15
    )
    res["spanstore_ingest"] = timed(
        "spanstore ingest (corpus)",
        lambda: int(sstore.ingest(docs, batch="b0")),
    )
    res["spanstore_profile"] = timed(
        "spanstore profile (500 docs)",
        lambda: int(
            sstore.profile(eval_docs).where(F.col("dup_tokens") > 0).count()
        ),
    )

    def minhash_clusters():
        pairs = D.minhash_near_duplicates(
            docs,
            "text",
            "doc_id",
            n=MINHASH["n"],
            num_perm=MINHASH["num_perm"],
            bands=MINHASH["bands"],
            threshold=MINHASH["threshold"],
            sigs=sigs,
        )
        return D.connected_components(pairs).count()

    res["minhash_clusters"] = timed("minhash pairs + clusters", minhash_clusters)

    if exact_tier:
        def ngram_clusters():
            pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=5, threshold=0.5)
            return D.connected_components(pairs).count()

        res["ngram_clusters"] = timed("exact ngram pairs+clusters", ngram_clusters)
    spark.catalog.clearCache()
    return res


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = get_spark("soak_dedup")
    work = tempfile.mkdtemp(prefix="spark_graft_soak_")
    try:
        docs_1x = table(spark, SF_DIR, "documents")
        eval_docs = docs_1x.orderBy("doc_id").limit(500).cache()
        eval_docs.count()
        # exact tier only up to 4x: quadratic by design (see module doc)
        base = run(spark, docs_1x, eval_docs, "1x", exact_tier=scale <= 4)
        path = scaled_corpus(spark, scale, work)
        docs_nx = spark.read.parquet(path)
        big = run(spark, docs_nx, eval_docs, f"{scale}x", exact_tier=scale <= 4)
        print(f"\n{'op':<28}{'1x':>9}{'%dx' % scale:>9}{'cost ratio':>12}{'rows ratio':>12}")
        for op in ("store_build", "serve", "contamination", "dup_spans", "span_cut", "spanstore_ingest", "spanstore_profile", "minhash_clusters", "ngram_clusters"):
            if op not in base:
                continue
            (t1, n1), (tn, nn) = base[op], big[op]
            print(
                f"{op:<28}{t1:>8.2f}s{tn:>8.2f}s{tn / t1:>11.1f}x"
                f"{(nn / n1 if n1 else float('nan')):>11.1f}x"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
