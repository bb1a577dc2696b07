"""10× soak of the round-9b families: phrase index, trained
classifier, JL projection.

Fixture: the standard rotated-copy 10× of sf0.1 (distinct content per
copy — tools/spot_sf10.build), 50k documents / 50k embeddings.

Measurements (expectations in parentheses):

1. **Phrase index**: 3-batch incremental ingest (one tokenize pass
   per batch — linear), top-df trigram serve (one postings aggregate —
   linear in postings), and a single-phrase probe (output-bound:
   broadcast 1-row probe against the posting lists).
2. **Classifier training**: feature projection + 10 full-batch GD
   iterations (10 map-side-combinable scans of a 5-double frame —
   linear, no shuffle growth).
3. **JL projection + top-k**: project 64→16 + brute-force cosine
   rank for 5 queries (linear in corpus; the projection is the
   per-row cost, the rank is TakeOrdered-bounded).

Usage: python tools/soak_r9b.py [scale]   # default 10; results → ROADMAP.md
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spot_sf10 import build  # noqa: E402

from etl_database_spark.functions import classifier as C  # noqa: E402
from etl_database_spark.functions import similarity as S  # noqa: E402
from etl_database_spark.operators.phraseindex import PhraseIndexStore  # noqa: E402
from etl_database_spark.queries import table  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def best2(fn):
    times = []
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return min(times)


def run_suite(spark, sf_dir: str, label: str) -> None:
    d = table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix=f"soak_r9b_{label}_")
    try:
        # 1. phrase index: 3-batch ingest + serve + probe
        store = PhraseIndexStore(spark, os.path.join(work, "idx"), n=3)
        t0 = time.monotonic()
        for i in range(3):
            store.ingest(d.where(F.col("doc_id") % 3 == i), f"b{i}")
        t_ingest = time.monotonic() - t0
        t_serve = best2(lambda: store.top_gram_postings(3).count())
        n_served = store.top_gram_postings(3).count()
        gram = (
            store.postings().groupBy("gram").count()
            .orderBy(F.desc("count"), "gram").limit(10)
            .orderBy("gram").collect()[5].gram
        )
        t_probe = best2(lambda: store.search([gram]).count())
        n_probe = store.search([gram]).count()
        print(
            f"{label}: phrase ingest(3 batches) {t_ingest:.1f}s, "
            f"top3-serve {t_serve:.1f}s ({n_served} rows), "
            f"probe {t_probe:.2f}s ({n_probe} docs)"
        )
        # 1a. char-trigram substring probe: build once, probe a fixed
        # cross-token literal — the conjunctive intersection must stay
        # posting-list-bound (pushed In(gram) filter)
        cstore = PhraseIndexStore(spark, os.path.join(work, "chidx"), n=3, unit="char")
        t0 = time.monotonic()
        cstore.ingest(d, "all")
        t_cingest = time.monotonic() - t0
        lit = (
            d.select(F.lower(F.col("text")).substr(3, 12).alias("l")).first().l
        )
        t_cprobe = best2(lambda: cstore.substring_search([lit], corpus=d).count())
        n_cprobe = cstore.substring_search([lit], corpus=d).count()
        print(
            f"{label}: char-trigram ingest {t_cingest:.1f}s, "
            f"substring probe {t_cprobe:.2f}s ({n_cprobe} docs)"
        )
        # 1b. token index: 3-batch ingest + BM25 serve from the index
        from etl_database_spark.operators.tokenindex import TokenIndexStore

        tstore = TokenIndexStore(spark, os.path.join(work, "tokidx"))
        t0 = time.monotonic()
        for i in range(3):
            tstore.ingest(d.where(F.col("doc_id") % 3 == i), f"b{i}")
        t_tingest = time.monotonic() - t0
        terms = tstore.top_terms(5)
        t_bm25 = best2(lambda: tstore.bm25_serve(terms).count())
        print(
            f"{label}: tokenindex ingest(3 batches) {t_tingest:.1f}s, "
            f"bm25 serve(|Q|=5) {t_bm25:.1f}s"
        )
        # 2. classifier training
        feats = C.quality_features(d)
        t0 = time.monotonic()
        w = C.logreg_train(feats)[-1]
        t_train = time.monotonic() - t0
        t_score = best2(
            lambda: C.logreg_scores(C.quality_features(d), w)
            .agg(F.sum("pred")).first()
        )
        print(f"{label}: logreg train(10 iters) {t_train:.1f}s, score-pass {t_score:.1f}s")
        # 2b. PMI collocations + PSI drift (one-pass analysis rows)
        from etl_database_spark.queries import load_all

        reg = load_all()
        t_pmi = best2(
            lambda: reg["bigram_pmi_collocations"].fn(spark, sf_dir).count()
        )
        t_psi = best2(
            lambda: reg["source_length_drift_psi"].fn(spark, sf_dir).count()
        )
        print(f"{label}: pmi top-20 {t_pmi:.1f}s, psi monitor {t_psi:.1f}s")
        # 3. JL projection + top-k
        emb = table(spark, sf_dir, "embeddings")

        def rp_topk():
            proj = S.rp_project(emb, dim=64, out_dim=16, seed=7)
            S.cosine_topk(
                proj, proj.where(F.col("_id") < 5), k=10,
                id_col="_id", vec_col="rp_vec",
            ).count()

        print(f"{label}: rp project+topk {best2(rp_topk):.1f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    run_suite(spark, SF_DIR, "1x")
    big = tempfile.mkdtemp(prefix="soak_r9b_fixture_")
    try:
        build(spark, scale, big)
        run_suite(spark, big, f"{scale}x")
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
