"""Stage-by-stage profile of ONE EdgeStore day-batch ingest (r11
verdict ask #2): build a store on 98% of the corpus exactly like the
bench setup line, then run the 100-doc day batch with a timer around
each ingest stage — sig pass, sig write, band+write, counts write,
candidate join, exact verify, edge write — so the dominant term is a
measurement, not a guess. Usage:

    python tools/profile_edgestore_ingest.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from etl_database_spark.functions import dedup as D
    from etl_database_spark.operators.edgestore import EdgeStore
    from etl_database_spark.queries import table as _table
    from etl_database_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = get_spark("profile_edgestore")
    spark.sparkContext.setLogLevel("ERROR")

    d = _table(spark, sf_dir, "documents").select("doc_id", "text")

    for rep in range(repeats):
        ddir = tempfile.mkdtemp(prefix="prof_day_batch_")
        store = EdgeStore(
            spark, os.path.join(ddir, "edges"),
            n=5, num_perm=32, bands=32, threshold=0.3, min_agree=3,
        )
        t0 = time.time()
        store.ingest(d.where(F.col("doc_id") % 50 != 0), "bulk", corpus=d)
        print(f"[rep {rep}] bulk build (98%): {time.time()-t0:.2f}s")

        day = d.where(F.col("doc_id") % 50 == 0)
        batch = "day"
        stages: list[tuple[str, float]] = []

        def mark(label, t):
            stages.append((label, time.time() - t))
            return time.time()

        # mirror of EdgeStore.ingest's CURRENT structure (write-then-
        # read-back, dir-listed mods, write-materialized verify)
        t = time.time()
        assert store._begin_batch(batch)
        store._clear_stale_partials(batch)
        store._ensure_band_backfill()
        t = mark("begin+backfill-check", t)
        store._write_sigs(
            D.minhash_signatures(
                D.shingles(day, "text", "doc_id", store.n, portable=store.portable),
                store.num_perm,
            ),
            batch, sign=1,
        )
        sigs_new = store._read_batch_partition(store.SIGS_SUBDIR, batch)
        t = mark("sig pass + write", t)
        store._write_bands(
            D.band_table(sigs_new, store.num_perm, store.bands, portable=store.portable),
            batch, sign=1,
        )
        banded_new = store._read_batch_partition(store.BANDS_SUBDIR, batch)
        mods = store._batch_band_mods(batch)
        t = mark("band pass + write", t)
        store._write_side(
            banded_new.groupBy("band_id", "band_hash").agg(
                F.count("*").cast("long").alias("cnt")
            ),
            store.COUNTS_SUBDIR, batch, sign=1,
        )
        t = mark("counts write", t)
        cands = store._candidate_pairs(banded_new, mods=mods).localCheckpoint(
            eager=True
        )
        t = mark("candidate join (checkpoint)", t)
        verified, caches = D.jaccard_verify(
            cands, None, threshold=store.threshold, release=[cands],
            sets_df=D.shingle_sets(
                d, "text", "doc_id", store.n, portable=store.portable
            ).select("_id", F.col("_sh").alias("shset")),
            finish=False,
        )
        t = mark("verify plan + sets gate", t)
        store._write_batch(verified.withColumn("sign", F.lit(1).cast("int")), batch)
        for c in caches:
            c.unpersist()
        t = mark("verify join + edge write + commit", t)

        total = sum(s for _, s in stages)
        print(f"[rep {rep}] day-batch ingest total {total:.2f}s:")
        for label, s in stages:
            print(f"    {label:32s} {s:6.2f}s  ({100*s/total:4.1f}%)")
        n_files = sum(
            len(files) for _, _, files in os.walk(os.path.join(ddir, "edges"))
        )
        print(f"[rep {rep}] store file count: {n_files}")
        shutil.rmtree(ddir, ignore_errors=True)


if __name__ == "__main__":
    main()
