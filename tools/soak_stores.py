"""Index-store lifecycle soak at sf1 and sf10 (VERDICT r10 ask #5).

The serving tier's previous soaks were synthetic single-operator
fixtures; this tool runs the THREE persisted index stores through
their full production lifecycle — 3-batch ingest, retraction of one
batch, compaction, serve — at sf1 (50k docs) and a documents-only
sf10 (500k docs, the spot_sf10 100x-of-sf0.1 construction), recording
per-stage wall so the ROADMAP table can show which stages scale
linearly and which are dominated by documented verify volume.

Also measures the round-11 band-layout win head-on (VERDICT r10 ask
#4): for a populated EdgeStore, the candidate join's stored-band scan
is partition-pruned to the buckets the batch touches — reported as
bytes read vs bytes on disk for a 1-doc fixup batch and a 100-doc
day-batch. Honest note recorded with the numbers: a day-batch's
bands (100 docs x 32 bands ~ 3.2k distinct bucket keys) touch nearly
every partition at band_buckets=256, so pruning pays for FIXUP-sized
batches; at 100 TB the bucket count rises with the store (it is a
physical layout knob, not identity), which moves the crossover up.

Usage: python tools/soak_stores.py [sf1|sf10 ...]   (default: both)
Results recorded in ROADMAP.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_database_spark.operators.edgestore import EdgeStore  # noqa: E402
from etl_database_spark.operators.phraseindex import PhraseIndexStore  # noqa: E402
from etl_database_spark.operators.tokenindex import TokenIndexStore  # noqa: E402
from etl_database_spark.queries import table  # noqa: E402
from etl_database_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGE_P = dict(n=5, num_perm=32, bands=32, threshold=0.3, min_agree=3)
EDGE_BUCKETS = 256  # soak layout: sized for the sf10 store


def _stage(out: dict, name: str, fn) -> None:
    t0 = time.time()
    n = fn()
    out[name] = round(time.time() - t0, 2)
    print(f"    {name}: {out[name]}s ({n} rows)", flush=True)


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        total += sum(
            os.path.getsize(os.path.join(dirpath, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def lifecycle(spark, docs, work: str, label: str) -> dict:
    """3-batch ingest + retract(b1) + compact + serve for all three
    stores; returns {store.stage: seconds}."""
    out: dict = {}
    batches = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]

    print(f"  [{label}] EdgeStore", flush=True)
    es = EdgeStore(
        spark, os.path.join(work, "edges"), band_buckets=EDGE_BUCKETS, **EDGE_P
    )
    for i in range(3):
        corpus = docs.where(F.col("doc_id") % 3 <= i)
        _stage(out, f"edge.ingest_b{i}", lambda b=batches[i], c=corpus: es.ingest(b, f"b{i}", corpus=c))
    _stage(out, "edge.retract_b1", lambda: es.retract(batches[1], "rm_b1"))
    _stage(out, "edge.compact", lambda: es.compact() or 0)
    _stage(out, "edge.serve", lambda: es.edges().count())

    print(f"  [{label}] TokenIndexStore", flush=True)
    ts = TokenIndexStore(spark, os.path.join(work, "tokens"))
    for i in range(3):
        _stage(out, f"token.ingest_b{i}", lambda b=batches[i], i=i: ts.ingest(b, f"b{i}"))
    _stage(out, "token.retract_b1", lambda: ts.retract(batches[1], "rm_b1"))
    _stage(out, "token.compact", lambda: ts.compact() or 0)
    _stage(
        out,
        "token.serve",
        lambda: ts.bm25_serve(ts.top_terms(5)).orderBy(F.desc("bm25_dec")).limit(100).count(),
    )

    print(f"  [{label}] PhraseIndexStore (char trigrams)", flush=True)
    ps = PhraseIndexStore(spark, os.path.join(work, "phrase"), n=3, unit="char")
    for i in range(3):
        _stage(out, f"phrase.ingest_b{i}", lambda b=batches[i], i=i: ps.ingest(b, f"b{i}"))
    _stage(out, "phrase.retract_b1", lambda: ps.retract(batches[1], "rm_b1"))
    _stage(out, "phrase.compact", lambda: ps.compact() or 0)
    _stage(out, "phrase.serve", lambda: ps.top_gram_postings(k=3).count())
    return out


def band_scan_pruning(spark, docs, work: str, label: str) -> None:
    """Bytes the candidate join reads from the stored band table vs
    bytes on disk, for a 1-doc fixup and a 100-doc day-batch (the
    store was just compacted by lifecycle(), so this measures the
    steady-state layout)."""
    from etl_database_spark.functions import dedup as D

    es = EdgeStore(
        spark, os.path.join(work, "edges"), band_buckets=EDGE_BUCKETS, **EDGE_P
    )
    bands_root = os.path.join(es.path, EdgeStore.BANDS_SUBDIR)
    total = _dir_bytes(bands_root)
    for nd, batch in (
        (1, docs.where(F.col("doc_id") == 3)),
        (100, docs.orderBy("doc_id").limit(100)),
    ):
        sigs = D.minhash_signatures(
            D.shingles(batch, "text", "doc_id", EDGE_P["n"]), EDGE_P["num_perm"]
        )
        banded = D.band_table(sigs, EDGE_P["num_perm"], EDGE_P["bands"])
        mods = {
            r.m
            for r in banded.select(es._band_mod(EDGE_BUCKETS).alias("m"))
            .distinct()
            .collect()
        }
        read = sum(
            _dir_bytes(os.path.join(bands_root, d, f"bh_mod={m}"))
            for d in os.listdir(bands_root)
            if d.startswith("batch=")
            for m in mods
            if os.path.isdir(os.path.join(bands_root, d, f"bh_mod={m}"))
        )
        print(
            f"  [{label}] band scan, {nd}-doc batch: {len(mods)}/{EDGE_BUCKETS} "
            f"buckets touched, {read/1e6:.1f} MB read of {total/1e6:.1f} MB "
            f"on disk ({100*read/max(total,1):.0f}%)",
            flush=True,
        )


def ensure_fixtures(spark, want: list[str]) -> dict[str, str]:
    dirs = {}
    if "sf1" in want:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import check_sf1

        sf1 = os.path.join(REPO, ".localdata", "sf1")
        check_sf1.ensure_sf1(sf1)
        dirs["sf1"] = sf1
    if "sf10" in want:
        import spot_sf10

        sf10 = os.path.join(REPO, ".localdata", "sf10_docs")
        if not os.path.isdir(os.path.join(sf10, "documents.parquet")):
            t0 = time.time()
            spot_sf10.build(spark, 100, sf10)
            print(f"built sf10 fixture in {time.time()-t0:.1f}s", flush=True)
        dirs["sf10"] = sf10
    return dirs


def main() -> None:
    import shutil
    import tempfile

    want = sys.argv[1:] or ["sf1", "sf10"]
    spark = get_spark("soak-stores")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = ensure_fixtures(spark, want)
    results: dict[str, dict] = {}
    for label, sf_dir in dirs.items():
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        print(f"{label}: {docs.count()} docs", flush=True)
        work = tempfile.mkdtemp(prefix=f"soak_stores_{label}_")
        try:
            results[label] = lifecycle(spark, docs, work, label)
            band_scan_pruning(spark, docs, work, label)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    if len(results) == 2:
        a, b = (results[k] for k in ("sf1", "sf10"))
        print("\nstage            sf1(s)   sf10(s)  ratio (10x data)")
        for k in a:
            r = b[k] / a[k] if a[k] else float("inf")
            print(f"{k:<18} {a[k]:>7.2f} {b[k]:>8.2f}  {r:>5.1f}x")


if __name__ == "__main__":
    main()
