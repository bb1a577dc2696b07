"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Each query runs $SPARK_GRAFT_BENCH_REPEATS times (default 5) after a
shared session warmup; timing is end-to-end (plan + execute +
collect-to-count) per query. The headline value stays best-of-N (the
stable throughput signal); per-query p50/p95 over the repeats are
reported alongside to expose JVM/GC variance.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Pinned reference for the host-speed calibration probe: the probe's
# best-of-3 on this box in a quiet state across rounds 8-10 measured
# 0.289-0.324s. value_norm = value * (REFERENCE_CALIBRATION_SEC /
# calibration_sec) deflates a headline taken on a degraded host back
# to quiet-host terms (round 10: probe 0.584s, headline 34.37s on a
# ~1.8x-loaded box vs 32.18s quiet on identical code), so BENCH_rN
# artifacts compare across rounds without forensics.
REFERENCE_CALIBRATION_SEC = 0.30
# Pinned reference for the IO/shuffle probe (round-11 verdict ask #7:
# make value_norm two-probe). Quiet-host samples on the record: 1.53,
# 1.90, 2.09, 2.21 across the four r11 builder runs (host-variance
# ledger in OPTIMIZATION_r11.md) vs 6.50 on the degraded r11 driver
# host and 34.66 on the pathological session-1 box. Reference = the
# median-ish 1.9; value_norm_io deflates by this probe the way
# value_norm deflates by the CPU probe. A CPU-linear deflation
# under-corrects IO-degraded runs, so artifacts now carry BOTH.
REFERENCE_CALIBRATION_IO_SEC = 1.9

HEADLINE = [
    "event_changes",
    "pricing_summary",
    "regional_revenue",
    "latest_window_orders",
    "orders_prev_busday",
    "customer_churn_setops",
    "order_tier_classification",
    "latest_event_per_user",
    "top_orders_per_segment",
    "props_json_extract",
    "above_nation_avg_balance",
    "windowed_event_counts",
    "exact_dedup_groups",
    "doc_token_stats",
    "lang_id_distribution",
    "cosine_topk_bruteforce",
    "minhash_near_dups",
    "simhash_fingerprints",
    "corpus_curation_pipeline",
    "doc_bigram_lm_scores",
    "train_eval_contamination",
    "semdedup_prune",
    "event_funnel_counts",
    "rollup_daily_event_stats",
    "partitioned_day_slice_stats",
    "duplicate_span_stats",
    "bloom_gated_new_docs",
    # round-6 additions: CDC-maintained rollup serving (store build is
    # cached after the first repeat; best-of-N measures the serve) and
    # DSIR hashed-ngram data selection
    "cdc_rollup_order_totals",
    "dsir_target_selection",
    # round-7 additions: PageRank on the LSH-verified pair graph (the
    # exact-tier source refused past its mass gate at sf1 — this is
    # the scale path) and the engine-portable DSIR twin (md5 buckets +
    # exact-decimal weights — the oracle-checkable variant's cost)
    "doc_similarity_pagerank",
    "dsir_selection_checkable",
    # round-8 additions: BM25 retrieval scoring and MOSS winnowing
    # (both window-promoted this round), plus the incremental
    # winnow-store serve (store build is cached after the first
    # repeat, same discipline as cdc_rollup_order_totals)
    "doc_bm25_scores",
    "winnow_near_dup_pairs",
    "winnowstore_incremental_pairs",
    # round-9 additions: phrase-search served from the incremental
    # inverted index (store build cached after the first repeat; the
    # measured row is probe-select + posting-list serve) and the
    # JL-projected 16-d cosine top-k (the embedding-compression tier's
    # project+rank cost)
    "phrase_index_search",
    "rp_ann_topk_checkable",
    # BM25 served from the persisted token index (store build cached
    # after the first repeat; the measured row is |Q| posting-list
    # folds + the shared scoring tail)
    "bm25_index_scores",
    # round-10 addition: the curation pipeline with its near-dup stage
    # served from the persisted EdgeStore (store build cached after
    # the first repeat; the measured row is gates + exact-dedup +
    # component removal off the stored edge list + split counts)
    "corpus_curation_served",
    # round-11 additions: hybrid retrieval (BM25 top-k + cosine top-k
    # fused by exact-integer reciprocal rank — both toplist builds are
    # the measured cost), greedy MMR diversity selection over the
    # cosine shortlist, and the k-anonymity governance profile
    "hybrid_retrieval_rrf",
    "mmr_diverse_topk_checkable",
    "customer_kanonymity_profile",
    # the Markov transition-matrix view of the event stream: one
    # user_id window shuffle + a tiny (|types|^2) normalizer join
    "event_transition_matrix",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    # Round-4 postmortem: Spark's console progress bars flooded the
    # captured stdout and the driver's tail truncated the headline JSON
    # out of the recorded artifact. The bar writes to stderr but the
    # capture interleaves streams, so turn it off for the bench session
    # — it must be set before the JVM starts (builder conf, not
    # spark.conf.set).
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = get_spark("bench")
    # Round-8 postmortem: the driver's tail-bounded capture was swamped
    # by WARN lines (WindowExec flood), cutting the summary out of the
    # recorded artifact. The plans that warned are fixed, but the bench
    # session shouldn't depend on that: nothing below WARN-level noise
    # is useful during a timing run.
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Host-speed calibration probe (round-8 verdict ask #4): a pinned,
    # data-independent, CPU-bound codegen aggregate. Cross-round
    # wall-clock comparisons on a shared box are meaningless without
    # knowing how fast the box was THAT day — r8 burned analysis time
    # adjudicating a uniform 1.45× drift that this 2-second number
    # explains instantly. Quote cross-round ratios normalized by it.
    def _calibrate() -> float:
        from pyspark.sql import functions as CF

        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            (
                spark.range(0, 500_000_000, 1, 32)
                .select(
                    CF.sum(
                        CF.xxhash64(
                            CF.col("id"), CF.col("id") * 31, CF.col("id") + 7
                        ).cast("double")
                    ).alias("h")
                )
                .collect()
            )
            best = min(best, time.time() - t0)
        return round(best, 3)

    # IO/shuffle-side calibration probe (round-11 close finding): this
    # session produced the first run where the CPU probe read quiet
    # (0.316 vs 0.315 mid-round) while byte-identical Spark rows ran a
    # uniform 1.65× slower (regional_revenue 0.72→2.64s on code
    # untouched since r6) — host degradation living entirely in the
    # shuffle/temp-write path, invisible to a codegen aggregate. This
    # probe times a pinned shuffle + parquet write + read-back so the
    # recorded artifact can separate "code got slower" from "the
    # box's IO path got slower" without forensics. Reported alongside
    # calibration_sec; once two-plus rounds of quiet-host samples
    # exist, value_norm can start deflating by both.
    def _calibrate_io() -> float:
        import shutil
        import tempfile

        from pyspark.sql import functions as CF

        best = float("inf")
        for _ in range(3):
            d = tempfile.mkdtemp(prefix="bench_iocal_")
            p = os.path.join(d, "t")
            t0 = time.time()
            (
                spark.range(0, 8_000_000, 1, 32)
                .select(
                    CF.col("id"),
                    CF.xxhash64(CF.col("id")).alias("k"),
                    CF.md5(CF.col("id").cast("string")).alias("pad"),
                )
                .repartition(32, "k")
                .write.mode("overwrite").parquet(p)
            )
            spark.read.parquet(p).select(CF.sum("id")).collect()
            best = min(best, time.time() - t0)
            shutil.rmtree(d, ignore_errors=True)
        return round(best, 3)

    # Warm up the JVM/codegen path so query 1 doesn't absorb startup:
    # one pass of every headline query at the smallest SF compiles the
    # generated code for each plan shape (C2 JIT) without touching the
    # measured SF's data. Measured runs then reflect steady-state
    # throughput rather than first-compile latency.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
        for name in HEADLINE:
            rq = registry.get(name)
            if rq is not None:
                try:
                    rq.fn(spark, warm_dir).count()
                except Exception:
                    pass
        spark.catalog.clearCache()
        # Drop the Python references to warmup results so their
        # localCheckpoint RDDs (dedup pipelines) release block-manager
        # memory before timing starts, not mid-measurement.
        import gc

        gc.collect()

    calibration_sec = _calibrate()
    calibration_io_sec = _calibrate_io()
    print(
        f"# calibration: {calibration_sec:.2f}s cpu, "
        f"{calibration_io_sec:.2f}s shuffle+parquet",
        file=sys.stderr,
    )

    # Persisted-index setup (reported, not hidden): the minhash edge
    # store — minhash_near_dups' pair source since r12 (r11 verdict
    # ask #3) — is a maintained artifact built once per corpus batch
    # at ingest time in production; build it up front here (three
    # modulo batches through the real EdgeStore lifecycle) and report
    # the cost separately so per-query timings measure serving, not
    # indexing.
    setup: dict = {}
    try:
        from etl_database_spark.queries.llmdata import _minhash_edges

        t0 = time.time()
        _minhash_edges(spark, sf_dir).count()
        setup["minhash_edge_store"] = round(time.time() - t0, 3)
    except Exception as e:
        # A failed build means the first minhash repeat silently
        # absorbs the full index cost — record it so skewed timings
        # are explainable from the output alone.
        setup["minhash_edge_store_error"] = str(e)[:200]
        print(f"# WARNING: minhash-edge-store setup failed: {e}", file=sys.stderr)
    try:
        # The similarity-edge graph (PageRank's input) is likewise a
        # maintained artifact at scale: build + verify it once here and
        # report the cost, so the timed repeats measure graph SERVING.
        from etl_database_spark.queries.llmdata import _pagerank_edges

        t0 = time.time()
        _pagerank_edges(spark, sf_dir).count()
        setup["pagerank_edge_store"] = round(time.time() - t0, 3)
    except Exception as e:
        setup["pagerank_edge_store_error"] = str(e)[:200]
        print(f"# WARNING: pagerank-edge-store setup failed: {e}", file=sys.stderr)
    try:
        # Steady-state EdgeStore posture on the record (round-10
        # verdict ask #6): the pagerank_edge_store line above measures
        # the 3x33%-batch bulk build, which is verify-dominated and
        # unrepresentative of production maintenance (a corpus
        # day-batch is ~100 docs against a full-size store). Build a
        # store on 98% of the corpus (reported separately), then time
        # ONE 100-doc day-batch ingest — the number the
        # batch-proportional design actually claims (~flat across
        # store sizes, ROADMAP's day-batch soak).
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from etl_database_spark.operators.edgestore import EdgeStore
        from etl_database_spark.queries import table as _table

        ddir = tempfile.mkdtemp(prefix="bench_day_batch_")
        d = _table(spark, sf_dir, "documents").select("doc_id", "text")
        store = EdgeStore(
            spark,
            os.path.join(ddir, "edges"),
            n=5, num_perm=32, bands=32, threshold=0.3, min_agree=3,
        )
        t0 = time.time()
        store.ingest(d.where(F.col("doc_id") % 50 != 0), "bulk", corpus=d)
        setup["day_batch_store_build"] = round(time.time() - t0, 3)
        day = d.where(F.col("doc_id") % 50 == 0)
        n_day = day.count()
        t0 = time.time()
        store.ingest(day, "day", corpus=d)
        setup["day_batch_ingest"] = round(time.time() - t0, 3)
        setup["day_batch_docs"] = int(n_day)
        shutil.rmtree(ddir, ignore_errors=True)
    except Exception as e:
        setup["day_batch_ingest_error"] = str(e)[:200]
        print(f"# WARNING: day-batch setup failed: {e}", file=sys.stderr)
    try:
        # Same treatment for the incremental rollup store: built at
        # ingest time in production, so report the build separately and
        # let the timed repeats measure serving.
        from etl_database_spark.queries.analytics import _rollup_store

        t0 = time.time()
        _rollup_store(spark, sf_dir)
        setup["rollup_store"] = round(time.time() - t0, 3)
    except Exception as e:
        setup["rollup_store_error"] = str(e)[:200]
        print(f"# WARNING: rollup-store setup failed: {e}", file=sys.stderr)
    try:
        # Day-partitioned events layout: the ingest-time write whose
        # partition-pruned scans the headline query serves from.
        from etl_database_spark.queries.analytics import _partitioned_events

        t0 = time.time()
        _partitioned_events(spark, sf_dir)
        setup["partitioned_events_layout"] = round(time.time() - t0, 3)
    except Exception as e:
        setup["partitioned_events_layout_error"] = str(e)[:200]
        print(f"# WARNING: partitioned-layout setup failed: {e}", file=sys.stderr)
    try:
        # Streaming-path overhead on the record: drain the corpus's
        # document fingerprints through the Structured Streaming Bloom
        # ingest (8 files -> 8 micro-batches via maxFilesPerTrigger=1,
        # foreachBatch into the persisted store). The batch twins are
        # equivalence-tested in pytest; this line times the stream
        # engine + checkpoint + store-commit cost per micro-batch.
        import shutil
        import tempfile

        from etl_database_spark.functions.text import fingerprint_md5
        from etl_database_spark.queries import table as _table
        from etl_database_spark.streaming.bloom import run_bloom_once

        sdir = tempfile.mkdtemp(prefix="bench_stream_bloom_")
        src, store_p, ckpt = (os.path.join(sdir, d) for d in ("src", "store", "ckpt"))
        keys = _table(spark, sf_dir, "documents").select(
            fingerprint_md5("text").alias("k")
        )
        keys.repartition(8).write.parquet(src)
        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        store = run_bloom_once(spark, stream, "k", store_p, ckpt)
        wall = time.time() - t0
        n_batches = len(store.batches())
        setup["streaming_bloom_ingest"] = round(wall, 3)
        setup["streaming_bloom_batches"] = n_batches
        setup["streaming_bloom_per_batch"] = round(wall / max(n_batches, 1), 3)
        shutil.rmtree(sdir, ignore_errors=True)
    except Exception as e:
        setup["streaming_bloom_ingest_error"] = str(e)[:200]
        print(f"# WARNING: streaming-bloom setup failed: {e}", file=sys.stderr)
    try:
        # Incremental semantic dedup on the record (round-7): drain the
        # embeddings through the streaming semdedup path in 4
        # micro-batches (assign+pair cost per batch, cross-batch pairs
        # via the persisted embedding store), then time the corpus-wide
        # prune-list SERVE from the accumulated match store —
        # per-day-batch maintenance vs the batch operator's full
        # recompute. Stream == batch is pytest-proven
        # (tests/test_semdedup.py).
        import shutil
        import tempfile

        from pyspark.sql import functions as SF

        from etl_database_spark.functions.similarity import auto_semdedup_k
        from etl_database_spark.queries import table as _table
        from etl_database_spark.streaming.semdedup import (
            prune_from_matches,
            run_semdedup_once,
        )

        sdir = tempfile.mkdtemp(prefix="bench_stream_sd_")
        src, store_p, match_p, ckpt = (
            os.path.join(sdir, d) for d in ("src", "store", "matches", "ckpt")
        )
        emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        k = auto_semdedup_k(emb.count())
        seeds = emb.orderBy("vec_id").limit(k).select("embedding").collect()
        cents = spark.createDataFrame(
            [(i, [float(x) for x in r.embedding]) for i, r in enumerate(seeds)],
            "cluster_id long, cvec array<double>",
        )
        emb.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        run_semdedup_once(spark, stream, store_p, match_p, ckpt, cents)
        wall = time.time() - t0
        setup["streaming_semdedup_ingest"] = round(wall, 3)
        setup["streaming_semdedup_per_batch"] = round(wall / 4, 3)
        t0 = time.time()
        n_pruned = prune_from_matches(spark.read.parquet(match_p)).count()
        setup["streaming_semdedup_serve"] = round(time.time() - t0, 3)
        setup["streaming_semdedup_pruned"] = int(n_pruned)
        shutil.rmtree(sdir, ignore_errors=True)
    except Exception as e:
        setup["streaming_semdedup_error"] = str(e)[:200]
        print(f"# WARNING: streaming-semdedup setup failed: {e}", file=sys.stderr)

    def pctl(xs: list[float], q: float) -> float:
        xs = sorted(xs)
        i = q * (len(xs) - 1)
        lo, hi = int(i), min(int(i) + 1, len(xs) - 1)
        return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)

    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")), 1)
    forced_repeats = max(
        int(os.environ.get("SPARK_GRAFT_BENCH_FORCED_REPEATS", "2")), 0
    )
    timings: dict[str, float] = {}
    p50: dict[str, float] = {}
    p95: dict[str, float] = {}
    forced: dict[str, float] = {}
    from pyspark.sql import functions as F

    for name in HEADLINE:
        rq = registry.get(name)
        if rq is None:
            continue
        runs, n = [], 0
        for _ in range(repeats):
            t0 = time.time()
            df = rq.fn(spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
            # Queries that cache intermediates would otherwise pollute
            # later timings (memory churn); each run is measured cold.
            spark.catalog.clearCache()
        # Value-forced column: count() on a provably cardinality-
        # preserving plan lets Catalyst prune whole subtrees (the r6
        # simhash honesty note: 1.8s counted vs 6.4s value-forced at
        # 100×). Hashing every column of every row defeats pruning, so
        # this column is the no-asterisk absolute number; count()
        # stays the round-over-round trend convention.
        fruns = []
        for _ in range(forced_repeats):
            t0 = time.time()
            df = rq.fn(spark, sf_dir)
            df.agg(
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns]).cast("double"))
            ).collect()
            fruns.append(time.time() - t0)
            spark.catalog.clearCache()
        import gc

        gc.collect()
        timings[name] = round(min(runs), 3)
        p50[name] = round(pctl(runs, 0.5), 3)
        p95[name] = round(pctl(runs, 0.95), 3)
        if fruns:
            forced[name] = round(min(fruns), 3)
        print(
            f"# {name}: {timings[name]:.2f}s (p50 {p50[name]:.2f}s, p95 {p95[name]:.2f}s, "
            f"forced {forced.get(name, float('nan')):.2f}s, "
            f"{n} rows, best of {repeats})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # Host-independent headline (round-10 verdict ask #2): deflate by
    # the calibration probe so a run on a loaded box compares with a
    # quiet-host run directly. On a quiet host value_norm ~= value.
    value_norm = (
        round(total * (REFERENCE_CALIBRATION_SEC / calibration_sec), 3)
        if calibration_sec > 0
        else None
    )
    # Two-probe normalization (r11 verdict ask #7): the r11 driver run
    # was IO-degraded (probe 6.50 vs ~1.9 quiet) while its CPU probe
    # only read 2.6x — a CPU-only deflation under-corrects such runs.
    value_norm_io = (
        round(total * (REFERENCE_CALIBRATION_IO_SEC / calibration_io_sec), 3)
        if calibration_io_sec > 0
        else None
    )
    line = json.dumps(
        {
            "metric": "headline_query_wall_seconds",
            "value": total,
            "value_norm": value_norm,
            "value_norm_io": value_norm_io,
            "unit": "sec",
            "queries": timings,
            "queries_p50": p50,
            "queries_p95": p95,
            "queries_value_forced": forced,
            "setup": setup,
            "calibration_sec": calibration_sec,
            "calibration_io_sec": calibration_io_sec,
            "reference_calibration_sec": REFERENCE_CALIBRATION_SEC,
            "reference_calibration_io_sec": REFERENCE_CALIBRATION_IO_SEC,
            "sf": sf,
        }
    )
    # Belt and braces against output truncation (round 4 lost the
    # headline value to interleaved progress bars): the JSON line also
    # lands in a file next to this script.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    print(line)


def _wrapper() -> int:
    """Run the real bench in a child process and print its one-line
    JSON summary as the PARENT's very first stdout bytes. The round
    driver's output capture is head-bounded, and Spark/JVM noise used
    to fill that head before the summary line was reached (rounds
    4-7 recorded `parsed: null`); with the wrapper, stdout begins
    with the JSON line no matter how chatty the child was. The
    child's progress lines are replayed to stderr afterwards for
    human runs — and the summary is printed AGAIN as the very last
    bytes, because round 8 showed the driver records the output TAIL
    (the head-first print alone still produced `parsed: null`). With
    the line at both ends and the replay flushed in between, any
    head- or tail-bounded capture contains it."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
    )
    summary = ""
    for ln in reversed(proc.stdout.splitlines()):
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            summary = ln
            break
    found = bool(summary)
    if not found:
        summary = json.dumps(
            {"metric": "headline_query_wall_seconds", "error": "child produced no summary"}
        )
    print(summary, flush=True)
    sys.stderr.write(proc.stderr)
    if not found:
        sys.stderr.write(proc.stdout)
    sys.stderr.flush()
    # Final stdout bytes: a COMPACT summary. Round 9 measured the
    # actual failure mode — the driver's tail capture is 2,000 chars
    # and the full per-query line is >5,000, so the tail started
    # mid-line and could not parse. Round 11's verdict measured the
    # cost of the fix: dropping the per-query dict left PERF_r11 with
    # per_query:{} and an empty scaling table. The compact line now
    # carries a slim {"queries": {name: best_sec}} map (42 rows at 2
    # decimals ~= 1.3 KB, inside the 2,000-char tail alongside the
    # headline fields), degrading to 1-decimal and then to no map if
    # a future query census would push the line past the capture.
    try:
        full = json.loads(summary)
        base = {
            "metric": full.get("metric", "headline_query_wall_seconds"),
            "value": full.get("value"),
            "value_norm": full.get("value_norm"),
            "value_norm_io": full.get("value_norm_io"),
            "unit": full.get("unit", "sec"),
            "sf": full.get("sf"),
            "calibration_sec": full.get("calibration_sec"),
            "calibration_io_sec": full.get("calibration_io_sec"),
            "n_queries": len(full.get("queries", {})) or None,
        }
        queries = full.get("queries") or {}
        compact = json.dumps(base)
        for nd in (2, 1):
            cand = json.dumps(
                dict(base, queries={k: round(v, nd) for k, v in queries.items()})
            )
            if len(cand) <= 1900:
                compact = cand
                break
    except (ValueError, TypeError):
        compact = summary
    print(compact, flush=True)
    return proc.returncode


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        main()
    else:
        sys.exit(_wrapper())
