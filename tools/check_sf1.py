"""Replayable sf1 correctness matrix (VERDICT r7 ask #7).

Round 7 recorded the sf1 matrix as a ROADMAP table: N-green plus a
pinned set of deliberate exact-tier mass-gate refusals, each naming
its sub-linear LSH sibling. This script turns that table into an
asserted artifact: it (re)generates the local 10×-scaled fixture if
missing, replays the FULL registry through the same check loop the
sf0.01 gate uses, and exits 0 only when

- every query outside EXPECTED_REFUSALS is green (oracle-backed rows
  hash-verified, rows-only rows completing), AND
- every query inside EXPECTED_REFUSALS fails with a mass-gate
  ValueError that names its scale sibling (a refusal that stopped
  refusing, or started failing for a different reason, is a FAIL).

Usage: python tools/check_sf1.py [sf1_dir]   (default .localdata/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import check_one, duck_connect  # noqa: E402

# Exact verification tiers that MUST refuse at sf1 (quadratic
# candidate/pair mass past their gates), and the substring of the
# gate message that names the sub-linear sibling a user should run.
EXPECTED_REFUSALS: dict[str, str] = {
    "ngram_jaccard_pairs": "minhash_near_duplicates",
    "ngram_dup_clusters": "minhash_near_duplicates",
    "embedding_near_dups": "cosine_near_dup_lsh",
}

# Queries whose SPARK side runs at sf1 but whose DuckDB oracle is
# infeasible at this scale — run Spark, assert rows, skip the oracle.
# Empty since round 9: leakage_safe_splits' oracle now replays the
# PORTABLE LSH pair set + recursive-CTE closure (linear-ish, the
# dedup_clusters_checkable recipe) instead of the memory-quadratic
# exact n-gram tier that OOMed DuckDB at 89 GB in round 8.
SPARK_ONLY: dict[str, str] = {}


def ensure_sf1(sf1_dir: str) -> None:
    probe = os.path.join(sf1_dir, "lineitem.parquet")
    if os.path.exists(probe):
        return
    print(f"generating {sf1_dir} (10x sf0.1, union-with-offset) ...")
    import gen_scaled_sf

    sys.argv = [sys.argv[0], "10", "/root/testdata/sf0.1", sf1_dir]
    gen_scaled_sf.main()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    start_from = None
    if "--from" in args:
        i = args.index("--from")
        start_from = args[i + 1]
        del args[i : i + 2]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf1_dir = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1"
    )
    ensure_sf1(sf1_dir)

    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    spark = get_spark("check_sf1")
    os.makedirs("/tmp/duck_spill", exist_ok=True)

    def fresh_con():
        # One connection PER ROW (round 10): a single long-lived
        # connection accumulates buffer-pool/temp state across 167
        # heavy oracles — pagerank_checkable OOM'd at the shared 40GB
        # cap and corpus_curation_full filled the spill disk inside
        # the matrix, while BOTH pass solo in under 35s on a fresh
        # default-limit connection. Per-row isolation releases memory
        # and temp deterministically; the 64GB cap (vs the 48GB JVM)
        # keeps the two engines co-resident, and the spill directory
        # still catches the genuinely large oracles
        # (leakage_safe_splits spills ~11GB).
        c = duck_connect(sf1_dir)
        c.execute("SET memory_limit='64GB'")
        c.execute("SET temp_directory='/tmp/duck_spill'")
        return c

    registry = load_all()

    bad: list[str] = []
    n_green = n_refused = 0
    t_start = time.time()
    skipping = start_from is not None
    for name, rq in registry.items():
        if only is not None and name not in only:
            continue
        if skipping:
            if name == start_from:
                skipping = False
            else:
                continue
        if name in SPARK_ONLY:
            import dataclasses

            rq = dataclasses.replace(rq, oracle=None)
        con = fresh_con()
        try:
            status, detail, el = check_one(spark, con, rq, sf1_dir)
        finally:
            con.close()
        if name in EXPECTED_REFUSALS:
            sibling = EXPECTED_REFUSALS[name]
            if status == "fail" and "spark error" in detail and sibling in detail:
                print(f"REFUSED (expected) {name}: names sibling {sibling} ({el:.1f}s)")
                n_refused += 1
            elif status != "fail":
                bad.append(name)
                print(
                    f"BAD   {name}: expected a mass-gate refusal at sf1 but it "
                    f"ran ({detail}) — the gate regressed or the scale bound moved"
                )
            else:
                bad.append(name)
                print(f"BAD   {name}: failed for the WRONG reason: {detail}")
        elif status == "fail":
            bad.append(name)
            print(f"FAIL  {name}: {detail} ({el:.1f}s)")
        else:
            n_green += 1
            tag = "OK   " if status == "ok" else "rows "
            note = f" [spark-only at sf1: {SPARK_ONLY[name]}]" if name in SPARK_ONLY else ""
            print(f"{tag} {name}: {detail}{note} ({el:.1f}s)")

    total = len(registry)
    print(
        f"\nsf1 matrix: {n_green} green + {n_refused} expected refusals "
        f"of {total} queries ({time.time() - t_start:.0f}s total)"
    )
    if bad:
        print(f"NOT OK: {bad}")
        return 1
    expected_refusals = (
        {n for n in EXPECTED_REFUSALS if n in only} if only is not None
        else set(EXPECTED_REFUSALS)
    )
    if start_from is None and n_refused != len(expected_refusals):
        print(f"NOT OK: expected {len(expected_refusals)} refusals, saw {n_refused}")
        return 1
    if start_from is not None:
        print(f"OK (partial, from {start_from}): no failures in the replayed tail")
        return 0
    if only is not None:
        print(f"OK (subset --only {','.join(sorted(only))}): all selected rows green")
        return 0
    print("OK: sf1 matrix matches the expected green/refusal pattern")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
