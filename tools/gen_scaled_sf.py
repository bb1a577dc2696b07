"""Generate a K×-scaled copy of a fixture directory (default: sf0.1 ×
10 → a local "sf1") so the FULL headline bench can be measured one
order of magnitude up, not just the dedup-family soaks.

Construction (union-with-offset, the soak_dedup.py trick, extended to
the whole star schema with referential integrity preserved):

- ``region`` / ``nation`` are dimensions — copied as-is. At any scale
  the TPC-H dim tables stay tiny; scaling them would change join
  semantics (new FK targets), not load.
- Every fact/entity table is unioned K times with ALL key columns
  (primary and foreign) offset by ``copy * 10_000_000``, so each copy
  is a self-consistent shard of the original graph: lineitem k joins
  orders k joins customer k, events k keeps its own users. That is
  exactly how a 10× production dataset behaves for these queries —
  join fan-outs and group cardinalities scale linearly, dim joins
  stay broadcast-sized.
- ``documents``: text is alphabet+digit-rotated per copy (distinct
  content, identical intra-copy duplicate structure), so dedup-family
  output scales exactly K× with no cross-copy matches — clean cost
  curves up to K=26.
- ``embeddings``: each copy's vectors are cyclically shifted by
  ``copy`` positions — norm-preserving, so cosine math and cluster
  geometry stay realistic while copies are distinct vectors.
- ``events``: timestamps are kept — a 10× corpus over the same time
  range means 10× daily density, which is the realistic read for
  windowed/rollup/partition-pruning queries (same partition count,
  bigger partitions).

Usage: python tools/gen_scaled_sf.py [K] [src_dir] [dst_dir]
Defaults: K=10, src=/root/testdata/sf0.1, dst=<repo>/.localdata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import string

from pyspark.sql import DataFrame, functions as F

from etl_database_spark.queries import table
from etl_database_spark.session import get_spark

STRIDE = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _offset_copy(df: DataFrame, name: str, k: int) -> DataFrame:
    cols = []
    keys = set(KEY_COLS[name])
    alpha, digits = string.ascii_lowercase, string.digits
    for c in df.columns:
        if c in keys:
            cols.append((F.col(c) + k * STRIDE).alias(c))
        elif name == "supplier" and c == "s_name" and k > 0:
            # Perturb names per copy: verbatim copies created K
            # identical-name clusters (1.4M edges at K=10) that made
            # the edit-distance-1 entity-resolution oracle quadratic
            # in group size (r6 verdict ask #6). The doubled 3-digit
            # copy token keeps every cross-copy name pair at edit
            # distance >= 2 (two digit positions change between any
            # two copies), while intra-copy distance-1 structure —
            # the thing the query detects — is preserved exactly.
            cols.append(
                F.concat_ws(" ", F.col("s_name"), F.lit(f"{k:03d}{k:03d}")).alias(
                    "s_name"
                )
            )
        elif name == "documents" and c == "text":
            rot = (alpha[k % 26 :] + alpha[: k % 26]) + (
                digits[k % 10 :] + digits[: k % 10]
            )
            cols.append(F.translate("text", alpha + digits, rot).alias("text"))
        elif name == "embeddings" and c == "embedding":
            # cyclic shift by k: slice+concat keeps it a codegen expr
            n = F.size("embedding")
            shift = F.lit(k) % n
            cols.append(
                F.concat(
                    F.slice("embedding", shift + 1, n - shift),
                    F.slice("embedding", F.lit(1), shift),
                ).alias("embedding")
            )
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def main() -> None:
    k_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".localdata", "sf1")
    os.makedirs(dst, exist_ok=True)

    spark = get_spark("gen-scaled-sf")
    for name in ["region", "nation"]:
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        print(f"{name}: copied dim ({df.count()} rows)")
    for name in KEY_COLS:
        # table() so events' nanos-encoded ts normalizes once here
        df = table(spark, src, name)
        copies = [_offset_copy(df, name, k) for k in range(k_scale)]
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        out = os.path.join(dst, f"{name}.parquet")
        # partition count sized so sf1 files stay ~16-64 MB-ish; tiny
        # tables still coalesce sensibly
        n_rows = df.count() * k_scale
        parts = max(1, min(32, n_rows // 200_000))
        u.repartition(parts).write.mode("overwrite").parquet(out)
        print(f"{name}: {n_rows} rows → {out} ({parts} files)")
    print("done:", dst)


if __name__ == "__main__":
    main()
