"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the
oracle SQL on DuckDB over the same parquet tables, then compares row
count, column names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        mask = df[c].isna()
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S").str.replace(" 00:00:00", "", regex=False)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str).str.replace(" 00:00:00", "", regex=False)
        if mask.any():
            df[c] = df[c].where(~mask, "")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.md5(canon(df).to_csv(index=False, float_format="%.6g").encode()).hexdigest()


def duck_connect(sf_dir: str):
    """DuckDB connection with the fixture tables registered as views
    (single-file or Spark-written directory-of-parts parquet)."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table: a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def check_one(spark, con, rq, sf_dir: str) -> tuple[str, str, float]:
    """Run one registered query on Spark (+ its DuckDB oracle when it
    has one) → (status, detail, elapsed): status ∈ {"ok", "rows",
    "fail"} where "rows" means no-oracle rows-only success."""
    t0 = time.time()
    try:
        sdf = rq.fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return "fail", f"spark error: {e}", time.time() - t0
    el = time.time() - t0
    if rq.oracle is None:
        return "rows", f"{len(sdf)} rows [no oracle]", el
    try:
        odf = con.execute(rq.oracle).df()
    except Exception as e:  # noqa: BLE001
        return "fail", f"duckdb error: {e}", el
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rows {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    elif value_hash(sdf) != value_hash(odf):
        problems.append("value-hash mismatch")
        a, b = canon(sdf), canon(odf)
        diff = a.compare(b) if a.shape == b.shape else None
        if diff is not None and len(diff):
            print(diff.head(10))
    if problems:
        return "fail", "; ".join(problems), el
    return "ok", f"{len(sdf)} rows", el


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duck_connect(sf_dir)

    registry = load_all()
    failures = []
    attempted = 0
    for name, rq in registry.items():
        if only and name not in only:
            continue
        attempted += 1
        status, detail, el = check_one(spark, con, rq, sf_dir)
        tag = {"ok": "OK   ", "rows": "rows ", "fail": "FAIL "}[status]
        print(f"{tag} {name}: {detail} ({el:.1f}s)")
        if status == "fail":
            failures.append(name)
    print(f"\n{attempted - len(failures)}/{attempted} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
