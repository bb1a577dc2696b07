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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_database_spark.queries import load_all
    from etl_database_spark.session import get_spark

    spark = get_spark("check_oracle")
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

    registry = load_all()
    failures = []
    attempted = 0
    for name, rq in registry.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = rq.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        el = time.time() - t0
        if rq.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows ({el:.1f}s) [no oracle]")
            continue
        try:
            odf = con.execute(rq.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
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
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({el:.1f}s)")
        else:
            print(f"OK    {name}: {len(sdf)} rows ({el:.1f}s)")
    print(f"\n{attempted - len(failures)}/{attempted} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
