"""DuckDB-oracle equivalence for queries OUTSIDE the driver's window.

The round driver's correctness gate checks only the first 50 entries
of `queries()`; the registry deliberately orders the SURVEY §2 core
operators inside that window, which leaves the later llmdata /
similarity queries with no driver-visible red row if they regress.
This suite closes that gap: every oracle-backed query past the cap is
compared against DuckDB here, so a green `pytest` implies all
registered oracle-backed queries are green, not just the first 50.

Runs at sf0.01 (the driver's own comparison scale — small enough to be
fast, large enough that joins/windows produce non-trivial output).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import TABLES, value_hash  # noqa: E402  (tools/check_oracle.py)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
DRIVER_CAP = 50

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


def _uncapped_oracle_queries():
    from etl_database_spark.queries import load_all

    registry = load_all()
    names = list(registry)
    return [(n, registry[n]) for n in names[DRIVER_CAP:] if registry[n].oracle is not None]


_QUERIES = _uncapped_oracle_queries() if os.path.isdir(SF_DIR) else []


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def test_uncapped_query_set_is_what_we_expect():
    """The cap math only protects anything if the uncapped tail is
    non-empty and oracle-backed; pin the shape so a registry reorder
    that silently drops oracles from the tail fails loudly."""
    assert len(_QUERIES) >= 20
    names = {n for n, _ in _QUERIES}
    # representative llmdata queries that must stay covered somewhere
    for probe in ("ngram_jaccard_pairs", "train_eval_contamination", "leakage_safe_splits"):
        from etl_database_spark.queries import load_all

        registry = load_all()
        assert probe in registry
        if list(registry).index(probe) >= DRIVER_CAP:
            assert probe in names


def test_driver_window_holds_every_core_query_and_only_oracle_backed():
    """Permanent guard on the 50-query driver window: every SURVEY §2
    core query (event_changes + relational, minus the explicitly
    demoted variants) must rank inside the window, and every window
    slot must carry a DuckDB oracle — reordering a core query past the
    cap, or letting a rows-only query drift into the window, turns
    pytest red before the driver ever sees it."""
    from etl_database_spark.queries import (
        DRIVER_WINDOW,
        WINDOW_DEMOTED,
        WINDOW_PROMOTED,
        load_all,
    )

    registry = load_all()
    names = list(registry)
    window = names[:DRIVER_WINDOW]
    core = [
        n
        for n, rq in registry.items()
        if rq.fn.__module__.endswith(("event_changes", "relational"))
        and n not in WINDOW_DEMOTED
    ]
    out_of_window = [n for n in core if names.index(n) >= DRIVER_WINDOW]
    assert not out_of_window, f"core queries past the driver cap: {out_of_window}"
    rows_only = [n for n in window if registry[n].oracle is None]
    assert not rows_only, f"window slots without an oracle: {rows_only}"
    missing_promoted = [n for n in WINDOW_PROMOTED if n not in window]
    assert not missing_promoted, f"promoted queries fell out: {missing_promoted}"
    # demoted queries stay registered AND oracle-backed (each demotion
    # receipt in queries/__init__.py promises pytest DuckDB
    # equivalence; a rename/deletion or a dropped oracle would orphan
    # that receipt silently without this pin)
    orphaned = [n for n in WINDOW_DEMOTED if n not in registry]
    assert not orphaned, f"demoted queries no longer registered: {orphaned}"
    # the only demoted rows allowed to lack an oracle are the two
    # engine-native sketches (xxhash64 HLL registers have no DuckDB
    # twin); their receipts are the property tests in
    # tests/test_properties.py
    rows_only_demoted = {"approx_distinct_parts", "approx_price_percentiles"}
    receiptless = [
        n
        for n in WINDOW_DEMOTED
        if registry[n].oracle is None and n not in rows_only_demoted
    ]
    assert not receiptless, f"demoted queries without an oracle: {receiptless}"


@pytest.mark.parametrize("name,rq", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_oracle_equivalence(spark, duck, name, rq):
    sdf = rq.fn(spark, SF_DIR).toPandas()
    odf = duck.execute(rq.oracle).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols {sorted(sdf.columns)} vs oracle {sorted(odf.columns)}"
    )
    assert value_hash(sdf) == value_hash(odf), f"{name}: value-hash mismatch vs oracle"


def _rows_only_queries():
    from etl_database_spark.queries import load_all

    registry = load_all()
    return [(n, rq) for n, rq in registry.items() if rq.oracle is None]


_ROWS_ONLY = _rows_only_queries() if os.path.isdir(SF_DIR) else []
_SMOKE_SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name,rq", _ROWS_ONLY, ids=[n for n, _ in _ROWS_ONLY]
)
def test_rows_only_query_contract_smoke(spark, name, rq):
    """Rows-only queries have no oracle row to turn red, and their
    module tests exercise the underlying FUNCTIONS, not the registered
    callables the driver invokes. This smoke drives each registry
    entry exactly like the driver does (callable at a fixture sf_dir,
    collectable, stable schema) and asserts run-to-run row-count
    determinism — the weak signal the driver records must at least be
    reproducible."""
    df = rq.fn(spark, _SMOKE_SF)
    first = df.toPandas()
    again = rq.fn(spark, _SMOKE_SF).toPandas()
    assert list(first.columns) == list(again.columns)
    assert len(first) == len(again), f"{name}: row count not reproducible"
