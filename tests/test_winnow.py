"""Winnowing fingerprints: the SIGMOD'03 coverage guarantee (every
shared substring of length ≥ k+w−1 shares a fingerprint), density,
and the stats form's checksum arithmetic — verified against a pure
Python reference."""

import hashlib
import random

from etl_database_spark.functions.dedup import (
    winnow_fingerprint_sets,
    winnow_fingerprints,
)

K, W = 8, 4


def _norm(s: str) -> str:
    return " ".join(s.lower().split())


def _py_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    t = _norm(text)
    if len(t) < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def test_winnow_matches_python_reference(spark):
    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice("abcdefg hij klmno pqr".split()) for _ in range(30)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r._id: set(r._fps)
        for r in winnow_fingerprint_sets(df, "text", "doc_id").collect()
    }
    for i, text in rows:
        assert got[i] == _py_winnow(text), i


def test_winnow_shared_substring_guarantee(spark):
    """Two documents sharing any substring of length ≥ k+w−1 must
    share at least one fingerprint — the scheme's defining property."""
    rng = random.Random(5)
    shared = "the quick brown fox jumps over the lazy dog"
    assert len(shared) >= K + W - 1
    rows = []
    for i in range(20):
        pre = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(6))
        post = " ".join(rng.choice(["eps", "zeta", "eta"]) for _ in range(6))
        rows.append((i, f"{pre} {shared} {post}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r._id: set(r._fps)
        for r in winnow_fingerprint_sets(df, "text", "doc_id").collect()
    }
    for i in range(1, 20):
        assert got[0] & got[i], f"doc 0 and {i} share '{shared}' but no fingerprint"


def test_winnow_stats_checksum(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "xy")],  # doc 2 too short
        "doc_id long, text string",
    )
    out = {r._id: (r.n_fps, r.fp_sum) for r in winnow_fingerprints(df, "text", "doc_id").collect()}
    assert 2 not in out
    fps = _py_winnow("abcdefghijklmnopqrstuvwxyz")
    assert out[1] == (len(fps), sum(fps))
