"""Seeded-random cross-validation of the round-5 operators against
independent pure-Python references — a different failure surface than
the DuckDB oracles (which share their author's reading of the spec
with the Spark code). Each test runs a few seeded corpora so runtime
stays bounded (repo convention: Spark-per-example hypothesis is too
slow; randomized-with-seeds catches shape bugs the handcrafted
fixtures miss)."""

import itertools
import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import spans as SP
from etl_database_spark.operators.spanstore import SpanStore

W = 4
VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


def _norm(text):
    return re.sub(r"\s+", " ", (text or "").lower()).strip()


def _random_corpus(seed, n_docs=24):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(0, 26)))))
    # plant structure: exact dup, prefix share, mid-run share, self-repeat
    base = docs[1][1]
    docs.append((100, base))
    if len(base.split()) >= 6:
        run = " ".join(base.split()[:6])
        docs.append((101, run + " " + " ".join(rng.choice(VOCAB) for _ in range(5))))
    docs.append((102, "zz yy xx ww " * 2))
    return docs


def _ref_windows(tk, w=W):
    return [" ".join(tk[p : p + w]) for p in range(max(len(tk) - w + 1, 0))]


def _ref_span_stats(docs, w=W):
    toks = {i: _norm(t).split(" ") for i, t in docs}
    cnt = Counter()
    wins = {i: _ref_windows(tk, w) for i, tk in toks.items()}
    for ws_ in wins.values():
        cnt.update(ws_)
    out = {}
    for i, tk in toks.items():
        covered = set()
        for p, s in enumerate(wins[i]):
            if cnt[s] > 1:
                covered.update(range(p, p + w))
        runs = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                runs += 1
            prev = p
        out[i] = (len(tk), len(covered), runs)
    return out


def _ref_cut(docs, w=W):
    toks = {i: _norm(t).split(" ") for i, t in docs}
    first = {}
    for i in sorted(toks):
        for p, s in enumerate(_ref_windows(toks[i], w)):
            first.setdefault(s, (i, p))
    out = {}
    for i in sorted(toks):
        cut = set()
        for p, s in enumerate(_ref_windows(toks[i], w)):
            if first[s] != (i, p):
                cut.update(range(p, p + w))
        kept = [t for idx, t in enumerate(toks[i]) if idx not in cut]
        out[i] = (len(toks[i]), len(cut), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_span_stats_match_python_reference(spark, seed):
    docs = _random_corpus(seed)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"])
        for r in SP.duplicate_span_stats(df, "text", "doc_id", W).collect()
    }
    assert got == _ref_span_stats(docs)


@pytest.mark.parametrize("seed", [13, 29])
def test_span_cut_matches_python_reference(spark, seed):
    docs = _random_corpus(seed)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["cut_tokens"], r["new_text"])
        for r in SP.cut_duplicate_spans(df, "text", "doc_id", W).collect()
    }
    assert got == _ref_cut(docs)


@pytest.mark.parametrize("seed", [5, 17])
def test_spanstore_random_splits_equal_one_shot(spark, tmp_path, seed):
    docs = _random_corpus(seed)
    rng = random.Random(seed * 7)
    n_batches = rng.randrange(2, 5)
    batches = [[] for _ in range(n_batches)]
    for d in docs:
        batches[rng.randrange(n_batches)].append(d)
    store = SpanStore(spark, str(tmp_path / f"s{seed}"), w=W)
    for bi, b in enumerate(batches):
        if b:
            store.ingest(spark.createDataFrame(b, ["doc_id", "text"]), batch=f"b{bi}")
        if bi == 1:
            store.compact()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"])
        for r in store.profile(df).collect()
    }
    assert got == _ref_span_stats(docs)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@pytest.mark.parametrize("seed", [7, 31, 53])
def test_fuzzy_join_matches_brute_force(spark, seed):
    from etl_database_spark.functions import fuzzy as FZ

    rng = random.Random(seed)
    keys = list(
        {
            "".join(rng.choice("abc") for _ in range(rng.randrange(0, 7)))
            for _ in range(40)
        }
    )
    rows = list(enumerate(sorted(keys)))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id1"], r["id2"]): r["dist"]
        for r in FZ.fuzzy_pairs_dist1(df, "name", "id").collect()
    }
    want = {
        (i1, i2): _lev(n1, n2)
        for (i1, n1), (i2, n2) in itertools.combinations(rows, 2)
        if _lev(n1, n2) <= 1
    }
    assert got == want
