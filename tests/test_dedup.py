"""Dedup operators vs brute-force ground truth on a corpus with planted
near-duplicates (hash-family ops get no SQL oracle — this is their
correctness gate, per llmdata.py)."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import dedup as D

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega red green blue yellow"
).split()


def _mk_corpus():
    rng = random.Random(7)
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(40))))
    # planted near-dups: copy with small real edits (case/whitespace
    # changes alone would normalize back to exact dups)
    base = docs[3][1]
    docs.append((100, base.replace(base.split()[0], "edited", 1)))
    docs.append((101, base + " extra tail words here"))
    base2 = docs[10][1]
    docs.append((102, base2))  # exact dup
    return docs


def _brute_force_jaccard(docs, n=5, threshold=0.5):
    def shingle_set(text):
        norm = " ".join(text.lower().split())
        return {norm[i : i + n] for i in range(len(norm) - n + 1)}

    sets = {i: shingle_set(t) for i, t in docs}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out[(a, b)] = round(j, 4)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_mk_corpus(), "doc_id long, text string")


def test_exact_duplicates(spark, corpus):
    groups = D.exact_duplicates(corpus, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 10 and groups[0].n_dups == 2


def test_minhash_matches_brute_force(spark, corpus):
    truth = _brute_force_jaccard(_mk_corpus())
    found = {
        (r.id_a, r.id_b): round(r.jaccard, 4)
        for r in D.minhash_near_duplicates(corpus, "text", "doc_id").collect()
    }
    # verified pairs are exact-Jaccard → values must equal brute force
    for pair, j in found.items():
        assert pair in truth and abs(truth[pair] - j) < 1e-6
    # high-similarity planted pairs must be captured (LSH S-curve makes
    # J≥0.8 near-certain at num_perm=32, bands=8)
    high = {p for p, j in truth.items() if j >= 0.8}
    assert high <= set(found)


def test_ngram_jaccard_is_exhaustive(spark, corpus):
    truth = _brute_force_jaccard(_mk_corpus())
    found = {
        (r.id_a, r.id_b): round(r.jaccard, 4)
        for r in D.ngram_jaccard_pairs(corpus, "text", "doc_id").collect()
    }
    assert found == truth


def test_ngram_max_df_sizes_use_true_sets(spark):
    """max_df + prefix_filter: the prefix length and the t·|A| ≤ |B|
    size filter must use TRUE shingle-set sizes (what jaccard_verify
    scores), not max_df-filtered ones. Fixture: docs A/B share common
    chars (df=7, dropped at max_df=2) plus rare 'p'; on filtered sizes
    (5 vs 2) the size filter would wrongly prune the pair, which
    passes on true sizes (11 vs 8, J=7/12≈0.583 ≥ 0.5)."""
    rows = [(1, "abcdefpqrst"), (2, "abcdefpz")] + [
        (10 + i, "abcdef") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            df, "text", "doc_id", n=1, threshold=0.5, max_df=2, prefix_filter=True
        ).collect()
    }
    assert (1, 2) in found
    assert abs(found[(1, 2)] - 7 / 12) < 1e-9


def test_ngram_mass_gate_trips_on_pathological_corpus(spark):
    """The quadratic exact tier must refuse — naming the scale-safe
    alternative — when the measured candidate mass Σ df·(df−1)/2
    exceeds the bound, so it cannot be reached by accident at 100×.
    Fixture: 40 near-identical docs → every posting list is
    corpus-wide and no prefix can bind."""
    rows = [(i, f"the same boilerplate text everywhere {i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="minhash_near_duplicates"):
        D.ngram_jaccard_pairs(df, "text", "doc_id", max_candidate_mass=100)
    # explicit opt-out still runs the unbounded tier
    out = D.ngram_jaccard_pairs(df, "text", "doc_id", max_candidate_mass=None)
    assert out.count() > 0


def test_simhash_near_duplicates(spark, corpus):
    fps = D.simhash_fingerprints(corpus, "text", "doc_id")
    assert fps.count() == corpus.count()
    # exact dup must have identical simhash (hamming 0)
    vals = {r._id: r.simhash for r in fps.collect()}
    assert vals[10] == vals[102]
    pairs = {(r.id_a, r.id_b): r.hamming for r in D.simhash_near_duplicates(fps, 3).collect()}
    assert (10, 102) in pairs and pairs[(10, 102)] == 0


def test_minhash_deterministic(spark, corpus):
    a = sorted(map(tuple, D.minhash_near_duplicates(corpus, "text", "doc_id").collect()))
    b = sorted(map(tuple, D.minhash_near_duplicates(corpus, "text", "doc_id").collect()))
    assert a == b


@pytest.mark.parametrize("small_gate", [1_000_000, 0])
def test_connected_components_vs_union_find(spark, small_gate):
    # small_gate=0 forces the distributed label-propagation path; the
    # default exercises the driver union-find tier.
    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 11)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r._id: r.component
        for r in D.connected_components(pairs, small_graph_max_edges=small_gate).collect()
    }
    # python union-find ground truth
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    truth = {x: find(x) for x in parent}
    assert got == truth
    assert got[11] == 1 and got[10] == 8 and got[6] == 5


def test_verify_broadcast_fallback_matches(spark, corpus, monkeypatch):
    """With the broadcast gates forced to 0 every join takes the
    shuffle fallback — results must be identical to the broadcast
    plan (the 100 TB path is the same operator, bigger corpus)."""
    baseline = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 4))
        for r in D.minhash_near_duplicates(corpus, "text", "doc_id").collect()
    )
    monkeypatch.setattr(D, "BROADCAST_MAX_SET_ENTRIES", 0)
    monkeypatch.setattr(D, "BROADCAST_MAX_ID_ROWS", 0)
    fallback = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 4))
        for r in D.minhash_near_duplicates(corpus, "text", "doc_id").collect()
    )
    assert baseline == fallback


def test_near_duplicate_clusters(spark, corpus):
    out = D.near_duplicate_clusters(corpus, "text", "doc_id").collect()
    by_id = {r.doc_id: r for r in out}
    # planted: 3-100-101 form one cluster with 3 canonical;
    # 10-102 exact dups cluster with 10 canonical
    assert by_id[100].component == 3 and by_id[101].component == 3
    assert by_id[3].is_survivor and not by_id[100].is_survivor
    assert by_id[102].component == 10 and by_id[10].is_survivor


def test_contamination_check_counts_shared_ngrams(spark):
    from etl_database_spark.functions.dedup import contamination_check

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely disjoint content with zero overlap here"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "someone said the quick brown fox runs fast")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in contamination_check(train, eval_df, "text", "doc_id", n=13).collect()}
    assert set(out) == {1, 2}
    # doc 1 shares the 'the quick brown fox' region → contaminated
    assert out[1].n_contaminated > 0
    assert 0 < out[1].contamination_bp <= 10_000
    # doc 2 shares nothing
    assert out[2].n_contaminated == 0 and out[2].contamination_bp == 0
    # bp is exact integer basis points
    assert out[1].contamination_bp == out[1].n_contaminated * 10_000 // out[1].n_shingles


def test_shingle_sets_match_exploded_distinct(spark):
    """shingle_sets (row-local array_distinct, the r11 zero-shuffle
    contamination shape) must reproduce shingles(...).distinct()
    exactly, for both hash families."""
    from pyspark.sql import functions as F

    from etl_database_spark.functions.dedup import shingle_sets, shingles

    docs = [
        (1, "abcabcabc"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "aaaaa"),
        (4, "xy"),  # shorter than n: dropped by both paths
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for portable in (False, True):
        want = {
            (r._id, r.shingle)
            for r in shingles(df, "text", "doc_id", n=5, portable=portable)
            .distinct()
            .collect()
        }
        got = {
            (r._id, r.shingle)
            for r in shingle_sets(df, "text", "doc_id", n=5, portable=portable)
            .select("_id", F.explode("_sh").alias("shingle"))
            .collect()
        }
        assert got == want


def test_distinct_shingles_match_exploded_distinct(spark):
    """distinct_shingles (inline explode(array_distinct), the actual
    contamination hot path) must also reproduce
    shingles(...).distinct() exactly."""
    from etl_database_spark.functions.dedup import distinct_shingles, shingles

    docs = [
        (1, "abcabcabc"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "aaaaa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for portable in (False, True):
        want = {
            (r._id, r.shingle)
            for r in shingles(df, "text", "doc_id", n=5, portable=portable)
            .distinct()
            .collect()
        }
        got = {
            (r._id, r.shingle)
            for r in distinct_shingles(
                df, "text", "doc_id", n=5, portable=portable
            ).collect()
        }
        assert got == want
