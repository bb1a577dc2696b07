"""BPE training: the distributed merge loop must reproduce the
reference (Sennrich) algorithm exactly — same merges, same order,
same counts — and apply_bpe must segment like the reference."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from etl_database_spark.functions.bpe import EOW, apply_bpe, train_bpe, word_frequencies


# -- pure-Python reference (independent of the Spark code) ----------------


def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                c[w] += 1
    return c


def _ref_pair_counts(vocab):
    pc = Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += freq
    return pc


def _ref_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_train(texts, n_merges, min_freq=2):
    vocab = [
        (list(w) + [EOW], f) for w, f in sorted(_ref_word_freqs(texts).items())
    ]
    merges = []
    for rank in range(1, n_merges + 1):
        pc = _ref_pair_counts(vocab)
        if not pc:
            break
        # same tie-break as the engine: count desc, then lexicographic
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append({"rank": rank, "left": a, "right": b, "merged": a + b, "pair_count": cnt})
        vocab = [(_ref_merge(s, a, b), f) for s, f in vocab]
    return merges


def _ref_apply(text, merges):
    toks = []
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = list(w) + [EOW]
        for m in merges:
            syms = _ref_merge(syms, m["left"], m["right"])
        toks.extend(syms)
    return toks


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "low lower lowest newer newest wide wider widest",
    "hugging faces hug the newest widest models",
    "the the the and and of of of to to in in",
]


def test_word_frequencies_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {r.word: r.freq for r in word_frequencies(df, "text").collect()}
    assert got == dict(_ref_word_freqs(CORPUS))


def test_train_bpe_reproduces_reference_merges(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe(df, "text", n_merges=15, min_freq=2)
    want = _ref_train(CORPUS, n_merges=15, min_freq=2)
    assert got == want
    assert len(got) > 5  # the corpus genuinely trains something
    # counts are non-increasing only per-pair, but ranks must be 1..n
    assert [m["rank"] for m in got] == list(range(1, len(got) + 1))


@pytest.mark.parametrize("seed", [1, 2])
def test_train_bpe_fuzz_matches_reference(spark, seed):
    rng = random.Random(seed)
    alphabet = "abcd"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 12))
        )
        for _ in range(20)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe(df, "text", n_merges=10, min_freq=2, checkpoint_every=3)
    want = _ref_train(texts, n_merges=10, min_freq=2)
    assert got == want


def test_apply_bpe_segments_like_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = train_bpe(df, "text", n_merges=12, min_freq=2)
    out = {r.text: list(r.bpe_tokens) for r in apply_bpe(df, "text", merges).collect()}
    for t in CORPUS:
        assert out[t] == _ref_apply(t, merges), t
    # merged symbols actually appear (training changed segmentation)
    assert any(len(tok) > 2 for toks in out.values() for tok in toks)
