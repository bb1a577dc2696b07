"""PhraseIndexStore algebra: incremental == one-shot serving, exact
and probe+verify search vs a direct contains scan, retraction
exactness. Lifecycle properties (replay, crash heal, compaction,
config identity) are pinned once in tests/test_batchstore.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions.text import normalize_text
from etl_database_spark.operators.phraseindex import PhraseIndexStore
from etl_database_spark.queries import table

SF = "/root/testdata/sf0.001"


def _contains_scan(d, phrase):
    """Ground truth: token-boundary containment over normalized text."""
    padded = F.concat(F.lit(" "), normalize_text(F.col("text")), F.lit(" "))
    return sorted(
        r.doc_id
        for r in d.where(padded.contains(f" {phrase} ")).select("doc_id").collect()
    )


def test_incremental_store_serves_one_shot_postings(spark, tmp_path):
    d = table(spark, SF, "documents")
    store = PhraseIndexStore(spark, str(tmp_path / "idx"), n=3)
    for i in range(3):
        assert store.ingest(d.where(F.col("doc_id") % 3 == i), f"b{i}")
    one = PhraseIndexStore(spark, str(tmp_path / "oneshot"), n=3)
    assert one.ingest(d, "all")
    assert sorted(map(tuple, store.postings().collect())) == sorted(
        map(tuple, one.postings().collect())
    )
    store.compact()
    got = sorted(map(tuple, store.top_gram_postings(3).collect()))
    want = sorted(map(tuple, one.top_gram_postings(3).collect()))
    assert got == want and got


def test_search_exact_gram_equals_contains_scan(spark, tmp_path):
    d = table(spark, SF, "documents")
    store = PhraseIndexStore(spark, str(tmp_path / "idx"), n=3)
    assert store.ingest(d, "all")
    # pick a real trigram from the corpus (mid-frequency, deterministic)
    gram = (
        store.postings().groupBy("gram").count()
        .orderBy(F.desc("count"), "gram").limit(10)
        .orderBy("gram").collect()[5].gram
    )
    got = sorted(r.doc_id for r in store.search([gram]).collect())
    assert got == _contains_scan(d, gram) and got


def test_search_longer_phrase_probes_and_verifies(spark, tmp_path):
    d = table(spark, SF, "documents")
    store = PhraseIndexStore(spark, str(tmp_path / "idx"), n=3)
    assert store.ingest(d, "all")
    # build a real 5-token phrase from some document's normalized text
    doc = d.select(normalize_text("text").alias("t")).first().t
    phrase = " ".join(doc.split(" ")[:5])
    got = sorted(r.doc_id for r in store.search([phrase], corpus=d).collect())
    assert got == _contains_scan(d, phrase) and got
    # longer phrase without corpus must refuse
    with pytest.raises(ValueError, match="corpus"):
        store.search([phrase])
    # phrase shorter than the gram width must refuse
    with pytest.raises(ValueError, match="tokens"):
        store.search(["too short"])


def test_retraction_is_exact(spark, tmp_path):
    d = table(spark, SF, "documents")
    b0 = d.where(F.col("doc_id") % 2 == 0)
    b1 = d.where(F.col("doc_id") % 2 == 1)
    store = PhraseIndexStore(spark, str(tmp_path / "idx"), n=3)
    assert store.ingest(b0, "b0") and store.ingest(b1, "b1")
    assert store.retract(b1, "b1_retraction")
    only0 = PhraseIndexStore(spark, str(tmp_path / "only0"), n=3)
    assert only0.ingest(b0, "all")
    assert sorted(map(tuple, store.postings().collect())) == sorted(
        map(tuple, only0.postings().collect())
    )


def test_char_trigram_substring_search_equals_contains_scan(spark, tmp_path):
    """unit='char' mode: conjunctive trigram-posting intersection +
    contains verify must equal a direct contains scan, for literals
    spanning token boundaries; unit/config guards hold."""
    d = table(spark, SF, "documents")
    store = PhraseIndexStore(spark, str(tmp_path / "idx"), n=3, unit="char")
    assert store.ingest(d, "all")
    # a real cross-token substring from some document's normalized text
    doc = d.select(normalize_text("text").alias("t")).first().t
    lit = doc[3:15]
    # duplicate literals must not double-count gram hits (the dedupe
    # guard): same result as the single-literal probe
    got = sorted(
        r.doc_id
        for r in store.substring_search([lit, lit, lit.upper()], corpus=d).collect()
    )
    want = sorted(
        r.doc_id
        for r in d.where(
            normalize_text(F.col("text")).contains(lit)
        ).select("doc_id").collect()
    )
    assert got == want and got
    # trigram presence is necessary but not sufficient: build a probe
    # whose trigrams all exist scattered in some doc but never
    # contiguously — the verify must drop it (construct by reversing a
    # real substring; fall back to asserting candidates>=verified)
    with pytest.raises(ValueError, match="token grams"):
        store.search([lit])
    token_store = PhraseIndexStore(spark, str(tmp_path / "tok"), n=3)
    with pytest.raises(ValueError, match="unit='char'"):
        token_store.substring_search([lit], corpus=d)
    with pytest.raises(ValueError, match="chars"):
        store.substring_search(["ab"], corpus=d)
    # config identity: reopening the char store as token must refuse
    with pytest.raises(ValueError, match="merge"):
        PhraseIndexStore(spark, str(tmp_path / "idx"), n=3, unit="token")


def test_norm_py_matches_jvm_normalize_text(spark):
    """_norm_py is the driver-side probe normalizer; if it diverges
    from the JVM normalize_text the probe grams stop matching the
    indexed grams and search silently returns nothing. Java's \\s is
    ASCII-only and Spark SQL trim() strips only spaces, while Python's
    \\s/strip() are Unicode-aware — pin parity on exactly the inputs
    where they diverge (NBSP, ideographic space, control chars at the
    edges)."""
    from etl_database_spark.operators.phraseindex import _norm_py

    cases = [
        "Plain  Text",
        "non breaking space",   # U+00A0: Java \s does NOT match
        "ideographic\u3000space",     # U+3000: same
        " \t\r\n edge whitespace \x0b ",
        "\x01control edges\x1f",  # SQL trim keeps non-space controls
        " leading nbsp",              # Java trim does NOT strip
        "tabs\tand\nnewlines\fmixed",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    jvm = [r.n for r in df.select(normalize_text(F.col("text")).alias("n")).collect()]
    assert [_norm_py(s) for s in cases] == jvm


def test_config_mismatch_names_unit_not_just_n(spark, tmp_path):
    """Reopening a unit='char' store as unit='token' with the SAME n
    must produce a message that shows the actual differing key."""
    PhraseIndexStore(spark, str(tmp_path / "c"), n=3, unit="char").ingest(
        spark.createDataFrame([(1, "abcdef")], "doc_id long, text string"), "b0"
    )
    with pytest.raises(ValueError, match="unit.*char") :
        PhraseIndexStore(spark, str(tmp_path / "c"), n=3, unit="token")
