from pyspark.sql import functions as F

from etl_database_spark.functions import text as T


def _one(spark, s, col):
    return spark.createDataFrame([(s,)], "t string").select(col.alias("v")).first().v


def test_token_count(spark):
    assert _one(spark, "hello world foo", T.token_count("t")) == 3
    assert _one(spark, "  spaced   out  ", T.token_count("t")) == 2
    assert _one(spark, "", T.token_count("t")) == 0
    assert _one(spark, "   ", T.token_count("t")) == 0


def test_word_occurrences(spark):
    assert _one(spark, "the cat the dog the", T.word_occurrences("t", "the")) == 3
    assert _one(spark, "theater theory", T.word_occurrences("t", "the")) == 0


def test_punct_and_upper_ratio(spark):
    assert _one(spark, "ab!!", T.punct_ratio("t")) == 0.5
    assert _one(spark, "", T.punct_ratio("t")) == 0.0
    assert _one(spark, "ABcd", T.upper_ratio("t")) == 0.5


def test_detect_language(spark):
    assert _one(spark, "the cat and the dog is here", T.detect_language("t")) == "en"
    assert _one(spark, "el perro de la casa que ladra", T.detect_language("t")) == "es"
    assert _one(spark, "der hund und die katze nicht", T.detect_language("t")) == "de"
    assert _one(spark, "xyzzy plugh qwerty", T.detect_language("t")) == "und"


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog and runs far away today",),
         ("!!! ### $$$ %%%",), ("",)],
        "t string",
    )
    vals = [r.q for r in df.select(T.quality_score("t").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # natural text beats punctuation soup


def test_fingerprints_normalize(spark):
    a = _one(spark, "Hello   World", T.fingerprint_md5("t"))
    b = _one(spark, "hello world", T.fingerprint_md5("t"))
    assert a == b
    x = _one(spark, "Hello   World", T.fingerprint_xx64("t"))
    y = _one(spark, "hello world", T.fingerprint_xx64("t"))
    assert x == y


def test_bpe_token_count(spark):
    import re

    from etl_database_spark.functions.text import BPE_TOKEN_RE, bpe_token_count

    samples = [
        "hello world",               # 2 letter runs
        "x=1+2;  # done",            # letters, digits, symbols
        "",                          # empty
        "   ",                       # blank
        "don't stop-me now!!",       # apostrophe/hyphen split off
        "abc123def 42",              # digit singles between runs
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
    got = {r.i: r.n for r in df.select("i", bpe_token_count("t").alias("n")).collect()}
    want = {i: len(re.findall(BPE_TOKEN_RE, s)) for i, s in enumerate(samples)}
    assert got == want
    assert got[0] == 2 and got[2] == 0 and got[3] == 0


def test_pii_patterns_sensitive_on_fixture(spark):
    """The PII regexes must actually fire: a fixture with emails, URLs
    and long digit runs yields the right per-pattern counts (the
    bundled corpus has none, so doc_pii_profile's zeros need this
    positive control)."""
    from etl_database_spark.queries.llmdata import _EMAIL_RE, _LONG_NUM_RE, _URL_RE

    samples = [
        (1, "contact bob.smith+spam@example.co.uk or alice@test.org today"),
        (2, "see https://spark.apache.org/docs and http://a.b/c?q=1"),
        (3, "card 4111111111111111 ssn-ish 123456789 short 12345"),
        (4, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")
    out = {
        r.doc_id: (r.e, r.u, r.n)
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(_EMAIL_RE)).alias("e"),
            F.regexp_count("text", F.lit(_URL_RE)).alias("u"),
            F.regexp_count("text", F.lit(_LONG_NUM_RE)).alias("n"),
        ).collect()
    }
    assert out[1] == (2, 0, 0)
    assert out[2] == (0, 2, 0)
    assert out[3] == (0, 0, 2)
    assert out[4] == (0, 0, 0)

    # portability: DuckDB counts the same fixture identically
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(samples, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("fixture", pdf)
    dd = con.execute(
        f"""SELECT doc_id, len(regexp_extract_all(text, '{_EMAIL_RE}')),
                   len(regexp_extract_all(text, '{_URL_RE}')),
                   len(regexp_extract_all(text, '{_LONG_NUM_RE}'))
            FROM fixture ORDER BY doc_id"""
    ).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in dd} == out


def test_compression_ratios_match_direct_zlib(spark):
    import zlib

    from etl_database_spark.functions.text import compression_ratios

    rows = [
        (1, "spam spam spam " * 40),          # repetitive -> low ratio
        (2, "the quick brown fox jumps over the lazy dog and keeps going"),
        (3, "9f8e7d6c5b4a" * 1 + "zqxjkvbwpm"),  # short, high-entropy
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in compression_ratios(df).collect()}
    for i, text in rows:
        raw = text.encode()
        comp = zlib.compress(raw, 6)
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["n_compressed"] == len(comp)
        assert got[i]["ratio_permille"] == ((1000 * len(comp)) // len(raw) if raw else 0)
    assert got[1]["ratio_permille"] < 200        # boilerplate compresses hard
    assert got[2]["ratio_permille"] > got[1]["ratio_permille"]
