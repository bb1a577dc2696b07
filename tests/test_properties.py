"""Property-based tests (hypothesis) for the pure-Python kernels the
pipeline depends on — the SURVEY §5.2 plan's property tier. Spark-side
invariants are covered deterministically elsewhere; these pin the
driver-side logic over generated inputs."""

import datetime as dt
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_database_spark.ingest import normalize_name
from etl_database_spark.metadata import MetadataSpec, parse_date, parse_label, strptime_to_java
from etl_database_spark.scheduler import cron_matches


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_normalize_name_idempotent_and_clean(name):
    out = normalize_name(name)
    assert normalize_name(out) == out  # idempotent
    assert out == out.lower()
    assert " " not in out and "-" not in out


@given(st.integers(min_value=0, max_value=9), st.integers(min_value=1, max_value=5))
@settings(max_examples=50, deadline=None)
def test_parse_label_token_index_roundtrip(idx, n_tokens):
    tokens = [f"tok{i}" for i in range(n_tokens)]
    fname = "_".join(tokens) + ".csv"
    spec = MetadataSpec(label_location=str(idx))
    got = parse_label(fname, spec)
    assert got == (tokens[idx] if idx < n_tokens else None)


@given(
    st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2099, 12, 31)),
    st.times(),
)
@settings(max_examples=100, deadline=None)
def test_parse_date_roundtrip(d, t):
    stamp = dt.datetime.combine(d, t).strftime("%Y%m%dT%H%M%S")
    spec = MetadataSpec(date_location="0", date_format="%Y%m%dT%H%M%S")
    assert parse_date(f"{stamp}_MeetMax_1.xls", spec) == d


@given(st.sampled_from(["%Y%m%d", "%Y-%m-%d", "%d/%m/%Y", "%Y%m%dT%H%M%S", "%H:%M:%S"]))
@settings(max_examples=20, deadline=None)
def test_strptime_java_translation_parses_same(fmt):
    """The Java pattern must format a probe datetime to the same string
    strftime produces (spot-equivalence of the translation table)."""
    java = strptime_to_java(fmt)
    # no stray strptime tokens survive
    assert "%" not in java
    # every alpha literal is quoted
    for m in re.finditer(r"(?<!')[a-zA-Z]+(?!')", java):
        assert set(m.group(0)) <= set("yMdHmsS"), java


@given(
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=23),
    st.datetimes(min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 1, 1)),
)
@settings(max_examples=200, deadline=None)
def test_cron_exact_minute_hour(minute, hour, when):
    """A fully-pinned (minute, hour) expression fires iff the clock
    matches both fields."""
    expr = f"{minute} {hour} * * *"
    assert cron_matches(expr, when) == (when.minute == minute and when.hour == hour)


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_split_boundaries_partition_bucket_space(raw):
    """split_boundaries always yields contiguous, non-overlapping
    ranges starting at 0, regardless of weight shape."""
    from etl_database_spark.functions.sampling import split_boundaries

    total = sum(raw)
    weights = {f"s{i}": w / total for i, w in enumerate(raw)}
    bounds = split_boundaries(weights)
    assert bounds[0][1] == 0
    for (_, _, hi_prev), (_, lo, _) in zip(bounds, bounds[1:]):
        assert lo == hi_prev  # contiguous
    assert all(lo <= hi for _, lo, hi in bounds)
    # total coverage is within rounding of the bucket space
    assert abs(bounds[-1][2] - 1000) <= len(raw)
