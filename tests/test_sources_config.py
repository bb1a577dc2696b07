import datetime as dt

from etl_database_spark.config import ConfigStore, SchedulerEntry, generate_cron_lines
from etl_database_spark.ingest import ImportConfig
from etl_database_spark.metadata import MetadataSpec
from etl_database_spark.reports import ReportConfig
from etl_database_spark.sources.http import fetch_urls, fetch_with_retry, url_check_frame
from etl_database_spark.sources.inbox import (
    InboxConfig,
    Message,
    message_matches_config,
    process_inbox,
)


# -- HTTP (S9/S10) ---------------------------------------------------------
def test_fetch_with_retry_backoff():
    calls = []
    delays = []

    def fetcher(url):
        calls.append(url)
        return (429, "") if len(calls) < 3 else (200, "<html>ok</html>")

    status, body = fetch_with_retry(
        "http://x/1", fetcher, max_retries=5, initial_delay=1.0, sleep=delays.append
    )
    assert status == 200 and body == "<html>ok</html>"
    assert delays == [1.0, 2.0]  # exponential (web_utils.py:20,28)


def test_fetch_with_retry_gives_up():
    calls = []

    def fetcher(u):
        calls.append(u)
        return (503, "")

    status, _ = fetch_with_retry(
        "http://x/1", fetcher, max_retries=3, initial_delay=0, sleep=lambda d: None
    )
    assert status == 503
    assert len(calls) == 3  # transient 5xx is retried before giving up


def test_fetch_client_error_fails_fast():
    calls = []

    def fetcher(u):
        calls.append(u)
        return (404, "gone")

    status, _ = fetch_with_retry(
        "http://x/1", fetcher, max_retries=5, initial_delay=0, sleep=lambda d: None
    )
    assert status == 404
    assert len(calls) == 1  # 4xx never retries — dead links don't stall the partition


def test_url_check_extraction(spark):
    def fetcher(url):
        if url.endswith("94583"):
            return 200, (
                '<html><title>Spring Conf</title>'
                '<a href="/sched/__co-list_cp.xls?event_id=94583">Export</a></html>'
            )
        return 200, "<html><title>Oops</title>Invalid Event ID</html>"

    pages = fetch_urls(
        spark, ["http://m/94583", "http://m/99999"], fetcher, max_retries=1, initial_delay=0
    )
    rows = {r.url: r for r in url_check_frame(pages).collect()}
    good = rows["http://m/94583"]
    assert good.title == "Spring Conf" and good.isdownloadable == 1
    assert good.downloadlink.endswith("event_id=94583")
    bad = rows["http://m/99999"]
    assert bad.invalideventid and bad.isdownloadable == 0


# -- Inbox (S11/P6) --------------------------------------------------------
def test_inbox_matching_and_routing(tmp_path):
    cfg = InboxConfig(
        config_name="weekly",
        subject_pattern=r"weekly report",
        sender_filter="ops@corp.com",
        attachment_name_pattern=r"\.csv$",
        local_repository_path=str(tmp_path / "watch"),
    )
    hit = Message(
        "RE: Weekly Report March", "Ops Team <OPS@corp.com>",
        {"data.csv": b"a,b\n1,2\n", "notes.txt": b"skip"},
        received=dt.datetime(2025, 3, 1, 12, 0, 0),
    )
    miss_subject = Message("spam", "ops@corp.com", {"data.csv": b""})
    miss_sender = Message("weekly report", "evil@other.com", {"data.csv": b""})
    assert message_matches_config(hit, cfg)
    assert not message_matches_config(miss_subject, cfg)
    assert not message_matches_config(miss_sender, cfg)

    written = process_inbox([hit, miss_subject, miss_sender], [cfg])
    assert len(written) == 1
    assert written[0].endswith("20250301T120000_data.csv")  # date-prefixed
    assert (tmp_path / "watch" / "20250301T120000_data.csv").read_bytes() == b"a,b\n1,2\n"


# -- Config store (F5) -----------------------------------------------------
def test_config_store_roundtrip(tmp_path):
    store = ConfigStore(str(tmp_path))
    imp = ImportConfig(
        config_name="MeetMaxURLCheckImport",
        source_directory="/watch",
        archive_directory="/arch",
        file_pattern=r".*\.csv",
        target_table="tmeetmaxurlcheck",
        metadata=MetadataSpec(label_location="1"),
    )
    store.upsert("import", imp)
    store.upsert("report", ReportConfig(1, "daily", "subj", ["a@b"]))
    got = store.get("import", "MeetMaxURLCheckImport")
    assert got == imp and isinstance(got.metadata, MetadataSpec)
    # upsert replaces by key
    store.upsert("import", ImportConfig(
        config_name="MeetMaxURLCheckImport", source_directory="/watch2",
        archive_directory="/arch", file_pattern=".*", target_table="t",
    ))
    assert len(store.list("import")) == 1
    assert store.get("import", "MeetMaxURLCheckImport").source_directory == "/watch2"


def test_cron_generation(tmp_path):
    entries = [
        SchedulerEntry("import", "0 5,17 * * 1-5", "jobs/run_import.py", "--config 1"),
        SchedulerEntry("disabled", "0 0 * * *", "x.py", is_active=False),
    ]
    lines = generate_cron_lines(entries)
    assert lines == ["0 5,17 * * 1-5 spark-submit jobs/run_import.py --config 1"]


def test_curation_rules_round_trip_and_drive_the_pipeline(spark, tmp_path):
    """CurationRule rows round-trip through the ConfigStore and drive
    curation_counts identically to the registered literal query —
    config IS the program surface, as in the reference."""
    from etl_database_spark.config import CurationRule
    from etl_database_spark.queries import llmdata as L
    from etl_database_spark.queries import table

    store = ConfigStore(str(tmp_path))
    for s, (q, langs, t) in L._CURATION_RULE_OVERRIDES.items():
        store.upsert("curation", CurationRule(s, q, langs, t))
    store.upsert("curation", CurationRule("srcX", 9999, "zz", 999, is_active=False))

    got = store.get("curation", "src1")
    assert (got.min_quality_units, got.langs, got.min_tokens) == (7000, "en", 12)
    overrides = L.curation_overrides(store)
    assert overrides == L._CURATION_RULE_OVERRIDES  # inactive row excluded

    d = table(spark, "/root/testdata/sf0.001", "documents")
    from_store = L.curation_counts(d, overrides).collect()
    literal = L.config_curation_counts(spark, "/root/testdata/sf0.001").collect()
    assert from_store == literal
    assert sum(r.n_kept for r in from_store) > 0
