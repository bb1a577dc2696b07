"""HTTP scan with retry/backoff + HTML field extraction.

Re-expresses the reference's scraping edge:

- ``fetch_with_retry``: GET with N retries, exponential backoff,
  429-aware (systemscripts/web_utils.py:5-29);
- ``url_check_frame``: the S10 pattern (jobscripts/meetmax_url_check.py
  :111-184) — page bodies become a DataFrame and the field extraction
  (title, invalid-event alert, download link) is ``regexp_extract``
  columns, JVM-side;
- at scale, fetching itself distributes via ``fetch_partition`` inside
  ``mapInPandas`` — each partition runs its own rate-limited session
  (the reference's politeness throttling becomes per-partition).

The transport is injectable (``fetcher`` callable) — tests and offline
environments never touch the network; the default uses urllib only
when actually called.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Fetcher = Callable[[str], tuple[int, str]]  # url -> (status_code, body)


def default_fetcher(timeout: float = 10.0) -> Fetcher:  # pragma: no cover - network edge
    def fetch(url: str) -> tuple[int, str]:
        import urllib.request

        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            return e.code, ""

    return fetch


def fetch_with_retry(
    url: str,
    fetcher: Fetcher,
    max_retries: int = 5,
    initial_delay: float = 15.0,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[int, str]:
    """GET with exponential backoff; 429 (rate limit), gateway-
    transient 5xx (502/503/504 — upstream restarts and load shedding
    recover), and transport errors retry, doubling the delay each
    time (web_utils.py:5-29). 4xx client errors AND plain 500 return
    immediately: 500 usually means a deterministic server bug for
    this URL, and retrying a dead link would stall its partition for
    the full backoff schedule for nothing."""
    retryable = {429, 502, 503, 504, -1}
    delay = initial_delay
    status, body = -1, ""
    for attempt in range(max(max_retries, 1)):
        try:
            status, body = fetcher(url)
        except Exception:  # noqa: BLE001 — transport failure → retry
            status, body = -1, ""
        if status not in retryable:
            return status, body
        if attempt < max_retries - 1:
            sleep(delay)
            delay *= 2
    return status, body


def fetch_urls(
    spark: SparkSession,
    urls: list[str],
    fetcher: Fetcher,
    max_retries: int = 5,
    initial_delay: float = 1.0,
) -> DataFrame:
    """Distributed fetch: (url, status, body) via mapInPandas — each
    partition fetches serially with backoff (per-partition politeness;
    parallelism = partition count, the knob the reference sets to 1).
    ``initial_delay`` must be positive for the backoff to throttle at
    all (0 doubles to 0 forever — no politeness)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                status, body = fetch_with_retry(
                    url, fetcher, max_retries, initial_delay, sleep=time.sleep
                )
                rows.append({"url": url, "status": int(status), "body": body})
            yield pd.DataFrame(rows, columns=["url", "status", "body"])

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.mapInPandas(run, "url string, status int, body string")


def url_check_frame(pages: DataFrame) -> DataFrame:
    """Field extraction over fetched pages (meetmax_url_check.py:111-184):
    title, invalid-event alert, downloadable export link — pure
    regexp_extract/rlike columns, so extraction runs scan-speed however
    many pages were fetched."""
    body = F.col("body")
    return pages.select(
        "url",
        F.col("status").cast("string").alias("statuscode"),
        (F.col("status") == 200).cast("int").alias("ifexists"),
        F.regexp_extract(body, r"<title>([^<]*)</title>", 1).alias("title"),
        body.rlike(r"(?i)invalid\s+event\s+id").alias("invalideventid"),
        F.regexp_extract(body, r'href="([^"]*__co-list[^"]*\.xls[^"]*)"', 1).alias(
            "downloadlink"
        ),
    ).withColumn(
        "isdownloadable",
        ((F.length("downloadlink") > 0) & ~F.col("invalideventid")).cast("int"),
    )
