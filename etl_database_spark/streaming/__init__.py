"""Structured Streaming layer: the reference's cron-polled
file_watcher directory (README.md:39-57) as a real file-source stream
(SURVEY.md §2.9)."""
