"""Config-table surface: the reference's "behavior is data" core.

The reference drives every pipeline from database config tables —
dba.timportconfig, dba.treportmanager, dba.tinboxconfig, dba.tscheduler
— with plpgsql insert/update functions (create_importconfig_table.sql:
78-192, create_treportmanager.sql:62-187, create_tscheduler_procedures
.sql:1-87) and generates the crontab from them
(systemscripts/update_cron_jobs.py:21-33, README.md:281-289).

Here the same surface is a JSON-lines config store (small, read at job
start, human-diffable) with typed dataclass round-tripping, plus the
cron-line generator. The store is the single source the entry points
read: ``ImportJob`` takes an ImportConfig row, ``process_reports``
takes ReportConfig rows, ``process_inbox`` takes InboxConfig rows.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any

from etl_database_spark.ingest import ImportConfig
from etl_database_spark.metadata import MetadataSpec
from etl_database_spark.reports import ReportConfig
from etl_database_spark.sources.inbox import InboxConfig


@dataclass
class CurationRule:
    """Per-source curation thresholds for the LLM-data layer — the
    importconfig pattern (config rows parameterize a generic pipeline)
    applied to corpus curation. Consumed by
    queries.llmdata.curation_counts."""

    source: str
    min_quality_units: int = 6000  # integer basis points, engine-exact
    langs: str = "en"  # CSV of allowed detected languages
    min_tokens: int = 10
    is_active: bool = True


@dataclass
class SchedulerEntry:
    """One row of dba.tscheduler (create_tscheduler.sql:1-12)."""

    taskname: str
    frequency: str  # cron expression
    scriptpath: str
    scriptargs: str = ""
    is_active: bool = True


_KINDS: dict[str, type] = {
    "import": ImportConfig,
    "report": ReportConfig,
    "inbox": InboxConfig,
    "scheduler": SchedulerEntry,
    "curation": CurationRule,
}


def _to_dict(obj: Any) -> dict:
    d = dataclasses.asdict(obj)
    return d


def _from_dict(kind: str, d: dict) -> Any:
    cls = _KINDS[kind]
    if kind == "import" and isinstance(d.get("metadata"), dict):
        d = dict(d, metadata=MetadataSpec(**d["metadata"]))
    return cls(**d)


class ConfigStore:
    """JSONL-file-backed config tables with idempotent upsert semantics
    (the insert/update function pairs of the reference)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, kind: str) -> str:
        if kind not in _KINDS:
            raise KeyError(f"unknown config kind {kind!r}")
        return os.path.join(self.root, f"{kind}_config.jsonl")

    def list(self, kind: str, active_only: bool = False) -> list[Any]:
        path = self._path(kind)
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    cfg = _from_dict(kind, json.loads(line))
                    if not active_only or getattr(cfg, "is_active", True):
                        out.append(cfg)
        return out

    def _key(self, kind: str, obj: Any) -> Any:
        return {
            "import": lambda o: o.config_name,
            "report": lambda o: o.report_id,
            "inbox": lambda o: o.config_name,
            "scheduler": lambda o: o.taskname,
            "curation": lambda o: o.source,
        }[kind](obj)

    def upsert(self, kind: str, obj: Any) -> None:
        """Insert-or-replace by natural key (the f_insert/f_update
        pairs collapse to one idempotent operation)."""
        rows = self.list(kind)
        key = self._key(kind, obj)
        rows = [r for r in rows if self._key(kind, r) != key] + [obj]
        with open(self._path(kind), "w") as f:
            for r in rows:
                f.write(json.dumps(_to_dict(r), default=str) + "\n")

    def get(self, kind: str, key: Any) -> Any | None:
        for r in self.list(kind):
            if self._key(kind, r) == key:
                return r
        return None


def generate_cron_lines(
    entries: list[SchedulerEntry], runner: str = "spark-submit"
) -> list[str]:
    """Crontab generation from the scheduler table
    (update_cron_jobs.py:29-33): one line per active entry."""
    return [
        f"{e.frequency} {runner} {e.scriptpath} {e.scriptargs}".rstrip()
        for e in entries
        if e.is_active
    ]
