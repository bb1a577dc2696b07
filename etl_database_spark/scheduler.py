"""Scheduler runtime: 5-field cron matching + due-task selection.

The reference generates its crontab from the scheduler table and lets
cron do the matching (systemscripts/update_cron_jobs.py, README.md:
281-289). For environments where the engine itself owns the loop, this
module evaluates the same 5-field expressions (minute hour day-of-month
month day-of-week) against a clock — a dependency-free matcher covering
the forms the reference's configs use: ``*``, lists ``a,b``, ranges
``a-b``, steps ``*/n`` and ``a-b/n``.

Semantics follow cron: if both day-of-month and day-of-week are
restricted, the entry fires when EITHER matches.
"""

from __future__ import annotations

import datetime as dt

from etl_database_spark.config import SchedulerEntry

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
        for v in range(start, end + 1, step):
            if lo <= v <= hi:
                out.add(v)
    return out


def cron_matches(expr: str, when: dt.datetime) -> bool:
    """True if the 5-field cron expression fires at ``when`` (minute
    resolution)."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"bad cron expression {expr!r}")
    sets = [
        _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)
    ]
    minute, hour, dom, month, dow = sets
    # Vixie cron: DOW 7 is a standard alias for Sunday (0); the range
    # guard would otherwise silently drop it and '* * * * 7' entries
    # would never fire.
    if "7" in fields[4]:
        dow = dow | {v % 7 for v in _parse_field(fields[4], 0, 7)}
    # cron DOW: 0=Sunday; Python weekday(): 0=Monday → convert
    py_dow = (when.weekday() + 1) % 7
    time_ok = when.minute in minute and when.hour in hour and when.month in month
    dom_restricted = fields[2] != "*"
    dow_restricted = fields[4] != "*"
    if dom_restricted and dow_restricted:
        day_ok = when.day in dom or py_dow in dow
    else:
        day_ok = when.day in dom and py_dow in dow
    return time_ok and day_ok


def due_tasks(entries: list[SchedulerEntry], when: dt.datetime) -> list[SchedulerEntry]:
    """Active entries whose cron expression fires at ``when``."""
    return [e for e in entries if e.is_active and cron_matches(e.frequency, when)]
