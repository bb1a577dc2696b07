import datetime as dt

import pytest

from etl_database_spark.config import SchedulerEntry
from etl_database_spark.scheduler import cron_matches, due_tasks


def test_reference_cron_lines():
    # the reference's actual schedules (README.md:246-260)
    imports = "0 5,17 * * 1-5"
    weekly = "0 19 * * 5"
    assert cron_matches(imports, dt.datetime(2025, 3, 3, 5, 0))    # Mon 05:00
    assert cron_matches(imports, dt.datetime(2025, 3, 7, 17, 0))   # Fri 17:00
    assert not cron_matches(imports, dt.datetime(2025, 3, 8, 5, 0))   # Sat
    assert not cron_matches(imports, dt.datetime(2025, 3, 3, 6, 0))   # wrong hour
    assert cron_matches(weekly, dt.datetime(2025, 3, 7, 19, 0))    # Fri 19:00
    assert not cron_matches(weekly, dt.datetime(2025, 3, 6, 19, 0))  # Thu


def test_steps_ranges_lists():
    assert cron_matches("*/15 * * * *", dt.datetime(2025, 1, 1, 0, 45))
    assert not cron_matches("*/15 * * * *", dt.datetime(2025, 1, 1, 0, 46))
    assert cron_matches("0 0 1-7/2 * *", dt.datetime(2025, 1, 3, 0, 0))
    assert not cron_matches("0 0 1-7/2 * *", dt.datetime(2025, 1, 4, 0, 0))


def test_dom_dow_either_semantics():
    # both restricted → OR (cron quirk)
    expr = "0 0 13 * 5"  # 13th OR Friday
    assert cron_matches(expr, dt.datetime(2025, 6, 13, 0, 0))  # Fri 13th
    assert cron_matches(expr, dt.datetime(2025, 6, 6, 0, 0))   # a Friday
    assert cron_matches(expr, dt.datetime(2025, 5, 13, 0, 0))  # a Tuesday 13th
    assert not cron_matches(expr, dt.datetime(2025, 6, 12, 0, 0))


def test_bad_expression():
    with pytest.raises(ValueError):
        cron_matches("* * *", dt.datetime(2025, 1, 1))


def test_due_tasks():
    entries = [
        SchedulerEntry("a", "0 5 * * *", "a.py"),
        SchedulerEntry("b", "0 6 * * *", "b.py"),
        SchedulerEntry("c", "0 5 * * *", "c.py", is_active=False),
    ]
    due = due_tasks(entries, dt.datetime(2025, 1, 1, 5, 0))
    assert [e.taskname for e in due] == ["a"]


def test_cron_dow_seven_is_sunday():
    """Vixie-cron alias: DOW 7 == Sunday; '* * * * 7' must fire on
    Sundays instead of never."""
    import datetime as dt

    from etl_database_spark.scheduler import cron_matches

    sunday = dt.datetime(2025, 3, 2, 2, 0)  # a Sunday
    monday = dt.datetime(2025, 3, 3, 2, 0)
    assert cron_matches("0 2 * * 7", sunday)
    assert not cron_matches("0 2 * * 7", monday)
    assert cron_matches("0 2 * * 0", sunday)  # canonical form unaffected
