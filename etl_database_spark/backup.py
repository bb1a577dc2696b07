"""Backup sink and file-retention jobs.

Re-expresses the reference's ops shell scripts as engine jobs:

- ``backup_data_root`` ≙ jobscripts/daily_backup.sh:26-46 — tar.gz the
  data root (Parquet dirs are the storage; a tarball is the
  single-file backup artifact) with N-day rotation;
- ``purge_old_files`` ≙ weekly_cleanup_logs.sh:23 /
  weekly_cleanup_meetmaxevents.sh:24 — delete files older than a
  threshold (the ``find -mtime`` analog), scoped by glob.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import tarfile
import time


def backup_data_root(data_root: str, backup_dir: str, keep_days: int = 3) -> str:
    """Create ``{backup_dir}/backup_{yyyyMMddTHHmmss}.tar.gz`` of the
    data root and drop backups older than ``keep_days``. Returns the
    new archive path."""
    os.makedirs(backup_dir, exist_ok=True)
    stamp = dt.datetime.now().strftime("%Y%m%dT%H%M%S")
    path = os.path.join(backup_dir, f"backup_{stamp}.tar.gz")
    seq = 1
    while os.path.exists(path):  # same-second run must not clobber
        path = os.path.join(backup_dir, f"backup_{stamp}.{seq}.tar.gz")
        seq += 1
    # If backup_dir lives inside data_root, the recursion would
    # archive every previous backup plus the partial in-progress
    # archive itself (geometric growth) — exclude it.
    backup_abs = os.path.abspath(backup_dir)

    def _exclude_backups(ti):
        full = os.path.abspath(os.path.join(os.path.dirname(data_root.rstrip("/")), ti.name))
        return None if full == backup_abs or full.startswith(backup_abs + os.sep) else ti

    with tarfile.open(path, "w:gz") as tar:
        tar.add(
            data_root,
            arcname=os.path.basename(data_root.rstrip("/")),
            filter=_exclude_backups,
        )
    cutoff = time.time() - keep_days * 86400
    for old in glob.glob(os.path.join(backup_dir, "backup_*.tar.gz")):
        if old != path and os.path.getmtime(old) < cutoff:
            os.remove(old)
    return path


def purge_old_files(directory: str, keep_days: int, pattern: str = "*") -> list[str]:
    """Delete files in ``directory`` matching ``pattern`` whose mtime is
    older than ``keep_days`` days; returns the removed paths."""
    removed = []
    cutoff = time.time() - keep_days * 86400
    for path in glob.glob(os.path.join(directory, pattern)):
        if os.path.isfile(path) and os.path.getmtime(path) < cutoff:
            os.remove(path)
            removed.append(path)
    return removed
