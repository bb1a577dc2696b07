"""Inbox processing: config-driven message matching → watch-dir files.

Re-expresses the reference's Gmail attachment pipeline
(systemscripts/gmail_inbox_processor.py) with the transport abstracted:
a *message provider* yields (subject, sender, attachments) records —
the Gmail API client is one provider; tests use an in-memory one. The
matching rules are the reference's ``email_matches_config``
(gmail_inbox_processor.py:83-103): case-insensitive subject regex,
sender substring filter, attachment-name regex. Matched attachments are
written into the config's repository path with a date prefix
(gmail_inbox_processor.py:105-145) — i.e. into the file-watcher
directory the import jobs consume.
"""

from __future__ import annotations

import datetime as dt
import os
import re
from collections.abc import Iterable
from dataclasses import dataclass, field


@dataclass
class InboxConfig:
    """One row of the inbox-config surface
    (create_inboxconfig_table.sql:1-15)."""

    config_name: str
    subject_pattern: str = ".*"
    sender_filter: str = ""
    has_attachment: bool = True
    attachment_name_pattern: str = ".*"
    local_repository_path: str = "."
    is_active: bool = True


@dataclass
class Message:
    subject: str
    sender: str
    attachments: dict[str, bytes] = field(default_factory=dict)
    received: dt.datetime = field(default_factory=dt.datetime.now)


def message_matches_config(msg: Message, cfg: InboxConfig) -> bool:
    """gmail_inbox_processor.py:83-103 semantics: all configured
    filters must pass; regexes are case-insensitive."""
    if not re.search(cfg.subject_pattern, msg.subject, re.IGNORECASE):
        return False
    if cfg.sender_filter and cfg.sender_filter.lower() not in msg.sender.lower():
        return False
    if cfg.has_attachment and not msg.attachments:
        return False
    return True


def matching_attachments(msg: Message, cfg: InboxConfig) -> dict[str, bytes]:
    pat = re.compile(cfg.attachment_name_pattern, re.IGNORECASE)
    return {name: data for name, data in msg.attachments.items() if pat.search(name)}


def process_inbox(
    messages: Iterable[Message], configs: list[InboxConfig]
) -> list[str]:
    """Route each message's matching attachments to the first matching
    active config's repository path, date-prefixed
    (gmail_inbox_processor.py:105-145). Returns written file paths."""
    written: list[str] = []
    for msg in messages:
        for cfg in configs:
            if not cfg.is_active or not message_matches_config(msg, cfg):
                continue
            os.makedirs(cfg.local_repository_path, exist_ok=True)
            stamp = msg.received.strftime("%Y%m%dT%H%M%S")
            for name, data in matching_attachments(msg, cfg).items():
                # Attachment names come from external senders: strip
                # any path components (a name containing separators
                # would escape the repository dir or crash the write),
                # and uniquify on collision — two messages in the same
                # second with same-named attachments must not silently
                # overwrite each other.
                safe = os.path.basename(name.replace("\\", "/")) or "attachment"
                path = os.path.join(cfg.local_repository_path, f"{stamp}_{safe}")
                seq = 1
                while os.path.exists(path):
                    stem, ext = os.path.splitext(safe)
                    path = os.path.join(
                        cfg.local_repository_path, f"{stamp}_{stem}.{seq}{ext}"
                    )
                    seq += 1
                with open(path, "wb") as f:
                    f.write(data)
                written.append(path)
            break
    return written
