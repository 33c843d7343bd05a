"""Dynamic table discovery (S6) — TableMonitorThread.java:40-186 analogue.

The reference runs a monitor thread that periodically lists the database's
tables, applies the whitelist/blacklist, detects changes against the last
snapshot and triggers task reconfiguration; it FAILS when two qualified
tables share an unqualified name (duplicate-topic hazard,
TableMonitorThread.java:112-131).

Here the "database" is a directory of Parquet tables (one file or one
directory per table); ``TableMonitor.poll()`` is the synchronous analogue
of one monitor tick: it returns the filtered table list plus the
added/removed delta, so a long-running ingest loop can rebuild its
MultiTableTail specs (the task-reconfiguration analogue) when the set
changes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def discover_tables(root: str) -> dict[str, str]:
    """Unqualified table name -> path, for every ``*.parquet`` file or
    Parquet-containing subdirectory directly under ``root``. Raises on
    duplicate unqualified names (file AND directory with the same stem) —
    the reference's duplicate-table startup failure."""
    found: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return {}
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        if entry.startswith(("_", ".")):
            continue
        if entry.endswith(".parquet") and os.path.isfile(path):
            found.setdefault(entry[: -len(".parquet")], []).append(path)
        elif os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            found.setdefault(entry, []).append(path)
    dups = {k: v for k, v in found.items() if len(v) > 1}
    if dups:
        raise ValueError(
            "duplicate unqualified table names detected (would mix data "
            f"types in one topic — TableMonitorThread.java:112-131): {dups}"
        )
    return {k: v[0] for k, v in found.items()}


@dataclass
class TableMonitor:
    """One-tick-at-a-time table monitor with whitelist/blacklist filtering.

    ``poll()`` returns {"tables", "added", "removed", "changed"}; callers
    reconfigure their tails when ``changed`` is true (the
    ``context.requestTaskReconfiguration()`` analogue).
    """

    root: str
    whitelist: tuple[str, ...] = ()
    blacklist: tuple[str, ...] = ()
    _last: dict[str, str] | None = field(default=None, repr=False)

    def __post_init__(self):
        if self.whitelist and self.blacklist:
            # JdbcSourceConnector forbids configuring both
            raise ValueError("use either a table whitelist or a blacklist, not both")

    def _filtered(self) -> dict[str, str]:
        tables = discover_tables(self.root)
        if self.whitelist:
            allowed = {w.lower() for w in self.whitelist}
            return {k: v for k, v in tables.items() if k.lower() in allowed}
        if self.blacklist:
            denied = {b.lower() for b in self.blacklist}
            return {k: v for k, v in tables.items() if k.lower() not in denied}
        return tables

    def poll(self) -> dict:
        current = self._filtered()
        prev = self._last or {}
        added = sorted(set(current) - set(prev))
        removed = sorted(set(prev) - set(current))
        self._last = current
        return {
            "tables": current,
            "added": added,
            "removed": removed,
            "changed": bool(added or removed),
        }
