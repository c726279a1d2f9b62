"""Per-dataset refresh tracker.

Capability twin of /root/reference/lib/dataset_tracker.py:7-16: after a
successful publish, record an ISO-8601 UTC timestamp under the dataset
name so ops tooling can answer "when was X last refreshed?". The
reference stores America/New_York local time; we store UTC and leave
rendering to the CLI (SURVEY.md §1.2 F11).
"""

from __future__ import annotations

from datetime import datetime, timezone


class DatasetTracker:
    def __init__(self, kv, now=lambda: datetime.now(timezone.utc)) -> None:
        self.kv = kv
        self.now = now

    @staticmethod
    def key(dataset: str) -> str:
        return f"dataset_tracker:{dataset}"

    def update_tracker(self, dataset: str) -> None:
        self.kv[self.key(dataset)] = self.now().isoformat()

    def get_last_refresh(self, dataset: str) -> datetime | None:
        raw = self.kv.get(self.key(dataset))
        return datetime.fromisoformat(raw) if raw else None
