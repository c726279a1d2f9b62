"""Per-dataset refresh schedules.

Capability twin of /root/reference/scheduling.py:6-42 (frequency enum
abstracted from the backend) and :63-100 (dataset → frequency map).
The engine itself only *declares* schedules; execution belongs to an
external scheduler (k8s CronJob / Airflow) invoking
``spark-submit cli.py load <dataset>`` — the same separation the
reference draws (k8s_build_jobs.py generates manifests from this map).
"""

from __future__ import annotations

from enum import Enum


class Schedule(Enum):
    """Cron expressions, timezone-naive (deploy tz is configured on
    the scheduler, reference uses America/New_York —
    k8s-job-template.yml)."""

    DAILY_10PM = "0 22 * * *"
    DAILY_11PM = "0 23 * * *"
    DAILY_7AM = "0 7 * * *"
    DAILY_8AM = "0 8 * * *"
    ODD_DAYS_6AM = "0 6 1-31/2 * *"
    EVEN_DAYS_6AM = "0 6 2-30/2 * *"
    YEARLY = "0 0 1 1 *"

    @property
    def cron(self) -> str:
        return self.value


def schedule_for(dataset: str, overrides: dict[str, Schedule] | None = None) -> Schedule:
    """Default daily refresh with per-dataset overrides (the reference
    hand-assigns each of ~36 datasets a slot; our registry carries the
    override map instead of a hardcoded table)."""
    if overrides and dataset in overrides:
        return overrides[dataset]
    return Schedule.DAILY_10PM
