"""Lastmod-gated downstream-export hook.

Capability twin of the reference's search-index update gate
(/root/reference/wowutil.py:99-141): after a build, push derived data
to an external system (there: the Algolia landlord index) ONLY if the
upstream source has refreshed since the last export — the date compare
at wowutil.py:116-123 (source Last-Modified vs index updatedAt), with
"no source lastmod recorded → skip" (wowutil.py:93-96) and "client not
configured → skip" both surfaced as notifications, never errors.

The external client itself stays out of engine scope (SURVEY §7 "what
NOT to build"); this is the generic gate any exporter plugs into:

    gate = LastmodGatedExport(kv, urls_of("hpd_registrations"),
                              export_key="landlord_search_index")
    gate.run(push_to_index, notifier)

State lives in the same KV store as the URL validators: the gate reads
the ``last_modified:<url>`` keys UrlModTracker maintains and writes an
``exported_at:<key>`` timestamp after a successful export, so a
crashed export retries on the next run (exported_at only advances on
success — same crash-retry discipline as the load lifecycle).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timezone

from nycdb_k8s_loader_spark.state.lastmod import LastmodInfo

#: HTTP-date (RFC 7231, what Last-Modified headers carry; the format
#: the reference parses at wowutil.py:96).
_HTTP_DATE = "%a, %d %b %Y %H:%M:%S %Z"


def parse_when(text: str | None) -> datetime | None:
    """HTTP-date or ISO-8601 → aware UTC datetime (None on blank)."""
    if not text:
        return None
    for parse in (
        lambda s: datetime.strptime(s, _HTTP_DATE),
        datetime.fromisoformat,
    ):
        try:
            dt = parse(text)
            break
        except ValueError:
            continue
    else:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


class LastmodGatedExport:
    def __init__(
        self,
        kv,
        source_urls: list[str],
        export_key: str,
        clock: Callable[[], datetime] = _utcnow,
    ) -> None:
        self.kv = kv
        self.source_urls = source_urls
        self.state_key = f"exported_at:{export_key}"
        self.clock = clock

    def source_last_updated(self) -> datetime | None:
        """Newest recorded Last-Modified across the source URLs (the
        reference reads exactly one HPD url's validator,
        wowutil.py:90-96; multiple urls take the max so ANY refreshed
        source re-triggers the export)."""
        stamps = []
        for url in self.source_urls:
            _, last_modified = LastmodInfo.read(self.kv, url)
            dt = parse_when(last_modified)
            if dt is not None:
                stamps.append(dt)
        return max(stamps, default=None)

    def exported_at(self) -> datetime | None:
        return parse_when(self.kv.get(self.state_key))

    def should_export(self) -> tuple[bool, str]:
        """(push?, human reason) — the reference's three outcomes:
        no source validator → skip; source older than export → skip;
        else push (wowutil.py:116-127)."""
        src = self.source_last_updated()
        if src is None:
            return False, "no source lastmod recorded; skipping export"
        exported = self.exported_at()
        if exported is not None and src <= exported:
            return False, (
                "no new source data since last export; skipping"
            )
        return True, "source newer than last export"

    def run(self, export_fn: Callable[[], None], notifier=None) -> bool:
        """Gate + execute + persist. Returns True iff the export ran.
        ``exported_at`` advances only after ``export_fn`` returns, so
        a crashed push is retried next run rather than lost."""
        push, reason = self.should_export()
        if notifier is not None:
            notifier.safe_notify(reason)
        if not push:
            return False
        export_fn()
        self.kv.set_or_delete(self.state_key, self.clock().isoformat())
        return True
