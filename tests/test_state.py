"""KV store / lastmod / tracker contract tests (mirrors the
reference's unit pyramid: tests/test_dbhash.py, test_lastmod.py,
test_dataset_tracker.py)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from nycdb_k8s_loader_spark.state.kvstore import DictKVStore, ParquetKVStore
from nycdb_k8s_loader_spark.state.lastmod import (
    FetchResult,
    LastmodInfo,
    UrlModTracker,
)
from nycdb_k8s_loader_spark.state.tracker import DatasetTracker


@pytest.fixture(params=["dict", "parquet"])
def kv(request, tmp_path):
    if request.param == "dict":
        return DictKVStore()
    return ParquetKVStore(str(tmp_path / "kv.parquet"))


class TestKVStore:
    def test_get_set_delete(self, kv):
        kv["a"] = "1"
        assert kv["a"] == "1"
        kv["a"] = "2"
        assert kv["a"] == "2"
        del kv["a"]
        assert kv.get("a") is None

    def test_set_or_delete(self, kv):
        kv.set_or_delete("k", "v")
        assert kv["k"] == "v"
        kv.set_or_delete("k", None)
        assert "k" not in kv
        kv.set_or_delete("never_existed", None)  # no-op, no raise

    def test_non_str_value_rejected(self, kv):
        with pytest.raises(TypeError):
            kv["k"] = 42

    def test_parquet_persistence(self, tmp_path):
        path = str(tmp_path / "kv2.parquet")
        s1 = ParquetKVStore(path)
        s1["x"] = "y"
        s1["z"] = "w"
        del s1["z"]
        s2 = ParquetKVStore(path)
        assert dict(s2) == {"x": "y"}


def make_transport(responses: dict[str, FetchResult]):
    calls: list[tuple[str, dict]] = []

    def transport(url: str, headers: dict[str, str]) -> FetchResult:
        calls.append((url, headers))
        return responses[url]

    transport.calls = calls
    return transport


class TestUrlModTracker:
    URL = "https://example.com/data.csv"

    def test_change_then_304_skip(self):
        kv = DictKVStore()
        t1 = make_transport(
            {self.URL: FetchResult(200, etag='"abc"', last_modified="Mon, 01 Jan")}
        )
        tracker = UrlModTracker([self.URL], kv, t1)
        assert tracker.did_any_urls_change()
        # validators not persisted until after publish
        assert LastmodInfo.read(kv, self.URL) == (None, None)
        tracker.update_lastmods()
        assert LastmodInfo.read(kv, self.URL) == ('"abc"', "Mon, 01 Jan")

        t2 = make_transport({self.URL: FetchResult(304)})
        tracker2 = UrlModTracker([self.URL], kv, t2)
        assert not tracker2.did_any_urls_change()
        # conditional headers were sent from stored state
        _, headers = t2.calls[0]
        assert headers == {
            "If-None-Match": '"abc"',
            "If-Modified-Since": "Mon, 01 Jan",
        }

    def test_error_counts_as_changed(self):
        kv = DictKVStore()
        t = make_transport({self.URL: FetchResult(500)})
        assert UrlModTracker([self.URL], kv, t).did_any_urls_change()

    def test_any_semantics(self):
        kv = DictKVStore()
        urls = ["u1", "u2"]
        t = make_transport({"u1": FetchResult(304), "u2": FetchResult(200)})
        assert UrlModTracker(urls, kv, t).did_any_urls_change()


class TestDatasetTracker:
    def test_update_and_read(self):
        kv = DictKVStore()
        frozen = datetime(2026, 8, 13, 12, 0, 0, tzinfo=timezone.utc)
        tr = DatasetTracker(kv, now=lambda: frozen)
        tr.update_tracker("pluto")
        assert tr.get_last_refresh("pluto") == frozen
        assert tr.get_last_refresh("missing") is None
