"""Engine state: KV store, HTTP lastmod tracking, dataset tracker."""
