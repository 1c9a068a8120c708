"""Structured Streaming surfaces: usage-log stream analytics and the
artifact-watcher reindex trigger."""
