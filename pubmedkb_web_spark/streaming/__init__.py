"""Structured Streaming operators.

The reference is strictly batch (SURVEY.md §2.10) — no watermarks or
stateful ops exist there. This module exists for the engine's incremental-
refresh path: the same windowed aggregations used batch-side, expressed as
streaming queries so an append-only source (new corpus snapshots, event
feeds) can maintain the stats tables without full rebuilds.
"""
