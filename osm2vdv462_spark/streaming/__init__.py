"""Structured Streaming components.

The reference is pure batch (SURVEY.md §2.10) — these exist for the
engine's training-data-pipeline surface: incremental ingestion of event /
image streams with late-data handling, runnable hermetically via
``availableNow`` over file sources.
"""
