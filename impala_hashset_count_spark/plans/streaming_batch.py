"""Batch-equivalent forms of the streaming queries (time windows,
sessionization, dedup-within-watermark) — see streaming/ package."""

from __future__ import annotations
