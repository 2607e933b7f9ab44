"""LLM-data-pipeline extension queries (dedup / similarity / text /
multimodal) — filled by operators.dedup, operators.similarity,
functions.text, operators.multimodal. See those modules."""

from __future__ import annotations
