"""LLM-data-pipeline surface (north star): dedup, similarity search,
text analysis, multimodal column plumbing."""

from __future__ import annotations
