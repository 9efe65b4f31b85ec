"""Structured Streaming surface (beyond-reference; SURVEY.md §2.8)."""
