"""Relational parity operators (SURVEY.md §2.2-2.6) and the
beyond-reference training-data surface (dedup / similarity / text
analysis / multimodal)."""
