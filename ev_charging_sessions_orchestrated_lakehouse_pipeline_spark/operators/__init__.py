"""Operator layer: silver cleaning, quality, gold fact, analytics,
dedup, similarity, text analysis, multimodal (SURVEY.md §2, §7)."""
