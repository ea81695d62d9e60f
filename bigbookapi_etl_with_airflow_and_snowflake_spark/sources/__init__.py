"""Data sources (SURVEY.md §2.1)."""
