"""Composable DataFrame operators (SURVEY.md §2)."""
