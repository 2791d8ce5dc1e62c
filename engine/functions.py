"""Placeholder — populated in a later milestone (SURVEY.md §7.2)."""
