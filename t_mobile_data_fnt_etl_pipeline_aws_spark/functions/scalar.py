"""Placeholder — populated by build plan SURVEY.md §7."""
