"""Placeholder — queries land in milestone order (SURVEY.md §7)."""
