"""Declared queries (SURVEY.md §2). Import via registry.load_all()."""
