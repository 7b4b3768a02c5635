"""Structured Streaming surface (SURVEY.md §2 group H, s03-s04)."""
