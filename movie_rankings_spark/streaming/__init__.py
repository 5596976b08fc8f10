"""Structured Streaming tier over the events table (SURVEY.md §2i)."""
