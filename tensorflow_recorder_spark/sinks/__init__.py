"""Sinks (SURVEY.md §2.5): TFRecord writer, transform artifacts,
discarded-rows sink."""
