"""Logical plans / compound pipelines (SURVEY.md §3): the convert
lifecycle and its fitted-transform state."""
