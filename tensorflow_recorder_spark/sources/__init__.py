"""Sources (SURVEY.md §2.1): in-memory/pandas ingest, CSV scan,
image-directory scan, TFRecord scan, and the source dispatcher."""

from .dispatch import to_dataframe  # noqa: F401
