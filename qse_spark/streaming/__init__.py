from .extract import streaming_extract, streaming_class_counts  # noqa: F401
