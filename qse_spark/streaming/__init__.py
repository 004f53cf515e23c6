from .extract import streaming_extract, streaming_class_counts  # noqa: F401
from .incremental import (compact_groups, compact_to_base,  # noqa: F401
                          incremental_kg, ingest_transcripts)
