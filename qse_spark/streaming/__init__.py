from .extract import streaming_extract, streaming_class_counts  # noqa: F401
from .incremental import (compact_groups, incremental_kg,  # noqa: F401
                          ingest_transcripts)
