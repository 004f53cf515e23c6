"""Custom stateful streaming operator — incremental first-seen emission via
`applyInPandasWithState` (the (b) path of SURVEY's custom-operator ladder:
semantics the built-in streaming aggregates can't express).

`first_seen_pairs` is streaming-distinct over (entity, class): across
micro-batches, a pair is emitted exactly once — the first time it arrives.
This is the incremental form of the canonical-ID dictionary build: as
transcripts stream in, downstream consumers receive only NEW entities /
type assertions, so the broadcast dictionary can be patched instead of
rebuilt (reference QSE re-scans the file per run; Parser.java:98-146).

State is per entity: the list of class strings already seen — bounded by
the entity's type count, not the stream length, so executor state stays
O(vocabulary). Group key = entity ⇒ the shuffle is the same hash
partitioning the batch kernel uses for entity_types_df.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "entity string, class string"
STATE_DDL = "seen array<string>"


def _emit_first_seen(key: Tuple[Any, ...],
                     pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    new: list[str] = []
    for pdf in pdfs:
        # drop null classes: None in the state array breaks sorted() below
        # and a null type assertion is meaningless to the dictionary
        for cls in pdf["class"].dropna():
            if cls not in seen:
                seen.add(cls)
                new.append(cls)
    state.update((sorted(seen),))
    if new:
        yield pd.DataFrame({"entity": key[0] if key else None,
                            "class": new})


def first_seen_pairs(entity_classes: DataFrame) -> DataFrame:
    """(entity, class) emitted once per distinct pair across the stream.

    Input: a STREAMING DataFrame with columns (entity, class) — e.g.
    streaming_extract(...) filtered to type triples. Output mode must be
    'update' or 'append' on the sink; state never times out (the
    dictionary is permanent by design — cap it upstream if the entity
    space is unbounded)."""
    return (entity_classes
            .groupBy("entity")
            .applyInPandasWithState(_emit_first_seen,
                                    outputStructType=OUTPUT_DDL,
                                    stateStructType=STATE_DDL,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
