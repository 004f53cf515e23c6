"""qse_spark — PySpark-native knowledge-graph construction engine.

A from-scratch Spark implementation of the QSE (Quality Shapes Extraction)
semantics (reference: dkw-aau/qse, PVLDB 16(5) 2023) over multi-turn
conversation/agent transcripts:

    transcripts --(vectorized extraction)--> mentions + triples
               --(minhash/LSH blocking + similarity)--> entity links
               --(large-star/small-star CC)--> canonical ids
               --(groupBy aggregation)--> (subj, pred, obj) triples
               --(QSE stats kernel)--> shape support/confidence/cardinality
               --(shape builder + pruning)--> SHACL shapes

Everything is declared with the DataFrame API so Catalyst/AQE pick the
physical plan; Python only runs inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
