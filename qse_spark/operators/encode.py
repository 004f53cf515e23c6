"""S4 — string dictionary encoding (reference `StringEncoder.java:19-28`,
`NodeEncoder.java:27-36`).

The reference encodes every IRI/datatype string to a dense int through a
mutable single-JVM hash map before any other stage touches it. Spark does
not need that to run (strings shuffle fine and Parquet dictionary-encodes
at rest — SURVEY §2 S4), but the operator is still useful as an explicit
narrow-int key space for downstream joins, so it exists in both of the
forms SURVEY suggests:

  method='hash'    id = xxhash64(value). Embarrassingly parallel, no
                   shuffle beyond the distinct — the 100 TB path. Ids are
                   sparse; collisions are 2^-64-scale and detectable by
                   comparing distinct counts.
  method='sorted'  id = dense_rank over lexicographic value order, zero
                   -based — dense, deterministic, reproducible by any SQL
                   engine (the oracle-checked path). The global window
                   sorts only the DISTINCT dictionary (vocabulary-sized,
                   not corpus-sized); at extreme vocabularies prefer
                   'hash'.

The reference's insertion-order ids are inherently sequential-scan
semantics and deliberately NOT reproduced (SURVEY §2 S4: any stable
bijection serves; nothing downstream depends on id order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def string_dictionary(df: DataFrame, col: str,
                      method: str = "hash") -> DataFrame:
    """(id bigint, value string) — one row per distinct non-NULL value of
    `col`. NULLs get no dictionary row (encode_column leaves them NULL):
    encoding them would also make the 'sorted' ids engine-dependent
    (Spark windows sort NULLS FIRST, SQL DENSE_RANK defaults NULLS
    LAST)."""
    d = (df.select(F.col(col).cast("string").alias("value"))
         .filter(F.col("value").isNotNull()).distinct())
    if method == "hash":
        return d.select(F.xxhash64("value").alias("id"), "value")
    if method == "sorted":
        w = Window.orderBy("value")
        return d.select((F.dense_rank().over(w) - 1).cast("long").alias("id"),
                        "value")
    raise ValueError(f"unknown method {method!r}")


def encode_column(df: DataFrame, col: str, dictionary: DataFrame,
                  broadcast: bool = True) -> DataFrame:
    """Replace string `col` with its dictionary id (column keeps its name).

    The dictionary is broadcast by default (predicate/class vocabularies
    are tiny); pass broadcast=False to shuffle-join a corpus-scale
    dictionary instead."""
    dim = dictionary.select(F.col("value").alias(f"__v_{col}"),
                            F.col("id").alias(f"__id_{col}"))
    if broadcast:
        dim = F.broadcast(dim)
    return (df.join(dim, df[col] == dim[f"__v_{col}"], "left")
            .drop(col, f"__v_{col}")
            .withColumnRenamed(f"__id_{col}", col))


def decode_column(df: DataFrame, col: str, dictionary: DataFrame,
                  broadcast: bool = True) -> DataFrame:
    """Inverse of encode_column."""
    dim = dictionary.select(F.col("id").alias(f"__id_{col}"),
                            F.col("value").alias(f"__v_{col}"))
    if broadcast:
        dim = F.broadcast(dim)
    return (df.join(dim, df[col] == dim[f"__id_{col}"], "left")
            .drop(col, f"__id_{col}")
            .withColumnRenamed(f"__v_{col}", col))
