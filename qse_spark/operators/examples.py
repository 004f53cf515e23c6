"""Example sampling (E1-E4) — k example nodes per class and k example
values per (class, property), reference `Parser.java:117-130,214-228`,
`ExampleManager.java`.

The reference uses unseeded reservoir replacement (`Parser.java:72`); this
engine makes every sample a pure function of the data + seed by ranking on
md5(entity || seed) — md5 (not xxhash64) so the DuckDB oracle reproduces
the exact same sample."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _order_key(col, seed: int):
    return F.md5(F.concat(col, F.lit(f"#{seed}")))


def example_nodes(entity_types: DataFrame, k: int = 5,
                  seed: int = 100) -> DataFrame:
    """(class, entity, rnk) — <=k deterministic example entities per class."""
    w = Window.partitionBy("class").orderBy(_order_key(F.col("entity"), seed),
                                            F.col("entity"))
    return (entity_types.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def example_values(tagged: DataFrame, entity_types: DataFrame, k: int = 5,
                   seed: int = 100) -> DataFrame:
    """(class, property, value, rnk) — <=k example object values per
    (class, property); input `tagged` is (entity, property, obj_value)."""
    joined = (tagged.join(entity_types, "entity")
              .select("class", "property",
                      F.col("obj_value").alias("value")).distinct())
    w = Window.partitionBy("class", "property").orderBy(
        _order_key(F.col("value"), seed), F.col("value"))
    return (joined.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def labels_for_interesting(labels: DataFrame,
                           interesting: DataFrame) -> DataFrame:
    """E3 — keep label triples only for interesting subjects (left-semi),
    reference `Parser.java:255-288` third pass."""
    return labels.join(interesting, labels["subject"] == interesting["id"],
                       "left_semi")
