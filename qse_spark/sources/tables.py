"""Table source/sink with format fallback.

The north rule targets partitioned Iceberg tables; the Iceberg runtime jars
are not in this image, so the writer probes for the Iceberg catalog and
falls back to plain parquet directories with identical layout. On a real
cluster, set QSE_TABLE_FORMAT=iceberg (jars on the classpath) and nothing
else changes."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMAT = os.environ.get("QSE_TABLE_FORMAT", "parquet")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    if FORMAT == "iceberg" and iceberg_available(spark):
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.parquet(path_or_table)


def write_table(df: DataFrame, path_or_table: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if FORMAT == "iceberg" and iceberg_available(df.sparkSession):
        w.format("iceberg").save(path_or_table)
    else:
        w.parquet(path_or_table)
