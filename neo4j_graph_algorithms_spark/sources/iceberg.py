"""Iceberg source/sink adapter (import-gated).

Production target per BASELINE.json: the pages table and the
rank/component state tables live in Iceberg (partition pruning, snapshot
isolation, MERGE INTO write-back — the Exporter equivalent,
core/.../core/write/Exporter.java:46-68). The sandbox image has no
Iceberg runtime jars, so this adapter degrades to plain parquet paths
with identical call shapes; on a real cluster set
``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`` and
the same functions read/write through the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["iceberg_available", "read_table", "write_table"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.catalog.Catalog  # noqa: SLF001
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read an Iceberg table (catalog name) or a parquet path fallback."""
    if "/" not in table_or_path and iceberg_available(spark):
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def write_table(df: DataFrame, table_or_path: str, mode: str = "overwrite") -> None:
    """Write results to Iceberg (or parquet fallback) — the property
    write-back sink; distributed, batched per partition natively."""
    if "/" not in table_or_path and iceberg_available(df.sparkSession):
        df.writeTo(table_or_path).createOrReplace()
        return
    df.write.mode(mode).parquet(table_or_path)
