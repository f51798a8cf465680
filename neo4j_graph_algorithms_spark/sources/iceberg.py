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

__all__ = ["iceberg_available", "read_table", "write_table",
           "write_similarity_relationships"]


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


def write_similarity_relationships(
    pairs: DataFrame,
    table_or_path: str,
    *,
    relationship_type: str = "SIMILAR",
    item1_col: str = "item1",
    item2_col: str = "item2",
    similarity_col: str = "similarity",
    mode: str = "overwrite",
) -> None:
    """Dedicated relationship sink for similarity results — the
    ``SimilarityExporter`` equivalent (similarity/SimilarityExporter.java
    :36-86 creates one typed relationship per pair with the score as a
    property; write-sequential batches). The Spark restatement writes
    the edge table (src, dst, rel_type, similarity) in one distributed
    job — no per-row transactions; downstream graph loads read it back
    as a typed, weighted relationship table."""
    from pyspark.sql import functions as F

    edges = pairs.select(
        F.col(item1_col).alias("src"),
        F.col(item2_col).alias("dst"),
        F.lit(relationship_type).alias("rel_type"),
        F.col(similarity_col).cast("double").alias("similarity"),
    )
    write_table(edges, table_or_path, mode=mode)
