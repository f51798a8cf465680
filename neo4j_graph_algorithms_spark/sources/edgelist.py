"""Edge-list file sources/sinks (CSV / TSV / JSON / parquet).

The reference's own benchmark corpora ship as plain edge-list files
(see its readme's pokec/dbpedia/graph500 downloads); this adapter reads
them straight into the engine's ``(src, dst[, weight])`` contract.

Scale notes: the schema is always passed EXPLICITLY (``inferSchema``
would scan the whole 100 TB input once just to guess types), the reader
is a plain ``spark.read`` so Catalyst keeps partition pruning /
predicate pushdown, and malformed rows are dropped (PERMISSIVE nulls
filtered) rather than failing the load — the semantics a web-scale
crawl-derived edge dump needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["read_edge_list", "write_edge_list"]


def _schema(weighted: bool) -> T.StructType:
    fields = [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
    if weighted:
        fields.append(T.StructField("weight", T.DoubleType()))
    return T.StructType(fields)


def read_edge_list(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "csv",
    weighted: bool = False,
    delimiter: str = ",",
    header: bool = False,
    comment: str = "#",
    dedup: bool = False,
) -> DataFrame:
    """Load ``(src, dst[, weight])`` from an edge-list file tree.

    ``fmt``: 'csv' (use ``delimiter='\\t'`` for TSV), 'json' (one object
    per line with src/dst[/weight] keys), or 'parquet'. ``dedup``
    applies the parallel-edge DISTINCT the projections use."""
    schema = _schema(weighted)
    if fmt == "csv":
        df = (
            spark.read.schema(schema)
            .option("delimiter", delimiter)
            .option("header", str(header).lower())
            .option("comment", comment)
            .option("mode", "PERMISSIVE")
            .csv(path)
        )
    elif fmt == "json":
        df = spark.read.schema(schema).json(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path).select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            *([F.col("weight").cast("double")] if weighted else []),
        )
    else:
        raise ValueError(f"unknown edge-list format: {fmt}")
    df = df.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedup:
        df = df.dropDuplicates(["src", "dst"])
    return df


def write_edge_list(
    edges: DataFrame,
    path: str,
    *,
    fmt: str = "csv",
    delimiter: str = ",",
    mode: str = "overwrite",
) -> None:
    """Write ``(src, dst[, weight])`` back out as an edge-list tree."""
    cols = [c for c in ("src", "dst", "weight") if c in edges.columns]
    out = edges.select(*cols)
    if fmt == "csv":
        out.write.mode(mode).option("delimiter", delimiter).csv(path)
    elif fmt == "json":
        out.write.mode(mode).json(path)
    elif fmt == "parquet":
        out.write.mode(mode).parquet(path)
    else:
        raise ValueError(f"unknown edge-list format: {fmt}")
