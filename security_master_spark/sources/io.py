"""Batch source/sink helpers (SURVEY.md §2.1): CSV / JSON / Parquet.

Readers take an explicit schema — schema inference is a full extra
pass over the data (prohibitive at 100 TB) and can silently drift
between runs; a declared schema also lets the scan prune columns and
push predicates from the first byte.

The parquet sink is the engine's canonical output: ``partitionBy`` on
the query-predicate columns turns future reads' filters into partition
pruning (directories skipped at planning time, no file I/O at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partitioned parquet sink — the ETL landing pattern. One output
    directory per distinct partition-column tuple; keep partition
    cardinality ≤ O(10^4) and files ≥ ~100 MB at scale (tiny files are
    the classic 100 TB failure mode — compact with coalesce/AQE)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Bucketed+sorted table sink: pre-shuffles by ``bucket_col`` into
    ``n_buckets`` files so future equi-joins/aggregations on that key
    read co-located data and skip their Exchange entirely — the
    pay-once-shuffle-never-again layout for repeatedly-joined 100 TB
    facts. (Bucketing metadata lives in the catalog, hence
    ``saveAsTable`` rather than a bare path write.)"""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Global-sort-on-write for parquet data skipping:
    ``repartitionByRange`` assigns each output file a DISJOINT range of
    ``sort_cols`` (one range shuffle, sampled boundaries), and
    ``sortWithinPartitions`` orders rows inside each file (no extra
    shuffle). Parquet footers then carry tight, non-overlapping
    min/max on the sort columns at both file and row-group level, so
    any later scan with a predicate on them prunes whole files before
    decoding a byte — the same layout Iceberg sort orders / Delta
    OPTIMIZE formalize. tests/test_io_skipping.py proves the
    footer-stat tightening on the events fixture. ``n_files`` fixes
    the output file count (defaults to shuffle parallelism)."""
    cols = list(sort_cols)
    parts = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    parts.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)
