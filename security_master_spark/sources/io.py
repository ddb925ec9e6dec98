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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
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


def _spread_bits_21(col: Column) -> Column:
    """Spread the low 21 bits of a long so consecutive bits land 3
    apart (x -> x with two zero bits between every bit) — the standard
    magic-mask dilation, expressed as JVM bitwise column ops (stays in
    whole-stage codegen; no UDF)."""
    x = col.bitwiseAND(F.lit(0x1FFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 32))).bitwiseAND(F.lit(0x1F00000000FFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x1F0000FF0000FF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x100F00F00F00F00F))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x1249249249249249))
    return x


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Multi-dimensional clustering (Z-order / Morton) on write — the
    Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort-order primitive for
    workloads that filter on MORE THAN ONE column. A single-column
    sort gives one dimension tight per-file min/max footer stats and
    leaves every other dimension spanning the full range in every
    file (nothing prunes). Interleaving the bits of both dimensions'
    21-bit quantized ranks orders files along a space-filling curve,
    so EACH file covers a small rectangle of the 2-D space — both
    dimensions' footer stats tighten, and predicates on either (or
    both) skip files. The quantization only drives placement; stored
    values are untouched. tests/test_io_skipping.py proves the
    two-dimensional tightening against both a single-sort and an
    unsorted control.

    Cost shape: one tiny min/max agg + one range shuffle on the
    morton key — identical to single-column sort-on-write; you pay
    nothing extra for the second dimension."""
    ext = df.agg(
        F.min(col_a).cast("double").alias("a_min"),
        F.max(col_a).cast("double").alias("a_max"),
        F.min(col_b).cast("double").alias("b_min"),
        F.max(col_b).cast("double").alias("b_max"),
    ).first()
    bits = (1 << 21) - 1

    def quant(c: str, lo: float, hi: float) -> Column:
        if lo is None:  # empty input: no rows to place; any key works
            lo, hi = 0.0, 1.0
        span = (hi - lo) or 1.0
        return F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * bits
        ).cast("long")

    z = _spread_bits_21(quant(col_a, ext.a_min, ext.a_max)).bitwiseOR(
        F.shiftleft(_spread_bits_21(quant(col_b, ext.b_min, ext.b_max)), 1)
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
