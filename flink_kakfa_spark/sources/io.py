"""Write-side surface (SURVEY.md §2.1 S6) and layout tools for scale.

The reference's only sink is a Kafka topic; a batch engine needs a
lake-writer story too. This module owns the three layouts that matter
at 100 TB:

- **Partitioned parquet** (``partitionBy``): directory-level pruning —
  a reader filtering on the partition column skips whole directories
  (visible as PartitionFilters in the scan).
- **Bucketed tables** (``bucketBy`` + ``saveAsTable``): pre-shuffled
  layout — equi-joins/aggregations on the bucket key skip the exchange
  entirely, the decisive optimization for repeatedly-joined fact
  tables.
- **Plain parquet/CSV/JSON** round-trips for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """Write parquet hive-partitioned by the given columns."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (pre-shuffled) managed table.

    Joining two tables bucketed on the same key with the same bucket
    count requires NO exchange — asserted in tests/test_io.py.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV source with an explicit schema (never infer at scale — a
    schema inference pass is a full extra read of the data)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with an explicit schema."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default) — the columnar interchange format for
    Hive-ecosystem consumers; same pushdown/pruning behavior as
    parquet through Spark's native vectorized ORC reader."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (schema from file metadata, like parquet)."""
    return spark.read.orc(path)
