"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of fact-to-fact joins (lineitem⋈orders) is
shuffling both sides by the key. Writing both tables bucketed by that
key with the same bucket count lets Spark's SortMergeJoin read
bucket i of each side into the same task — zero Exchange on either
side, forever, for every downstream join on that key. This module
wraps the write/read pattern (session-catalog parquet tables)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
