"""Sorted, size-bounded parquet layout (compaction / clustering).

The write-side half of data skipping: files whose key ranges don't
overlap let any min/max-stats reader (parquet row-group stats, engine
file pruning) skip whole files for range predicates, and bounded file
sizes keep scan tasks uniform (no 10 GB straggler files, no
million-small-files listing storms).

``repartitionByRange`` range-partitions on the sort key (one shuffle,
sampled split points), ``sortWithinPartitions`` orders rows inside
each output file, ``maxRecordsPerFile`` caps file size. At 100 TB this
is the nightly compaction job shape; pair with hive-style
``partitionBy`` for the coarse (date/tenant) axis and this for the
fine (key-range) axis within each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_compacted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    out = df.repartitionByRange(num_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
