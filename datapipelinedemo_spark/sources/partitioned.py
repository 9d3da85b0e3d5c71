"""Day-partitioned parquet layout with dynamic partition overwrite —
the standard incremental-ingestion contract: re-landing one day's
batch replaces exactly that day's files and touches nothing else.

Why it matters at 100 TB: backfills and late-arriving corrections are
per-partition operations; static overwrite mode would truncate the
whole table, and append mode would duplicate the re-landed day. The
``partitionOverwriteMode=dynamic`` write option scopes the overwrite
to the partitions present in the incoming batch — set per-write here
(not on the session) so library users and the vanilla driver session
see no global config mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_day_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Initial land: partition by event day (hive-style ``day=...``
    directories, partition pruning for free on day filters)."""
    (
        df.withColumn("day", F.date_format(ts_col, "yyyy-MM-dd"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )


def overwrite_days(batch: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Incremental land: replace ONLY the day-partitions present in
    ``batch``; all other partitions' files are untouched (their
    file-modification times are asserted in tests, not just their
    contents)."""
    (
        batch.withColumn("day", F.date_format(ts_col, "yyyy-MM-dd"))
        .write.partitionBy("day")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
