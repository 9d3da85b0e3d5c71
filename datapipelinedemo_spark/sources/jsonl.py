"""JSONL (newline-delimited JSON) source/sink.

Web-crawl corpora ship as JSONL far more often than CSV; this is the
source a training-data pipeline actually ingests. Rules that matter at
100 TB:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full sampling pass over the input first; with a
  declared schema the scan is single-pass, and unreferenced fields are
  never even parsed (Jackson skips them token-wise — column pruning
  for semi-structured input).
- **Corrupt-record quarantine, not job failure.** One malformed line
  in a billion must not kill the job: PERMISSIVE mode routes bad lines
  to ``_corrupt_record`` for a dead-letter sink instead of throwing
  (FAILFAST) or silently dropping (DROPMALFORMED).
- JSONL is splittable (line-oriented), so parallelism is free;
  gzip'd JSONL is NOT splittable — one file = one task — so shard
  compressed corpora into many files upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = DOCUMENT_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Single-pass JSONL scan with a declared schema.

    With ``keep_corrupt`` the frame carries a ``_corrupt_record``
    column: null for clean rows, the raw line for malformed ones —
    filter it into a dead-letter path and drop it from the main flow.
    """
    full = schema
    if keep_corrupt:
        full = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return spark.read.schema(full).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(paths)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_marker_column, dead_letter_rows).

    Spark refuses queries that reference ONLY ``_corrupt_record`` on a
    raw scan (the parser would have nothing to fail on), so the frame
    is cached — one materialization serves both branches anyway, which
    is what a split sink wants.
    """
    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    dead = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, dead


def write_jsonl(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Distributed JSONL sink (one file per task; hive-style
    subdirectories when partitioned, so downstream scans prune)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
