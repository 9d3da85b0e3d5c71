"""SparkSession factory tuned for this engine.

The reference creates a bare session (``/root/reference/demo.py:50``)
and then defeats Catalyst with UDFs and RDD detours. Here the session
is configured so that the declarative plans the rest of the package
builds get the optimizer behaviors that matter at 100 TB:

- AQE on (runtime shuffle coalescing, skew-join splitting) — the pair
  cooccurrence expansion and dictionary joins are skew-prone.
- Arrow on — any pandas-interchange (``mapInPandas`` multimodal ops,
  ``toPandas`` in tests) is batch-columnar, never row-pickled.
- UTC session timezone — parquet timestamps compare identically
  across Spark / DuckDB / pandas.
- shuffle partitions sized to the local core count by default; on a
  real cluster this would be set to ~2-3× total executor cores (or
  left to AQE's ``coalescePartitions`` with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "datapipelinedemo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    sp = shuffle_partitions or int(
        os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # dictionary/dimension tables (NER patterns ~25k rows, sentiment
        # lexicon, keyword→category map) must broadcast, never shuffle
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (one historical testdata generation)
        # reads as long under this flag; tables.table() floor-converts.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
