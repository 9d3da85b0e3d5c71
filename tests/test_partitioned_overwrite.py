"""Dynamic partition overwrite (sources/partitioned.py): re-landing
one day replaces that day only — contents AND files of other days
stay untouched."""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import functions as F

from datapipelinedemo_spark.sources.partitioned import (
    overwrite_days,
    write_day_partitioned,
)

SCHEMA = "user_id long, ts timestamp, event_id long, value double"


def _rows(day: int, n: int, base_id: int):
    return [
        (1, dt.datetime(2024, 1, day, 12, 0, i), base_id + i, float(day))
        for i in range(n)
    ]


def test_dynamic_overwrite_replaces_only_landed_days(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    initial = _rows(1, 3, 100) + _rows(2, 4, 200) + _rows(3, 5, 300)
    write_day_partitioned(spark.createDataFrame(initial, SCHEMA), path)

    before = spark.read.parquet(path)
    assert before.count() == 12
    d1_files_before = sorted(glob.glob(os.path.join(path, "day=2024-01-01", "*.parquet")))
    d1_mtimes_before = [os.path.getmtime(f) for f in d1_files_before]

    # re-land day 2 with corrected (fewer) rows
    overwrite_days(spark.createDataFrame(_rows(2, 2, 900), SCHEMA), path)

    after = spark.read.parquet(path)
    per_day = {
        str(r.day): r.n
        for r in after.groupBy("day").agg(F.count("*").alias("n")).collect()
    }
    assert per_day == {"2024-01-01": 3, "2024-01-02": 2, "2024-01-03": 5}

    # day 2 now contains ONLY the re-landed batch
    ids = {
        r.event_id
        for r in after.filter(F.col("day").cast("string") == "2024-01-02").collect()
    }
    assert ids == {900, 901}

    # untouched partitions kept their physical files (no rewrite)
    d1_files_after = sorted(glob.glob(os.path.join(path, "day=2024-01-01", "*.parquet")))
    assert d1_files_after == d1_files_before
    assert [os.path.getmtime(f) for f in d1_files_after] == d1_mtimes_before


def test_dynamic_overwrite_can_add_new_days(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    write_day_partitioned(
        spark.createDataFrame(_rows(1, 2, 100), SCHEMA), path
    )
    overwrite_days(spark.createDataFrame(_rows(4, 3, 400), SCHEMA), path)
    per_day = {
        str(r.day): r.n
        for r in spark.read.parquet(path)
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_day == {"2024-01-01": 2, "2024-01-04": 3}
