"""Compacted layout: files are sorted inside, key ranges don't overlap
across files, and file sizes are bounded."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from datapipelinedemo_spark.sources.compact import write_compacted
from datapipelinedemo_spark.tables import table


def test_compacted_layout_sorted_disjoint(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_compact")
    write_compacted(orders, path, ["o_orderkey"], num_files=4)

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4

    ranges = []
    total = 0
    for f in files:
        pdf = spark.read.parquet(f).select("o_orderkey").toPandas()
        keys = pdf["o_orderkey"].tolist()
        assert keys == sorted(keys), f"{f} not sorted"
        ranges.append((keys[0], keys[-1]))
        total += len(keys)
    assert total == orders.count()
    # ranges are pairwise disjoint -> min/max stats prune whole files
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo, f"overlap: ({a_lo},{a_hi}) vs ({b_lo},{b_hi})"


def test_max_records_per_file_bounds(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    total = orders.count()
    cap = total // 10  # force ~10+ files at any sf
    path = str(tmp_path / "orders_small_files")
    write_compacted(
        orders, path, ["o_orderkey"], num_files=2,
        max_records_per_file=cap,
    )
    files = glob.glob(path + "/part-*.parquet")
    assert len(files) >= 10
    for f in files:
        assert spark.read.parquet(f).count() <= cap
