"""Z-order clustered layout: multi-dimension file skipping
(sources/zorder.py), measured against a linear sorted layout via
parquet footer min/max stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from datapipelinedemo_spark.sources.compact import write_compacted
from datapipelinedemo_spark.sources.zorder import morton_value, write_zordered
from datapipelinedemo_spark.tables import table


def test_morton_value_interleaves(spark):
    df = spark.createDataFrame([(3, 5)], "a long, b long").select(
        morton_value("a", "b", 4).alias("z")
    )
    # a=0b0011 (odd bits), b=0b0101 (even bits) →
    # z = b0*1 + a0*2 + b1*4 + a1*8 + b2*16 + a2*32 + b3*64 + a3*128
    #   = 1 + 2 + 0 + 8 + 16 + 0 + 0 + 0 = 27
    assert df.collect()[0].z == 27


def _files_hit(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(candidate files whose [min,max] intersects [lo,hi], total)."""
    hit, total = 0, 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        (
            F.floor(
                (F.col("ts").cast("long") - F.lit(1704067200)) / 3600
            ).cast("long")
        ).alias("hour_idx"),
        "event_type",
        "value",
    )
    # normalize both dims to fill [0, 2^8) — Morton squares only prune
    # well when the data spans the bit space (module docstring); the
    # scale factors come from the data (two tiny driver scalars, the
    # normal prologue of a layout/compaction job)
    um, hm = ev.agg(F.max("user_id"), F.max("hour_idx")).collect()[0]
    ev = ev.withColumn(
        "u_norm", F.floor(F.col("user_id") * 255 / um).cast("long")
    ).withColumn(
        "h_norm", F.floor(F.col("hour_idx") * 255 / hm).cast("long")
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(ev, zpath, "u_norm", "h_norm", num_files=16, bits=8)
    write_compacted(ev, lpath, ["hour_idx"], num_files=16)

    # a narrow slice on each dimension against both layouts (≈20% of
    # the user domain, ≈4% of the hour domain at sf0.001)
    u_lo, u_hi = int(um * 0.6), int(um * 0.6) + max(2, int(um * 0.1))
    zu, tot = _files_hit(zpath, "user_id", u_lo, u_hi)
    zh, _ = _files_hit(zpath, "hour_idx", 100, 129)
    lu, ltot = _files_hit(lpath, "user_id", u_lo, u_hi)
    lh, _ = _files_hit(lpath, "hour_idx", 100, 129)

    assert tot == 16 and ltot == 16
    # linear layout: the sorted dimension prunes hard, the other does
    # not — every file is a candidate for the user slice
    assert lu == ltot
    assert lh <= 4
    # z-order: BOTH dimensions prune meaningfully
    assert zu <= ltot // 2
    assert zh <= ltot // 2

    # and the data survives the round trip
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(lpath).count()
        == ev.count()
    )
