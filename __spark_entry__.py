"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check (sf0.001).
``queries()``    — every implemented operator from SURVEY.md §2, as
                   ``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — matching DuckDB SQL for the hash-compare gate.

The real implementations live in ``datapipelinedemo_spark``; this file
only adapts its catalog to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipelinedemo_spark.plans import catalog
from datapipelinedemo_spark.plans.catalog import ORACLES, QUERIES

catalog.load_catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's signature shape (SURVEY.md §2.5 A6): a monthly
    pivoted aggregate — event_type × "YYYY-M" month columns, summed
    value, missing cells zero-filled.
    """
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.tables import table

    sf_dir = "/root/testdata/sf0.001"
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.concat(
            F.year("ts").cast("string"), F.lit("-"), F.month("ts").cast("string")
        ).alias("ym"),
        "value",
    )
    labels = sorted(r[0] for r in ev.select("ym").distinct().collect())
    return (
        ev.groupBy("event_type")
        .pivot("ym", labels)
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"))
        .fillna(0.0)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
