"""Query + oracle registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 that is implemented gets:
- a ``queries()`` entry: ``name -> (spark, sf_dir) -> DataFrame``
- when SQL-expressible, an ``oracle_sql()`` entry: ANSI SQL DuckDB runs
  on the same parquet tables (views pre-registered by the driver).

Conventions that make the driver's hash comparison deterministic
(order-insensitive value hash, columns sorted by name — see
``functions.stable``):
- every computed column aliased identically in Spark and SQL;
- doubles aggregated across rows go through DECIMAL accumulators;
- timestamps/dates presented as formatted strings;
- ordering never relied upon (except LIMIT queries, which must use a
  fully deterministic ORDER BY with unique tie-break).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datapipelinedemo_spark.session import ensure_runtime_confs

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the catalog.

    The registered callable is wrapped so that
    ``session.ensure_runtime_confs`` runs once per session before the
    plan is built: the catalog boundary is where externally-built
    (vanilla driver) sessions enter the engine, so the UTC-timezone /
    ``nanosAsLong`` pins happen here — readers (``tables.table``) stay
    side-effect-free. The wrapper is a no-op for sessions built by
    ``session.get_spark``.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_catalog() -> None:
    """Import every registering module (idempotent)."""
    from datapipelinedemo_spark.plans import relational  # noqa: F401
    from datapipelinedemo_spark.plans import relational_ext  # noqa: F401
    from datapipelinedemo_spark.plans import tpch_deep  # noqa: F401
    from datapipelinedemo_spark.plans import tpch_rest  # noqa: F401
    from datapipelinedemo_spark.plans import reference_pipeline  # noqa: F401
    from datapipelinedemo_spark.plans import llm_ops  # noqa: F401
    from datapipelinedemo_spark.plans import corpus_ops  # noqa: F401
    from datapipelinedemo_spark.plans import warehouse_ops  # noqa: F401
    from datapipelinedemo_spark.plans import graph_ops  # noqa: F401
    from datapipelinedemo_spark.plans import tweets_catalog  # noqa: F401
    from datapipelinedemo_spark.plans import analytics_ops  # noqa: F401
    from datapipelinedemo_spark.plans import ml_ops  # noqa: F401
    # classifier_ops must register before dedup_ext: the v4 pipeline's
    # oracle composes the classifier-scores oracle at import time
    from datapipelinedemo_spark.plans import classifier_ops  # noqa: F401
    from datapipelinedemo_spark.plans import dedup_ext  # noqa: F401
    from datapipelinedemo_spark.plans import selection_ops  # noqa: F401
    from datapipelinedemo_spark.plans import tokenizer_ops  # noqa: F401
    from datapipelinedemo_spark.plans import quality_ops  # noqa: F401
    from datapipelinedemo_spark.plans import matryoshka_ops  # noqa: F401
    from datapipelinedemo_spark.plans import hamming_ops  # noqa: F401
    from datapipelinedemo_spark.plans import lexstats_ops  # noqa: F401
    from datapipelinedemo_spark.plans import sq8_ops  # noqa: F401
