"""Assembled query plans.

- ``catalog``    — the registry the driver contract reads: every
  implemented operator registers a ``(spark, sf_dir) -> DataFrame``
  callable and (when SQL-expressible) a DuckDB oracle SQL string.
- ``relational`` — core relational surface (scans, filters, joins,
  aggregations, windows, set ops, rollup/cube, as-of).
- ``reference_pipeline`` — the four reference outputs (tweet analytics)
  plus testdata analogs of their operator semantics.
- ``llm_ops``    — dedup / similarity / text-analysis / multimodal
  query registrations.
"""

from datapipelinedemo_spark.plans import catalog  # noqa: F401
