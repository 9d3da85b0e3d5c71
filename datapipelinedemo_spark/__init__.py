"""datapipelinedemo_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of TasteGuruAI/DataPipeLineDemo (reference: a single-file
PySpark tweet-analytics pipeline, ``demo.py``), re-expressed as a small
library of composable, schema-explicit DataFrame operators:

- ``session``    — tuned ``SparkSession`` factory (AQE, Arrow, UTC).
- ``tables``     — schema-explicit loaders for the driver testdata.
- ``functions``  — native Column-expression versions of the reference's
  scalar UDFs (F1–F16 in SURVEY.md §2.3) plus text-analysis primitives.
- ``operators``  — aggregation pipelines (A1–A7), pair expansion,
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, as-of joins.
- ``plans``      — assembled end-to-end pipelines: the four reference
  outputs and the oracle-checked query catalog.
- ``streaming``  — Structured Streaming variants of the window aggs.
- ``multimodal`` — binary-column (image/audio) plumbing over
  ``mapInPandas`` with stubbed decoders.

Design rules (SURVEY.md §7): zero RDD API, zero row-at-a-time Python
UDFs on the hot path, explicit schemas, cached shared prefixes,
explicit pivot values, broadcast joins for dictionary lookups.
"""

__version__ = "0.1.0"
