"""S1 — CSV scan with explicit schema.

The reference uses ``inferSchema='True'`` (demo.py:53), which costs a
full extra pass over the input before the real job; with a declared
schema the scan is single-pass and the columns prune."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TWEET_SCHEMA = T.StructType(
    [
        T.StructField("Timestamp", T.StringType()),
        T.StructField("Text", T.StringType()),
        T.StructField("Comments", T.StringType()),
        T.StructField("Likes", T.StringType()),
        T.StructField("Retweets", T.StringType()),
        T.StructField("Page_URL", T.StringType()),
    ]
)


def read_tweets_csv(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Multi-file CSV scan (glob ok), header, comma-delimited, declared
    schema — the S1 source (demo.py:53) without the inference pass."""
    return spark.read.csv(paths, header=True, schema=TWEET_SCHEMA)
