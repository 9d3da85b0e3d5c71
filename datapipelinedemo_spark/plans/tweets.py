"""The four reference outputs (tweet analytics), assembled Spark-first.

Reference flow (demo.py): CSV scan → ~20 row-at-a-time UDF enrichments
→ per output: rdd.map → groupByKey → Python dict fold → toDF → explode
→ pivot → toPandas CSV, re-running the whole uncached prefix 4×.

Rebuild: one declarative enrichment (every F1–F10 as native
expressions, NER + sentiment as broadcast joins), ``.cache()``d once,
then four groupBy/pivot plans that share it. Each aggregation is a
partial-agg HashAggregate; pivots get explicit chronologically-sorted
values (no hidden distinct job); weights fold into SUMs (the reference
materializes weight-repeated arrays, F11 — never needed).

Output schemas match the golden CSV headers
(Frequency_monthly_demo.csv etc.): key cols + ``<Prefix>_<Y>-<M>``
month columns (month not zero-padded) + constant ``Category1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from datapipelinedemo_spark.pin import pin

from datapipelinedemo_spark.functions.cleaning import (
    clean_timestamp,
    keyword_from_url,
    keyword_to_category,
    log2_bucket,
    parse_human_number,
    parse_timestamp_date,
)
from datapipelinedemo_spark.functions.ner import extract_phrases
from datapipelinedemo_spark.functions.sentiment import score_sentiment


def enrich(
    tweets: DataFrame,
    patterns: DataFrame,
    lexicon: DataFrame,
    sample_n: int | None = None,
    seed: int = 42,
    cache: bool = True,
) -> DataFrame:
    """E1 — the shared enrichment prefix (demo.py:50-187), one pass.

    ``sample_n`` reproduces the reference's P1 random-sample-then-limit
    (demo.py:55,59) but SEEDED; pass None to process everything (the
    reference's unseeded global sort made its golden outputs
    unreproducible — quarantined here, SURVEY.md §5).
    """
    df = tweets.filter(F.col("Timestamp").isNotNull())
    if sample_n is not None:
        df = df.orderBy(F.rand(seed)).limit(sample_n)

    df = (
        df.withColumn("TweetDate", parse_timestamp_date(clean_timestamp("Timestamp")))
        .filter(F.col("TweetDate").isNotNull())
        .fillna("0", subset=["Comments", "Likes", "Retweets"])
        .withColumn("Comments", parse_human_number("Comments"))
        .withColumn("Likes", parse_human_number("Likes"))
        .withColumn("Retweets", parse_human_number("Retweets"))
        .withColumn("Likes_log", log2_bucket("Likes"))
        .withColumn("Retweets_log", log2_bucket("Retweets"))
        .withColumn("Year", F.year("TweetDate"))
        .withColumn("Month", F.month("TweetDate"))
        .withColumn("Quarter", F.quarter("TweetDate"))
        .filter(F.col("Page_URL").isNotNull())
        .withColumn("Keyword", keyword_from_url("Page_URL"))
        .filter(F.col("Keyword").isNotNull())
        # Unknown keyword → null category in the reference (demo.py:135);
        # those rows are KEPT and every output consumes Category2 only via
        # str(key) in the month/category UDFs (demo.py:219, str(None) →
        # 'None'), so coalescing to the literal 'None' here is
        # observationally equivalent and keeps the group key non-null.
        .withColumn(
            "Category2",
            F.coalesce(keyword_to_category("Keyword"), F.lit("None")),
        )
        .withColumn("__rid", F.monotonically_increasing_id())
    )
    # __rid feeds TWO reattach joins (phrases, sentiment) below.
    # monotonically_increasing_id is only stable for a fixed partition
    # layout + row order, so pin it by materializing the frame once
    # (lineage truncation: retries and both join branches reread the
    # same blocks instead of regenerating ids). Lazy: first action pays.
    df = df.transform(pin)  # pin-bounded: tweets demo-fixture grain; materialization REQUIRED for monotonically_increasing_id stability (correctness, not perf)
    df = extract_phrases(df, "Text", patterns, "__rid", out_col="All_phrases")
    # CheckEmpty != 1 (demo.py:157's intended semantics): drop sentinel rows
    df = df.filter(F.col("All_phrases") != F.array(F.lit("empty")))
    df = score_sentiment(df, "Text", lexicon, "__rid", out_col="Sentiment")
    df = df.drop("__rid")
    return df.cache() if cache else df


def _month_labels(df: DataFrame, prefix: str) -> list[str]:
    """Distinct (Year, Month) labels — the explicit pivot value list
    (one tiny job instead of Catalyst's hidden distinct, and a
    deterministic column order). Sorted LEXICOGRAPHICALLY by label
    string (2018-1 < 2018-10 < 2018-2), matching the golden headers:
    the reference's value-less pivot sorts the distinct labels as
    strings (Frequency_monthly_demo.csv:1)."""
    ym = {
        (r["Year"], r["Month"])
        for r in df.select("Year", "Month").distinct().collect()  # bounded-collect: distinct (Year,Month) pivot labels, calendar-bounded
    }
    return sorted(f"{prefix}_{y}-{m}" for y, m in ym)


def _pivot(
    long: DataFrame, keys: list[str], prefix: str, value_col: str, labels: list[str]
) -> DataFrame:
    wide = (
        long.withColumn(
            "__label",
            F.concat(
                F.lit(prefix + "_"),
                F.col("Year").cast("string"),
                F.lit("-"),
                F.col("Month").cast("string"),
            ),
        )
        .groupBy(*keys)
        .pivot("__label", labels)
        .max(value_col)
        .fillna(0)
    )
    return wide.withColumn("Category1", F.lit("Beverage")).select(
        *keys, *labels, "Category1"
    )


def _explode_topics(enriched: DataFrame) -> DataFrame:
    return enriched.select(
        "Year",
        "Month",
        "Category2",
        "Likes_log",
        "Retweets_log",
        "Sentiment",
        F.explode("All_phrases").alias("Topic"),
    ).filter(F.col("Topic") != "empty")


def _explode_topic_pairs(enriched: DataFrame) -> DataFrame:
    from datapipelinedemo_spark.operators.pairs import explode_pairs

    base = enriched.select(
        "Year",
        "Month",
        "Category2",
        "Likes_log",
        "Retweets_log",
        "Sentiment",
        "All_phrases",
    )
    pairs = explode_pairs(
        base,
        "All_phrases",
        out1="Topic",
        out2="Topic2",
        keep=["Year", "Month", "Category2", "Likes_log", "Retweets_log", "Sentiment"],
    )
    return pairs.filter((F.col("Topic") != "empty") & (F.col("Topic2") != "empty"))


def frequency_monthly(enriched: DataFrame) -> DataFrame:
    """A1 — weighted phrase frequency: per (Topic, Category2, month),
    Σ_tweets (Retweets_log + 1). Weight folded into the SUM (the
    reference repeats the phrase array weight+1 times then FreqDists
    it, demo.py:180-213)."""
    long = _explode_topics(enriched).groupBy(
        "Year", "Month", "Category2", "Topic"
    ).agg(F.sum(F.col("Retweets_log") + 1).alias("val"))
    labels = _month_labels(long, "Frequency")
    return _pivot(long, ["Topic", "Category2"], "Frequency", "val", labels)


def sentiments_monthly(enriched: DataFrame) -> DataFrame:
    """A2 — smoothed weighted mean sentiment per phrase:
    Σ(Sentiment·(Likes_log+1)) / (Σ Likes_log + 1) — numerator weights
    every tweet, denominator smooths once per group (demo.py:255-306)."""
    long = (
        _explode_topics(enriched)
        .groupBy("Year", "Month", "Category2", "Topic")
        .agg(
            (
                # fixed-point-snapped numerator: order-independent and
                # oracle-reproducible (see functions.stable)
                (
                    F.sum(
                        F.floor(
                            F.col("Sentiment")
                            * (F.col("Likes_log") + 1)
                            * F.lit(1000000.0)
                            + F.lit(0.5)
                        ).cast("long")
                    ).cast("double")
                    / F.lit(1000000.0)
                )
                / (F.sum("Likes_log") + F.lit(1)).cast("double")
            ).alias("val")
        )
    )
    labels = _month_labels(long, "Sentiment")
    return _pivot(long, ["Topic", "Category2"], "Sentiment", "val", labels)


def frequency_2d_monthly(enriched: DataFrame) -> DataFrame:
    """A4 — pair frequency: per (Topic, Topic2, Category2, month),
    1 + Σ_tweets Retweets_log (asymmetric smoothing vs A1 — the
    reference's setdefault(pair, 1) fold, demo.py:436-442)."""
    long = (
        _explode_topic_pairs(enriched)
        .groupBy("Year", "Month", "Category2", "Topic", "Topic2")
        .agg((F.lit(1) + F.sum("Retweets_log")).alias("val"))
    )
    labels = _month_labels(long, "Frequency")
    return _pivot(long, ["Topic", "Topic2", "Category2"], "Frequency", "val", labels)


def sentiment2d_monthly(enriched: DataFrame) -> DataFrame:
    """A3 — pair smoothed sentiment (golden column order:
    Category2, Topic, Topic2, months…, Category1)."""
    long = (
        _explode_topic_pairs(enriched)
        .groupBy("Year", "Month", "Category2", "Topic", "Topic2")
        .agg(
            (
                # fixed-point-snapped numerator: order-independent and
                # oracle-reproducible (see functions.stable)
                (
                    F.sum(
                        F.floor(
                            F.col("Sentiment")
                            * (F.col("Likes_log") + 1)
                            * F.lit(1000000.0)
                            + F.lit(0.5)
                        ).cast("long")
                    ).cast("double")
                    / F.lit(1000000.0)
                )
                / (F.sum("Likes_log") + F.lit(1)).cast("double")
            ).alias("val")
        )
    )
    labels = _month_labels(long, "Sentiment")
    return _pivot(long, ["Category2", "Topic", "Topic2"], "Sentiment", "val", labels)


def run_all(
    tweets: DataFrame, patterns: DataFrame, lexicon: DataFrame, **enrich_kw
) -> dict[str, DataFrame]:
    """All four outputs off ONE cached enrichment (the reference
    recomputes the whole prefix per output — 4 full passes)."""
    e = enrich(tweets, patterns, lexicon, **enrich_kw)
    return {
        "frequency_monthly": frequency_monthly(e),
        "sentiments_monthly": sentiments_monthly(e),
        "sentiment2d_monthly": sentiment2d_monthly(e),
        "frequency_2d_monthly": frequency_2d_monthly(e),
    }
