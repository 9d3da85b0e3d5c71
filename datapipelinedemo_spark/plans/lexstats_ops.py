"""Lexical statistics of a training corpus: Zipf power-law shape of
the term-frequency distribution and per-language lexical diversity —
the corpus-health diagnostics a data pipeline reads before mixing or
filtering (a crawl whose Zipf slope collapses is template-flooded; a
language whose type-token ratio craters is boilerplate).

Scale shapes (all three entries):
- the only corpus-grain work is ONE tokenize+explode into a
  ``groupBy(term)`` / ``groupBy(lang, term)`` count — fully
  partial-aggregable, so the 10⁸-occurrence stopword collapses to one
  row per input partition map-side; the shuffle carries the VOCABULARY,
  never the corpus;
- everything after the term counts is histogram-compressed: the Zipf
  fit runs on ≤~40 log2-frequency buckets (the standing design rule —
  a diagnostic may never cost what it measures), and the diversity
  table is one partial agg over the (lang, term) frame;
- no windows at all, no driver-side loops.

Cross-engine determinism: counts and bucket sums are exact BIGINTs;
``log2``/``ln`` land on a 1e-6 integer grid via FLOOR(x·1e6 + 0.5)
(the classifier-sigmoid precedent); the final slope/intercept/ratios
are ONE IEEE division of exact integers, then round(_, 6) — the
``functions/stable.py`` playbook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.text import tokenize
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.tables import table

_TOK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

# shared DuckDB CTE: corpus-wide term frequencies
_TF_CTE = f"""
    WITH tf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_TOK}) AS term FROM documents)
        GROUP BY 1
    )"""

# the F5 log2 bucket applied to a term frequency (see
# functions/cleaning.py:71 for the half-up-vs-banker's parity note:
# log2(n+1) is irrational for integer n, so the modes agree)
_BUCKET_SQL = "CAST(round(log2(CAST(freq AS DOUBLE) + 1.0), 0) + 1 AS BIGINT)"

_HIST_CTE = (
    _TF_CTE
    + f""",
    hist AS (
        SELECT {_BUCKET_SQL} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(freq) AS BIGINT) AS occurrences
        FROM tf GROUP BY 1
    )"""
)


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.round(F.log2(F.col("freq").cast("double") + F.lit(1.0)), 0)
        + F.lit(1)
    ).cast("long")
    return (
        _tf(spark, sf_dir)
        .select(bucket.alias("bucket"), "freq")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("freq").cast("long").alias("occurrences"),
        )
    )


@register(
    "token_zipf_histogram",
    oracle=_HIST_CTE + "SELECT bucket, n_terms, occurrences FROM hist",
)
def token_zipf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(log2-frequency bucket, n_terms, occurrences): the
    frequency-of-frequency distribution on doubling buckets — Zipf's
    law makes it near-linear in log-log, so the ~40 buckets carry the
    whole distributional signal of a 10⁸-term vocabulary."""
    return _hist(spark, sf_dir)


@register(
    "token_zipf_slope",
    oracle=_HIST_CTE
    + """,
    pts AS (
        SELECT bucket AS x,
               CAST(FLOOR(ln(CAST(n_terms AS DOUBLE)) * 1e6 + 0.5)
                    AS BIGINT) AS y6
        FROM hist
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y6) AS BIGINT) AS sy6,
               CAST(SUM(x * y6) AS BIGINT) AS sxy6
        FROM pts
    )
    SELECT n AS n_buckets,
           (SELECT CAST(SUM(n_terms) AS BIGINT) FROM hist)
               AS n_terms_total,
           round(CAST(n * sxy6 - sx * sy6 AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE) * 1e6), 6)
               AS slope,
           round(CAST(sy6 * sxx - sx * sxy6 AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE) * 1e6), 6)
               AS intercept
    FROM s
    """,
)
def token_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of ln(n_terms) against the log2-frequency
    bucket — the power-law exponent diagnostic (Zipf ⇒ slope ≈
    −ln 2·(1 + 1/s)). All sums are exact integers on the 1e-6 grid;
    the slope/intercept are each ONE IEEE division at the end, so the
    fit is bit-reproducible in any engine."""
    pts = _hist(spark, sf_dir).select(
        F.col("bucket").alias("x"),
        "n_terms",
        F.floor(
            F.log(F.col("n_terms").cast("double")) * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("y6"),
    )
    # n_terms_total folds out of the SAME histogram — never a second
    # corpus pass (the r14 exponent run caught the 2x).
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y6").cast("long").alias("sy6"),
        F.sum(F.col("x") * F.col("y6")).cast("long").alias("sxy6"),
        F.sum("n_terms").cast("long").alias("n_terms_total"),
    )
    den = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double") * F.lit(1e6)
    return s.select(
        F.col("n").alias("n_buckets"),
        "n_terms_total",
        F.round(
            (
                F.col("n") * F.col("sxy6") - F.col("sx") * F.col("sy6")
            ).cast("double")
            / den,
            6,
        ).alias("slope"),
        F.round(
            (
                F.col("sy6") * F.col("sxx") - F.col("sx") * F.col("sxy6")
            ).cast("double")
            / den,
            6,
        ).alias("intercept"),
    )


@register(
    "lexical_diversity_by_lang",
    oracle=f"""
    WITH ltf AS (
        SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT lang, unnest({_TOK}) AS term FROM documents)
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS types,
               CAST(SUM(freq) AS BIGINT) AS tokens,
               CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS hapax_types
        FROM ltf GROUP BY 1
    ),
    nd AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    )
    SELECT a.lang AS lang, n.n_docs AS n_docs, a.types AS types,
           a.tokens AS tokens, a.hapax_types AS hapax_types,
           round(CAST(a.types AS DOUBLE) / a.tokens, 6)
               AS type_token_ratio,
           round(CAST(a.hapax_types AS DOUBLE) / a.types, 6)
               AS hapax_ratio
    FROM agg a JOIN nd n ON n.lang = a.lang
    """,
)
def lexical_diversity_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language lexical diversity: distinct types, total tokens,
    hapax legomena, type-token ratio, hapax share. The TTR/hapax pair
    is the standard boilerplate detector (duplicated templates crater
    both); exact counts + one division each, so cross-engine exact."""
    docs = table(spark, sf_dir, "documents")
    ltf = (
        docs.select("lang", F.explode(tokenize("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    agg = ltf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("types"),
        F.sum("freq").cast("long").alias("tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax_types"),
    )
    nd = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return agg.join(nd, "lang").select(
        "lang",
        "n_docs",
        "types",
        "tokens",
        "hapax_types",
        F.round(
            F.col("types").cast("double") / F.col("tokens"), 6
        ).alias("type_token_ratio"),
        F.round(
            F.col("hapax_types").cast("double") / F.col("types"), 6
        ).alias("hapax_ratio"),
    )
